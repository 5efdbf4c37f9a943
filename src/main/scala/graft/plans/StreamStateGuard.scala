package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._

/** Scale-lint for STREAMING plans — the stateful counterpart of
  * [[ScaleGuard]]: flag any keyed state store whose contents can only ever
  * GROW. A batch plan that shuffles too much is slow; a streaming query
  * whose state has no eviction bound is a time bomb — it runs clean for
  * days while the key space (users, band buckets, fingerprints) fills the
  * state store, then dies in production where the key domain is unbounded.
  *
  * What counts as bounded, per stateful operator:
  *  - `[flat]mapGroupsWithState`: a ProcessingTime or EventTime timeout
  *    (the state-TTL idioms of `minhashCandidatesStreamTtl` /
  *    `winnowCandidatesStreamTtl` / `sessionizeLate`); EventTimeTimeout
  *    additionally requires a watermark below, or Spark can never fire it.
  *    `GroupStateTimeout.NoTimeout` = state lives forever → flagged.
  *  - streaming `Aggregate`: a watermark below AND a time-window grouping
  *    key (`window()` / `session_window()`) — that pair is exactly what
  *    lets Spark drop a group once the watermark passes its window. A
  *    keyed streaming aggregate without a windowed key keeps every key's
  *    row forever even under a watermark → flagged.
  *  - `dropDuplicates` on a stream: flagged without a watermark;
  *    `dropDuplicatesWithinWatermark` is bounded by construction.
  *  - stream-stream joins: both sides must carry watermarks (state on each
  *    side buffers until the other side's watermark clears it).
  * Stream-static joins, stateless transforms and sinks carry no keyed
  * state and stay silent.
  *
  * Surfaces: [[audit]] returns the classification per stateful op (the
  * spec enumerates every streaming op in the library against it);
  * [[requireBounded]] is the CI gate; and the [[check]] rule wired through
  * `SparkSessionExtensions.injectCheckRule` warns on every unbounded
  * streaming plan at analysis time — `spark.graft.streamGuard.fail=true`
  * upgrades to an error, mirroring the batch ScaleGuard posture. (The
  * plain demo twins — `sessionize`, `funnelStream`, `attributionStream` —
  * deliberately carry NoTimeout for replay-style corpora; the audit is
  * what documents that they are NOT the deployment shape, their `*Late` /
  * `*Ttl` twins are.)
  */
object StreamStateGuard extends Logging {

  val FailConf = "spark.graft.streamGuard.fail"

  /** One stateful operator's classification. */
  final case class StateOp(op: String, bounded: Boolean, detail: String)

  private def hasWatermark(p: LogicalPlan): Boolean =
    p.exists { case _: EventTimeWatermark => true; case _ => false }

  private def windowKeyed(a: Aggregate): Boolean =
    a.groupingExpressions.exists(_.exists {
      case ar: Attribute =>
        ar.name == "window" || ar.name == "session_window"
      case _: TimeWindow => true
      case _: SessionWindow => true
      case _ => false
    })

  /** Alias definitions and literal-generator outputs in a subtree, for
    * chasing a grouping attribute back to the expression that computes it.
    */
  private def definitions(plan: LogicalPlan)
      : (Map[ExprId, Expression], Set[ExprId]) = {
    val defs = Map.newBuilder[ExprId, Expression]
    val gen = Set.newBuilder[ExprId]
    plan.foreach {
      case pr: Project =>
        pr.projectList.foreach {
          case a: Alias => defs += a.exprId -> a.child
          case _ => ()
        }
      case ag: Aggregate =>
        ag.aggregateExpressions.foreach {
          case a: Alias => defs += a.exprId -> a.child
          case _ => ()
        }
      case g: Generate if g.generator.children.forall(_.foldable) =>
        g.generatorOutput.foreach(o => gen += o.exprId)
      case _ => ()
    }
    (defs.result(), gen.result())
  }

  /** Value-range boundedness of a grouping key: true when the key's DOMAIN
    * is fixed by construction, so keyed aggregation state is a fixed-size
    * register table regardless of stream length — `% literal` / pmod
    * (sketch buckets), `least(..., literal)` bin ladders, floor/divide of a
    * bounded value (bit positions → words), explode over a literal
    * sequence (hash-row spines), booleans, and compositions thereof.
    * Attributes chase through Project/Aggregate aliases up to `depth`
    * levels. A raw id/string key resolves to none of these and stays
    * unbounded — a per-user register is corpus-sized.
    */
  private[graft] def boundedDomainKey(key: Expression, child: LogicalPlan): Boolean = {
    val (defs, boundedGen) = definitions(child)
    def bounded(e: Expression, depth: Int): Boolean = e match {
      case _ if e.foldable => true
      case _ if e.dataType == org.apache.spark.sql.types.BooleanType => true
      case a: Alias => bounded(a.child, depth)
      case c: Cast => bounded(c.child, depth)
      case r: Remainder => r.right.foldable
      case p: Pmod => p.right.foldable
      // least(key, 100) clamps only from ABOVE — a signed key is still
      // unbounded below, so one bounded child must NOT make Least bounded.
      // Bounded iff all children are bounded, or a foldable ceiling exists
      // AND every other child carries a proven lower bound (the
      // least(greatest(x, lo), hi) clamp ladder).
      case l: Least =>
        l.children.forall(bounded(_, depth)) ||
          (l.children.exists(_.foldable) &&
            l.children.forall(c => c.foldable || bounded(c, depth) ||
              lowerBounded(c, depth)))
      case g: Greatest => g.children.forall(bounded(_, depth))
      case f: Floor => bounded(f.child, depth)
      case d: Divide => d.right.foldable && bounded(d.left, depth)
      case a: Attribute if boundedGen.contains(a.exprId) => true
      case a: Attribute if depth > 0 && defs.contains(a.exprId) =>
        bounded(defs(a.exprId), depth - 1)
      // a short fixed-length prefix is a bounded domain (≤ charset^len —
      // the Merkle-register hex-prefix bucket space); cap at 4 so a long
      // substring of an unbounded string never sneaks through
      case s: Substring if s.pos.foldable && s.len.foldable =>
        s.len.eval() match {
          case n: Int => n <= 4
          case n: Long => n <= 4L
          case _ => false
        }
      case _ => false
    }
    // proven lower bound: greatest(x, literal) clamps from below (and so
    // does any alias/cast of one) — paired with a foldable Least ceiling
    // the composed domain is a finite interval
    def lowerBounded(e: Expression, depth: Int): Boolean = e match {
      case a: Alias => lowerBounded(a.child, depth)
      case c: Cast => lowerBounded(c.child, depth)
      case g: Greatest => g.children.exists(_.foldable)
      case a: Attribute if depth > 0 && defs.contains(a.exprId) =>
        lowerBounded(defs(a.exprId), depth - 1)
      case _ => false
    }
    bounded(key, depth = 8)
  }

  /** Classify every stateful operator in an analyzed (streaming) plan. */
  def audit(plan: LogicalPlan): Seq[StateOp] = {
    val out = Seq.newBuilder[StateOp]
    plan.foreach {
      case f: FlatMapGroupsWithState =>
        val name = if (f.isMapGroupsWithState) "mapGroupsWithState"
          else "flatMapGroupsWithState"
        f.timeout match {
          case NoTimeout =>
            out += StateOp(name, bounded = false,
              "GroupStateTimeout.NoTimeout — keyed state is never evicted; " +
                "use an EventTime/ProcessingTime timeout TTL (the " +
                "sessionizeLate / minhashCandidatesStreamTtl pattern)")
          case EventTimeTimeout if !hasWatermark(f.child) =>
            out += StateOp(name, bounded = false,
              "EventTimeTimeout without a watermark below — the timeout " +
                "can never fire, state is never evicted")
          case t =>
            out += StateOp(name, bounded = true, s"state TTL via $t")
        }
      case a: Aggregate if a.child.isStreaming &&
          a.groupingExpressions.nonEmpty =>
        val wm = hasWatermark(a.child)
        val win = windowKeyed(a)
        // window-keyed check first; else a register table (every key's
        // domain fixed by construction) is fine without any watermark
        if (wm && win)
          out += StateOp("streamingAggregate", bounded = true,
            "watermark + time-window grouping key — groups evict as the " +
              "watermark passes their window")
        else if (a.groupingExpressions
            .forall(k => boundedDomainKey(k, a.child)))
          out += StateOp("streamingAggregate", bounded = true,
            "register-bounded grouping keys (modulus/ladder/literal-spine " +
              "domains) — state is a fixed-size register table")
        else if (!wm)
          out += StateOp("streamingAggregate", bounded = false,
            "no watermark — per-key aggregation state grows forever")
        else
          out += StateOp("streamingAggregate", bounded = false,
            "watermarked but no time-window grouping key — a key's state " +
              "row is never dropped; group on window(ts, ...) too")
      case d: Deduplicate if d.child.isStreaming =>
        if (hasWatermark(d.child))
          out += StateOp("dropDuplicates", bounded = true,
            "watermarked — seen-key state expires past the horizon")
        else
          out += StateOp("dropDuplicates", bounded = false,
            "no watermark — the seen-key set grows forever; use " +
              "dropDuplicatesWithinWatermark")
      case _: DeduplicateWithinWatermark =>
        out += StateOp("dropDuplicatesWithinWatermark", bounded = true,
          "state expiry is the operator's contract")
      case j: Join if j.left.isStreaming && j.right.isStreaming =>
        if (hasWatermark(j.left) && hasWatermark(j.right))
          out += StateOp("streamStreamJoin", bounded = true,
            "both sides watermarked — buffered rows clear as the " +
              "opposite watermark advances")
        else
          out += StateOp("streamStreamJoin", bounded = false,
            "a side without a watermark buffers its whole stream")
      case _ => ()
    }
    out.result()
  }

  def audit(ds: Dataset[_]): Seq[StateOp] =
    audit(ds.queryExecution.analyzed)

  /** CI gate: throw if any stateful operator lacks an eviction bound. */
  def requireBounded(ds: Dataset[_]): Unit = {
    val bad = audit(ds).filterNot(_.bounded)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "graft stream-state guard: unbounded keyed state:\n" +
          bad.map(b => s"  - ${b.op}: ${b.detail}").mkString("\n"))
  }

  /** Analysis-time check-rule form (injected next to [[ScaleGuard.check]]):
    * silent on batch plans; warns per unbounded stateful op on streaming
    * plans, or fails the analysis when [[FailConf]] is set.
    */
  def check(spark: SparkSession)(plan: LogicalPlan): Unit =
    if (plan.isStreaming) {
      val bad = audit(plan).filterNot(_.bounded)
      if (bad.nonEmpty) {
        val msg = "graft stream-state guard: unbounded keyed state: " +
          bad.map(b => s"${b.op} (${b.detail})").mkString("; ")
        if (spark.conf.get(FailConf, "false").toBoolean)
          throw new IllegalStateException(msg)
        else logWarning(msg)
      }
    }
}
