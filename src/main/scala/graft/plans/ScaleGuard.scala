package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

/** Scale-lint analysis check: flag the canonical 100 TB plan-killer — an
  * UNPARTITIONED window (`ROW_NUMBER() OVER (ORDER BY ...)` with no
  * PARTITION BY) over an unbounded child. Spark plans that as ONE task
  * holding the entire dataset; on a laptop it's a latent bug, on a cluster
  * it's an OOM with a stack trace three hours in. The distributed
  * alternatives exist in this library ([[graft.ext.GlobalRank]]'s
  * range-partition + offset numbering, TakeOrderedAndProject for top-k), so
  * the guard points there.
  *
  * A window over a BOUNDED child is fine and stays silent — post-`limit`
  * ranking (q_bm25, q_hill_tail), 1-row aggregates, literal relations, and
  * compositions thereof. Default behavior is a log warning;
  * `spark.graft.scaleGuard.fail=true` upgrades to an analysis-time error
  * (the CI posture). Wired through `SparkSessionExtensions.injectCheckRule`
  * (runs ONCE per query after analysis, exactly the validation seam Spark
  * provides — not an optimizer rule that would re-fire per fixed-point
  * round).
  */
object ScaleGuard extends Logging {

  val FailConf = "spark.graft.scaleGuard.fail"

  /** A plan whose row count is bounded by construction (small enough that a
    * single-task window over it is not a scale hazard).
    *
    * Grouped aggregates count as bounded here: the guard lints the
    * RAW-CORPUS unpartitioned-window shape, and a window over `groupBy(...)
    * .agg(...)` output is the library's documented post-aggregation idiom
    * (per-source caps, tier CDFs, decile cumulatives — group domains of
    * tens, not billions). A window over a genuinely high-cardinality
    * groupBy (e.g. per-user) is still worth GlobalRank, but that is a
    * cardinality judgment a static plan check cannot make, so the guard
    * stays silent rather than failing the library's own operators under
    * `spark.graft.scaleGuard.fail=true`.
    *
    * `Generate` (explode) multiplies rows, so it does NOT pass boundedness
    * through — an explode over a `limit` is unbounded again.
    */
  private[graft] def bounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit => true
    case _: OneRowRelation | _: LocalRelation => true
    case _: Aggregate => true
    case _: Generate => false
    case j: Join => bounded(j.left) && bounded(j.right)
    case u: Union => u.children.forall(bounded)
    case w: Window => bounded(w.child)
    case other if other.children.size == 1 => bounded(other.children.head)
    case _ => false
  }

  def check(spark: SparkSession)(plan: LogicalPlan): Unit =
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
        val msg = "graft scale guard: unpartitioned window over an " +
          "unbounded child — this plans as ONE task holding the whole " +
          s"dataset. Use graft.ext.GlobalRank (distributed numbering) or " +
          s"orderBy().limit(k) (TakeOrderedAndProject) instead. Window: " +
          w.windowExpressions.map(_.sql).mkString(", ")
        if (spark.conf.get(ScaleGuard.FailConf, "false").toBoolean)
          throw new IllegalStateException(msg)
        else logWarning(msg)
      case _ => ()
    }
}
