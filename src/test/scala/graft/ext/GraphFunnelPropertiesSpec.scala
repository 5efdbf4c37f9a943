package graft.ext

import java.sql.Timestamp

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated differentials for connected components and funnels
  * against INDEPENDENT in-memory implementations (union-find for CC, direct
  * stage chaining for funnels) — a different algorithm family than the Spark
  * operators, so shared-bug blind spots are unlikely. Fixed seeds keep the
  * suite deterministic (same convention as MetricPropertiesSpec).
  */
class GraphFunnelPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // --- connected components vs union-find -----------------------------------

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(3, 80)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
  } yield rows.filter { case (a, b) => a != b }
    .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct

  /** Plain union-find with path compression — the independent oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id canonical labels, matching dupClusters' contract
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val label = members.min
      members.map(_ -> label)
    }
  }

  test("dupClusters equals union-find on random graphs") {
    (1L to 6L).foreach { seed =>
      val edges = sample(edgesGen, seed)
      if (edges.nonEmpty) {
        val df = edges.toDF("id_a", "id_b")
        // distributed rounds (unionFindMaxEdges = 0) and the single-task
        // fast path (default) must both match the reference union-find
        val dist = Dedup.dupClusters(df, maxIter = 15, unionFindMaxEdges = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val fast = Dedup.dupClusters(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(dist == unionFind(edges), s"seed $seed edges $edges")
        assert(fast == unionFind(edges), s"seed $seed (fast path) edges $edges")
      }
    }
  }

  // --- funnels vs direct stage chaining --------------------------------------

  private val stageNames = Vector("view", "click", "purchase")

  private val eventsGen: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(5, 120)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 500L), Gen.choose(0, 2)))
  } yield rows.map { case (u, t, s) => (u, t, stageNames(s)) }
    // unique (user, time) so "first qualifying event" is unambiguous
    .groupBy(x => (x._1, x._2)).map(_._2.head).toList

  /** Direct per-user stage chaining: reach(i) = min event time of stage i at or
    * after reach(i-1), within the window when bounded.
    */
  private def chainCounts(events: Seq[(Long, Long, String)],
                          window: Option[Long]): Seq[Long] = {
    val byUser = events.groupBy(_._1)
    val reached = byUser.values.map { evs =>
      var prev = Long.MinValue
      var count = 0
      var alive = true
      stageNames.foreach { st =>
        if (alive) {
          val cands = evs.filter(e => e._3 == st &&
            (prev == Long.MinValue ||
              (e._2 >= prev && window.forall(w => e._2 <= prev + w))))
          if (cands.isEmpty) alive = false
          else { prev = cands.map(_._2).min; count += 1 }
        }
      }
      count
    }.toSeq
    stageNames.indices.map(i => reached.count(_ > i).toLong)
  }

  private def toTs(events: Seq[(Long, Long, String)]) =
    events.map { case (u, t, s) =>
      (u, new Timestamp(1700000000000L + t * 1000L), s)
    }.toDF("user_id", "ts", "event_type")

  test("funnelCounts equals direct stage chaining on random event sets") {
    (1L to 6L).foreach { seed =>
      val events = sample(eventsGen, seed)
      val row = Funnel.funnelCounts(toTs(events), "user_id", "ts", "event_type",
        stageNames).collect().head
      val got = stageNames.indices.map(row.getLong)
      assert(got == chainCounts(events, None), s"seed $seed")
    }
  }

  test("funnelCountsWindowed equals direct windowed chaining on random event sets") {
    (1L to 6L).foreach { seed =>
      val events = sample(eventsGen, seed)
      Seq(10L, 100L, 1000L).foreach { windowSec =>
        val row = Funnel.funnelCountsWindowed(toTs(events), "user_id", "ts",
          "event_type", stageNames, windowMs = windowSec * 1000L).collect().head
        val got = stageNames.indices.map(row.getLong)
        assert(got == chainCounts(events, Some(windowSec)), s"seed $seed w=$windowSec")
      }
    }
  }
}
