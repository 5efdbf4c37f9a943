package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage subset selection (Nemhauser, Wolsey & Fisher
  * 1978: the (1 − 1/e) greedy for monotone submodular maximization) — the
  * diverse-subset primitive of training-data curation: pick k documents
  * that together cover the most distinct features (shingles, domains,
  * topics), the exact shape of facility-location / coverage-based data
  * selection.
  *
  * Greedy is inherently sequential in k: each pick conditions the next
  * round's marginal gains. Per round, the marginal gain of every candidate
  * is ONE distributed aggregate (its uncovered-feature count after an
  * anti-join against the covered set), the argmax is a 1-row
  * TakeOrderedAndProject collected to the driver (ties → smallest doc id —
  * deterministic), and the covered set grows by the winner's features
  * (checkpointed so round r never replays rounds 1..r−1). k is small by
  * contract (a selection budget), so the driver holds k scalars — never
  * data.
  *
  * Scale shape: the item table is the only corpus-sized relation; each
  * round's anti-join is against a covered set bounded by k × max-doc
  * features (broadcastable), and the gain aggregate is one shuffle on
  * doc_id. Output: one row per pick — (round, doc_id, marginal_gain,
  * covered_total).
  */
object MaxCoverage {

  /** Greedily select `k` ids from `items` (idCol, featureCol — duplicates
    * fine, coverage is set semantics). Stops early when no positive gain
    * remains.
    */
  def greedySelect(items: DataFrame, idCol: String, featureCol: String,
                   k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be 1..64, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val base = items.select(col(idCol).cast("long").as("id"),
        col(featureCol).cast("string").as("f"))
      .distinct()
      .localCheckpoint() // re-joined every round
    var covered = base.select(col("f")).limit(0).localCheckpoint()
    var coveredN = 0L
    val picks = Seq.newBuilder[(Int, Long, Long, Long)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val top = base.join(broadcast(covered), Seq("f"), "leftanti")
        .groupBy(col("id")).agg(count(lit(1)).as("g"))
        .orderBy(col("g").desc, col("id")).limit(1)
        .as[(Long, Long)].collect().headOption
      top match {
        case Some((id, g)) if g > 0 =>
          coveredN += g
          picks += ((r, id, g, coveredN))
          covered = covered
            .unionByName(base.filter(col("id") === id).select(col("f")))
            .distinct()
            .localCheckpoint()
          r += 1
        case _ => done = true
      }
    }
    picks.result()
      .toDF("round", "doc_id", "marginal_gain", "covered_total")
  }
}
