package graft.plans

import graft.{SparkEntry, SparkTestBase}

/** Suite-wide scale-lint regression gate: every declared query's analyzed
  * plan must pass [[ScaleGuard]] in FAIL mode. Now that `bounded()`
  * classifies the library's own post-aggregation window idioms correctly, a
  * new corpus-sized unpartitioned window (or any future hard-fail shape the
  * guard learns) cannot land silently in ANY of the suite's queries — the
  * exact regression that forced the q_pagerank GlobalRank rewrite.
  *
  * Construction also exercises every query builder end-to-end at sf0.001
  * (eager checkpoints, index writes and query-vector collects included), so
  * a query that stopped constructing fails here before the driver round.
  */
class ScaleGuardSuiteSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("ScaleGuard fail mode passes over every SparkEntry query plan") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists(),
      s"driver testdata not present at $sfDir")
    spark.conf.set(ScaleGuard.FailConf, "true")
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try {
            ScaleGuard.check(spark)(fn(spark, sfDir).queryExecution.analyzed)
            None
          } catch {
            case e: IllegalStateException => Some(s"$name: ${e.getMessage}")
            case e: Exception =>
              Some(s"$name: construction failed: ${e.getClass.getSimpleName}" +
                s" ${e.getMessage}")
          }
      }
      assert(failures.isEmpty,
        s"${failures.size} queries tripped the scale guard:\n" +
          failures.mkString("\n"))
    } finally spark.conf.unset(ScaleGuard.FailConf)
  }
}
