package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at SPARK_GRAFT_SF_DIR.
  *
  * Single-run timings on this host are noise-dominated (round-1: 359.7s recorded
  * vs 18.9s re-run on identical code — Firecracker vCPU throttling). So each
  * query is timed SPARK_GRAFT_BENCH_REPS times (default 3) after one untimed
  * warm-up, and the reported per-query number is the MEDIAN across reps;
  * per-query minima ride along under "queries_min" for variance diagnosis.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the machine's real core count so unset-env runs are comparable
    // across hosts (local[32] on a smaller box oversubscribes and skews numbers)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One untimed warmup pass per query (codegen compile + JIT), then `reps`
    // timed runs — steady-state numbers, as a long-lived cluster would see.
    val timings = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      name -> runs
    }
    def fmt(sel: Seq[Double] => Double) = timings
      .map { case (k, runs) => s"\"" + k + "\":" + sel(runs) }
      .mkString("{", ",", "}")
    val qs = fmt(median)
    val qsMin = fmt(_.min)
    val total = timings.map { case (_, runs) => median(runs) }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qsMin,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
