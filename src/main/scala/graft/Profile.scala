package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: runs each SparkEntry query twice in one session (cold/warm) and
  * optionally dumps the formatted physical plan. Usage:
  *   runMain graft.Profile <sfDir> [planFor...]
  * SPARK_GRAFT_ONLY=<substr1,substr2,...> restricts to matching query names;
  * SPARK_GRAFT_PROFILE_REPS overrides the run count (default 2).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val planFor = args.drop(1).toSet
    // comma-separated substrings, same contract as Verify's filter
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).filter(_.nonEmpty)
    val reps = math.max(2, sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // untimed: clearCache alone leaks localCheckpoint blocks, and
        // ContextCleaner needs a GC to reap broadcasts (Bench.releaseStorage)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        dt
      }
      val rest = times.drop(2).map(t => f"$t%.2f").mkString(" ")
      println(f"PROFILE $name%-22s cold=${times(0)}%7.2fs warm=${times(1)}%7.2fs $rest")
      if (planFor(name)) {
        val df = fn(spark, sfDir)
        df.queryExecution.toRdd.count() // same QueryExecution → AQE finalizes stage reuse
        println(s"=== plan $name (final adaptive) ===")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
