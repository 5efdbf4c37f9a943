package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev experiments (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val queries = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_jaccard", "q_fingerprint", "q_lang_id")
    queries.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/scratch_out/$name")
      spark.catalog.clearCache()
      println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    spark.stop()
  }
}
