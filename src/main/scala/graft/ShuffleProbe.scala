package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe for the substring tier's key-width claim: runs
  * `SubstringDedup.mergedSpans` with the string gram key and with the
  * hashed (h1, h2) key over the same corpus and reports total shuffle
  * WRITE bytes/records per variant (a task-end listener sums the real
  * executor metrics — not plan estimates). Usage:
  *   runMain graft.ShuffleProbe <sfDir>
  * SPARK_GRAFT_CPUS as in Profile.
  */
object ShuffleProbe {
  private final class ShuffleTally extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val records = new java.util.concurrent.atomic.AtomicLong()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten): Unit
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    for ((label, hash) <- Seq(("string-key", false), ("hashed-key", true))) {
      val tally = new ShuffleTally
      spark.sparkContext.addSparkListener(tally)
      val n = graft.ext.SubstringDedup.mergedSpans(docs, "doc_id", "text",
        k = 8, minLen = 20, maxDf = 64, gramHash = hash).count()
      // the listener bus is async: drain it before reading the tallies or
      // the trailing task-end events are silently missed
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(tally)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      println(f"SHUFFLE $label%-12s spans=$n%d " +
        f"bytes=${tally.bytes.get}%d records=${tally.records.get}%d")
    }
    spark.stop()
  }
}
