package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe for per-query JOB structure: runs each selected SparkEntry
  * query once untimed (warm-up) and once tallied, reporting Spark jobs,
  * stages, tasks, total shuffle WRITE bytes/records (real executor
  * metrics via a task-end listener, not plan estimates) and wall seconds.
  * The job/stage counts are load-independent, so this is the right
  * instrument for "did the change remove a per-round job/exchange"
  * claims; use Profile/Bench for wall-clock claims. Usage:
  *   runMain graft.JobProbe <sfDir>
  * SPARK_GRAFT_ONLY / SPARK_GRAFT_CPUS as in Profile.
  */
object JobProbe {
  private final class Tally extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    val shufBytes = new java.util.concurrent.atomic.AtomicLong()
    val shufRecords = new java.util.concurrent.atomic.AtomicLong()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(): Unit
    }
    val stageLines =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = s.stageInfo.taskMetrics
      if (m != null && sys.env.contains("SPARK_GRAFT_JOBPROBE_STAGES") &&
          m.shuffleWriteMetrics.recordsWritten > 0)
        stageLines.add(f"  stage=${s.stageInfo.stageId}%4d " +
          f"wKB=${m.shuffleWriteMetrics.bytesWritten / 1024}%7d " +
          f"wRecs=${m.shuffleWriteMetrics.recordsWritten}%9d " +
          s.stageInfo.name.takeWhile(_ != '\n').take(60)): Unit
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten): Unit
      }
    }
  }

  private def releaseStorage(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).filter(_.nonEmpty)
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
        fn(spark, sfDir).count()
        releaseStorage(spark)
        val t = new Tally
        spark.sparkContext.addSparkListener(t)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
        spark.sparkContext.removeSparkListener(t)
        releaseStorage(spark)
        println(f"JOBPROBE $name%-24s jobs=${t.jobs.get}%3d " +
          f"stages=${t.stages.get}%3d tasks=${t.tasks.get}%5d " +
          f"shufKB=${t.shufBytes.get / 1024}%8d recs=${t.shufRecords.get}%9d " +
          f"sec=$dt%6.2f")
        t.stageLines.forEach(l => println(l))
      }
    spark.stop()
  }
}
