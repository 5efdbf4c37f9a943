package graft

import org.apache.spark.sql.SparkSession

/** Scratch-tree lifecycle for queries that WRITE an artifact then read it
  * back (persisted IVF/PQ indexes, format round-trips): paths are keyed by
  * data dir AND Spark application id so concurrent runs never race on one
  * half-rewritten tree, and every path handed out is swept by a JVM
  * shutdown hook — Verify/Bench/Profile leave /tmp clean instead of
  * accreting one tree per (query, run) forever. The sweep is best-effort
  * by design: a SIGKILL'd run leaves its trees, but the NEXT run's keys
  * never collide with them (fresh application id), so correctness never
  * depends on the cleanup.
  */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** A per-(tag, dir, applicationId) scratch path, registered for the
    * end-of-JVM sweep.
    */
  def path(spark: SparkSession, tag: String, dir: String): String =
    register(s"/tmp/graft_${tag}_${math.abs(dir.hashCode.toLong)}_" +
      spark.sparkContext.applicationId)

  /** Register an externally-chosen path for the end-of-JVM sweep and
    * return it.
    */
  def register(p: String): String = {
    created.add(p)
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => sweep(), "graft-scratch-sweep"))
    p
  }

  /** Delete every registered tree now (also what the shutdown hook runs —
    * callable directly from tests).
    */
  def sweep(): Unit = {
    var p = created.poll()
    while (p != null) {
      deleteRecursively(new java.io.File(p))
      p = created.poll()
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }
}
