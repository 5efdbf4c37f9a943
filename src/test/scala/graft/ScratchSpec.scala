package graft

class ScratchSpec extends SparkTestBase {

  test("sweep deletes registered trees recursively and is idempotent " +
      "(private instance — never drains the global queue other suites use)") {
    val reg = new ScratchRegistry
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_spec")
    val nested = root.resolve("a/b")
    java.nio.file.Files.createDirectories(nested)
    java.nio.file.Files.write(nested.resolve("x.parquet"),
      Array[Byte](1, 2, 3))
    reg.register(root.toString)
    reg.sweep()
    assert(!root.toFile.exists(), "registered tree survived the sweep")
    reg.sweep() // second sweep over an empty queue is a no-op
  }

  test("path keys on tag, dir hash, and application id") {
    val p = Scratch.path(spark, "spec", "/some/dir")
    assert(p.startsWith("/tmp/graft_spec_"))
    assert(p.endsWith(spark.sparkContext.applicationId))
    // nothing was created at p; the global shutdown sweep handles it
  }
}
