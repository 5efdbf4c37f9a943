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

  test("sweep deletes a symlink inside a registered tree WITHOUT following " +
      "it — the link target's contents survive") {
    val reg = new ScratchRegistry
    val outside = java.nio.file.Files.createTempDirectory("graft_scratch_out")
    val keep = outside.resolve("keep.txt")
    java.nio.file.Files.write(keep, Array[Byte](42))
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_lnk")
    java.nio.file.Files.createSymbolicLink(root.resolve("link"), outside)
    reg.register(root.toString)
    reg.sweep()
    assert(!root.toFile.exists(), "registered tree survived the sweep")
    assert(java.nio.file.Files.exists(keep),
      "sweep followed a symlink and deleted files outside the tree")
    java.nio.file.Files.delete(keep)
    java.nio.file.Files.delete(outside)
  }

  test("path keys on tag, dir hash, and application id") {
    val p = Scratch.path(spark, "spec", "/some/dir")
    assert(p.startsWith("/tmp/graft_spec_"))
    assert(p.endsWith(spark.sparkContext.applicationId))
    // nothing was created at p; the global shutdown sweep handles it
  }
}
