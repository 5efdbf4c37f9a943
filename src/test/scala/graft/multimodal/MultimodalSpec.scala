package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello multimodal world"), (2L, "bytes")).toDF("doc_id", "text")

  test("withFakeMedia produces a binary column; decodeMeta adds typed metadata") {
    val media = Multimodal.withFakeMedia(docs, "text")
    assert(media.schema("media").dataType.typeName == "binary")
    val out = Multimodal.decodeMeta(media, "media").collect()
      .map(r => r.getLong(0) -> r.getStruct(r.length - 1)).toMap
    val m1 = out(1L)
    assert(m1.getAs[Long]("n_bytes") == "hello multimodal world".length.toLong)
    assert(m1.getAs[Int]("width") >= 1 && m1.getAs[Int]("width") <= 1024)
    // deterministic: same input → same fake decode
    val again = Multimodal.decodeMeta(media, "media").collect()
      .map(r => r.getLong(0) -> r.getStruct(r.length - 1)).toMap
    assert(again(1L) == m1)
  }

  test("featurize emits a normalized histogram of the payload") {
    val out = Multimodal.featurize(Multimodal.withFakeMedia(docs, "text"), "media")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](r.length - 1)).toMap
    val h = out(1L)
    assert(h.size == 16)
    assert(approx(h.sum, 1.0))
  }

  test("frameSample explodes n frames per blob with correct offsets") {
    val out = Multimodal.frameSample(Multimodal.withFakeMedia(docs, "text"), "media",
      n = 3, frameBytes = 4)
    val frames = out.filter("doc_id = 1").collect()
    assert(frames.length == 3)
    // columns: doc_id, text, media, frame_idx, frame
    assert(frames.map(_.getInt(3)).toSeq == Seq(0, 1, 2))
    val f0 = new String(frames(0).getAs[Array[Byte]](4), "UTF-8")
    assert(f0 == "hell")
  }
}
