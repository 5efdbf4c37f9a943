package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Differential pin for [[Multimodal.md5Samples]] (r17): the JVM generator
  * must be BIT-IDENTICAL to the Catalyst column formulation it replaced —
  * `transform(sequence(0, n-1), w -> conv(substring(md5(...), 1, 8), 16,
  * 10) % mod)`, a CodegenFallback/interpreted expression — for every
  * derive shape the media fixture queries use: the near-dup
  * single-perturbation shape (Keystone), the image y/x grid shape
  * (Horizon), and the copy-shift shape (Beacon shifted, Crest
  * subwindow/CDC). Ids cover both branches of every conditional
  * (id ≡ 1 mod 10 copies and non-copies, single- and multi-digit ids).
  */
class Md5SamplesSpec extends SparkTestBase {
  import spark.implicits._

  private val ids: Seq[Long] = (0L to 25L) ++ Seq(100L, 101L, 9999L, 10001L)

  private def exprSamples(n: Int, f: (Column, Column) => Column)
      : Map[Long, Seq[Int]] = {
    val id = col("doc_id")
    ids.toDF("doc_id")
      .select(id,
        transform(sequence(lit(0), lit(n - 1)), w => f(id, w)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
  }

  private def jvmSamples(n: Int,
                         gen: (Multimodal.Md5Hex32, Long, Int) => Int)
      : Map[Long, Seq[Int]] =
    Multimodal.md5Samples(ids.toDF("doc_id"), "doc_id", n, gen)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap

  // the column form the queries carried before r17, verbatim
  private def md5ValCol(prefix: String, d: Column, w: Column,
                        mod: Int): Column =
    conv(substring(md5(concat(lit(prefix), d.cast("string"), lit("_"),
      w.cast("string"))), 1, 8), 16, 10).cast("long") % mod

  test("near-dup shape: md5(pat_w) % mod with one perturbed window " +
      "(q_audio_near_dup / q_video_near_dup forms)") {
    val expr = exprSamples(65, (id, w) => {
      val pat = when(id % 10 === 1, id - 1).otherwise(id)
      val v = md5ValCol("", pat, w, 32768)
      when(id % 10 === 1 && w === 7, (v + 9000) % 32768)
        .otherwise(v).cast("int")
    })
    val jvm = jvmSamples(65, (h, id, w) => {
      val pat = if (id % 10 == 1) id - 1 else id
      val v = h.hex32(s"${pat}_$w") % 32768
      (if (id % 10 == 1 && w == 7) (v + 9000) % 32768 else v).toInt
    })
    assert(jvm == expr)
    val exprV = exprSamples(65, (id, w) => {
      val pat = when(id % 10 === 1, id - 1).otherwise(id)
      val v = md5ValCol("v", pat, w, 256)
      when(id % 10 === 1 && w === 11, (v + 97) % 256)
        .otherwise(v).cast("int")
    })
    val jvmV = jvmSamples(65, (h, id, w) => {
      val pat = if (id % 10 == 1) id - 1 else id
      val v = h.hex32(s"v${pat}_$w") % 256
      (if (id % 10 == 1 && w == 11) (v + 97) % 256 else v).toInt
    })
    assert(jvmV == exprV)
  }

  test("grid shape: md5(pat_y_x) % 256 with one perturbed cell " +
      "(q_image_near_dup form, 9x8)") {
    val W = 9
    val expr = exprSamples(W * 8, (id, i) => {
      val pat = when(id % 10 === 1, id - 1).otherwise(id)
      val y = floor(i / W).cast("int")
      val x = i % W
      val v = conv(substring(md5(concat(pat.cast("string"), lit("_"),
          y.cast("string"), lit("_"), x.cast("string"))), 1, 8), 16, 10)
        .cast("long") % 256
      when(id % 10 === 1 && y === 3 && x === 4, (v + 60) % 256)
        .otherwise(v).cast("int")
    })
    val jvm = jvmSamples(W * 8, (h, id, i) => {
      val pat = if (id % 10 == 1) id - 1 else id
      val y = i / W
      val x = i % W
      val v = h.hex32(s"${pat}_${y}_$x") % 256
      (if (id % 10 == 1 && y == 3 && x == 4) (v + 60) % 256 else v).toInt
    })
    assert(jvm == expr)
  }

  test("copy-shift shape: copies read the previous doc's generator at " +
      "w + trim (shifted / subwindow / CDC forms)") {
    for ((prefix, mod, trim, n) <- Seq(("ao", 32768, 5, 160),
        ("vo", 256, 5, 160), ("cd", 32768, 3, 160), ("cv", 256, 3, 160),
        ("as", 32768, 5, 80), ("vs", 256, 5, 80))) {
      val last = n - trim - 1
      val expr = exprSamples(n, (id, w) =>
        when(id % 10 === 1 && w <= last,
            md5ValCol(prefix, id - 1, w + trim, mod))
          .otherwise(md5ValCol(prefix, id, w, mod)).cast("int"))
      val jvm = jvmSamples(n, (h, id, w) => {
        val (d, ww) = if (id % 10 == 1 && w <= last) (id - 1, w + trim)
          else (id, w)
        (h.hex32(prefix + d + "_" + ww) % mod).toInt
      })
      assert(jvm == expr, s"shape $prefix mod=$mod trim=$trim n=$n drifted")
    }
  }
}
