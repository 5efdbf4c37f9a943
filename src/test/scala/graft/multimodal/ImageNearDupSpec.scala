package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Perceptual near-dup through the banded-LSH path over REAL rendered
  * PNGs: a perturbed copy of a base image must pair with it (true
  * positive), unrelated patterns must not, and the banding must agree
  * with brute-force Hamming over the same dHashes (exactness by
  * pigeonhole at maxHamming = bands − 1).
  */
class ImageNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val W = 9
  private val H = 8

  /** Deterministic pseudo-random pixel grid per seed. */
  private def pattern(seed: Int): Seq[Int] =
    (0 until W * H).map { i =>
      val s = s"${seed}_${i / W}_${i % W}"
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (java.lang.Long.parseLong(
        md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % 256).toInt
    }

  private def render(rows: Seq[(Long, Seq[Int])]) =
    Multimodal.synthPixelPng(rows.toDF("id", "pixels"), "pixels", W, H)

  test("a one-cell perturbed copy pairs with its base at small Hamming; " +
      "unrelated patterns stay unpaired") {
    val base = pattern(42)
    val perturbed = base.updated(3 * W + 4, (base(3 * W + 4) + 60) % 256)
    val imgs = render(Seq(
      (1L, base), (2L, perturbed), (3L, pattern(7)), (4L, pattern(99))))
    val pairs = Multimodal.perceptualDupPairs(imgs, "id", "media",
        maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"got ${pairs.toSeq}")
    assert(pairs.head._3 <= 2, s"perturbation flipped >2 dHash bits: $pairs")
  }

  test("banded candidate generation is EXACT at maxHamming = bands - 1: " +
      "agrees with brute-force over the same dHashes") {
    val imgs = render((1L to 12L).map { i =>
      // chain of small perturbations of one base + a few independents
      if (i <= 6) {
        val b = pattern(1)
        (i, (0 until (i.toInt - 1)).foldLeft(b)((p, j) =>
          p.updated(j * W, (p(j * W) + 70) % 256)))
      } else (i, pattern(i.toInt * 13))
    })
    val banded = Multimodal.perceptualDupPairs(imgs, "id", "media",
        maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force from the raw hashes
    val hashes = imgs.rdd.map(r => (r.getLong(0),
        ImageIoCodec.dHash(r.getAs[Array[Byte]](r.length - 1)).get))
      .collect().toSeq
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (ia, ib, d)).toSet
    assert(banded == brute, s"banded $banded != brute $brute")
    assert(brute.nonEmpty, "fixture produced no near-dup pairs at all")
  }

  test("synthPixelPng renders losslessly: decoded lumas equal the input " +
      "pixel values") {
    val pix = pattern(5)
    val bytes = render(Seq((1L, pix))).collect().head
      .getAs[Array[Byte]]("media")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val got = for (y <- 0 until H; x <- 0 until W) yield {
      val rgb = img.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
    assert(got.toSeq == pix)
  }
}
