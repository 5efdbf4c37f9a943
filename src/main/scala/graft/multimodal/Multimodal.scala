package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary` columns
  * with typed metadata, decoded/featurized per partition in batches.
  *
  * North-star extension (no counterpart in the reference). The Spark-side shape —
  * schema, partition-parallel batch processing, explode of frame samples — is real and
  * tested, and the codec seam is a [[MediaCodec]] trait with TWO implementations:
  * [[ImageIoCodec]] (REAL — JDK `javax.imageio`, reads PNG/JPEG/GIF/BMP headers
  * without new dependencies) and [[FakeCodec]] (deterministic stand-in for formats
  * the JDK can't read, and the oracle-checkable default for the synthetic corpus,
  * whose "media" blobs are UTF-8 text, not images). Swap in JavaCPP/FFmpeg or
  * TwelveMonkeys per-executor at deployment for the long-tail formats; everything
  * else stays.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a binary media column. In production this is the raw image/audio blob
    * column of the table; here we fake it from a text column's UTF-8 bytes.
    */
  def withFakeMedia(df: DataFrame, textCol: String, mediaCol: String = "media"): DataFrame =
    df.withColumn(mediaCol, encode(col(textCol), "UTF-8"))

  /** Expression-only metadata variant: byte length plus md5-derived fake dimensions,
    * all portable column expressions (oracle-checkable, unlike the codec path below
    * which models real per-partition native decoding).
    */
  def metaExprDF(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val media = encode(col(textCol), "UTF-8")
    val h = conv(substring(md5(col(textCol)), 1, 8), 16, 10).cast("long")
    df.select(col(idCol),
      octet_length(media).cast("long").as("n_bytes"),
      (lit(1L) + h.bitwiseAND(lit(1023L))).as("width"),
      (lit(1L) + shiftright(h, 10).bitwiseAND(lit(1023L))).as("height"),
      when(octet_length(media) % 2 === 0, lit("png")).otherwise(lit("jpeg"))
        .as("format"))
  }

  /** Decode metadata for each media blob — per-partition imperative batch loop (the
    * Scala analog of `mapInPandas`: one iterator in, one iterator out, no per-row
    * driver involvement, arbitrary native-lib calls allowed inside). The codec is
    * injected ([[MediaCodec]] is `Serializable`, instantiated once per partition
    * iterator closure, so a real codec can hold native handles per executor).
    */
  def decodeMeta(df: DataFrame, mediaCol: String,
                 codec: MediaCodec = FakeCodec): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", mediaMetaSchema))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rows = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val m = codec.decode(bytes)
        Row.fromSeq(r.toSeq :+ Row(m.format, m.width, m.height, m.nBytes))
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** Feature-extract: fixed-size byte-value histogram per blob (stands in for an
    * embedding model / mel spectrogram). Output adds `features: array<double>`.
    */
  def featurize(df: DataFrame, mediaCol: String, bins: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType, containsNull = false)))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rows = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val hist = new Array[Double](bins)
        bytes.foreach(b => hist(((b & 0xff) * bins) / 256) += 1.0)
        val n = math.max(bytes.length, 1).toDouble
        Row.fromSeq(r.toSeq :+ hist.map(_ / n).toSeq)
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** Image near-dup pairs by perceptual hash: dHash every decodable blob
    * ([[ImageIoCodec.dHash]], per-partition batch decode), then find pairs
    * within `maxHamming` bits via banded equi-join — the 64-bit hash splits
    * into `maxHamming + 1` bands, and by pigeonhole any pair within the
    * budget shares at least one EXACT band, so candidate generation is an
    * equi-join on (band, bits), never corpus². Verification is one
    * bit_count(xor) on candidates. Output: (id_a, id_b, hamming), id_a <
    * id_b. The simhash-banding discipline applied to the pixel domain.
    */
  def perceptualDupPairs(df: DataFrame, idCol: String, mediaCol: String,
                         maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15, "need 0 <= maxHamming <= 15")
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val idField = df.schema(idCol)
    val hashSchema = StructType(Seq(
      StructField(idCol, idField.dataType, idField.nullable),
      StructField("dhash", LongType, nullable = false)))
    val hashed = df.sparkSession.createDataFrame(
      df.rdd.mapPartitions { it =>
        it.flatMap { r =>
          ImageIoCodec.dHash(r.getAs[Array[Byte]](mediaIdx))
            .map(hh => Row(r.get(idIdx), hh))
        }
      }, hashSchema)
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    val mask = (1L << bandBits) - 1
    val bands = explode(array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("dhash"), b * bandBits).bitwiseAND(lit(mask))
          .as("bits"))
    }: _*))
    val banded = hashed.select(col(idCol), col("dhash"), bands.as("__bb"))
      .select(col(idCol), col("dhash"),
        col("__bb.band").as("band"), col("__bb.bits").as("bits"))
    banded.select(col(idCol).as("id_a"), col("dhash").as("__ha"),
        col("band"), col("bits"))
      .join(banded.select(col(idCol).as("id_b"), col("dhash").as("__hb"),
        col("band"), col("bits")), Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Frame-sample a "video" blob: split the payload into `n` evenly spaced fixed-size
    * frames, one output row each — the explode shape a video pipeline needs.
    */
  def frameSample(df: DataFrame, mediaCol: String, n: Int,
                  frameBytes: Int = 32): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rows = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        if (bytes.isEmpty) Iterator.empty
        else (0 until n).iterator.map { i =>
          val start = (bytes.length.toLong * i / n).toInt
          val frame = bytes.slice(start, math.min(start + frameBytes, bytes.length))
          Row.fromSeq(r.toSeq ++ Seq(i, frame))
        }
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}

final case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)

/** The codec seam: one blob in, typed metadata out. Implementations must be
  * serializable (shipped inside the mapPartitions closure) and thread-safe per
  * instance OR cheap to construct per partition.
  */
trait MediaCodec extends Serializable {
  def decode(bytes: Array[Byte]): MediaMeta
}

/** REAL image decoder on the JDK's built-in `javax.imageio` readers (PNG, JPEG,
  * GIF, BMP, WBMP — no external dependency). Reads ONLY the header: an
  * `ImageReader` over a memory-backed stream answers `getWidth/getHeight/
  * getFormatName` from metadata without decoding pixel data — the right shape
  * for a 100 TB metadata sweep where full decode would be ~1000× the IO.
  * Blobs no reader claims (audio, video, corrupt) fall back to [[FakeCodec]]
  * semantics with format "unknown" so a mixed-media scan never throws.
  */
object ImageIoCodec extends MediaCodec {
  override def decode(bytes: Array[Byte]): MediaMeta = {
    val in = new java.io.ByteArrayInputStream(bytes)
    val iis = javax.imageio.ImageIO.createImageInputStream(in)
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          MediaMeta(r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0),
            bytes.length.toLong)
        } finally r.dispose()
      } else MediaMeta("unknown", 0, 0, bytes.length.toLong)
    } finally if (iis != null) iis.close()
  }

  /** Perceptual difference-hash (dHash): decode, average-pool the luma plane
    * to a (size+1)×size grid, emit one bit per horizontal neighbor pair
    * (left > right). Near-duplicate images (recompression, mild resize/crop,
    * brightness shifts) land within a few bits of hamming distance — the
    * standard cheap screen for image-level training-data dedup. None for
    * undecodable blobs.
    */
  def dHash(bytes: Array[Byte], size: Int = 8): Option[Long] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null || img.getWidth == 0 || img.getHeight == 0) None
    else {
      val w = size + 1; val h = size
      val cell = Array.ofDim[Long](h, w)
      val cnt = Array.ofDim[Long](h, w)
      var y = 0
      while (y < img.getHeight) {
        val gy = math.min(h - 1, (y.toLong * h / img.getHeight).toInt)
        var x = 0
        while (x < img.getWidth) {
          val gx = math.min(w - 1, (x.toLong * w / img.getWidth).toInt)
          val rgb = img.getRGB(x, y)
          val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          cell(gy)(gx) += luma; cnt(gy)(gx) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L; var bit = 0
      var gy = 0
      while (gy < h) {
        var gx = 0
        while (gx < w - 1) {
          val a = if (cnt(gy)(gx) == 0) 0.0 else cell(gy)(gx).toDouble / cnt(gy)(gx)
          val b = if (cnt(gy)(gx + 1) == 0) 0.0
            else cell(gy)(gx + 1).toDouble / cnt(gy)(gx + 1)
          if (a > b) hash |= (1L << bit)
          bit += 1; gx += 1
        }
        gy += 1
      }
      Some(hash)
    }
  }

  /** Full-decode feature extraction: normalized 256-bin luminance histogram of
    * the decoded pixels (the classic cheap image fingerprint). Null for
    * undecodable blobs.
    */
  def lumaHistogram(bytes: Array[Byte], bins: Int = 16): Option[Array[Double]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val hist = new Array[Double](bins)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          // ITU-R BT.601 integer luma
          val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          hist((luma * bins) / 256) += 1.0
          x += 1
        }
        y += 1
      }
      val n = (img.getWidth.toLong * img.getHeight).toDouble
      Some(hist.map(_ / n))
    }
  }
}

/** Deterministic stand-in codec: derives metadata from the bytes alone. Kept as
  * the default for the synthetic corpus (whose media blobs are UTF-8 text, which
  * no image reader claims) and as the oracle-checkable path — DuckDB can't run
  * javax.imageio, but it CAN replay this arithmetic.
  */
object FakeCodec extends MediaCodec {
  /** "Decodes" dimensions from the byte content deterministically. */
  override def decode(bytes: Array[Byte]): MediaMeta = {
    var h = 1125899906842597L
    bytes.take(64).foreach(b => h = 31 * h + (b & 0xff))
    val w = 1 + (math.abs(h) % 1024).toInt
    val ht = 1 + (math.abs(h / 1024) % 1024).toInt
    val fmt = if (bytes.length % 2 == 0) "png" else "jpeg"
    MediaMeta(fmt, w, ht, bytes.length.toLong)
  }
}
