package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary` columns
  * with typed metadata, decoded/featurized per partition in batches.
  *
  * North-star extension (no counterpart in the reference). The Spark-side shape —
  * schema, partition-parallel batch processing, explode of frame samples — is real and
  * tested; the codec itself is STUBBED with a deterministic fake (this container has no
  * image/audio libraries): [[FakeCodec.decode]] derives metadata and "pixels" from the
  * bytes alone. Swap `FakeCodec` for a real decoder (JavaCPP/FFmpeg, TwelveMonkeys)
  * per-executor at deployment; everything else stays.
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
    * driver involvement, arbitrary native-lib calls allowed inside).
    */
  def decodeMeta(df: DataFrame, mediaCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", mediaMetaSchema))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rows = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val m = FakeCodec.decode(bytes)
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

/** Deterministic stand-in for a real media codec (STUB — see [[Multimodal]] docs). */
object FakeCodec {
  final case class Meta(format: String, width: Int, height: Int, nBytes: Long)

  /** "Decodes" dimensions from the byte content deterministically. */
  def decode(bytes: Array[Byte]): Meta = {
    var h = 1125899906842597L
    bytes.take(64).foreach(b => h = 31 * h + (b & 0xff))
    val w = 1 + (math.abs(h) % 1024).toInt
    val ht = 1 + (math.abs(h / 1024) % 1024).toInt
    val fmt = if (bytes.length % 2 == 0) "png" else "jpeg"
    Meta(fmt, w, ht, bytes.length.toLong)
  }
}
