package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR importance weights: differential against an independent
  * single-threaded reference computation (same hashed-unigram features,
  * add-one smoothing, DECIMAL(18,8) ladder), plus the direction property
  * a selection policy must satisfy — target-distribution docs outrank
  * off-target docs.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "de", "ein kleines haus am see ein haus"),
    (2L, "de", "der see und der wald"),
    (3L, "en", "the quick brown fox jumps over the lazy dog"),
    (4L, "en", "a house by the lake"),
    (5L, "en", "ein haus am see der wald") // en doc that LOOKS german
  )

  private val B = 256

  private def bucket(w: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % B
  }

  /** Independent reference: exact-integer counts, BigDecimal ladder with
    * the same HALF_UP 8-dp quantization both engines apply to each ln.
    */
  private def referenceWeights(): Map[Long, Double] = {
    val toks = docs.flatMap { case (id, lang, text) =>
      text.split(" ").filter(_.nonEmpty).map(w => (id, lang, bucket(w)))
    }
    val cnt = toks.groupBy(t => (t._1, t._3)).view.mapValues(_.size.toLong).toMap
    val ct = toks.filter(_._2 == "de").groupBy(_._3).view
      .mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val cr = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tt = ct.values.sum
    val tr = cr.values.sum
    def q8(x: Double): BigDecimal =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val dterm = cr.keys.map { g =>
      g -> (q8(math.log((ct(g) + 1).toDouble / (tt + B))) -
        q8(math.log((cr(g) + 1).toDouble / (tr + B))))
    }.toMap
    cnt.groupBy(_._1._1).map { case (id, m) =>
      id -> m.map { case ((_, g), c) => BigDecimal(c) * dterm(g) }
        .sum.toDouble
    }
  }

  private def engine() = {
    val df = docs.toDF("doc_id", "lang", "text")
    val tok = df.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % B)
          .as("g"))
    val dgl = tok.groupBy(col("doc_id"), col("g"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val buckets = dgl.groupBy(col("g"))
      .agg(sum(when(col("lang") === "de", col("c")).otherwise(0L)).as("ct"),
        sum(col("c")).as("cr"))
    val totals = buckets.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val term = buckets.crossJoin(broadcast(totals))
      .select(col("g"),
        (log((col("ct") + 1).cast("double") / (col("tt") + B))
            .cast("decimal(18,8)") -
          log((col("cr") + 1).cast("double") / (col("tr") + B))
            .cast("decimal(18,8)")).as("dterm"))
    dgl.join(broadcast(term), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c").cast("decimal(10,0)") * col("dterm")).as("lw"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
  }

  test("engine weights equal the independent reference exactly") {
    val ref = referenceWeights()
    val got = engine()
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, w) =>
      assert(approx(w, ref(id), 1e-9), s"doc $id: engine $w vs ref ${ref(id)}")
    }
  }

  test("target-language docs outrank off-target docs; german-looking " +
      "english doc lands between") {
    val w = engine()
    val deMin = Seq(1L, 2L).map(w).min
    val enPure = Seq(3L, 4L).map(w).max
    assert(deMin > enPure,
      s"pure-target docs must beat pure-off-target: $w")
    assert(w(5L) > enPure, s"german-looking en doc should score high: $w")
  }
}
