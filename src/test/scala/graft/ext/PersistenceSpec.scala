package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 batch-17 spec: persistent-items quadrants. */
class PersistenceSpec extends SparkTestBase {
  import spark.implicits._

  test("persistence: hand-computed quadrants on a planted population") {
    // 4 windows total. entities:
    //  loyal-light: a in w1..w4, 1 event each      -> persistent_light
    //  loyal-heavy: b in w1..w4, 3 events each     -> persistent_heavy
    //  burst:       c in w1 only, 5 events         -> transient_heavy
    //  drive-by:    d in w2 only, 1 event          -> transient_light
    val rows =
      (1 to 4).map(w => ("a", w)) ++
      (1 to 4).flatMap(w => Seq.fill(3)(("b", w))) ++
      Seq.fill(5)(("c", 1)) ++ Seq(("d", 2))
    val out = EventStats.persistenceQuadrants(rows.toDF("ent", "win"),
        col("ent"), col("win"), persistMin = 0.5, perWindowMin = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.keySet == Set("persistent_light", "persistent_heavy",
      "transient_heavy", "transient_light"))
    assert(out("persistent_light") == ((1L, 4L, 1.0, 1.0)))
    assert(out("persistent_heavy") == ((1L, 12L, 1.0, 3.0)))
    assert(out("transient_heavy") == ((1L, 5L, 0.25, 5.0)))
    assert(out("transient_light") == ((1L, 1L, 0.25, 1.0)))
  }

  test("persistence: boundary entities land inclusively") {
    // 4 windows; e active in exactly 2 (= 50%, inclusive at persistMin 0.5),
    // with exactly 2 events per active window (inclusive at perWindowMin 2)
    val rows = Seq(("pad", 1), ("pad", 2), ("pad", 3), ("pad", 4)) ++
      Seq.fill(2)(("e", 1)) ++ Seq.fill(2)(("e", 2))
    val out = EventStats.persistenceQuadrants(rows.toDF("ent", "win"),
        col("ent"), col("win"), persistMin = 0.5, perWindowMin = 2)
      .collect().map(r => r.getString(0)).toSet
    assert(out.contains("persistent_heavy"), s"got $out")
  }

  test("persistence: mass conservation across quadrants") {
    val rnd = new scala.util.Random(113)
    val rows = (0 until 5000).map(_ => (s"e${rnd.nextInt(300)}",
      rnd.nextInt(12)))
    val out = EventStats.persistenceQuadrants(rows.toDF("ent", "win"),
      col("ent"), col("win"), persistMin = 0.25, perWindowMin = 2).collect()
    assert(out.map(_.getLong(1)).sum == rows.map(_._1).distinct.size)
    assert(out.map(_.getLong(2)).sum == rows.size.toLong)
  }
}
