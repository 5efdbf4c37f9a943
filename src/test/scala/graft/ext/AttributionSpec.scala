package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def df(rows: Seq[(Long, Long, Long, String)]) =
    rows.map { case (u, e, off, t) => (u, e, new Timestamp(base + off), t) }
      .toDF("user_id", "event_id", "ts", "event_type")

  private def run(rows: Seq[(Long, Long, Long, String)], lookbackMs: Long = 1000000L) =
    Attribution.channelCredit(df(rows), "ts", "user_id", "event_type", "event_id",
        Seq("view", "click"), "purchase", lookbackMs)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("first/last/linear credit on a two-conversion timeline") {
    val out = run(Seq(
      // conv 1: view then click then purchase → first=view, last=click, ½ each
      (1L, 1L, 0L, "view"), (1L, 2L, 10L, "click"), (1L, 3L, 20L, "purchase"),
      // conv 2: single view → all three models credit view
      (1L, 4L, 30L, "view"), (1L, 5L, 40L, "purchase")
    ))
    assert(out("view") == ((2L, 1L, 1.5)))
    assert(out("click") == ((0L, 1L, 0.5)))
  }

  test("touches beyond the lookback window earn nothing") {
    val out = run(Seq(
      (2L, 1L, 0L, "view"), (2L, 2L, 5000000L, "purchase")
    ), lookbackMs = 100L)
    assert(out.isEmpty) // the conversion is unattributed
  }

  test("a conversion resets the segment — earlier touches never leak forward") {
    val out = run(Seq(
      (3L, 1L, 0L, "click"), (3L, 2L, 10L, "purchase"),
      // second purchase has NO touches in its own segment
      (3L, 3L, 20L, "purchase")
    ))
    assert(out("click") == ((1L, 1L, 1.0)))
  }

  test("random timelines match an independent sequential replay") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val rowsGen: Gen[List[(Long, Long, Long, String)]] = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.choose(1L, 5L), Gen.choose(0L, 500L),
        Gen.oneOf("view", "click", "purchase", "noise")))
    } yield rows.zipWithIndex.map { case ((u, ms, t), i) =>
      (u, i.toLong, ms, t) // unique ids keep the (ms, id) order total
    }

    /** Sequential per-user replay — a different algorithm family than the
      * segment-join operator (buffer + reset instead of window counts).
      */
    def reference(rows: Seq[(Long, Long, Long, String)], lookback: Long)
        : Map[String, (Long, Long, Double)] = {
      val first = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val last = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val lin = scala.collection.mutable.Map[String, BigDecimal]()
        .withDefaultValue(BigDecimal(0))
      rows.groupBy(_._1).values.foreach { userRows =>
        val sorted = userRows.sortBy(r => (r._3, r._2))
          .filter(r => Set("view", "click", "purchase")(r._4))
        var buffer = Vector.empty[(Long, String)] // (ms, channel)
        sorted.foreach {
          case (_, _, ms, "purchase") =>
            val qual = buffer.filter { case (tms, _) => ms - tms <= lookback }
            if (qual.nonEmpty) {
              first(qual.head._2) += 1
              last(qual.last._2) += 1
              val share = BigDecimal(1.0 / qual.size)
                .setScale(8, BigDecimal.RoundingMode.HALF_UP)
              qual.foreach { case (_, ch) => lin(ch) += share }
            }
            buffer = Vector.empty
          case (_, _, ms, ch) => buffer :+= ((ms, ch))
        }
      }
      (first.keySet ++ last.keySet ++ lin.keySet).map { ch =>
        ch -> ((first(ch), last(ch), lin(ch).toDouble))
      }.toMap
    }

    for (seed <- 1L to 8L; lookback <- Seq(60L, 1000000L)) {
      val rows = sample(rowsGen, seed)
      val got = run(rows, lookback)
      val exp = reference(rows, lookback)
      assert(got.keySet == exp.keySet, s"seed $seed lookback $lookback")
      got.foreach { case (ch, (f, l, lv)) =>
        val (ef, el, elv) = exp(ch)
        assert(f == ef && l == el && math.abs(lv - elv) < 1e-6,
          s"seed $seed lookback $lookback channel $ch: " +
            s"got ($f,$l,$lv) expected ($ef,$el,$elv)")
      }
    }
  }

  test("other event types are ignored entirely") {
    val out = run(Seq(
      (4L, 1L, 0L, "view"), (4L, 2L, 5L, "error"), (4L, 3L, 6L, "signup"),
      (4L, 4L, 10L, "purchase")
    ))
    assert(out("view") == ((1L, 1L, 1.0)))
    assert(!out.contains("error") && !out.contains("signup"))
  }

  test("simultaneous timestamps break ties by event id") {
    val out = run(Seq(
      (5L, 1L, 0L, "view"), (5L, 2L, 0L, "click"), (5L, 3L, 10L, "purchase")
    ))
    assert(out("view")._1 == 1L)  // id 1 < id 2 → view is first
    assert(out("click")._2 == 1L) // click is last
  }

  test("adstockCorrelation: a lag-distributed response correlates with the " +
    "adstock transform far better than with the raw driver") {
    import spark.implicits._
    // driver: impulses on days 1, 11, 21; outcome: geometric echo of each
    // impulse over the following week (exactly what adstock models)
    val days = 1 to 30
    val driver = days.map { d =>
      (f"2024-03-$d%02d", if (d % 10 == 1) 1000L else 0L)
    }
    val theta = 0.7
    val outcome = days.map { d =>
      val echo = (0 to 9).map { k =>
        if (d - k >= 1 && (d - k) % 10 == 1)
          (1000 * math.pow(theta, k)).round
        else 0L
      }.sum
      (f"2024-03-$d%02d", echo)
    }
    def df(rows: Seq[(String, Long)]) = rows.toDF("d", "v")
      .select(col("d").cast("date").as("d"),
        col("v").cast("decimal(38,0)").as("v"))
    val out = Attribution.adstockCorrelation(df(driver), df(outcome),
        "d", "v", "v", lnTheta = math.log(theta), maxLag = 14)
      .collect().head
    assert(out.getLong(0) == 30)
    val raw = out.getDouble(1); val ads = out.getDouble(2)
    assert(ads > 0.99, s"adstock should nearly perfectly fit: $ads")
    // raw still picks up the echo's day-0 spike (~0.75); adstock closes
    // the remaining gap to ~1
    assert(ads > raw + 0.2, s"adstock $ads must beat raw $raw")
  }
}
