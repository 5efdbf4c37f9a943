package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

class BucketedSpec extends SparkTestBase {
  import spark.implicits._

  /** Formatted final-adaptive plan (AQE wraps shuffles in query stages, so the
    * rendered string is the robust place to look for exchanges).
    */
  private def planString(df: DataFrame): String = {
    df.count() // finalize the adaptive plan
    df.queryExecution.explainString(FormattedMode)
  }

  test("joining two same-key bucketed tables plans with zero shuffle exchange") {
    val left = (0L until 500L).map(i => (i, s"doc_$i")).toDF("doc_id", "text")
    val right = (0L until 500L by 2).map(i => (i, i % 7)).toDF("doc_id", "cluster")
    Bucketed.writeBucketed(left, "bk_left", "doc_id", nBuckets = 8)
    Bucketed.writeBucketed(right, "bk_right", "doc_id", nBuckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: a broadcast join would also be exchange-free,
      // but for the trivial reason that one side fits in memory
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.bucketedEquiJoin(spark, "bk_left", "bk_right", "doc_id")
      val plan = planString(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // differential: same rows as the plain (shuffling) join
      val plain = left.join(right, Seq("doc_id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == plain && got.size == 250)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }

  test("aggregation on the bucket key is exchange-free too") {
    val df = (0L until 300L).map(i => (i % 50, i)).toDF("user_id", "v")
    Bucketed.writeBucketed(df, "bk_agg", "user_id", nBuckets = 4)
    try {
      val agg = spark.table("bk_agg").groupBy("user_id").count()
      val plan = planString(agg)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg still shuffles:\n$plan")
      assert(agg.collect().map(_.getLong(1)).sum == 300)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_agg")
    }
  }
}
