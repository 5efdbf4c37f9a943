package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  /** Driver-generated parquet stores timestamps as
    * `Timestamp(isAdjustedToUTC=false)`, which Spark 4 infers as
    * TIMESTAMP_NTZ (`spark.sql.parquet.inferTimestampNTZ.enabled` default) —
    * a type `unix_timestamp`/`unix_millis`/window functions reject. Every
    * harness session pins the session timezone to UTC, so casting NTZ →
    * TIMESTAMP reinterprets the wall clock as the same UTC instant the
    * oracle (DuckDB reads the column as naive TIMESTAMP) computes with.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(raw) {
      (df, f) => df.withColumn(f.name, col(f.name).cast("timestamp"))
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only reads via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session builder here).
    * Convert the ns long back to a µs timestamp (integer DIV — a double division
    * would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
