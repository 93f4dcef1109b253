package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * Column pruning and predicate pushdown are free here: callers build
  * declarative plans on top of these scans, and Catalyst pushes
  * filters/projections into the parquet reader (visible as
  * `PushedFilters`/`ReadSchema` in `.explain("formatted")`). At 100 TB the
  * same code reads a partitioned table directory unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table $name")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  /** Normalize the generated `ts` column to a plain microsecond
    * TimestampType whatever physical form the driver wrote it in:
    *
    *  - TIMESTAMP(NANOS), which Spark's reader only accepts as a long
    *    (`spark.sql.legacy.parquet.nanosAsLong=true` — set in every session
    *    builder here); whole-microsecond data, so `div 1000` is lossless.
    *  - TIMESTAMP(MICROS) without timezone (isAdjustedToUTC=false →
    *    TimestampNTZType): cast through the session timezone, pinned UTC in
    *    every builder — the same instant DuckDB reads, and the TIMESTAMP
    *    type watermarks/`unix_micros` require.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
