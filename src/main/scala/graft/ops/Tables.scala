package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver test corpus (TESTDATA.md).
  *
  * The analogue of the reference's partitioned JDBC scans
  * (reference: spark_job/process_geodata.py:74-96) — Parquet file sources
  * parallelize via splits automatically, and Catalyst pushes projections
  * and filters into the scan, which is what the reference achieved manually
  * with SQL-in-string JDBC subqueries (process_geodata.py:165-174).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.parquet` stores nanosecond timestamps, which Spark's Parquet
    * reader only accepts as raw longs (`ts` becomes nanos-since-epoch
    * BIGINT). Set per-read via runtime conf so it works on any session. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }
}
