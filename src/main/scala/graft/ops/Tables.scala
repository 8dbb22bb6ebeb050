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
    * BIGINT).
    *
    * SESSION-LEVEL SIDE EFFECT, by necessity: `nanosAsLong` exists only as
    * the SQLConf `spark.sql.legacy.parquet.nanosAsLong` (ParquetOptions
    * exposes no per-read option for it in Spark 4.1), so this flips the
    * conf for the whole session. It is scoped in practice: the conf only
    * changes how parquet NANOS columns are read, and `events` is the sole
    * corpus table containing one; every other table reads identically
    * either way. All graft entry points (Bench/Verify/tests) also set it
    * at session build. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }
}
