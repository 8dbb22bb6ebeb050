package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructType}

/** Scalable global ranking. `row_number().over(Window.orderBy(...))`
  * moves EVERY row into one partition — the classic 100 TB cliff (Spark
  * itself warns "No Partition Defined for Window operation"). The
  * scalable form is the zipWithIndex device: range-repartition on the
  * sort keys, sort within partitions (both fully parallel), then assign
  * contiguous indices from per-partition offsets — `zipWithIndex` runs
  * one tiny count-per-partition job to build those offsets. Total order
  * and therefore ranks are IDENTICAL to the window form (ties impossible
  * when the key set includes a unique column); only the execution shape
  * changes.
  *
  * RDD use is deliberate here: per-partition contiguous index assignment
  * is genuinely imperative per-partition logic, the one case the
  * project's Spark-first rules reserve RDDs for (same class as
  * `connectedComponents`' contraction). */
object Ranks {

  /** `df` plus a 1-based BIGINT `rankCol` in the total order of `keys`
    * (include a unique tie-break column). Deterministic for a given
    * input: range boundaries come from Spark's seeded sampler, and the
    * rank values are boundary-invariant anyway. */
  def withGlobalRank(df: DataFrame, rankCol: String, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    val schema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(rankCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
