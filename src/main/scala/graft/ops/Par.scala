package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parallelism floor for map-side-expensive pipelines.
  *
  * The local corpus (TESTDATA.md) is one parquet file per table with a
  * single row group, so a scan plans 1-3 tasks no matter how many cores the
  * session has — and any per-row kernel downstream (JTS geometry, minhash,
  * array math) runs nearly single-threaded. `fanOut` restores scan-side
  * parallelism by round-robin repartitioning ONLY when the source collapsed
  * below the session's core count.
  *
  * At production scale this is the identity: a 100 TB table scans as tens of
  * thousands of splits, the condition is false, and no shuffle is added.
  * The check costs one plan->RDD conversion (no job).
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Width of a TeraSort-device range exchange ([[Ranks.withGlobalRank]],
    * weightedMedian, equidepthBins, the z-order/Hilbert layout writers).
    * A hardcoded literal is a parallelism CEILING: the device's whole
    * argument is "every partition is an equal slice of the sort order at
    * ANY data size", but with a fixed 32-way exchange each slice is a
    * multi-TB single-task sort at 100×. Deriving the width from the
    * session's shuffle parallelism makes the device track the cluster —
    * on a 1000-executor deployment `spark.sql.shuffle.partitions` is
    * sized to the cluster (or AQE coalesces from a high initial value),
    * so the exchange widens with it. `floorAt` preserves each call
    * site's historical minimum so tiny test sessions keep enough
    * partitions for the specs that count them. */
  def rangeWidth(spark: SparkSession, floorAt: Int = 32): Int =
    math.max(floorAt, spark.sessionState.conf.numShufflePartitions)
}
