package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical

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
  */
object Par {
  /** True when the optimized plan contains an operator that plans its own
    * exchange (repartition, shuffle join, aggregate, window, global sort,
    * dedup). Exchange output width is the session's shuffle parallelism
    * (or AQE's coalesced sizing), so the single-file scan collapse this
    * helper exists to fix cannot survive above one. */
  private def widensItself(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case _: logical.RepartitionOperation => true
      case _: logical.Aggregate => true
      case _: logical.Join => true
      case _: logical.Window => true
      case _: logical.Sort => true
      case _: logical.Deduplicate => true
      case _ => false
    }

  def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    // Probing width via df.rdd is only free on exchange-free plans: under
    // AQE, toRdd on a plan that already holds exchanges MATERIALIZES them
    // (AdaptiveSparkPlanExec runs every non-final query stage as a real
    // job) and that work is thrown away — at scale, a full wasted pass
    // over the input (measured r17: one orphaned 600k-row scan+shuffle
    // job per spatial-join query whose probe side was pre-repartitioned).
    // Exchange-bearing plans are already at shuffle width, so skip both
    // the probe and the repartition there; exchange-free plans keep the
    // exact partition-count check, where .rdd plans but never runs a job.
    if (widensItself(df)) df
    else if (df.rdd.getNumPartitions < want) df.repartition(want) else df
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
