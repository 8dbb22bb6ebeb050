package graft.ops

import org.apache.spark.sql.DataFrame

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
}
