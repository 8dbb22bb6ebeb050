package graft.tools

import graft.ops.{Par, Tables, TextQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase-level profiler for dedupClusters: times the pair
  * materialization vs the iterative tail separately under Bench-like
  * session settings. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm like Bench does
    TextQueries.dedupClusters(spark, "/root/testdata/sf0.001").count()
    for (_ <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        val t = System.nanoTime()
        println(f"PHASE $tag%-28s ${(t - t0) / 1e9}%6.2f s")
        t0 = t
      }
      val pairs = TextQueries.dedupMinhash(spark, sfDir).select(col("a_id"), col("b_id")).cache()
      val n = pairs.count()
      lap(s"pairs materialize (n=$n)")
      val out = TextQueries.dedupClusters(spark, sfDir)
      val m = out.count()
      lap(s"full dedupClusters (rows=$m)")
      pairs.unpersist(blocking = false)
    }
    spark.stop()
  }
}
