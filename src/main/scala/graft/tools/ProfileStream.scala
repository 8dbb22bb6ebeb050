package graft.tools

import graft.streaming.StreamQueries
import org.apache.spark.sql.SparkSession

/** Throwaway experiment harness for streaming fixed-cost work: runs the
  * three bounded streaming queries under a given state-partition count and
  * state-store provider, printing warm per-query times. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else "8"
    val rocks = args.length > 2 && args(2) == "rocksdb"
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("graft.stream.statePartitions", parts)
    if (rocks) b.config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("q_stream_window", "q_stream_dedup", "q_stream_join")) {
      val fn = StreamQueries.all(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STREAM parts=$parts%-3s rocks=$rocks $name%-18s ${times.map(t => f"$t%6.2f").mkString(" ")} min=${times.min}%6.2f")
    }
    spark.stop()
  }
}
