package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev profiling harness: run selected `SparkEntry.queries` repeatedly in
  * one warm session and print per-iteration wall times, so optimization
  * work measures steady-state query cost instead of session startup.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <iters> <query...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-24s ${times.map(t => f"$t%6.2f").mkString(" ")}  min=${times.min}%6.2f")
    }
    spark.stop()
  }
}
