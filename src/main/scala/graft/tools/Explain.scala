package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: print the FileScan lines (ReadSchema / PushedFilters) of
  * selected queries — the quick scan-pruning audit for new operators.
  * Usage: runMain graft.tools.Explain <query...> */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"===== $name")
      p.linesIterator.filter(l => l.contains("ReadSchema") || l.contains("FileScan"))
        .foreach(l => println(l.trim.take(300)))
    }
    spark.stop()
  }
}
