package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time containmentJoin on an already-built stress corpus with
  * spill accounting — the iteration loop for the positional-device work. */
object ProbeContain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/stress_corpus_30x")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
      }
    })
    // warm on the small corpus first
    graft.ops.TextQueries.containmentJoin(spark, "/root/testdata/sf0.001").count()
    (1 to runs).foreach { i =>
      org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
      val s0 = spill.get()
      val t0 = System.nanoTime()
      val n = graft.ops.TextQueries.containmentJoin(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
      println(f"[probe] run$i rows=$n sec=$sec%.2f spillMB=${(spill.get() - s0) / (1 << 20)}")
    }
    spark.stop()
  }
}
