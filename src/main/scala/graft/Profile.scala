package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level profiler for a single registered query — the measurement
  * tool the r10/r13 verdicts kept asking for before any hot-spot query
  * may be touched: per-stage wall clock, summed task CPU, task count,
  * input/shuffle record and byte counts, and spill. Usage:
  *
  *   sbt "runMain graft.Profile <queryName> [dataDir] [repeats]"
  *
  * dataDir defaults to sf0.1; pass the stress corpus to profile at 10×.
  * Repeats > 1 re-run the query in the same JVM (stages accumulate per
  * run and are printed per run) so JIT-warm numbers are visible. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, nameLine: String, wallMs: Long, cpuMs: Long,
                  tasks: Int, inRecs: Long, inBytes: Long,
                  shufReadRecs: Long, shufReadBytes: Long,
                  shufWriteRecs: Long, shufWriteBytes: Long, spill: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null) stages.add(St(si.stageId,
          si.name.linesIterator.nextOption().getOrElse(""),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.executorCpuTime / 1000000, si.numTasks,
          m.inputMetrics.recordsRead, m.inputMetrics.bytesRead,
          m.shuffleReadMetrics.recordsRead, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.recordsWritten, m.shuffleWriteMetrics.bytesWritten,
          m.diskBytesSpilled + m.memoryBytesSpilled))
      }
    })

    val rt = Runtime.getRuntime
    def heapMb(): Long = { System.gc(); (rt.totalMemory() - rt.freeMemory()) / (1 << 20) }
    (1 to repeats).foreach { r =>
      stages.clear()
      val h0 = heapMb()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
      val h1 = heapMb()
      println(f"%n== $name run $r: ${sec}%.2f s, $rows rows, heapDelta ${h1 - h0} MB ==")
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"cpu_ms"}%9s ${"tasks"}%5s " +
        f"${"in_recs"}%10s ${"in_MB"}%7s ${"shR_recs"}%10s ${"shR_MB"}%7s " +
        f"${"shW_recs"}%10s ${"shW_MB"}%7s ${"spill_MB"}%8s  name")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_.cpuMs).take(14).foreach { s =>
        println(f"${s.id}%6d ${s.wallMs}%8d ${s.cpuMs}%9d ${s.tasks}%5d " +
          f"${s.inRecs}%10d ${s.inBytes / (1 << 20)}%7d ${s.shufReadRecs}%10d " +
          f"${s.shufReadBytes / (1 << 20)}%7d ${s.shufWriteRecs}%10d " +
          f"${s.shufWriteBytes / (1 << 20)}%7d ${s.spill / (1 << 20)}%8d  ${s.nameLine.take(60)}")
      }
    }
    spark.stop()
  }
}
