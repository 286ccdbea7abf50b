package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.Queries

/** Stage-level shuffle/spill profiler (judge brief r17 #5): runs the
  * named catalog queries at the given SF dir with a listener that
  * records, per completed stage, the aggregate task metrics Spark
  * already tracks — run/CPU time, shuffle bytes+records both
  * directions, and memory/disk spill — then prints a table per query
  * sorted by executor run time.
  *
  * Purpose: attribute a super-linear decade ratio to its physical
  * cause. A stage whose shuffle WRITE grows ~10×/decade while its
  * runtime grows ~14× and `diskBytesSpilled` stays 0 is paying
  * shuffle-to-disk constants (compression/serialization of more bytes
  * per partition), not agg hash spill — the distinction the r16
  * FIXTURES continuation argued from partition-count A/B; this tool
  * measures it directly.
  *
  * Usage: runMain graft.tools.StageProfile <sfDir> <query> [query...]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PROFILE_RUNS
  * (default 2 — run N times inside one JVM; read the LAST run's table
  * for steady state, cold-JVM constants dominate the first).
  */
object StageProfile {

  final case class StageRow(run: Int, query: String, stageId: Int,
      name: String, tasks: Int, runMs: Long, cpuMs: Long,
      shufReadMB: Double, shufReadRec: Long,
      shufWriteMB: Double, shufWriteRec: Long,
      memSpillMB: Double, diskSpillMB: Double, peakExecMemMB: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val queries = args.drop(1).toSeq
    require(queries.nonEmpty, "usage: StageProfile <sfDir> <query> [query...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"datagen_id=${DataGenId.of(sfDir)} dir=$sfDir cpus=$cpus")

    val rows = new ConcurrentLinkedQueue[StageRow]()
    // mutated between runs on the driver only; listener events for a
    // run are drained by the post-run sleep before these advance
    @volatile var curQuery = ""
    @volatile var curRun = 0
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null) rows.add(StageRow(curRun, curQuery, si.stageId,
          si.name.takeWhile(_ != '\n').take(60), si.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead / 1048576.0,
          m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.bytesWritten / 1048576.0,
          m.shuffleWriteMetrics.recordsWritten,
          m.memoryBytesSpilled / 1048576.0,
          m.diskBytesSpilled / 1048576.0,
          m.peakExecutionMemory / 1048576.0))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (r <- 1 to runs; q <- queries) {
      curRun = r; curQuery = q
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      Queries.all(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async — let this run's stage events drain
      // before the labels move on
      Thread.sleep(2000)
      println(f"%n== run $r $q: $sec%.1f s ==")
      println(f"${"stage"}%-7s ${"tasks"}%5s ${"run_s"}%8s ${"cpu_s"}%8s " +
        f"${"sh_rd_MB"}%9s ${"sh_rd_rec"}%10s ${"sh_wr_MB"}%9s " +
        f"${"sh_wr_rec"}%10s ${"spill_mem"}%9s ${"spill_dsk"}%9s " +
        f"${"peak_MB"}%8s  name")
      import scala.jdk.CollectionConverters._
      val mine = rows.asScala.filter(s => s.run == r && s.query == q).toSeq
        .sortBy(-_.runMs)
      mine.foreach { s =>
        println(f"${s.stageId}%-7d ${s.tasks}%5d ${s.runMs / 1000.0}%8.1f " +
          f"${s.cpuMs / 1000.0}%8.1f ${s.shufReadMB}%9.1f " +
          f"${s.shufReadRec}%10d ${s.shufWriteMB}%9.1f " +
          f"${s.shufWriteRec}%10d ${s.memSpillMB}%9.1f " +
          f"${s.diskSpillMB}%9.1f ${s.peakExecMemMB}%8.1f  ${s.name}")
      }
      val totSpillD = mine.map(_.diskSpillMB).sum
      val totSpillM = mine.map(_.memSpillMB).sum
      val totShW = mine.map(_.shufWriteMB).sum
      println(f"totals: shuffle_write=${totShW}%.1f MB " +
        f"spill_mem=${totSpillM}%.1f MB spill_disk=${totSpillD}%.1f MB " +
        f"stages=${mine.size}")
    }
    spark.stop()
  }
}
