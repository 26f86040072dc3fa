package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.core.GraftSession

/** Per-STAGE profiler for one query: `runMain graft.StageProbe <sfDir>
  * <query> [iters]` runs the query `iters` times (default 2) into the
  * noop sink and prints, for every stage of the LAST iteration, the
  * task count, task run/cpu/GC time, shuffle read/write bytes+records
  * and the stage's callsite name — the data §1/§7.2 of the optimization
  * guide wants before an operator is touched, without the Spark UI.
  * Measurement-only: never on any query path. */
object StageProbe {
  private final case class StageRow(
      id: Int, attempt: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, gcMs: Long,
      shufReadB: Long, shufReadRec: Long, shufWriteB: Long,
      shufWriteRec: Long, inB: Long, inRec: Long, outB: Long, spillB: Long)

  private class StageListener extends SparkListener {
    val rows = new ConcurrentHashMap[(Int, Int), StageRow]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      if (m != null) {
        rows.put((si.stageId, si.attemptNumber()), StageRow(
          si.stageId, si.attemptNumber(), si.name,
          si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000,
          m.jvmGCTime,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleWriteMetrics.recordsWritten,
          m.inputMetrics.bytesRead, m.inputMetrics.recordsRead,
          m.outputMetrics.bytesWritten,
          m.memoryBytesSpilled + m.diskBytesSpilled))
      }
    }
    def reset(): Unit = rows.clear()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = args(1)
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-stageprobe", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new StageListener
    spark.sparkContext.addSparkListener(listener)
    val storeTiming = sys.env.get("GRAFT_STORE_TIMING").contains("1")
    if (storeTiming) graft.store.StoreTiming.enable()
    val fn = SparkEntry.queries(qname)
    var wall = 0.0
    (1 to iters).foreach { i =>
      listener.reset()
      if (storeTiming) graft.store.StoreTiming.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      wall = (System.nanoTime() - t0) / 1e9
      println(f"ITER $i wall ${wall}%.2f s")
    }
    if (storeTiming) graft.store.StoreTiming.report().foreach { case (p, n, s) =>
      println(f"  STORE-PHASE $p%-26s calls=$n%-5d total=$s%8.2f s")
    }
    // stop() drains the listener bus so the tail stages are accounted
    spark.stop()
    import scala.jdk.CollectionConverters._
    val rows = listener.rows.values.asScala.toSeq.sortBy(r => (-r.runMs, r.id))
    println(f"STAGES-FOR $qname (last iter, wall ${wall}%.2f s)")
    println(f"${"stage"}%6s ${"tasks"}%5s ${"run_s"}%8s ${"cpu_s"}%8s ${"gc_s"}%6s " +
      f"${"sh_rd_MB"}%9s ${"sh_rd_rec"}%10s ${"sh_wr_MB"}%9s ${"sh_wr_rec"}%10s " +
      f"${"in_rec"}%9s  name")
    rows.foreach { r =>
      println(f"${r.id}%6d ${r.tasks}%5d ${r.runMs / 1e3}%8.2f ${r.cpuMs / 1e3}%8.2f " +
        f"${r.gcMs / 1e3}%6.2f ${r.shufReadB / 1e6}%9.2f ${r.shufReadRec}%10d " +
        f"${r.shufWriteB / 1e6}%9.2f ${r.shufWriteRec}%10d ${r.inRec}%9d  ${r.name.take(80)}")
    }
    val tot = rows.map(_.runMs).sum / 1e3
    val cpu = rows.map(_.cpuMs).sum / 1e3
    val gc = rows.map(_.gcMs).sum / 1e3
    println(f"TOTAL stages=${rows.size} run ${tot}%.2f s cpu ${cpu}%.2f s gc ${gc}%.2f s")
  }
}
