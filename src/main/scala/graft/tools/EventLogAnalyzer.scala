package graft.tools

import java.io.{BufferedReader, FileInputStream, InputStreamReader}
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Offline Spark event-log analyzer — the operational half of the
  * reference's tooling (`/root/reference/src/analyze_spark_eventlog.py`,
  * ported as structured data instead of prints so callers and tests can
  * assert on it).
  *
  * Sections mirror the reference's report and its health thresholds
  * (BASELINE.md): FAIR pool assignment per job, per-stage task skew
  * (max/median, flagged > 3×, serious when max > 10 s), GC share
  * (normal < 5%, critical > 10%), per-executor utilization, CPU
  * efficiency (balanced 50–80%), SQL duration percentiles by statement
  * type, streaming batch progress, and the Spark config dump.
  */
object EventLogAnalyzer {

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------------
  // model
  // ------------------------------------------------------------------

  case class StageSkew(
      stageId: Long,
      tasks: Int,
      minMs: Long,
      medianMs: Long,
      maxMs: Long,
      skewRatio: Double) {
    def skewed: Boolean = skewRatio > 3.0
    def serious: Boolean = skewed && maxMs > 10000
  }

  case class ExecutorStats(
      executorId: String,
      tasks: Int,
      runTimeMs: Long,
      cpuTimeMs: Long,
      gcTimeMs: Long,
      shuffleReadWaitMs: Long,
      bytesSpilled: Long)

  case class SqlStats(
      statementType: String,
      count: Int,
      p50Ms: Long,
      p95Ms: Long,
      maxMs: Long)

  case class StreamingBatch(queryName: String, batchId: Long, numInputRows: Long)

  case class Report(
      pools: Map[String, Seq[Long]], // pool -> job ids
      stageSkew: Seq[StageSkew],
      gcSharePct: Double,
      cpuEfficiencyPct: Double,
      executors: Seq[ExecutorStats],
      sql: Seq[SqlStats],
      streaming: Seq[StreamingBatch],
      config: Map[String, String]) {

    def skewedStages: Seq[StageSkew] = stageSkew.filter(_.skewed)

    /** BASELINE.md health bands. */
    def gcHealth: String =
      if (gcSharePct < 5) "normal" else if (gcSharePct <= 10) "elevated" else "critical"
    def cpuHealth: String =
      if (cpuEfficiencyPct > 80) "cpu-bound"
      else if (cpuEfficiencyPct >= 50) "balanced"
      else "io-or-shuffle-bound"
  }

  // ------------------------------------------------------------------
  // IO
  // ------------------------------------------------------------------

  /** Read one event-log file (plain or .zstd via zstd-jni, the codec
    * Spark itself bundles) into JSON lines. */
  def readLines(file: Path): Seq[String] = {
    val in = new FileInputStream(file.toFile)
    val stream =
      if (file.getFileName.toString.endsWith(".zstd"))
        new com.github.luben.zstd.ZstdInputStream(in)
      else in
    val reader = new BufferedReader(new InputStreamReader(stream, "UTF-8"))
    try Iterator.continually(reader.readLine()).takeWhile(_ != null).toList
    finally reader.close()
  }

  def readEventLogDir(dir: Path): Seq[String] =
    Files.list(dir).iterator().asScala.toSeq
      .filter(p => Files.isRegularFile(p))
      .sortBy(_.getFileName.toString)
      .flatMap(readLines)

  def parseEvents(lines: Seq[String]): Seq[JsonNode] =
    lines.filter(_.trim.nonEmpty).flatMap { l =>
      try Some(mapper.readTree(l)) catch { case _: Exception => None }
    }

  // ------------------------------------------------------------------
  // analysis
  // ------------------------------------------------------------------

  def analyze(lines: Seq[String]): Report = {
    val events = parseEvents(lines)
    def ofType(t: String): Seq[JsonNode] =
      events.filter(_.path("Event").asText() == t)

    // FAIR pool per job (analyze_pools, :95-135)
    val pools = ofType("SparkListenerJobStart")
      .map { e =>
        val pool = e.path("Properties").path("spark.scheduler.pool").asText("default")
        pool -> e.path("Job ID").asLong()
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    // per-task rollups (analyze_task_skew :372-441, analyze_cpu :782-946)
    case class Task(stageId: Long, executorId: String, durationMs: Long,
        runMs: Long, cpuMs: Long, gcMs: Long, fetchWaitMs: Long, spilled: Long)
    val tasks = ofType("SparkListenerTaskEnd").map { e =>
      val info = e.path("Task Info")
      val m = e.path("Task Metrics")
      Task(
        stageId = e.path("Stage ID").asLong(),
        executorId = info.path("Executor ID").asText(""),
        durationMs = info.path("Finish Time").asLong() - info.path("Launch Time").asLong(),
        runMs = m.path("Executor Run Time").asLong(),
        cpuMs = m.path("Executor CPU Time").asLong() / 1000000, // ns on the wire
        gcMs = m.path("JVM GC Time").asLong(),
        fetchWaitMs = m.path("Shuffle Read Metrics").path("Fetch Wait Time").asLong(),
        spilled = m.path("Memory Bytes Spilled").asLong())
    }

    val stageSkew = tasks.groupBy(_.stageId).toSeq.map { case (sid, ts) =>
      val ds = ts.map(_.durationMs).sorted
      val median = ds(ds.length / 2)
      StageSkew(sid, ds.length, ds.head, median, ds.last,
        if (median > 0) ds.last.toDouble / median else 0.0)
    }.sortBy(-_.skewRatio)

    val totalRun = math.max(1L, tasks.map(_.runMs).sum)
    val gcSharePct = tasks.map(_.gcMs).sum.toDouble / totalRun * 100
    val cpuEfficiencyPct = tasks.map(_.cpuMs).sum.toDouble / totalRun * 100

    val executors = tasks.groupBy(_.executorId).toSeq.map { case (id, ts) =>
      ExecutorStats(id, ts.length, ts.map(_.runMs).sum, ts.map(_.cpuMs).sum,
        ts.map(_.gcMs).sum, ts.map(_.fetchWaitMs).sum, ts.map(_.spilled).sum)
    }.sortBy(_.executorId)

    // SQL executions by statement type (analyze_sql_performance :258-364)
    val sqlStarts = ofType(
      "org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart")
      .map(e => e.path("executionId").asLong() ->
        (e.path("description").asText(""), e.path("time").asLong()))
      .toMap
    val sql = ofType("org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd")
      .flatMap { e =>
        val id = e.path("executionId").asLong()
        sqlStarts.get(id).map { case (desc, start) =>
          val stmt = desc.trim.split("\\s+").headOption.getOrElse("unknown")
            .toUpperCase.take(20)
          stmt -> (e.path("time").asLong() - start)
        }
      }
      .groupBy(_._1).toSeq.map { case (stmt, xs) =>
        val ds = xs.map(_._2).sorted
        def pct(p: Double) = ds(math.min(ds.length - 1, (ds.length * p).toInt))
        SqlStats(stmt, ds.length, pct(0.5), pct(0.95), ds.last)
      }.sortBy(-_.maxMs)

    // streaming progress (analyze_streaming :1002-1070)
    val streaming = ofType(
      "org.apache.spark.sql.streaming.StreamingQueryListener$QueryProgressEvent")
      .map { e =>
        val p = e.path("progress")
        StreamingBatch(p.path("name").asText(""), p.path("batchId").asLong(),
          p.path("numInputRows").asLong())
      }

    // config dump (analyze_config :1078-1130)
    val config = ofType("SparkListenerEnvironmentUpdate").lastOption
      .map { e =>
        val props = e.path("Spark Properties")
        props.properties().iterator().asScala
          .map(en => en.getKey -> en.getValue.asText()).toMap
      }
      .getOrElse(Map.empty)

    Report(pools, stageSkew, gcSharePct, cpuEfficiencyPct, executors, sql,
      streaming, config)
  }

  def analyzeDir(dir: Path): Report = analyze(readEventLogDir(dir))
}
