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

  case class StreamingBatch(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSec: Double = 0.0,
      processedRowsPerSec: Double = 0.0)

  /** One streaming query's lifecycle (started/terminated events).
    * `terminated = false` means the log carries no QueryTerminatedEvent
    * — the query was still running, or the driver died without one —
    * which must NOT render as success. */
  case class StreamingQueryInfo(
      runId: String,
      name: String,
      exception: Option[String],
      terminated: Boolean = true) {
    def succeeded: Boolean = terminated && exception.isEmpty
    def lifecycle: String =
      if (!terminated) "no-terminated-event (running or driver died)"
      else if (exception.isEmpty) "ok"
      else s"FAILED: ${exception.get.linesIterator.nextOption().getOrElse("")}"
  }

  /** One topic's slice of the run: job-group start→end envelope
    * (`analyze_topic_timeline`, analyze_spark_eventlog.py:144-250). */
  case class TopicTimeline(
      topic: String,
      startMs: Long,
      endMs: Long,
      jobCount: Int) {
    def durationMs: Long = endMs - startMs
  }

  /** Per-executor memory decomposition (`analyze_memory`, :605-774). */
  case class ExecutorMemory(
      executorId: String,
      heapBytes: Long,
      peakExecBytes: Long,
      diskSpill: Long,
      memSpill: Long) {
    /** 0 when the heap is unknown (BlockManagerAdded rolled out of the
      * analyzed slice) — a 1-byte fallback denominator would report
      * astronomical usage and corrupt the health band. */
    def usagePct: Double =
      if (heapBytes <= 0) 0.0
      else peakExecBytes.toDouble / heapBytes * 100
  }

  case class MemoryReport(
      executors: Seq[ExecutorMemory],
      totalDiskSpill: Long,
      totalMemSpill: Long,
      totalInputBytes: Long,
      totalShuffleRead: Long,
      totalShuffleWrite: Long) {
    def avgUsagePct: Double = {
      // only executors whose heap is known contribute to the average
      val known = executors.filter(_.heapBytes > 0)
      if (known.isEmpty) 0.0 else known.map(_.usagePct).sum / known.size
    }

    /** The reference's memory-sizing bands: disk spill is a confirmed
      * shortage; >80% peak/heap is one data bump from spilling; <30%
      * is over-provisioned cluster budget. */
    def memoryHealth: String =
      if (totalDiskSpill > 0) "spilling"
      else if (avgUsagePct > 80) "at-risk"
      else if (avgUsagePct >= 30) "adequate"
      else "over-provisioned"
  }

  case class Report(
      pools: Map[String, Seq[Long]], // pool -> job ids
      stageSkew: Seq[StageSkew],
      gcSharePct: Double,
      cpuEfficiencyPct: Double,
      executors: Seq[ExecutorStats],
      sql: Seq[SqlStats],
      streaming: Seq[StreamingBatch],
      config: Map[String, String],
      timeline: Seq[TopicTimeline] = Nil,
      memory: MemoryReport = MemoryReport(Nil, 0, 0, 0, 0, 0),
      streamingQueries: Seq[StreamingQueryInfo] = Nil) {

    def skewedStages: Seq[StageSkew] = stageSkew.filter(_.skewed)

    /** BASELINE.md health bands. */
    def gcHealth: String =
      if (gcSharePct < 5) "normal" else if (gcSharePct <= 10) "elevated" else "critical"
    def cpuHealth: String =
      if (cpuEfficiencyPct > 80) "cpu-bound"
      else if (cpuEfficiencyPct >= 50) "balanced"
      else "io-or-shuffle-bound"

    /** Max topics in flight at once, sampled at every envelope edge —
      * the semaphore sanity check (equals `concurrency` when healthy).
      * Envelopes are half-open [start, end): back-to-back topics whose
      * edges touch (A ends exactly when B starts) are sequential, not
      * concurrent; zero-duration envelopes count at their start. */
    def maxConcurrentTopics: Int =
      if (timeline.isEmpty) 0
      else timeline.flatMap(t => Seq(t.startMs, t.endMs))
        .distinct
        .map(ts => timeline.count(t =>
          t.startMs <= ts && ts < math.max(t.endMs, t.startMs + 1)))
        .max

    /** The reference's config table (analyze_spark_config :1086-1100):
      * its fixed keys-of-interest in order, `N/A` where the log carries
      * no value. */
    def configOfInterest: Seq[(String, String)] =
      Report.ConfigKeysOfInterest.map(k => k -> config.getOrElse(k, "N/A"))

    /** Kafka-related properties, the reference's supplementary dump
      * (analyze_spark_config :1108-1112). */
    def kafkaConfig: Seq[(String, String)] =
      config.filter(_._1.toLowerCase.contains("kafka")).toSeq.sortBy(_._1)

    /** The reference's per-batch streaming progress table
      * (`analyze_streaming`, analyze_spark_eventlog.py:1038-1046): one
      * line per QueryProgressEvent — query name (truncated at 53),
      * micro-batch id, input rows, input and processed rows/sec at one
      * decimal. Widths reproduce the reference's OWN format strings
      * bug-for-bug: headers pad the rate columns to 10, data rows to 9
      * (`{in_rate:>9.1f}` under `{'In/s':>10}`), and the rule is 95
      * chars while data rows are 93 — parity over prettiness, so a
      * diff against the reference tool's output stays clean. Empty
      * when the log carries no progress events. */
    def streamingBatchTable: Seq[String] =
      if (streaming.isEmpty) Nil
      else {
        val header =
          f"${"Query Name"}%-55s ${"Batch"}%6s ${"Rows"}%10s ${"In/s"}%10s ${"Out/s"}%10s"
        val rows = streaming.map { s =>
          f"${s.queryName.take(53)}%-55s ${s.batchId}%6d ${s.numInputRows}%10d ${s.inputRowsPerSec}%9.1f ${s.processedRowsPerSec}%9.1f"
        }
        header +: ("-" * 95) +: rows
      }

    /** Progress events per started query — the reference's availableNow
      * heuristic input (:1049-1051): a low average with every query
      * terminated reads as an availableNow run (whose final batch may
      * be the empty flush, Rows=0 by design). */
    def avgBatchesPerQuery: Double =
      streaming.size.toDouble / math.max(1, streamingQueries.size)

    /** Text Gantt chart of the topic timeline (reference's bar render):
      * one line per topic, `width` cells across the app's span. */
    def ganttLines(width: Int = 60): Seq[String] = {
      if (timeline.isEmpty) return Nil
      val t0 = timeline.map(_.startMs).min
      val t1 = math.max(t0 + 1, timeline.map(_.endMs).max)
      timeline.sortBy(_.startMs).map { t =>
        val from = ((t.startMs - t0).toDouble / (t1 - t0) * width).toInt
        val to = math.max(from + 1, ((t.endMs - t0).toDouble / (t1 - t0) * width).toInt)
        val bar = " " * from + "#" * (to - from) + " " * (width - to)
        f"${t.topic.split('.').last.take(38)}%-40s|$bar|"
      }
    }

    /** The full human-readable report — the reference tool's stdout
      * form (its numbered sections in order), rendered from the
      * structured fields so the two views can never disagree. */
    def render: String = {
      val b = new StringBuilder
      def section(title: String): Unit =
        b.append("\n== ").append(title).append(" ==\n")
      section("1. Scheduler pools")
      pools.toSeq.sortBy(_._1).foreach { case (p, jobs) =>
        b.append(f"  $p%-30s jobs ${jobs.mkString(",")}\n")
      }
      section("2. Topic timeline")
      ganttLines().foreach(l => b.append("  ").append(l).append('\n'))
      if (timeline.nonEmpty)
        b.append(s"  max concurrent topics: $maxConcurrentTopics\n")
      section("3. Task skew")
      stageSkew.take(10).foreach { s =>
        b.append(f"  stage ${s.stageId}%-6d tasks ${s.tasks}%-5d median ${s.medianMs}%6d ms  max ${s.maxMs}%6d ms  x${s.skewRatio}%.1f")
        if (s.serious) b.append("  SERIOUS") else if (s.skewed) b.append("  skewed")
        b.append('\n')
      }
      section("4. GC / CPU")
      b.append(f"  gc share ${gcSharePct}%.1f%% ($gcHealth)   cpu efficiency ${cpuEfficiencyPct}%.1f%% ($cpuHealth)\n")
      section("5. Executors")
      executors.foreach { e =>
        b.append(f"  exec ${e.executorId}%-4s tasks ${e.tasks}%-5d run ${e.runTimeMs}%8d ms  gc ${e.gcTimeMs}%6d ms  fetch-wait ${e.shuffleReadWaitMs}%6d ms  spilled ${e.bytesSpilled}%d B\n")
      }
      section("6. Memory")
      memory.executors.foreach { m =>
        b.append(f"  exec ${m.executorId}%-4s peak/heap ${m.usagePct}%.0f%%  disk-spill ${m.diskSpill}%d B\n")
      }
      b.append(f"  health: ${memory.memoryHealth} (avg ${memory.avgUsagePct}%.0f%% of heap)\n")
      section("7. SQL statements")
      sql.foreach { s =>
        b.append(f"  ${s.statementType}%-20s n ${s.count}%-4d p50 ${s.p50Ms}%6d ms  p95 ${s.p95Ms}%6d ms  max ${s.maxMs}%6d ms\n")
      }
      section("8. Streaming")
      // the reference's summary line + failed-query list (:1027-1035)
      if (streamingQueries.isEmpty && streaming.isEmpty)
        b.append("  no streaming queries\n")
      if (streamingQueries.nonEmpty) {
        val ok = streamingQueries.count(_.succeeded)
        val bad = streamingQueries.count(_.exception.nonEmpty)
        b.append(s"  ${streamingQueries.size} streaming queries (ok: $ok, failed: $bad)\n")
        streamingQueries.filter(_.exception.nonEmpty).foreach { q =>
          b.append(s"    FAILED ${q.name}: ${q.exception.get.linesIterator.nextOption().getOrElse("").take(100)}\n")
        }
      }
      streamingQueries.foreach { q =>
        b.append(s"  query ${q.name} [${q.runId.take(8)}] ${q.lifecycle}\n")
      }
      streamingBatchTable.foreach(l => b.append("  ").append(l).append('\n'))
      if (streaming.nonEmpty)
        b.append(f"  avg batches per query: $avgBatchesPerQuery%.1f\n")
      streaming.groupBy(_.queryName).toSeq.sortBy(_._1).foreach { case (n, bs) =>
        b.append(f"  $n%-40s batches ${bs.size}%-5d rows ${bs.map(_.numInputRows).sum}%d\n")
      }
      section("9. Spark config")
      configOfInterest.foreach { case (k, v) => b.append(f"  $k%-50s $v\n") }
      if (kafkaConfig.nonEmpty) {
        b.append("  kafka:\n")
        kafkaConfig.foreach { case (k, v) => b.append(s"    $k: $v\n") }
      }
      b.result()
    }
  }

  object Report {
    /** analyze_spark_eventlog.py:1086-1100 — the settings an operator
      * reads first when sizing the app. */
    val ConfigKeysOfInterest: Seq[String] = Seq(
      "spark.app.name",
      "spark.scheduler.mode",
      "spark.driver.memory",
      "spark.driver.cores",
      "spark.executor.memory",
      "spark.executor.cores",
      "spark.executor.instances",
      "spark.dynamicAllocation.enabled",
      "spark.sql.shuffle.partitions",
      "spark.sql.caseSensitive",
      "spark.sql.session.timeZone",
      "spark.sql.defaultCatalog",
      "spark.yarn.maxAppAttempts")
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

  /** All event-log JSON lines under `dir`. Handles both layouts:
    * single-file logs (Spark ≤3 default: one `app-…[.codec]` per app)
    * and the rolling v2 layout Spark 4 writes by default
    * (`eventlog_v2_<appId>/events_<seq>_<appId>[.codec]` plus an
    * `appstatus_…` marker), segments ordered by sequence number. */
  def readEventLogDir(dir: Path): Seq[String] = {
    // Files.list streams hold an open directory fd until closed — a
    // monitoring loop calling this repeatedly would leak descriptors
    def listAll(d: Path): Seq[Path] = {
      val s = Files.list(d)
      try s.iterator().asScala.toSeq finally s.close()
    }
    val entries = listAll(dir)
    val flat = entries
      .filter(Files.isRegularFile(_))
      .map(p => (0L, p))
    val rolled = entries
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("eventlog_v2_"))
      .flatMap(listAll)
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("events_"))
      .map { p =>
        val seq = p.getFileName.toString.split("_").lift(1)
          .flatMap(_.toLongOption).getOrElse(0L)
        (seq, p)
      }
    (flat ++ rolled)
      .filterNot { case (_, p) =>
        val n = p.getFileName.toString
        n.startsWith(".") || n.startsWith("appstatus")
      }
      .sortBy { case (seq, p) => (seq, p.getFileName.toString) }
      .flatMap { case (_, p) => readLines(p) }
  }

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

    // topic timeline (analyze_topic_timeline :144-250): job-group id →
    // first description line, envelope = min(submission)..max(completion)
    val jobEnds = ofType("SparkListenerJobEnd")
      .map(e => e.path("Job ID").asLong() -> e.path("Completion Time").asLong())
      .toMap
    case class JobRow(id: Long, group: String, topic: String, submitted: Long)
    val jobRows = ofType("SparkListenerJobStart").map { e =>
      val props = e.path("Properties")
      JobRow(
        e.path("Job ID").asLong(),
        props.path("spark.jobGroup.id").asText(""),
        props.path("spark.job.description").asText("").split("\n").head.trim,
        e.path("Submission Time").asLong())
    }
    val timeline = jobRows
      .filter(j => j.group.nonEmpty && j.topic.nonEmpty)
      .groupBy(j => (j.group, j.topic)).toSeq
      .flatMap { case ((_, topic), js) =>
        val starts = js.map(_.submitted).filter(_ > 0)
        val ends = js.flatMap(j => jobEnds.get(j.id)).filter(_ > 0)
        if (starts.isEmpty || ends.isEmpty) None
        else Some(TopicTimeline(topic, starts.min, ends.max, js.size))
      }
      .sortBy(_.startMs)

    // memory decomposition (analyze_memory :605-774): heap from
    // BlockManagerAdded, peak/spill/IO from successful TaskEnds
    // heap per block manager, the driver's included: in cluster logs no
    // task reports executor id "driver" so the reference's exclusion is
    // preserved implicitly, while local-mode logs (all tasks on the
    // driver) still get a real heap denominator
    val executorHeap = ofType("SparkListenerBlockManagerAdded")
      .flatMap { e =>
        val eid = e.path("Block Manager ID").path("Executor ID").asText("")
        if (eid.isEmpty) None
        else Some(eid -> e.path("Maximum Memory").asLong())
      }.toMap
    case class MemTask(eid: String, peak: Long, diskSpill: Long, memSpill: Long,
        input: Long, shufRead: Long, shufWrite: Long)
    val memTasks = ofType("SparkListenerTaskEnd").flatMap { e =>
      val info = e.path("Task Info")
      if (info.path("Failed").asBoolean(false)) None
      else {
        val m = e.path("Task Metrics")
        val sr = m.path("Shuffle Read Metrics")
        Some(MemTask(
          info.path("Executor ID").asText(""),
          m.path("Peak Execution Memory").asLong(),
          m.path("Disk Bytes Spilled").asLong(),
          m.path("Memory Bytes Spilled").asLong(),
          m.path("Input Metrics").path("Bytes Read").asLong(),
          sr.path("Remote Bytes Read").asLong() + sr.path("Local Bytes Read").asLong(),
          m.path("Shuffle Write Metrics").path("Shuffle Bytes Written").asLong()))
      }
    }
    val memExecutors = memTasks.groupBy(_.eid).toSeq.map { case (eid, ts) =>
      ExecutorMemory(eid, executorHeap.getOrElse(eid, 0L),
        ts.map(_.peak).max, ts.map(_.diskSpill).sum, ts.map(_.memSpill).sum)
    }.sortBy(_.executorId)
    val memory = MemoryReport(
      memExecutors,
      memTasks.map(_.diskSpill).sum,
      memTasks.map(_.memSpill).sum,
      memTasks.map(_.input).sum,
      memTasks.map(_.shufRead).sum,
      memTasks.map(_.shufWrite).sum)

    // streaming progress (analyze_streaming :1002-1070)
    val streaming = ofType(
      "org.apache.spark.sql.streaming.StreamingQueryListener$QueryProgressEvent")
      .map { e =>
        val p = e.path("progress")
        StreamingBatch(p.path("name").asText(""), p.path("batchId").asLong(),
          p.path("numInputRows").asLong(),
          p.path("inputRowsPerSecond").asDouble(0.0),
          p.path("processedRowsPerSecond").asDouble(0.0))
      }

    // streaming query lifecycle: started → (optional) terminated with
    // the exception that killed it
    val terminated = ofType(
      "org.apache.spark.sql.streaming.StreamingQueryListener$QueryTerminatedEvent")
      .map(e => e.path("runId").asText("") ->
        Option(e.path("exception")).filter(n => !n.isNull && !n.isMissingNode)
          .map(_.asText("")).filter(_.nonEmpty))
      .toMap
    val streamingQueries = ofType(
      "org.apache.spark.sql.streaming.StreamingQueryListener$QueryStartedEvent")
      .map { e =>
        val rid = e.path("runId").asText("")
        StreamingQueryInfo(rid, e.path("name").asText(""),
          terminated.get(rid).flatten, terminated.contains(rid))
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
      streaming, config, timeline, memory, streamingQueries)
  }

  def analyzeDir(dir: Path): Report = analyze(readEventLogDir(dir))
}
