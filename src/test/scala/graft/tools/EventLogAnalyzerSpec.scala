package graft.tools

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EventLogAnalyzerSpec extends AnyFunSuite with Matchers {

  private def taskEnd(stage: Long, exec: String, launch: Long, finish: Long,
      run: Long, cpuMs: Long, gc: Long, wait: Long = 0, spill: Long = 0): String =
    s"""{"Event":"SparkListenerTaskEnd","Stage ID":$stage,
       "Task Info":{"Executor ID":"$exec","Launch Time":$launch,"Finish Time":$finish},
       "Task Metrics":{"Executor Run Time":$run,"Executor CPU Time":${cpuMs * 1000000},
         "JVM GC Time":$gc,"Memory Bytes Spilled":$spill,
         "Shuffle Read Metrics":{"Fetch Wait Time":$wait}}}""".replaceAll("\n", "")

  private val lines = Seq(
    """{"Event":"SparkListenerJobStart","Job ID":1,"Properties":{"spark.scheduler.pool":"topic-a"}}""",
    """{"Event":"SparkListenerJobStart","Job ID":2,"Properties":{"spark.scheduler.pool":"topic-a"}}""",
    """{"Event":"SparkListenerJobStart","Job ID":3,"Properties":{}}""",
    // stage 10: balanced (100ms each); stage 20: skewed (100,100,12000)
    taskEnd(10, "1", 0, 100, 100, 80, 2),
    taskEnd(10, "2", 0, 110, 100, 85, 3),
    taskEnd(20, "1", 0, 100, 100, 50, 0),
    taskEnd(20, "1", 0, 100, 100, 50, 0),
    taskEnd(20, "2", 0, 12000, 12000, 2000, 2000, wait = 100, spill = 4096),
    """{"Event":"org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart","executionId":1,"description":"MERGE INTO t USING s","time":1000}""",
    """{"Event":"org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd","executionId":1,"time":1500}""",
    """{"Event":"org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart","executionId":2,"description":"select * from x","time":2000}""",
    """{"Event":"org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd","executionId":2,"time":2100}""",
    """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryProgressEvent","progress":{"name":"pfx.db.t1","batchId":7,"numInputRows":1234}}""",
    """{"Event":"SparkListenerEnvironmentUpdate","Spark Properties":{"spark.sql.shuffle.partitions":"32","spark.scheduler.mode":"FAIR"}}""",
    "not json at all" // tolerated
  )

  test("full report: pools, skew, gc, cpu, executors, sql, streaming, config") {
    val r = EventLogAnalyzer.analyze(lines)

    r.pools("topic-a") shouldBe Seq(1L, 2L)
    r.pools("default") shouldBe Seq(3L)

    val skewed = r.skewedStages
    skewed.map(_.stageId) shouldBe Seq(20L)
    skewed.head.medianMs shouldBe 100L
    skewed.head.maxMs shouldBe 12000L
    skewed.head.skewRatio shouldBe 120.0
    skewed.head.serious shouldBe true
    r.stageSkew.find(_.stageId == 10).get.skewed shouldBe false

    // GC: (2+3+0+0+2000) / (100+100+100+100+12000)
    r.gcSharePct shouldBe (2005.0 / 12400 * 100) +- 0.01
    r.gcHealth shouldBe "critical"
    r.cpuHealth shouldBe "io-or-shuffle-bound" // skewed stage mostly waiting

    val e2 = r.executors.find(_.executorId == "2").get
    e2.tasks shouldBe 2
    e2.shuffleReadWaitMs shouldBe 100L
    e2.bytesSpilled shouldBe 4096L

    r.sql.map(s => s.statementType -> s.count).toMap shouldBe
      Map("MERGE" -> 1, "SELECT" -> 1)
    r.sql.find(_.statementType == "MERGE").get.maxMs shouldBe 500L

    r.streaming shouldBe Seq(
      EventLogAnalyzer.StreamingBatch("pfx.db.t1", 7L, 1234L))
    r.config("spark.scheduler.mode") shouldBe "FAIR"
  }

  test("config table: keys-of-interest order, N/A fill, kafka props") {
    val r = EventLogAnalyzer.analyze(lines :+
      """{"Event":"SparkListenerEnvironmentUpdate","Spark Properties":{
         "spark.sql.shuffle.partitions":"32","spark.scheduler.mode":"FAIR",
         "spark.kafka.bootstrap.servers":"b1:9092","spark.executor.memory":"4g"}}"""
        .replaceAll("\n", ""))

    // the reference's fixed table: every key present, in its order,
    // N/A where the log has no value
    val table = r.configOfInterest
    table.map(_._1) shouldBe EventLogAnalyzer.Report.ConfigKeysOfInterest
    table.toMap.apply("spark.executor.memory") shouldBe "4g"
    table.toMap.apply("spark.sql.shuffle.partitions") shouldBe "32"
    table.toMap.apply("spark.executor.instances") shouldBe "N/A"
    table.toMap.apply("spark.yarn.maxAppAttempts") shouldBe "N/A"

    r.kafkaConfig shouldBe Seq("spark.kafka.bootstrap.servers" -> "b1:9092")
  }

  test("render emits every section from the structured fields") {
    val r = EventLogAnalyzer.analyze(lines)
    val out = r.render
    (1 to 9).foreach(i => out should include(s"== $i."))
    out should include("topic-a")
    out should include("SERIOUS") // stage 20's 120x skew
    out should include("(critical)") // gc health
    out should include("MERGE")
    out should include("spark.sql.shuffle.partitions")
    out should include("N/A") // keys-of-interest absent from the log
  }

  test("healthy log: no skew, normal gc, balanced cpu") {
    val healthy = Seq(
      taskEnd(1, "1", 0, 100, 100, 70, 1),
      taskEnd(1, "2", 0, 105, 100, 65, 2))
    val r = EventLogAnalyzer.analyze(healthy)
    r.skewedStages shouldBe empty
    r.gcHealth shouldBe "normal"
    r.cpuHealth shouldBe "balanced"
  }

  private def jobStart(id: Long, group: String, topic: String, submitted: Long): String =
    s"""{"Event":"SparkListenerJobStart","Job ID":$id,"Submission Time":$submitted,
       "Properties":{"spark.jobGroup.id":"$group","spark.job.description":"$topic\\nstage detail"}}"""
      .replaceAll("\n", "")

  private def jobEnd(id: Long, completed: Long): String =
    s"""{"Event":"SparkListenerJobEnd","Job ID":$id,"Completion Time":$completed}"""

  test("topic timeline: job-group envelopes, concurrency, gantt bars") {
    val log = Seq(
      jobStart(1, "g-a", "pfx.db.topic_a", 1000), jobEnd(1, 3000),
      jobStart(2, "g-a", "pfx.db.topic_a", 3500), jobEnd(2, 5000),
      jobStart(3, "g-b", "pfx.db.topic_b", 2000), jobEnd(3, 4000),
      jobStart(4, "g-c", "pfx.db.topic_c", 6000), jobEnd(4, 7000))
    val r = EventLogAnalyzer.analyze(log)
    r.timeline.map(t => (t.topic, t.startMs, t.endMs, t.jobCount)) shouldBe Seq(
      ("pfx.db.topic_a", 1000L, 5000L, 2),
      ("pfx.db.topic_b", 2000L, 4000L, 1),
      ("pfx.db.topic_c", 6000L, 7000L, 1))
    r.timeline.head.durationMs shouldBe 4000L
    // a and b overlap in [2000,4000]; c runs alone
    r.maxConcurrentTopics shouldBe 2
    val gantt = r.ganttLines(width = 12)
    gantt should have size 3
    // topic_a spans the first 2/3 of the window, topic_c the last 1/6
    gantt.head should include("topic_a")
    gantt.head.count(_ == '#') shouldBe 8
    gantt.last.count(_ == '#') shouldBe 2
    gantt.last should endWith("#|")
  }

  test("memory report: heap, peak, spill, IO totals and health bands") {
    def memTask(eid: String, peak: Long, disk: Long, mem: Long,
        input: Long, sr: Long, sw: Long, failed: Boolean = false): String =
      s"""{"Event":"SparkListenerTaskEnd","Stage ID":1,
         "Task Info":{"Executor ID":"$eid","Launch Time":0,"Finish Time":10,"Failed":$failed},
         "Task Metrics":{"Executor Run Time":10,"Executor CPU Time":8000000,
           "Peak Execution Memory":$peak,"Disk Bytes Spilled":$disk,
           "Memory Bytes Spilled":$mem,
           "Input Metrics":{"Bytes Read":$input},
           "Shuffle Read Metrics":{"Remote Bytes Read":${sr / 2},"Local Bytes Read":${sr - sr / 2}},
           "Shuffle Write Metrics":{"Shuffle Bytes Written":$sw}}}""".replaceAll("\n", "")
    def bmAdded(eid: String, maxMem: Long): String =
      s"""{"Event":"SparkListenerBlockManagerAdded",
         "Block Manager ID":{"Executor ID":"$eid"},"Maximum Memory":$maxMem}"""
        .replaceAll("\n", "")
    val log = Seq(
      bmAdded("driver", 999999), // excluded
      bmAdded("1", 1000), bmAdded("2", 1000),
      memTask("1", peak = 600, disk = 0, mem = 0, input = 100, sr = 40, sw = 50),
      memTask("1", peak = 900, disk = 0, mem = 0, input = 100, sr = 0, sw = 0),
      memTask("2", peak = 300, disk = 0, mem = 128, input = 50, sr = 10, sw = 10),
      memTask("2", peak = 999999, disk = 1, mem = 1, input = 1, sr = 1, sw = 1,
        failed = true)) // failed tasks excluded, like the reference
    val r = EventLogAnalyzer.analyze(log)
    val m = r.memory
    m.executors.map(_.executorId) shouldBe Seq("1", "2")
    val e1 = m.executors.head
    e1.heapBytes shouldBe 1000L
    e1.peakExecBytes shouldBe 900L // max across tasks, not sum
    e1.usagePct shouldBe 90.0 +- 0.01
    m.totalMemSpill shouldBe 128L
    m.totalDiskSpill shouldBe 0L
    m.totalInputBytes shouldBe 250L
    m.totalShuffleRead shouldBe 50L
    m.totalShuffleWrite shouldBe 60L
    m.avgUsagePct shouldBe 60.0 +- 0.01
    m.memoryHealth shouldBe "adequate"
    // band edges: any disk spill wins; low usage = over-provisioned
    EventLogAnalyzer.MemoryReport(m.executors, 1, 0, 0, 0, 0)
      .memoryHealth shouldBe "spilling"
    EventLogAnalyzer.MemoryReport(
      Seq(EventLogAnalyzer.ExecutorMemory("1", 1000, 100, 0, 0)), 0, 0, 0, 0, 0)
      .memoryHealth shouldBe "over-provisioned"
  }

  test("streaming queries: lifecycle, rates, failure surface") {
    val log = Seq(
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryStartedEvent","runId":"r1","name":"q_ok"}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryStartedEvent","runId":"r2","name":"q_bad"}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryProgressEvent","progress":{"name":"q_ok","batchId":0,"numInputRows":500,"inputRowsPerSecond":250.0,"processedRowsPerSecond":125.5}}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryTerminatedEvent","runId":"r1"}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryTerminatedEvent","runId":"r2","exception":"boom at stage 3"}""")
    val r = EventLogAnalyzer.analyze(log)
    r.streamingQueries.map(q => (q.name, q.succeeded)) shouldBe
      Seq(("q_ok", true), ("q_bad", false))
    r.streamingQueries.last.exception.get should include("boom")
    // a query with NO terminated event (still running, or the driver
    // died without one) must not read as success
    val r2 = EventLogAnalyzer.analyze(log.take(2))
    r2.streamingQueries.map(_.succeeded) shouldBe Seq(false, false)
    r2.streamingQueries.head.lifecycle should include("no-terminated-event")
    // unknown heap (BlockManagerAdded rolled away) reports 0 usage, not
    // an astronomical 1-byte-denominator percentage
    EventLogAnalyzer.ExecutorMemory("9", 0, 4L << 30, 0, 0).usagePct shouldBe 0.0
    EventLogAnalyzer.MemoryReport(
      Seq(
        EventLogAnalyzer.ExecutorMemory("1", 1000, 600, 0, 0),
        EventLogAnalyzer.ExecutorMemory("9", 0, 4L << 30, 0, 0)),
      0, 0, 0, 0, 0).avgUsagePct shouldBe 60.0 +- 0.01
    val b = r.streaming.head
    b.inputRowsPerSec shouldBe 250.0
    b.processedRowsPerSec shouldBe 125.5
  }

  test("rendered streaming section: reference's per-batch rate table + summary") {
    val log = Seq(
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryStartedEvent","runId":"r1","name":"pfx.shop.orders"}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryStartedEvent","runId":"r2","name":"pfx.shop.events"}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryProgressEvent","progress":{"name":"pfx.shop.orders","batchId":0,"numInputRows":500,"inputRowsPerSecond":250.0,"processedRowsPerSecond":125.5}}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryProgressEvent","progress":{"name":"pfx.shop.orders","batchId":1,"numInputRows":0,"inputRowsPerSecond":0.0,"processedRowsPerSecond":0.0}}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryProgressEvent","progress":{"name":"pfx.shop.events","batchId":0,"numInputRows":12345,"inputRowsPerSecond":6172.5,"processedRowsPerSecond":4321.9}}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryTerminatedEvent","runId":"r1"}""",
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryTerminatedEvent","runId":"r2","exception":"boom at stage 3\n  at Foo.bar"}""")
    val r = EventLogAnalyzer.analyze(log)

    // table shape = the reference's columns (:1038-1046): header, rule,
    // one row per progress event in log order
    val table = r.streamingBatchTable
    table.head shouldBe
      f"${"Query Name"}%-55s ${"Batch"}%6s ${"Rows"}%10s ${"In/s"}%10s ${"Out/s"}%10s"
    table(1) shouldBe "-" * 95
    table(2) shouldBe
      f"${"pfx.shop.orders"}%-55s ${0L}%6d ${500L}%10d ${250.0}%9.1f ${125.5}%9.1f"
    table(3) should include(f"${0L}%10d") // availableNow's empty flush row
    table(4) should (include("pfx.shop.events") and include("6172.5") and
      include("4321.9"))
    table should have length 5
    r.avgBatchesPerQuery shouldBe 1.5

    // the rendered report carries summary, failed list, table, average
    val render = r.render
    render should include("2 streaming queries (ok: 1, failed: 1)")
    render should include("FAILED pfx.shop.events: boom at stage 3")
    render should include(table(2))
    render should include("avg batches per query: 1.5")
    // a long query name truncates at 53 like the reference's name[:53]
    val long = EventLogAnalyzer.analyze(Seq(
      """{"Event":"org.apache.spark.sql.streaming.StreamingQueryListener$QueryProgressEvent","progress":{"name":"""" +
        "x" * 80 + """","batchId":0,"numInputRows":1}}"""))
    long.streamingBatchTable(2).take(55).trim shouldBe "x" * 53
  }

  test("zstd-compressed event logs decompress transparently") {
    val dir = Files.createTempDirectory("evlog")
    val raw = lines.mkString("\n").getBytes("UTF-8")
    val compressed = com.github.luben.zstd.Zstd.compress(raw)
    Files.write(dir.resolve("events_1_app.zstd"), compressed)
    val r = EventLogAnalyzer.analyzeDir(dir)
    r.pools("topic-a") shouldBe Seq(1L, 2L)
    r.skewedStages.map(_.stageId) shouldBe Seq(20L)
  }

  test("rolling v2 layout: eventlog_v2_ dirs, segment order, markers skipped") {
    val dir = Files.createTempDirectory("evlog2")
    val app = Files.createDirectory(dir.resolve("eventlog_v2_local-42"))
    // events_10 sorts numerically AFTER events_2 (lexicographic would not)
    Files.write(app.resolve("events_2_local-42"),
      jobStart(1, "g", "db.t", 100).getBytes("UTF-8"))
    Files.write(app.resolve("events_10_local-42"),
      jobEnd(1, 500).getBytes("UTF-8"))
    Files.write(app.resolve("appstatus_local-42"), Array.emptyByteArray)
    Files.write(app.resolve(".appstatus_local-42.crc"), Array[Byte](1, 2))
    val r = EventLogAnalyzer.analyzeDir(dir)
    r.timeline.map(t => (t.topic, t.endMs)) shouldBe Seq(("db.t", 500L))
  }
}
