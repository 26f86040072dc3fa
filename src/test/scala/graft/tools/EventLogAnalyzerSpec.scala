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

  test("healthy log: no skew, normal gc, balanced cpu") {
    val healthy = Seq(
      taskEnd(1, "1", 0, 100, 100, 70, 1),
      taskEnd(1, "2", 0, 105, 100, 65, 2))
    val r = EventLogAnalyzer.analyze(healthy)
    r.skewedStages shouldBe empty
    r.gcHealth shouldBe "normal"
    r.cpuHealth shouldBe "balanced"
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
}
