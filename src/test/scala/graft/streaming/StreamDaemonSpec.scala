package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.ledger.Watermark
import graft.store.LakeCatalog

class StreamDaemonSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("daemon").toString

  test("signal lifecycle: build, request, check, cleanup") {
    val root = tmp()
    val p = Signal.buildSignalPath(root, "dag7")
    p shouldBe s"$root/spark/signal/dag7"
    Signal.checkStopSignal(spark, p) shouldBe false
    Signal.requestStop(spark, p)
    Signal.checkStopSignal(spark, p) shouldBe true
    Signal.cleanupStopSignal(spark, p)
    Signal.checkStopSignal(spark, p) shouldBe false
  }

  test("interruptibleSleep returns early on signal") {
    val p = Signal.buildSignalPath(tmp(), "d")
    Signal.requestStop(spark, p)
    val t0 = System.nanoTime()
    Signal.interruptibleSleep(spark, p, seconds = 30, pollSeconds = 0.05) shouldBe true
    (System.nanoTime() - t0) / 1e9 should be < 5.0
  }

  test("runTopicsConcurrently bounds concurrency and collects errors") {
    val active = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val errors = StreamRunner.runTopicsConcurrently(
      spark, (1 to 6).map(i => s"t$i"), concurrency = 2) { topic =>
      val now = active.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, now))
      Thread.sleep(50)
      active.decrementAndGet()
      if (topic == "t3") throw new RuntimeException("boom-t3")
    }
    maxSeen.get() should be <= 2
    errors.map(_._1) shouldBe Seq("t3")
    errors.head._2.getMessage shouldBe "boom-t3"
  }

  test("daemon: rounds run until signal; compaction phase fires for modified tables") {
    val cat = new LakeCatalog(spark, tmp())
    Watermark.ensureWatermarkTables(cat)
    cat.createDatabase("s")
    import spark.implicits._
    cat.table("s.d1").createOrReplace(Seq((1L, "a")).toDF("id", "v").repartition(4))

    val signalPath = Signal.buildSignalPath(tmp(), "dag")
    val daemon = new StreamDaemon(spark, cat, Seq("p.s.t1"), "dag",
      concurrency = 1, roundIntervalSec = 0, compactionIntervalSec = 0,
      signalPath = signalPath)
    val rounds = new AtomicInteger(0)
    val (ran, clean) = daemon.run { _ =>
      daemon.tracker.mark("s.d1")
      if (rounds.incrementAndGet() >= 2) Signal.requestStop(spark, signalPath)
    }
    clean shouldBe true
    ran shouldBe 2
    // compaction phase recorded ledger rows for the modified table
    val procs = cat.table(Watermark.MaintenanceTable).read
      .select("procedure_type", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    procs should contain(("rewrite_data_files", "success"))
    // signal cleaned up on exit
    Signal.checkStopSignal(spark, signalPath) shouldBe false
  }

  test("daemon exits uncleanly after max consecutive failures") {
    val cat = new LakeCatalog(spark, tmp())
    Watermark.ensureWatermarkTables(cat)
    val daemon = new StreamDaemon(spark, cat, Seq("p.s.t1"), "dag",
      concurrency = 1, roundIntervalSec = 0, maxConsecutiveFailures = 3,
      signalPath = Signal.buildSignalPath(tmp(), "dag"))
    val (rounds, clean) = daemon.run(_ => throw new RuntimeException("always fails"))
    clean shouldBe false
    rounds shouldBe 3
  }
}
