package graft.streaming

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** transformWithState abandonment monitor: event-time timers close
  * quiet sessions, RocksDB state store (the API requires it). */
class SessionMonitorSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDf(rows: (Long, String, Long, String)*): DataFrame =
    rows.map { case (id, t, uid, typ) => (id, ts(t), uid, typ) }
      .toDF("event_id", "ts", "user_id", "event_type")

  private def writeBatch(df: DataFrame, dir: String, seq: Int): Unit = {
    val tmp = Files.createTempDirectory("sm-batch").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$seq%03d.parquet")
    Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + seq * 60000L)
  }

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def runStream(src: String, name: String): Seq[(Long, String, Long, Long)] = {
    val ckpt = Files.createTempDirectory("sm-ckpt").toString
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    try {
      val q = SessionMonitor.abandonedSessions(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getLong(3)))
      .toSeq.sorted
  }

  test("the event-time timer closes a quiet clicked session — no follow-up event needed") {
    val src = Files.createTempDirectory("sm-t-src").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),
      (2L, "2026-01-01 10:10:00", 1L, "view")), src, 1)
    // watermark sentinel for ANOTHER user, view-only (never emits
    // itself): event time 16:00, delay 2 h → watermark 14:00 > user 1's
    // 10:10 + 2 h horizon → the TIMER fires and closes the session
    writeBatch(eventsDf((9L, "2026-01-01 16:00:00", 99L, "view")), src, 2)
    val out = runStream(src, "sm_t")
    out shouldBe Seq((1L, "2026-01-01 10:10:00.0", 2L, 1L))
  }

  test("a purchase in the session suppresses the abandonment event") {
    val src = Files.createTempDirectory("sm-p-src").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),
      (2L, "2026-01-01 10:05:00", 1L, "purchase")), src, 1)
    writeBatch(eventsDf((9L, "2026-01-01 16:00:00", 99L, "view")), src, 2)
    runStream(src, "sm_p") shouldBe empty
  }

  test("a gap splits sessions: the first emits on the next event's arrival") {
    val src = Files.createTempDirectory("sm-g-src").toString
    writeBatch(eventsDf((1L, "2026-01-01 10:00:00", 1L, "click")), src, 1)
    // >2h later: closes session 1 (abandoned) and opens session 2,
    // which then purchases — only session 1 emits
    writeBatch(eventsDf(
      (2L, "2026-01-01 13:00:00", 1L, "click"),
      (3L, "2026-01-01 13:10:00", 1L, "purchase")), src, 2)
    writeBatch(eventsDf((9L, "2026-01-01 20:00:00", 99L, "view")), src, 3)
    val out = runStream(src, "sm_g")
    out shouldBe Seq((1L, "2026-01-01 10:00:00.0", 1L, 1L))
  }

  test("stream output equals the batch path once the watermark passes every horizon") {
    val rows = Seq(
      (1L, "2026-01-01 09:00:00", 1L, "click"),
      (2L, "2026-01-01 09:30:00", 1L, "view"),
      (3L, "2026-01-01 12:30:00", 1L, "click"),    // new session (gap > 2h)
      (4L, "2026-01-01 12:45:00", 1L, "purchase"), // converts session 2
      (5L, "2026-01-01 09:10:00", 2L, "view"),     // no click: never emits
      (6L, "2026-01-01 10:00:00", 3L, "click"))
    val src = Files.createTempDirectory("sm-par-src").toString
    rows.grouped(2).zipWithIndex.foreach { case (g, i) => writeBatch(eventsDf(g: _*), src, i + 1) }
    writeBatch(eventsDf((9L, "2026-01-02 10:00:00", 99L, "view")), src, 9)
    val streamed = runStream(src, "sm_par")
    val batch = SessionMonitor.abandonedSessions(
      eventsDf(rows: _*).unionByName(eventsDf((9L, "2026-01-02 10:00:00", 99L, "view"))))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    streamed shouldBe batch
    streamed.map(_._1) shouldBe Seq(1L, 3L)
  }

  // -----------------------------------------------------------------
  // TTL/eviction battery (the state-TTL dimension of transformWithState
  // — processing-time-based, hence spec-pinned rather than
  // oracle-checked). Each scenario runs the stream MULTIPLE times over
  // the SAME checkpoint with new source files between runs: state must
  // survive the restart inside its TTL, be evicted past it, and have
  // its clock refreshed by updates.
  // -----------------------------------------------------------------

  /** One single-batch pass of [[SessionMonitor.activityCounts]] over
    * `src` resuming from `ckpt`; returns this run's (user, n) rows.
    * Trigger.Once, NOT AvailableNow: a ProcessingTime-mode
    * transformWithState keeps answering `shouldRunAnotherBatch = true`
    * (each new batch timestamp may expire TTLs/timers), so AvailableNow
    * never drains — it loops empty micro-batches forever. Once runs
    * exactly one batch over everything new and stops. */
  private def runTtl(src: String, ckpt: String, name: String,
      ttl: java.time.Duration): Seq[(Long, Long)] = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    // foreachBatch, not the memory sink: only recoverable sinks may
    // resume from a checkpoint, and resuming is the whole point here
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    try {
      val q = SessionMonitor.activityCounts(
        spark.readStream.schema(schema).parquet(src), ttl)
        .writeStream.queryName(name)
        .foreachBatch { (df: DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.Once()).start()
      q.awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    buf.synchronized(buf.toSeq.sorted)
  }

  test("TTL state survives a stream restart inside its TTL") {
    val src = Files.createTempDirectory("sm-ttl-a-src").toString
    val ckpt = Files.createTempDirectory("sm-ttl-a-ck").toString
    val ttl = java.time.Duration.ofHours(1)
    writeBatch(eventsDf((1L, "2026-01-01 10:00:00", 1L, "click")), src, 1)
    runTtl(src, ckpt, "ttl_a1", ttl) shouldBe Seq((1L, 1L))
    writeBatch(eventsDf((2L, "2026-01-01 10:01:00", 1L, "view")), src, 2)
    // same checkpoint: only the new file is processed and the count
    // CONTINUES — the state outlived the restart
    runTtl(src, ckpt, "ttl_a2", ttl) shouldBe Seq((1L, 2L))
  }

  test("idle state is EVICTED once the TTL passes: the count restarts from zero") {
    val src = Files.createTempDirectory("sm-ttl-b-src").toString
    val ckpt = Files.createTempDirectory("sm-ttl-b-ck").toString
    val ttl = java.time.Duration.ofMillis(150)
    writeBatch(eventsDf((1L, "2026-01-01 10:00:00", 1L, "click")), src, 1)
    runTtl(src, ckpt, "ttl_b1", ttl) shouldBe Seq((1L, 1L))
    Thread.sleep(1000) // idle well past the TTL
    writeBatch(eventsDf((2L, "2026-01-01 10:01:00", 1L, "view")), src, 2)
    // the store evicted the expired value: the returning user is new
    runTtl(src, ckpt, "ttl_b2", ttl) shouldBe Seq((1L, 1L))
  }

  test("an update inside the TTL refreshes the clock (sliding, not absolute, expiry)") {
    val src = Files.createTempDirectory("sm-ttl-c-src").toString
    val ckpt = Files.createTempDirectory("sm-ttl-c-ck").toString
    // margins (r14, was 4 s TTL / 2.5 s sleeps): each restart pays a
    // parquet write + full streaming-query start + RocksDB checkpoint
    // restore, which on a loaded host could eat the old ~1.5 s slack
    // and evict state that the test asserts alive. 10 s TTL with 6 s
    // sleeps keeps the sliding-vs-absolute discrimination (6+6 > 10,
    // so an absolute clock is guaranteed expired at the third batch —
    // overhead only widens that gap) while leaving ~4 s of restart
    // slack per hop; a pathologically slow hop CANCELS instead of
    // failing, because the property is unobservable once the hop
    // itself outlived the TTL.
    val ttl = java.time.Duration.ofSeconds(10)
    def hopWithinTtl[A](armedAtNanos: Long, sleepMs: Long)(run: => A): A = {
      Thread.sleep(sleepMs)
      val out = run
      assume(System.nanoTime() - armedAtNanos < ttl.toNanos,
        s"host too slow: the batch hop itself outlived the ${ttl.getSeconds} s " +
          "TTL, sliding-expiry is unobservable here")
      out
    }
    writeBatch(eventsDf((1L, "2026-01-01 10:00:00", 1L, "click")), src, 1)
    // capture BEFORE the arming batch runs: the TTL clock is armed
    // while c1 processes, so measuring from after runTtl returned would
    // under-count elapsed time and let a slow query start/shutdown eat
    // the TTL before the guard even starts watching — the guard must
    // bound the full arm-to-check interval (over-counting only makes
    // it cancel earlier, the safe direction)
    val armed1 = System.nanoTime()
    runTtl(src, ckpt, "ttl_c1", ttl) shouldBe Seq((1L, 1L))
    var armed2 = 0L
    val r2 = hopWithinTtl(armed1, 6000) {
      writeBatch(eventsDf((2L, "2026-01-01 10:01:00", 1L, "view")), src, 2)
      armed2 = System.nanoTime() // before c2 processes (and re-arms)
      runTtl(src, ckpt, "ttl_c2", ttl)
    }
    // 6 s elapsed < 10 s TTL: alive, and the update re-arms the clock
    r2 shouldBe Seq((1L, 2L))
    val r3 = hopWithinTtl(armed2, 6000) {
      writeBatch(eventsDf((3L, "2026-01-01 10:02:00", 1L, "view")), src, 3)
      runTtl(src, ckpt, "ttl_c3", ttl)
    }
    // 12+ s since the FIRST write (past the 10 s TTL) but only ~6 s
    // since the refresh: an absolute-expiry implementation would have
    // evicted (n back to 1); sliding TTL keeps the count going
    r3 shouldBe Seq((1L, 3L))
  }
}
