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
}
