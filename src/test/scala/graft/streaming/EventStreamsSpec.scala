package graft.streaming

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write one parquet file into `dir` with a controlled mtime so the
    * file stream source picks batches up in a deterministic order. */
  private def writeBatch(df: DataFrame, dir: String, seq: Int): Unit = {
    val tmp = Files.createTempDirectory("es-batch").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$seq%03d.parquet")
    Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + seq * 60000L)
  }

  private def eventsDf(rows: (Long, String, Long, String)*): DataFrame =
    rows.map { case (id, t, uid, typ) => (id, ts(t), uid, typ) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("batch sessionize: splits on gap, withholds the open tail session") {
    val ev = eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),
      (2L, "2026-01-01 10:30:00", 1L, "click"),
      (3L, "2026-01-01 20:00:00", 1L, "click"), // > 2h after -> new session
      (4L, "2026-01-01 09:00:00", 2L, "view"))
      .select("event_id", "ts", "user_id").as[EventStreams.Event]
    val out = EventStreams.sessionize(ev, gapMs = 2L * 3600 * 1000).collect()
    // user 1's first session closed by event 3; both tails stay open
    out.toSeq shouldBe Seq(
      EventStreams.Session(1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:30:00"), 2))
  }

  test("streaming sessionize: open session state survives micro-batch boundaries") {
    val src = Files.createTempDirectory("es-src").toString
    val ckpt = Files.createTempDirectory("es-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),
      (2L, "2026-01-01 10:30:00", 1L, "click"),
      (3L, "2026-01-01 10:05:00", 2L, "view")), src, 1)
    writeBatch(eventsDf(
      (4L, "2026-01-01 20:00:00", 1L, "click")), src, 2) // closes user 1's session

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(src)
      .select("event_id", "ts", "user_id").as[EventStreams.Event]
    val q = EventStreams.sessionize(stream, gapMs = 2L * 3600 * 1000)
      .writeStream.format("memory").queryName("sessions")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // the session assembled in batch 1 is closed by batch 2's event:
    // cross-batch GroupState carried start/end/count correctly
    val rows = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    rows.toSeq shouldBe Seq(
      (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:30:00"), 2L))
  }

  test("streaming windowed counts: watermark emits closed windows, withholds live ones") {
    val src = Files.createTempDirectory("es-wc-src").toString
    val ckpt = Files.createTempDirectory("es-wc-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 00:10:00", 1L, "click"),
      (2L, "2026-01-01 00:20:00", 2L, "click"),
      (3L, "2026-01-01 01:15:00", 1L, "view")), src, 1)
    writeBatch(eventsDf(
      (4L, "2026-01-01 07:00:00", 1L, "click")), src, 2)
    writeBatch(eventsDf(
      (5L, "2026-01-01 23:30:00", 1L, "click")), src, 3) // sentinel advances the watermark

    val q = EventStreams
      .windowedTypeCounts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        windowDur = "1 hour", watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("wc")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("wc").collect()
      .map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3))).toSet
    // the 00:00 window closed once the watermark passed 01:00
    rows should contain((ts("2026-01-01 00:00:00"), "click", 2L))
    // the sentinel's own window is within the watermark delay: withheld
    rows.map(_._1) should not contain ts("2026-01-01 23:00:00")
  }

  test("watermark late-drop: an out-of-order event behind the watermark never lands") {
    val src = Files.createTempDirectory("es-late-src").toString
    val ckpt = Files.createTempDirectory("es-late-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 00:10:00", 1L, "click"),
      (2L, "2026-01-01 00:20:00", 2L, "click")), src, 1)
    writeBatch(eventsDf(
      (3L, "2026-01-01 05:00:00", 1L, "view")), src, 2) // advances max event time
    // the max seen in batch N becomes the OPERATIVE filter watermark in
    // batch N+2 (it is committed after N and applied from N+1's end),
    // so an on-time filler batch sits between the advancer and the late
    // arrival to make 03:00 the active watermark when the late row lands
    writeBatch(eventsDf(
      (4L, "2026-01-01 05:30:00", 2L, "view")), src, 3)
    writeBatch(eventsDf(
      (5L, "2026-01-01 00:30:00", 3L, "click")), src, 4) // LATE: behind wm 03:00
    writeBatch(eventsDf(
      (6L, "2026-01-01 23:30:00", 1L, "view")), src, 5) // flushes 05:00's window

    val q = EventStreams
      .windowedTypeCounts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        windowDur = "1 hour", watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("late")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val w0 = spark.table("late").collect()
      .filter(_.getTimestamp(0) == ts("2026-01-01 00:00:00"))
      .map(r => (r.getString(2), r.getLong(3))).toSeq
    // the 00:00 window closed at watermark 03:00 and emitted EXACTLY
    // once, with the on-time rows only — the late click in batch 3 was
    // dropped at ingestion, never resurrecting the closed window
    w0 shouldBe Seq(("click", 2L))

    // the BATCH run of the same pipeline has no state to protect: the
    // watermark is inert and the late event counts — the delta between
    // the two results IS the late-drop contract this spec pins
    val batchAll = eventsDf(
      (1L, "2026-01-01 00:10:00", 1L, "click"),
      (2L, "2026-01-01 00:20:00", 2L, "click"),
      (3L, "2026-01-01 05:00:00", 1L, "view"),
      (4L, "2026-01-01 05:30:00", 2L, "view"),
      (5L, "2026-01-01 00:30:00", 3L, "click"),
      (6L, "2026-01-01 23:30:00", 1L, "view"))
    val batchW0 = EventStreams
      .windowedTypeCounts(batchAll, windowDur = "1 hour", watermarkDelay = "2 hours")
      .filter(col("w_start") === ts("2026-01-01 00:00:00"))
      .collect().map(r => (r.getString(2), r.getLong(3))).toSeq
    batchW0 shouldBe Seq(("click", 3L))
  }

  test("streaming dedup within watermark drops cross-batch duplicates") {
    val src = Files.createTempDirectory("es-dd-src").toString
    val ckpt = Files.createTempDirectory("es-dd-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),
      (2L, "2026-01-01 10:05:00", 2L, "view")), src, 1)
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:10:00", 1L, "click"), // dup key within horizon
      (3L, "2026-01-01 10:20:00", 3L, "click")), src, 2)

    val q = EventStreams
      .dedupWithinWatermark(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        keys = Seq("event_id"), watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("dd")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val ids = spark.table("dd").collect().map(_.getLong(0)).sorted
    ids shouldBe Array(1L, 2L, 3L) // event 1 emitted once despite the batch-2 replay
  }

  test("batch interval join: purchases attach to preceding same-user clicks only") {
    val ev = eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),
      (2L, "2026-01-01 10:30:00", 1L, "purchase"), // 30 min after click 1 -> pair
      (3L, "2026-01-01 12:00:00", 1L, "purchase"), // > 1h after click 1 -> no pair
      (4L, "2026-01-01 09:59:00", 1L, "purchase"), // before the click -> no pair
      (5L, "2026-01-01 10:10:00", 2L, "purchase")) // other user -> no pair
    val out = EventStreams.intervalJoin(ev, horizonSec = 3600L).collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5))).toSeq shouldBe
      Seq((1L, 1L, 2L, 30L * 60 * 1000000))
  }

  test("streaming interval join pairs across micro-batches under the watermark") {
    val src = Files.createTempDirectory("es-ij-src").toString
    val ckpt = Files.createTempDirectory("es-ij-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click")), src, 1)
    writeBatch(eventsDf(
      (2L, "2026-01-01 10:40:00", 1L, "purchase"), // joins batch-1 click state
      (3L, "2026-01-01 23:00:00", 9L, "view")), src, 2) // advances the watermark

    val q = EventStreams
      .intervalJoin(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        horizonSec = 3600L, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("ij")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    spark.table("ij").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, 1L, 2L)) // the cross-batch pair, exactly once
  }

  test("streaming outer interval join emits the null row only after the watermark") {
    val src = Files.createTempDirectory("es-oj-src").toString
    val ckpt = Files.createTempDirectory("es-oj-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),   // will never match
      (2L, "2026-01-01 10:05:00", 2L, "click"),
      (3L, "2026-01-01 10:20:00", 2L, "purchase")), src, 1)
    // sentinels must pass BOTH type filters: each branch owns a watermark
    // node and the global watermark is their min, so a click-only (or
    // filtered-out) sentinel would pin the other branch at its old value
    writeBatch(eventsDf(
      (4L, "2026-01-01 23:00:00", 8L, "click"),
      (5L, "2026-01-01 23:00:00", 9L, "purchase")), src, 2)

    val q = EventStreams
      .intervalJoin(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        horizonSec = 3600L, watermarkDelay = "2 hours", joinType = "left_outer")
      .writeStream.format("memory").queryName("oj")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("oj").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // matched pair emitted with its purchase; unmatched click 1 emitted
    // exactly once with nulls, and only because the watermark proved it.
    // Sentinel click 4's own horizon is NOT yet past the watermark, so
    // the join correctly withholds it — no premature null row.
    rows shouldBe Set((2L, 3L), (1L, -1L))
  }

  test("streaming FULL outer interval join: null rows on both sides, watermark-decided") {
    val src = Files.createTempDirectory("es-foj-src").toString
    val ckpt = Files.createTempDirectory("es-foj-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),    // never matches
      (2L, "2026-01-01 10:05:00", 2L, "click"),
      (3L, "2026-01-01 10:20:00", 2L, "purchase"), // matches click 2
      (6L, "2026-01-01 09:00:00", 3L, "purchase")), src, 1) // click-less
    writeBatch(eventsDf(
      (4L, "2026-01-01 23:00:00", 8L, "click"),
      (5L, "2026-01-01 23:00:00", 9L, "purchase")), src, 2)

    val q = EventStreams
      .intervalJoin(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        horizonSec = 3600L, watermarkDelay = "2 hours", joinType = "full_outer")
      .writeStream.format("memory").queryName("foj")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("foj").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // matched pair; unmatched click 1 with null purchase; unmatched
    // purchase 6 with null click — each null row only after the
    // watermark proved no counterpart can still arrive. The sentinels'
    // own horizons aren't past the watermark, so they're withheld.
    rows shouldBe Set((2L, 2L, 3L), (1L, 1L, -1L), (3L, -1L, 6L))
  }

  test("batch semi interval join: converted clicks emit once, no pair blow-up") {
    val ev = eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),
      (2L, "2026-01-01 10:10:00", 1L, "purchase"), // match 1
      (3L, "2026-01-01 10:40:00", 1L, "purchase"), // match 2 — same click
      (4L, "2026-01-01 12:00:00", 2L, "click"),    // no purchase in horizon
      (5L, "2026-01-01 14:00:00", 2L, "purchase"))
    val out = EventStreams.intervalSemiJoin(ev, horizonSec = 3600L).collect()
    // click 1 exactly ONCE despite two matches; click 4 dropped
    out.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((1L, 1L))
  }

  test("streaming semi interval join: first match emits the click, later matches don't") {
    val src = Files.createTempDirectory("es-sj-src").toString
    val ckpt = Files.createTempDirectory("es-sj-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click")), src, 1)
    writeBatch(eventsDf(
      (2L, "2026-01-01 10:30:00", 1L, "purchase")), src, 2) // first match
    writeBatch(eventsDf(
      (3L, "2026-01-01 10:45:00", 1L, "purchase"), // second match — no re-emit
      (4L, "2026-01-01 23:00:00", 8L, "click"),
      (5L, "2026-01-01 23:00:00", 9L, "purchase")), src, 3)

    val q = EventStreams
      .intervalSemiJoin(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        horizonSec = 3600L, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("sj")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // the converted click exactly once, from the cross-batch first match
    spark.table("sj").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((1L, 1L))
  }

  test("streaming asofAttach: latest-click state enriches purchases across batches") {
    val src = Files.createTempDirectory("es-aa-src").toString
    val ckpt = Files.createTempDirectory("es-aa-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "click"),
      (2L, "2026-01-01 10:01:00", 1L, "click")), src, 1)
    writeBatch(eventsDf(
      (3L, "2026-01-01 10:30:00", 1L, "purchase"),  // state: click 2
      (4L, "2026-01-01 10:20:00", 2L, "purchase")), src, 2) // no click -> null

    val q = EventStreams
      .asofAttach(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .selectExpr("event_id", "ts", "user_id", "event_type")
        .as[EventStreams.TypedEvent])
      .toDF()
      .writeStream.format("memory").queryName("aa")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    spark.table("aa").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet shouldBe Set((3L, 2L), (4L, -1L))
  }

  test("streaming funnelProgress: stages advance across batches, strictly-after rule holds") {
    val src = Files.createTempDirectory("es-fp-src").toString
    val ckpt = Files.createTempDirectory("es-fp-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "signup"),
      (2L, "2026-01-01 09:00:00", 1L, "click"), // BEFORE signup: no advance
      (3L, "2026-01-01 10:00:00", 2L, "signup")), src, 1)
    writeBatch(eventsDf(
      (4L, "2026-01-01 11:00:00", 1L, "click"), // after signup: stage 2
      (5L, "2026-01-01 10:30:00", 2L, "purchase")), src, 2) // no click yet: stays 1
    writeBatch(eventsDf(
      (6L, "2026-01-01 12:00:00", 1L, "purchase")), src, 3) // stage 3

    val q = EventStreams
      .funnelProgress(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .selectExpr("event_id", "ts", "user_id", "event_type")
        .as[EventStreams.TypedEvent])
      .toDF()
      .writeStream.format("memory").queryName("fp")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // one progress row per (user, advance): user 1 walks 1 -> 2 -> 3,
    // user 2 enters at 1 and never advances (purchase without click)
    spark.table("fp").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap shouldBe
      Map(1L -> Seq(1, 2, 3), 2L -> Seq(1))
  }

  test("funnelProgress in batch equals the per-user funnel SQL shape") {
    val out = EventStreams.funnelProgress(eventsDf(
      (1L, "2026-01-01 10:00:00", 1L, "signup"),
      (2L, "2026-01-01 10:00:00", 1L, "click"),   // same instant: NOT after
      (3L, "2026-01-01 10:05:00", 1L, "click"),
      (4L, "2026-01-01 10:04:00", 1L, "purchase"), // before first valid click
      (5L, "2026-01-01 10:06:00", 1L, "purchase"),
      (6L, "2026-01-01 10:00:00", 3L, "click"))    // never signed up
      .selectExpr("event_id", "ts", "user_id", "event_type")
      .as[EventStreams.TypedEvent])
      .collect().map(r => (r.user_id, r.stage)).toSeq
    out shouldBe Seq((1L, 3))
  }

  test("streaming windowed top-k: rank in foreachBatch over watermark-closed windows") {
    val src = Files.createTempDirectory("es-tk-src").toString
    val ckpt = Files.createTempDirectory("es-tk-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 00:10:00", 1L, "click"),
      (2L, "2026-01-01 00:20:00", 2L, "click"),
      (3L, "2026-01-01 00:30:00", 3L, "view"),
      (4L, "2026-01-01 00:40:00", 4L, "view"),
      (5L, "2026-01-01 00:50:00", 5L, "view"),
      (6L, "2026-01-01 00:55:00", 6L, "purchase")), src, 1)
    writeBatch(eventsDf(
      (7L, "2026-01-01 23:00:00", 9L, "click")), src, 2) // closes the 00h window

    val ranked = scala.collection.mutable.ArrayBuffer[(String, Int, String, Long)]()
    val q = EventStreams
      .windowedTypeCounts(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src))
      .writeStream
      .foreachBatch { (closed: org.apache.spark.sql.DataFrame, _: Long) =>
        // append-mode batches hold only CLOSED windows: rank is final
        EventStreams.rankWindows(closed, topK = 2).collect().foreach(r =>
          ranked.synchronized {
            ranked += ((r.getTimestamp(0).toString, r.getInt(4),
              r.getString(2), r.getLong(3)))
          })
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // only the 00h window closed (23h stays open past the watermark);
    // top-2 of {view:3, click:2, purchase:1}
    ranked.filter(_._1.startsWith("2026-01-01 00")).sortBy(_._2).toList shouldBe
      List(
        ("2026-01-01 00:00:00.0", 1, "view", 3L),
        ("2026-01-01 00:00:00.0", 2, "click", 2L))
    ranked.map(_._3) should not contain "purchase"
  }

  test("stream-static enrich: each run's batches join the CURRENT dim table") {
    import spark.implicits._
    val src = Files.createTempDirectory("es-se-src").toString
    val dimPath = Files.createTempDirectory("es-se-dim").toString + "/dim"
    val ckpt = Files.createTempDirectory("es-se-ckpt").toString
    Seq((1L, "bronze")).toDF("n_key", "tier").write.parquet(dimPath)
    writeBatch(eventsDf((1L, "2026-01-01 10:00:00", 1L, "click")), src, 1)

    val seen = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    def runOnce(): Unit = {
      val dim = spark.read.parquet(dimPath)
      val q = EventStreams
        .staticEnrich(
          spark.readStream.schema(schema).parquet(src)
            .withColumn("n_key", col("user_id")),
          dim, Seq("n_key"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => seen.synchronized {
            seen += ((r.getAs[Long]("event_id"), r.getAs[String]("tier")))
          })
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // dim changes between runs; the checkpoint resumes (event 1 is NOT
    // reprocessed) and only the new event joins the new dim content
    Seq((1L, "gold")).toDF("n_key", "tier").write.mode("overwrite").parquet(dimPath)
    writeBatch(eventsDf((2L, "2026-01-01 11:00:00", 1L, "click")), src, 2)
    runOnce()

    seen.toSet shouldBe Set((1L, "bronze"), (2L, "gold"))
  }

  test("streaming thresholdAlerts: armed bit survives batches, storms suppressed") {
    val src = Files.createTempDirectory("es-ta-src").toString
    val ckpt = Files.createTempDirectory("es-ta-ckpt").toString
    def ev(id: Long, t: String, u: Long, v: Double) =
      eventsDf((id, t, u, "metric")).withColumn("value", lit(v))
    def batchOf(rows: org.apache.spark.sql.DataFrame, i: Int) = writeBatch(rows, src, i)
    batchOf(ev(1L, "2026-01-01 10:00:00", 1L, 150.0)  // alert (armed)
      .unionByName(ev(2L, "2026-01-01 10:01:00", 1L, 160.0)), 1) // suppressed
    batchOf(ev(3L, "2026-01-01 10:02:00", 1L, 170.0)  // STILL suppressed (state)
      .unionByName(ev(4L, "2026-01-01 10:03:00", 1L, 5.0)), 2)   // re-arms
    batchOf(ev(5L, "2026-01-01 10:04:00", 1L, 120.0), 3) // alerts again

    val q = EventStreams
      .thresholdAlerts(
        spark.readStream.schema(ev(0L, "2026-01-01 00:00:00", 0L, 0.0).schema)
          .option("maxFilesPerTrigger", "1").parquet(src),
        high = 100.0, low = 20.0)
      .toDF()
      .writeStream.format("memory").queryName("ta")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    spark.table("ta").collect().map(_.getAs[Long]("event_id")).sorted.toSeq shouldBe
      Seq(1L, 5L)
  }

  test("windowed unique users in batch: distinct count per window") {
    val ev = eventsDf(
      (1L, "2026-01-01 00:10:00", 1L, "click"),
      (2L, "2026-01-01 00:20:00", 1L, "click"), // same user, same window
      (3L, "2026-01-01 00:30:00", 2L, "view"),
      (4L, "2026-01-01 01:15:00", 1L, "view"))
    val out = EventStreams.windowedUniqueUsers(ev)
      .orderBy("w_start").collect()
      .map(r => (r.getTimestamp(0), r.getLong(2)))
    out.toSeq shouldBe Seq(
      (ts("2026-01-01 00:00:00"), 2L),
      (ts("2026-01-01 01:00:00"), 1L))
  }

  test("streaming windowed unique users: cross-batch dedup, watermark closes windows") {
    val src = Files.createTempDirectory("es-wu-src").toString
    val ckpt = Files.createTempDirectory("es-wu-ckpt").toString
    writeBatch(eventsDf(
      (1L, "2026-01-01 00:10:00", 1L, "click"),
      (2L, "2026-01-01 00:20:00", 2L, "click")), src, 1)
    writeBatch(eventsDf(
      (3L, "2026-01-01 00:30:00", 1L, "view")), src, 2) // same user+window, later batch
    writeBatch(eventsDf(
      (4L, "2026-01-01 23:00:00", 9L, "click")), src, 3) // advances the watermark

    val q = EventStreams
      .windowedUniqueUsers(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
        windowDur = "1 hour", watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("wu")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("wu").collect()
      .map(r => (r.getTimestamp(0), r.getLong(2)))
    // user 1's batch-2 replay inside the same window did NOT double-count
    rows.toSeq shouldBe Seq((ts("2026-01-01 00:00:00"), 2L))
  }

  test("sliding windows: each event lands in both overlapping windows") {
    val ev = eventsDf((1L, "2026-01-01 05:30:00", 1L, "click"))
    val out = EventStreams.slidingTypeCounts(ev)
      .orderBy("w_start").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(3)))
    out.toSeq shouldBe Seq(
      (ts("2026-01-01 04:00:00"), ts("2026-01-01 06:00:00"), 1L),
      (ts("2026-01-01 05:00:00"), ts("2026-01-01 07:00:00"), 1L))
  }

  test("windowed counts on a batch frame equals a plain group-by (oracle parity shape)") {
    val ev = eventsDf(
      (1L, "2026-01-01 00:10:00", 1L, "click"),
      (2L, "2026-01-01 00:20:00", 2L, "click"),
      (3L, "2026-01-01 01:15:00", 1L, "view"))
    val out = EventStreams.windowedTypeCounts(ev)
      .orderBy("w_start", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      (ts("2026-01-01 00:00:00"), "click", 2L),
      (ts("2026-01-01 01:00:00"), "view", 1L))
  }
}
