package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkEntry, SparkSpec}
import graft.functions.Transforms

/** The driver testdata's parquet `ts` columns are untagged
  * `timestamp[us]` (isAdjustedToUTC=false), which Spark 4 reads back as
  * TIMESTAMP_NTZ — a layout the unit specs' hand-built TimestampType
  * frames never exercised, which is how round 7's
  * `unix_micros`-over-NTZ DATATYPE_MISMATCH slipped past the suite
  * while 149 other queries stayed green. This spec pins every
  * micros-consuming query path against BOTH layouts: an NTZ parquet
  * fixture and its zoned twin must analyze, run, and agree row-for-row
  * (the session zone is pinned UTC, so the layouts are value-identical
  * and any divergence is an engine bug, not a zone shift).
  */
class NtzFixtureSpec extends SparkSpec {

  import graft.SparkSpec.{spark => s}

  /** click/purchase timeline with sub-millisecond micros so a
    * millis-precision regression would also surface:
    *  user 10: click e1 @ 00:00:00.000001, purchase e2 @ 00:10:00.500000
    *           (gap 600.499999 s), click e3 @ 00:20:00, purchase e4
    *           @ 02:00:00 (100 min after e3 — outside the 1 h interval
    *           horizon, but still as-of attributable to e3)
    *  user 20: click e5 @ 00:00:30, no purchase (outer-join null row)
    */
  private val rows = Seq(
    (1L, "2026-01-01 00:00:00.000001", 10L, "click", 1.0),
    (2L, "2026-01-01 00:10:00.500000", 10L, "purchase", 5.0),
    (3L, "2026-01-01 00:20:00.000000", 10L, "click", 1.0),
    (4L, "2026-01-01 02:00:00.000000", 10L, "purchase", 7.0),
    (5L, "2026-01-01 00:00:30.000000", 20L, "click", 1.0))

  private def writeEvents(dir: String, ntz: Boolean): Unit = {
    import s.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts",
        col("ts_s").cast(if (ntz) TimestampNTZType else TimestampType))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private lazy val (ntzDir, tzDir): (String, String) = {
    val root = Files.createTempDirectory("graft-ntz-fixture")
    val (n, t) = (s"$root/ntz", s"$root/tz")
    writeEvents(n, ntz = true)
    writeEvents(t, ntz = false)
    (n, t)
  }

  test("the NTZ fixture actually round-trips as TIMESTAMP_NTZ") {
    SparkEntry.table(s, ntzDir, "events").schema("ts").dataType shouldBe
      TimestampNTZType
    SparkEntry.table(s, tzDir, "events").schema("ts").dataType shouldBe
      TimestampType
  }

  test("microsOf accepts both layouts and agrees at full precision") {
    def micros(dir: String): Seq[Long] =
      SparkEntry.table(s, dir, "events")
        .select(Transforms.microsOf(col("ts")))
        .orderBy("ts").collect().map(_.getLong(0)).toSeq
    val m = micros(ntzDir)
    m shouldEqual micros(tzDir)
    // e1 carries the lone sub-millisecond microsecond
    m.min % 1000L shouldBe 1L
  }

  for (q <- Seq("q29_asof_join", "s05_interval_join",
      "s06_outer_interval_join", "s07_stream_asof")) {
    test(s"$q runs on the NTZ layout and matches the zoned layout") {
      def run(dir: String): Seq[String] =
        SparkEntry.queries(q)(s, dir).collect().map(_.toString).toSeq
      val ntz = run(ntzDir)
      ntz should not be empty
      ntz shouldEqual run(tzDir)
    }
  }

  test("q29 gap_us is exact micros on the NTZ layout") {
    val byPurchase = SparkEntry.queries("q29_asof_join")(s, ntzDir)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // purchase e2 − click e1 = 600.499999 s; purchase e4 − click e3 = 100 min
    byPurchase(2L) shouldBe 600499999L
    byPurchase(4L) shouldBe 6000000000L
  }

  test("s06 outer join emits the matchless click with a null purchase") {
    val r = SparkEntry.queries("s06_outer_interval_join")(s, ntzDir)
      .filter(col("user_id") === 20L).collect()
    r should have length 1
    r.head.isNullAt(2) shouldBe true
  }
}
