package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2026-01-01 10:00:00"), 100.0),
    (1L, ts("2026-01-01 10:05:00"), 101.0),
    (1L, ts("2026-01-01 10:10:00"), 99.0),
    (2L, ts("2026-01-01 10:07:00"), 50.0))
    .toDF("k", "q_ts", "px")

  test("asofJoin attaches the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, ts("2026-01-01 10:06:00"), 10L), // after 10:05 quote -> 101.0
      (1L, ts("2026-01-01 10:05:00"), 11L), // equal ts -> inclusive, 101.0
      (1L, ts("2026-01-01 09:59:00"), 12L), // before any quote -> null
      (2L, ts("2026-01-01 11:00:00"), 13L), // key 2 -> 50.0
      (3L, ts("2026-01-01 10:00:00"), 14L)) // unseen key -> null
      .toDF("k", "t_ts", "trade_id")
    val out = Merge
      .asofJoin(trades, quotes, Seq("k"), "t_ts", "q_ts", Seq("px", "q_ts"))
      .orderBy("trade_id").collect()
    out.map(r => (r.getLong(2),
      if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq shouldBe Seq(
      (10L, 101.0), (11L, 101.0), (12L, -1.0), (13L, 50.0), (14L, -1.0))
    // the matched quote timestamp rides along with its value
    out(0).getTimestamp(4) shouldBe ts("2026-01-01 10:05:00")
  }

  test("asofJoin equals the naive range-join reference on seeded random data") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "t_ts", "id")
    val right = (1 to 200).map(i =>
      (rnd.nextInt(10).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toDouble))
      .toDF("k", "q_ts", "px")
    val fast = Merge.asofJoin(left, right, Seq("k"), "t_ts", "q_ts", Seq("px"))
      .select("id", "px").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // reference: range join (every right row at-or-before) + max-ts pick
    val l = left.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val rr = right.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    l.foreach { case (k, ts, id) =>
      val cand = rr.filter(q => q._1 == k && !q._2.after(ts))
      val expect = if (cand.isEmpty) null
        else cand.maxBy(q => (q._2.getTime, q._3))._3
      withClue(s"id=$id: ") { fast(id) shouldBe expect }
    }
  }

  test("asofJoin carries a null INSIDE a matched right row instead of skipping it") {
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), Some(1.0)),
      (1L, ts("2026-01-01 10:05:00"), None)) // the latest row has a null px
      .toDF("k", "q_ts", "px")
    val left = Seq((1L, ts("2026-01-01 10:06:00"), 1L)).toDF("k", "t_ts", "id")
    val out = Merge
      .asofJoin(left, right, Seq("k"), "t_ts", "q_ts", Seq("px", "q_ts"))
      .collect()
    // matched row IS the 10:05 one; its null px must not fall back to 1.0
    out.head.getTimestamp(4) shouldBe ts("2026-01-01 10:05:00")
    out.head.isNullAt(3) shouldBe true
  }
}
