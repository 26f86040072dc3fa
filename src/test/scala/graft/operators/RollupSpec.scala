package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.LakeCatalog

class RollupSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (id, k, v) => (id, k, v) }.toDF("id", "k", "v")
      .select($"id", $"k", $"v".cast("decimal(10,2)").as("v"))

  private def freshCat =
    new LakeCatalog(spark, Files.createTempDirectory("rollup-wh").toString)

  private def state(dst: graft.store.LakeTable) =
    dst.read.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq

  test("incremental refreshes equal a full recompute; watermark rides the merge commit") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src")
    val dst = cat.table("db.agg")
    src.createOrReplace(ev((1L, "a", "1.10"), (2L, "b", "2.20")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v")) // bootstrap = rebuild
    dst.properties(Rollup.WatermarkProp) shouldBe "1"
    state(dst) shouldBe Seq(("a", 1L, "1.10"), ("b", 1L, "2.20"))

    src.append(ev((3L, "a", "0.90"), (4L, "c", "3.00")))
    src.append(ev((5L, "b", "1.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v")) shouldBe 2L // two versions folded
    dst.properties(Rollup.WatermarkProp) shouldBe "3"
    state(dst) shouldBe Seq(("a", 2L, "2.00"), ("b", 2L, "3.20"), ("c", 1L, "3.00"))
    // bit-equal to the full recompute (decimal sums are order-free)
    val full = src.read.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq
    state(dst) shouldBe full
    // at head: no-op, watermark unchanged, no phantom commit
    val vBefore = dst.currentSnapshot.get.version
    Rollup.refresh(src, dst, Seq("k"), Seq("v")) shouldBe 0L
    dst.currentSnapshot.get.version shouldBe vBefore
  }

  private def fullRecompute(src: graft.store.LakeTable) =
    src.read.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq

  test("MoR merge and delete commits fold incrementally, bit-equal to a full recompute") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src_mor")
    val dst = cat.table("db.agg_mor")
    src.createOrReplace(ev((1L, "a", "1.10"), (2L, "a", "2.00"),
      (3L, "b", "3.30"), (4L, "b", "4.00"), (5L, "c", "5.50")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    // MoR MERGE: update ids 2 and 4 (+10 each) — delete file masks the
    // pre-images, new entries carry the post-images
    src.mergeIntoMoR(ev((2L, "a", "12.00"), (4L, "b", "14.00")), Seq("id"))
    Rollup.refresh(src, dst, Seq("k"), Seq("v")) shouldBe 1L
    state(dst) shouldBe fullRecompute(src)
    state(dst) shouldBe Seq(("a", 2L, "13.10"), ("b", 2L, "17.30"), ("c", 1L, "5.50"))
    // MoR DELETE: id 3 leaves — its last visible value (3.30) subtracts
    src.deleteWhereExistsMoR(Seq(3L).toDF("id"), Seq("id"))
    Rollup.refresh(src, dst, Seq("k"), Seq("v")) shouldBe 1L
    state(dst) shouldBe fullRecompute(src)
    state(dst) shouldBe Seq(("a", 2L, "13.10"), ("b", 1L, "14.00"), ("c", 1L, "5.50"))
  }

  test("a mixed append+merge+delete range folds in ONE refresh; twice-updated keys net correctly") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src_mixed")
    val dst = cat.table("db.agg_mixed")
    src.createOrReplace(ev((1L, "a", "1.00"), (2L, "b", "2.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    // range: append, update id 1 TWICE (both pre-image generations must
    // net away), delete id 2, and an appended-then-deleted id 9 (must
    // never touch the totals)
    src.append(ev((3L, "a", "3.00"), (9L, "d", "9.00")))
    src.mergeIntoMoR(ev((1L, "a", "10.00")), Seq("id"))
    src.mergeIntoMoR(ev((1L, "a", "20.00")), Seq("id"))
    src.deleteWhereExistsMoR(Seq(2L, 9L).toDF("id"), Seq("id"))
    Rollup.refresh(src, dst, Seq("k"), Seq("v")) shouldBe 4L
    state(dst) shouldBe fullRecompute(src)
    // a = id1(20.00) + id3(3.00); b and d are GONE (zero live rows —
    // no n=0 tombstone may remain)
    state(dst) shouldBe Seq(("a", 2L, "23.00"))
  }

  test("MAX measures: append ranges fold, MoR deletes re-aggregate the touched groups") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src_max")
    val dst = cat.table("db.agg_max")
    src.createOrReplace(ev((1L, "a", "5.00"), (2L, "a", "9.00"), (3L, "b", "4.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"), maxCols = Seq("v"))
    def maxima = dst.read.orderBy("k").collect()
      .map(r => (r.getString(0), r.getDecimal(3).toPlainString)).toSeq
    maxima shouldBe Seq(("a", "9.00"), ("b", "4.00"))
    // append range: max folds via greatest, no source re-read needed
    src.append(ev((4L, "a", "7.00"), (5L, "c", "1.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"), maxCols = Seq("v"))
    maxima shouldBe Seq(("a", "9.00"), ("b", "4.00"), ("c", "1.00"))
    // THE non-invertible case: delete the row that WAS the max of 'a' —
    // a greatest-fold would freeze 9.00 forever; the touched-group
    // re-aggregate must find the new max 7.00
    src.deleteWhereExistsMoR(Seq(2L).toDF("id"), Seq("id"))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"), maxCols = Seq("v"))
    maxima shouldBe Seq(("a", "7.00"), ("b", "4.00"), ("c", "1.00"))
    // untouched groups kept their rows without a recompute; totals and
    // counts still bit-equal the full recompute
    state(dst) shouldBe fullRecompute(src)
    // and a group deleted to zero leaves entirely (null max never lands)
    src.deleteWhereExistsMoR(Seq(3L).toDF("id"), Seq("id"))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"), maxCols = Seq("v"))
    maxima shouldBe Seq(("a", "7.00"), ("c", "1.00"))
  }

  test("a COW commit in a MoR range still refuses (rewrites re-emit rows)") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src_cowmix")
    val dst = cat.table("db.agg_cowmix")
    src.createOrReplace(ev((1L, "a", "1.00"), (2L, "b", "2.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    src.mergeIntoMoR(ev((1L, "a", "5.00")), Seq("id"))
    src.mergeInto(ev((2L, "b", "7.00")), Seq("id")) // COW rewrite
    val e = intercept[IllegalArgumentException] {
      Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    }
    e.getMessage should include ("non-append")
  }

  test("cherry-picked source rows fold into the rollup (changes must not skip them)") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src_cp")
    val dst = cat.table("db.agg_cp")
    src.createOrReplace(ev((1L, "a", "1.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    // branch work lands via cherry-pick (append-only, audited)
    src.createBranch("wap")
    src.branch("wap").append(ev((2L, "a", "2.00"), (3L, "b", "3.00")))
    src.cherryPick("wap")
    Rollup.refresh(src, dst, Seq("k"), Seq("v")) should be > 0L
    // the picked rows are IN the totals — a changes() skip would lose
    // them while still advancing the watermark
    state(dst) shouldBe Seq(("a", 2L, "3.00"), ("b", 1L, "3.00"))
  }

  test("a publish in the refresh range refuses — fastForward never audits the branch") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src_pub")
    val dst = cat.table("db.agg_pub")
    src.createOrReplace(ev((1L, "a", "1.00"), (2L, "b", "2.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    // the branch REWRITES existing rows: publishing it re-surfaces
    // them as adds in changes(), which would double-count
    src.createBranch("rw")
    src.branch("rw").mergeInto(ev((1L, "a", "9.00")), Seq("id"))
    src.fastForward("rw")
    val ex = intercept[IllegalArgumentException] {
      Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    }
    ex.getMessage should include("non-append")
    // recovery: rebuild reflects the merged state exactly once
    Rollup.rebuild(src, dst, Seq("k"), Seq("v"))
    state(dst) shouldBe Seq(("a", 1L, "9.00"), ("b", 1L, "2.00"))
  }

  test("refresh refuses after a non-append source commit; rebuild recovers") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src")
    val dst = cat.table("db.agg")
    src.createOrReplace(ev((1L, "a", "1.00"), (2L, "b", "2.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    // a COW rewrite re-emits rewritten rows in changes(): must refuse
    src.mergeInto(ev((1L, "a", "5.00")), Seq("id"))
    an[IllegalArgumentException] should be thrownBy
      Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    // rollup state untouched by the refusal
    state(dst) shouldBe Seq(("a", 1L, "1.00"), ("b", 1L, "2.00"))
    Rollup.rebuild(src, dst, Seq("k"), Seq("v"))
    state(dst) shouldBe Seq(("a", 1L, "5.00"), ("b", 1L, "2.00"))
    // and incremental maintenance resumes cleanly after the rebuild
    src.append(ev((3L, "b", "1.50")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v")) shouldBe 1L
    state(dst) shouldBe Seq(("a", 1L, "5.00"), ("b", 2L, "3.50"))
  }

  test("a source REPLACE inside the refresh range refuses — prior totals are invalid") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src")
    val dst = cat.table("db.agg")
    src.createOrReplace(ev((1L, "a", "1.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    src.createOrReplace(ev((2L, "b", "2.00"))) // rows the watermark counted are gone
    an[IllegalArgumentException] should be thrownBy
      Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    Rollup.rebuild(src, dst, Seq("k"), Seq("v"))
    state(dst) shouldBe Seq(("b", 1L, "2.00"))
  }

  test("a NULL group key in the delta is refused (merge equality cannot replace it)") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src")
    val dst = cat.table("db.agg")
    src.createOrReplace(ev((1L, "a", "1.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    src.append(Seq((2L, null.asInstanceOf[String], "2.00")).toDF("id", "k", "v")
      .select($"id", $"k", $"v".cast("decimal(10,2)").as("v")))
    an[IllegalArgumentException] should be thrownBy
      Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    state(dst) shouldBe Seq(("a", 1L, "1.00")) // untouched by the refusal
  }

  test("a pre-existing non-rollup table is refused (no silent overwrite)") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src")
    val dst = cat.table("db.not_a_rollup")
    src.createOrReplace(ev((1L, "a", "1.00")))
    dst.createOrReplace(ev((9L, "z", "9.99")))
    an[IllegalStateException] should be thrownBy
      Rollup.refresh(src, dst, Seq("k"), Seq("v"))
  }

  test("MoR-extrema re-aggregation prunes the source scan to touched-group entries") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src_prune")
    val dst = cat.table("db.agg_prune")
    // partitioned by the GROUP column: one manifest entry per group,
    // so the touched-keys predicate can prove untouched entries dead
    src.createOrReplace(
      ev((1L, "a", "1.00"), (2L, "a", "9.00"), (3L, "b", "2.00"),
        (4L, "b", "8.00"), (5L, "c", "3.00"), (6L, "c", "7.00")),
      partitionBy = Seq("k"))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"), maxCols = Seq("v"))
    // MoR-delete group a's maximum: the touched set is exactly {a}
    src.deleteWhereExistsMoR(Seq(2L).toDF("id"), Seq("id"))
    val pred = Rollup.touchedPrunePredicate(Seq("k"), Seq("a").toDF("k"))
    pred shouldBe defined
    val snap = src.currentSnapshot.get
    val pruned = src.prunedEntries(snap, pred.get)
    pruned.size should be < snap.entries.size
    // ...and the refresh over the pruned scan is still exact: group a's
    // max drops to the surviving row, b and c are untouched
    Rollup.refresh(src, dst, Seq("k"), Seq("v"), maxCols = Seq("v")) shouldBe 1L
    val got = dst.read.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString)).toSeq
    got shouldBe Seq(("a", 1L, "1.00", "1.00"), ("b", 2L, "10.00", "8.00"),
      ("c", 2L, "10.00", "7.00"))
  }

  test("readWithAverages derives avg from the maintained n/sum, null on n=0 tombstones") {
    val cat = freshCat
    cat.createDatabase("db")
    val src = cat.table("db.src_avg")
    val dst = cat.table("db.agg_avg")
    src.createOrReplace(ev((1L, "a", "1.00"), (2L, "a", "2.00"), (3L, "b", "6.00")))
    Rollup.refresh(src, dst, Seq("k"), Seq("v"))
    val got = Rollup.readWithAverages(dst, Seq("v"))
      .select("k", "avg_v").orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    got shouldBe Seq(("a", 1.5), ("b", 6.0))
  }

  test("touched-keys pruning predicate falls back to a full scan on nulls or oversized key sets") {
    import org.apache.spark.sql.functions.{col => fcol}
    Rollup.touchedPrunePredicate(Seq("k"),
      Seq(Option("a"), None).toDF("k")) shouldBe None
    Rollup.touchedPrunePredicate(Seq("k"),
      spark.range(Rollup.MaxInlineTouchedKeys + 1)
        .select(fcol("id").cast("string").as("k"))) shouldBe None
    Rollup.touchedPrunePredicate(Seq("k"),
      spark.range(0).select(fcol("id").cast("string").as("k"))) shouldBe None
  }
}
