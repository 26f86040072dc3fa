package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsPruningSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("stats-wh").toString)
    cat.createDatabase("lake")
    cat.table("lake.ranged")
  }

  /** 3 appends with disjoint id ranges — the append-ordered layout a
    * time/key-correlated ingest naturally produces. */
  private def build3(t: LakeTable) = {
    // these specs pin the AT-SCALE prune dispatch; disable the
    // tiny-table rewrite short-circuit that would otherwise skip it
    // on a 300-row fixture (r14, LakeTable.TinyRewriteMaxBytesProp)
    t.createOrReplace(
      (0L until 100L).map(i => (i, s"r$i", i * 1.5)).toDF("id", "s", "v"),
      tableProperties = Map(LakeTable.TinyRewriteMaxBytesProp -> "0"))
    t.append((100L until 200L).map(i => (i, s"r$i", i * 1.5)).toDF("id", "s", "v"))
    t.append((200L until 300L).map(i => (i, s"r$i", i * 1.5)).toDF("id", "s", "v"))
    t
  }

  test("writes record min/max stats per manifest entry, surviving the JSON round-trip") {
    val t = build3(freshTable)
    val s = t.currentSnapshot.get
    s.entries.length shouldBe 3
    all(s.entries.map(_.stats.keySet)) should contain allOf ("id", "s", "v")
    val first = s.entries.map(_.stats("id")).map { case (mn, mx) => (mn.toLong, mx.toLong) }
      .sortBy(_._1)
    first shouldBe Seq((0L, 99L), (100L, 199L), (200L, 299L))
  }

  test("range predicates prune to the overlapping entries only") {
    val t = build3(freshTable)
    val s = t.currentSnapshot.get
    t.prunedEntries(s, col("id") < 50L).length shouldBe 1
    t.prunedEntries(s, col("id") >= 150L).length shouldBe 2
    t.prunedEntries(s, col("id") === 250L).length shouldBe 1
    t.prunedEntries(s, col("id") > 1000L).length shouldBe 0
    t.prunedEntries(s, col("id").isin(10L, 110L)).length shouldBe 2
    t.prunedEntries(s, col("id") < 50L && col("id") > 250L).length shouldBe 0
    t.prunedEntries(s, col("id") < 50L || col("id") > 250L).length shouldBe 2
    // double + string columns prune too
    t.prunedEntries(s, col("v") < 10.0).length shouldBe 1
    t.prunedEntries(s, col("s") === "r50").length should be <= 2
  }

  test("InSet over internal values (UTF8String / boxed longs) prunes without crashing") {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.InSet
    import org.apache.spark.unsafe.types.UTF8String
    val t = build3(freshTable)
    val s = t.currentSnapshot.get
    val stats = s.entries.head.stats // id range [0, 99]
    // optimizer emits InSet with INTERNAL element types; both must be
    // handled directly, not via Literal.apply (which rejects them)
    val longsOut = InSet(UnresolvedAttribute("id"),
      (1000L to 1020L).map(java.lang.Long.valueOf).toSet)
    val longsIn = InSet(UnresolvedAttribute("id"),
      Set[Any](java.lang.Long.valueOf(5L), java.lang.Long.valueOf(2000L)))
    val strsOut = InSet(UnresolvedAttribute("s"),
      Set[Any](UTF8String.fromString("zz1"), UTF8String.fromString("zz2")))
    StatsPruning.mayMatch(stats, s.schema, longsOut) shouldBe false
    StatsPruning.mayMatch(stats, s.schema, longsIn) shouldBe true
    StatsPruning.mayMatch(stats, s.schema, strsOut) shouldBe false
  }

  test("value-changing casts block pruning (conservative keep)") {
    val t = build3(freshTable)
    val s = t.currentSnapshot.get
    // id.cast(double) is long->double: NOT value-preserving past 2^53,
    // so the cast must not be stripped and nothing may be pruned
    t.prunedEntries(s, col("id").cast("double") === 250.0).length shouldBe 3
    // int->long IS value-preserving: the coercion cast strips and prunes
    t.prunedEntries(s, col("id") === 250).length shouldBe 1
  }

  test("readWhere returns exactly the filtered rows (pruning never drops matches)") {
    val t = build3(freshTable)
    val out = t.readWhere(col("id").between(90L, 110L)).select("id")
      .collect().map(_.getLong(0)).sorted
    out shouldBe (90L to 110L).toArray
    t.readWhere(col("id") > 1000L).count() shouldBe 0L
  }

  test("unsupported predicates and unknown columns are conservative (no pruning)") {
    val t = build3(freshTable)
    val s = t.currentSnapshot.get
    t.prunedEntries(s, functions.length(col("s")) > 2).length shouldBe 3
    t.prunedEntries(s, col("id") + 1 < 10L).length shouldBe 3 // non-attr side: keep
    t.readWhere(functions.length(col("s")) >= 2).count() shouldBe 300L
  }

  test("merge rewrites only the entries whose key range overlaps the batch") {
    val t = build3(freshTable)
    val batch = (150L until 160L).map(i => (i, s"UPD$i", -1.0)).toDF("id", "s", "v")
    val snap = t.mergeInto(batch, Seq("id"))
    snap.summary("untouched-entries") shouldBe "2"
    snap.summary("rewritten-entries") shouldBe "1"
    val rows = t.read.filter(col("id").between(150L, 159L)).select("s")
      .collect().map(_.getString(0))
    all(rows) should startWith("UPD")
    t.read.count() shouldBe 300L
  }

  test("merge inserts new keys even when every entry is untouched") {
    val t = build3(freshTable)
    val batch = Seq((1000L, "new", 0.0)).toDF("id", "s", "v")
    val snap = t.mergeInto(batch, Seq("id"))
    snap.summary("untouched-entries") shouldBe "3"
    t.read.count() shouldBe 301L
    t.read.filter(col("id") === 1000L).count() shouldBe 1L
  }

  test("delete prunes disjoint entries and removes only matching keys") {
    val t = build3(freshTable)
    val snap = t.deleteWhereExists(
      (250L until 260L).map(i => Tuple1(i)).toDF("id"), Seq("id"))
    snap.summary("untouched-entries") shouldBe "2"
    t.read.count() shouldBe 290L
    t.read.filter(col("id").between(250L, 259L)).count() shouldBe 0L
  }

  test("copy-on-write rewrites refresh the rewritten entries' stats") {
    val t = build3(freshTable)
    t.deleteWhere(col("id") >= 290L)
    val s = t.currentSnapshot.get
    // the third range shrank; a query past the new max prunes everything
    t.prunedEntries(s, col("id") >= 290L).length shouldBe 0
    t.readWhere(col("id") >= 280L).count() shouldBe 10L
  }

  test("partition predicates prune at the MANIFEST level from the dir values") {
    // partition cols never reach the data files (partitionBy strips
    // them), so footer stats can't cover them — the entry's dir value
    // must stand in as a [v, v] range
    val cat = new LakeCatalog(spark, Files.createTempDirectory("pstats-wh").toString)
    cat.createDatabase("lake")
    val t = cat.table("lake.parted")
    val rows = (0L until 120L).map(i => (i, s"p${(i % 3)}", i * 1.0))
    t.createOrReplace(rows.toDF("id", "pt", "v"), partitionBy = Seq("pt"))
    t.append((120L until 240L).map(i => (i, s"p${(i % 3)}", i * 1.0))
      .toDF("id", "pt", "v"))
    val s = t.currentSnapshot.get
    s.entries.length shouldBe 6 // 2 commits x 3 leaves
    all(s.entries.map(_.stats.keySet)) should not contain "pt"
    t.prunedEntries(s, col("pt") === "p1").length shouldBe 2
    t.prunedEntries(s, col("pt").isin("p0", "p2")).length shouldBe 4
    t.prunedEntries(s, col("pt") === "nope").length shouldBe 0
    // composes with data-column range pruning on the same entries
    t.prunedEntries(s, col("pt") === "p1" && col("id") < 120L).length shouldBe 1
    t.readWhere(col("pt") === "p1").count() shouldBe 80L
  }

  test("numeric partition values prune with range predicates") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("npstats-wh").toString)
    cat.createDatabase("lake")
    val t = cat.table("lake.nparted")
    val rows = (0L until 100L).map(i => (i, i % 4, i * 1.0))
    t.createOrReplace(rows.toDF("id", "bucket", "v"), partitionBy = Seq("bucket"))
    val s = t.currentSnapshot.get
    s.entries.length shouldBe 4
    t.prunedEntries(s, col("bucket") === 2L).length shouldBe 1
    t.prunedEntries(s, col("bucket") >= 2L).length shouldBe 2
    t.readWhere(col("bucket") >= 2L).count() shouldBe 50L
  }
}
