package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-sidecar file skipping: point lookups prune entries whose
  * min/max ranges all overlap (append-churned layout) but whose bloom
  * filters prove the key absent. */
class BloomSkippingSpec extends SparkSpec {

  private val BloomProps = Map(
    "write.bloom.columns" -> "id,status",
    "write.bloom.expected-items" -> "10000")

  private def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("bloom-test").toString)

  private def df(rows: Seq[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "status", "amount")
  }

  /** Four appends with INTERLEAVED ids (every entry spans [base, base+4k))
    * so range stats alone prune nothing on a point lookup. */
  private def interleaved(t: LakeTable): Unit = {
    (0 until 4).foreach { m =>
      val rows = (0 until 50).map(i => (i * 4L + m, s"s$m", i * 1.0))
      if (m == 0) t.createOrReplace(df(rows), tableProperties = BloomProps)
      else t.append(df(rows))
    }
  }

  private def planned(t: LakeTable, cond: org.apache.spark.sql.Column): Seq[ManifestEntry] =
    t.prunedEntries(t.currentSnapshot.get, cond)

  test("point lookup prunes to the one entry holding the key") {
    val t = freshCatalog().table("db.bloomed")
    interleaved(t)
    val s = t.currentSnapshot.get
    s.entries.size shouldBe 4
    all(s.entries.map(_.blooms)) shouldBe Seq("id", "status")
    // id 41 = 4*10+1 lives only in the m=1 entry; ranges all overlap
    planned(t, col("id") === 41L).size shouldBe 1
    t.readWhere(col("id") === 41L).collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq shouldBe Seq((41L, "s1"))
  }

  test("string-column bloom prunes and int/long normalization agrees") {
    val t = freshCatalog().table("db.bloomed_str")
    interleaved(t)
    planned(t, col("status") === "s2").size shouldBe 1
    // analyzer inserts cast(id as bigint) around an INT literal — the
    // stripped probe must agree with the long-normalized build side
    planned(t, col("id") === 41).size shouldBe 1
    t.readWhere(col("status") === "s2").count() shouldBe 50
  }

  test("IN list keeps every entry holding at least one key, drops the rest") {
    val t = freshCatalog().table("db.bloomed_in")
    interleaved(t)
    planned(t, col("id").isin(40L, 41L)).size shouldBe 2
    // keys no entry holds: bloom prunes everything, result is empty
    planned(t, col("id").isin(1000001L, 1000002L)) shouldBe empty
    t.readWhere(col("id").isin(40L, 41L)).count() shouldBe 2
  }

  test("non-equality predicates and unindexed columns never bloom-prune") {
    val t = freshCatalog().table("db.bloomed_range")
    interleaved(t)
    // range predicate: bloom can't help; overlapping min/max keep all 4
    planned(t, col("id") > 100L).size shouldBe 4
    // amount has no sidecar (not in write.bloom.columns)
    planned(t, col("amount") === 3.0).size shouldBe 4
  }

  test("no bloom properties → no sidecars, lookup still correct") {
    val t = freshCatalog().table("db.plain")
    (0 until 4).foreach { m =>
      val rows = (0 until 50).map(i => (i * 4L + m, s"s$m", i * 1.0))
      if (m == 0) t.createOrReplace(df(rows)) else t.append(df(rows))
    }
    all(t.currentSnapshot.get.entries.map(_.blooms)) shouldBe empty
    planned(t, col("id") === 41L).size shouldBe 4
    t.readWhere(col("id") === 41L).count() shouldBe 1
  }

  test("partitioned table: per-leaf sidecars, probe composes with partition prune") {
    val t = freshCatalog().table("db.bloomed_part")
    import spark.implicits._
    val rows = (0 until 200).map(i => (i.toLong, s"p${i % 2}", i * 1.0))
    t.createOrReplace(rows.toDF("id", "pt", "amount"), partitionBy = Seq("pt"),
      tableProperties = Map("write.bloom.columns" -> "id"))
    t.append((200 until 400).map(i => (i.toLong, s"p${i % 2}", i * 1.0))
      .toDF("id", "pt", "amount"))
    val s = t.currentSnapshot.get
    s.entries.size shouldBe 4 // 2 commits × 2 leaves
    all(s.entries.map(_.blooms)) shouldBe Seq("id")
    // id=301 is in the second commit, leaf p1 — one entry survives
    planned(t, col("id") === 301L).size shouldBe 1
    t.readWhere(col("id") === 301L && col("pt") === "p1").count() shouldBe 1
  }

  test("URI-encoded partition values (space, percent) still get working sidecars") {
    val t = freshCatalog().table("db.bloomed_uri")
    import spark.implicits._
    val rows = (0L until 60L).map(i =>
      (i, if (i % 2 == 0) "ON HOLD" else "50%", i * 1.0))
    t.createOrReplace(rows.toDF("id", "pt", "amount"), partitionBy = Seq("pt"),
      tableProperties = Map("write.bloom.columns" -> "id"))
    val s = t.currentSnapshot.get
    // input_file_name URI-encodes these leaves; the sidecar writer must
    // decode back to the physical names the manifest carries
    all(s.entries.map(_.blooms)) shouldBe Seq("id")
    planned(t, col("id") === 2L).size shouldBe 1 // even ids: ON HOLD leaf
    t.readWhere(col("id") === 2L).count() shouldBe 1
    t.readWhere(col("pt") === "50%").count() shouldBe 30
  }

  test("COW merge rewrite regenerates sidecars for the rewritten entries") {
    val t = freshCatalog().table("db.bloomed_merge")
    interleaved(t)
    t.mergeInto(df(Seq((41L, "UPD", 9.9))), Seq("id"))
    val s = t.currentSnapshot.get
    all(s.entries.map(_.blooms)) shouldBe Seq("id", "status")
    t.readWhere(col("id") === 41L).collect().map(_.getString(1)).toSeq shouldBe Seq("UPD")
    // the rewritten entry's new bloom holds the updated status value
    planned(t, col("status") === "UPD").size shouldBe 1
  }

  test("expireSnapshots deletes the bloom dirs of dropped data dirs") {
    val t = freshCatalog().table("db.bloomed_gc")
    interleaved(t)
    val fs = new Path(t.location).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveDirs = t.currentSnapshot.get.entries.map(_.dir).toSet
    t.mergeInto(df(Seq((41L, "UPD", 9.9))), Seq("id")) // rewrites one entry
    t.expireSnapshots(keepLast = 1)
    val bloomRoot = new Path(s"${t.location}/blooms")
    val remaining = fs.listStatus(bloomRoot).map(_.getPath.getName).toSet
    val stillLive = t.currentSnapshot.get.entries.map(_.dir).toSet
    remaining shouldBe stillLive
    // at least one pre-merge dir was rewritten away and its blooms swept
    (liveDirs -- stillLive) should not be empty
  }

  test("partition columns are excluded from bloom indexing") {
    // the failure this prevents: sidecars are built by reading the
    // written dir back, where a STRING partition column with
    // numeric-looking values ('100', '101', …) comes back through
    // partition type INFERENCE as ints — the sidecar would hash longs
    // while the probe hashes UTF-8 bytes per the table schema, so
    // mightContain would return false and silently drop the entry that
    // holds the matching rows. Partition equality is already pruned
    // exactly by partition stats; the bloom must simply not cover it.
    val t = freshCatalog().table("db.bloomed_part")
    import spark.implicits._
    val rows = (0 until 100).map(i => (i.toLong, (100 + i % 4).toString, i * 1.0))
    t.createOrReplace(rows.toDF("id", "bucket", "amount"),
      partitionBy = Seq("bucket"),
      tableProperties = Map("write.bloom.columns" -> "id,bucket",
        "write.bloom.expected-items" -> "10000"))
    val s = t.currentSnapshot.get
    // bloom coverage carries only the non-partition column
    all(s.entries.map(_.blooms)) shouldBe Seq("id")
    // the numeric-looking string partition value still finds its rows
    t.readWhere(col("bucket") === "101").count() shouldBe 25
    // and partition pruning (exact) still plans just that partition
    planned(t, col("bucket") === "101").foreach(e =>
      e.partition.getOrElse("") should include ("bucket=101"))
  }

  test("all-null indexed column yields an empty filter that prunes soundly") {
    val t = freshCatalog().table("db.bloomed_null")
    import spark.implicits._
    val withNull = Seq((1L, null.asInstanceOf[String], 1.0), (2L, null.asInstanceOf[String], 2.0))
      .toDF("id", "status", "amount")
    t.createOrReplace(withNull, tableProperties = BloomProps)
    t.append(df(Seq((3L, "ok", 3.0))))
    // first entry's status bloom is empty (nulls skipped): pruned away
    planned(t, col("status") === "ok").size shouldBe 1
    t.readWhere(col("status") === "ok").count() shouldBe 1
  }
}
