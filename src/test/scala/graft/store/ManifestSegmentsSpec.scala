package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-level manifest tree (snapshot JSON → immutable segment
  * files): commit metadata cost O(changed entries), segment reuse
  * across appends / pruned rewrites / forks / publishes / rollbacks,
  * the small-segment fold that caps fanout, GC of unreachable
  * segments, and the pre-segment inline-entry format staying
  * readable. */
class ManifestSegmentsSpec extends SparkSpec {

  private def fresh(): (LakeCatalog, String) = {
    val wh = Files.createTempDirectory("segments-test").toString
    (new LakeCatalog(spark, wh), wh)
  }

  private def df(rows: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def segmentFiles(location: String): Set[String] = {
    val dir = Paths.get(location, "_meta", "manifests").toFile
    if (!dir.exists) Set.empty
    else dir.listFiles().map(_.getName).filter(_.startsWith("seg-")).toSet
  }

  private def snapshotJson(location: String, version: Long): String =
    new String(Files.readAllBytes(
      Paths.get(location, "_meta", f"v$version%05d.json")), StandardCharsets.UTF_8)

  test("append reuses every parent segment and writes only the new tail") {
    val (cat, wh) = fresh()
    val t = cat.table("db.t")
    t.createOrReplace(df((1L to 10L).map(i => (i, i.toDouble))))
    val afterCreate = segmentFiles(s"$wh/db/t")

    t.append(df((11L to 20L).map(i => (i, i.toDouble))))

    val afterAppend = segmentFiles(s"$wh/db/t")
    // the create's segment is still there, referenced untouched; the
    // append added exactly one new segment file
    afterCreate.subsetOf(afterAppend) shouldBe true
    (afterAppend -- afterCreate).size shouldBe 1
    // the snapshot JSON carries refs, not inline entries — and stays small
    val json = snapshotJson(s"$wh/db/t", t.currentSnapshot.get.version)
    json should include("\"segments\"")
    json should not include "\"entries\""
    t.read.count() shouldBe 20
  }

  test("a stats-pruned COW update reuses the untouched segments") {
    val (cat, wh) = fresh()
    val t = cat.table("db.t")
    // segment-per-commit: three disjoint id ranges → three segments
    t.createOrReplace(df((1L to 10L).map(i => (i, 1.0))))
    t.append(df((11L to 20L).map(i => (i, 1.0))))
    t.append(df((21L to 30L).map(i => (i, 1.0))))
    val before = segmentFiles(s"$wh/db/t")
    before.size shouldBe 3

    t.updateWhere(col("id") <= lit(5L), Map("v" -> lit(2.0)))

    // the new snapshot's layout reuses the two range-disjoint segments
    // and adds one fresh segment for the rewrite (the replaced file
    // stays on disk for the parent snapshot until expiry)
    val refs = referencedSegments(s"$wh/db/t", t.currentSnapshot.get.version)
    refs.size shouldBe 3
    (refs intersect before).size shouldBe 2
    t.read.filter(col("v") === 2.0).count() shouldBe 5
  }

  /** Segment file names the given snapshot version references. */
  private def referencedSegments(location: String, version: Long): Set[String] =
    "\"file\"\\s*:\\s*\"([^\"]+)\"".r
      .findAllMatchIn(snapshotJson(location, version)).map(_.group(1)).toSet

  test("segment fanout is capped by folding small segments") {
    val (cat, wh) = fresh()
    val t = cat.table("db.t")
    t.createOrReplace(df(Seq((1L, 1.0))),
      tableProperties = Map(
        "manifest.target-segment-entries" -> "4",
        "manifest.max-segments" -> "3"))
    // each append adds a 1-entry segment; past the cap they must fold
    (2L to 9L).foreach(i => t.append(df(Seq((i, i.toDouble)))))

    val s = t.currentSnapshot.get
    s.entries.size shouldBe 9
    val json = snapshotJson(s"$wh/db/t", s.version)
    val refCount = "\"file\"".r.findAllIn(json).size
    refCount should be <= 3
    t.read.count() shouldBe 9
    // every entry survived the folds with its stats and seq intact
    t.readWhere(col("id") === lit(7L)).count() shouldBe 1
  }

  test("fork and publish are metadata-only: branch and main share segment files") {
    val (cat, wh) = fresh()
    val t = cat.table("db.t")
    t.createOrReplace(df((1L to 10L).map(i => (i, 1.0))))
    val beforeFork = segmentFiles(s"$wh/db/t")

    val b = t.createBranch("audit")
    // fork wrote NO new segment files — pure reuse of main's
    segmentFiles(s"$wh/db/t") shouldBe beforeFork

    b.append(df((11L to 20L).map(i => (i, 2.0))))
    val afterBranchAppend = segmentFiles(s"$wh/db/t")
    (afterBranchAppend -- beforeFork).size shouldBe 1 // the branch's tail

    t.fastForward("audit")
    // publish imported the branch head by REUSING its segments
    segmentFiles(s"$wh/db/t") shouldBe afterBranchAppend
    t.read.count() shouldBe 20
  }

  test("rollback reuses the restored version's segments") {
    val (cat, wh) = fresh()
    val t = cat.table("db.t")
    t.createOrReplace(df((1L to 10L).map(i => (i, 1.0))))
    val v1 = t.currentSnapshot.get.version
    t.overwrite(df((1L to 5L).map(i => (i, 9.0))))
    val before = segmentFiles(s"$wh/db/t")

    t.rollbackTo(v1)

    segmentFiles(s"$wh/db/t") shouldBe before // no new files at all
    t.read.count() shouldBe 10
  }

  test("expireSnapshots sweeps segments only expired snapshots referenced") {
    val (cat, wh) = fresh()
    val t = cat.table("db.t")
    t.createOrReplace(df((1L to 10L).map(i => (i, 1.0))),
      tableProperties = Map("manifest.gc-grace-ms" -> "0"))
    t.overwrite(df((1L to 10L).map(i => (i, 2.0))))
    t.overwrite(df((1L to 10L).map(i => (i, 3.0))))
    segmentFiles(s"$wh/db/t").size shouldBe 3

    t.expireSnapshots(keepLast = 1) shouldBe 2

    // only the head's segment survives; data still reads
    segmentFiles(s"$wh/db/t").size shouldBe 1
    t.read.agg(max("v")).collect().head.getDouble(0) shouldBe 3.0
  }

  test("expireSnapshots keeps segments a tagged snapshot still references") {
    val (cat, wh) = fresh()
    val t = cat.table("db.t")
    t.createOrReplace(df((1L to 10L).map(i => (i, 1.0))),
      tableProperties = Map("manifest.gc-grace-ms" -> "0"))
    t.createTag("v1-audit")
    t.overwrite(df((1L to 10L).map(i => (i, 2.0))))
    t.overwrite(df((1L to 10L).map(i => (i, 3.0))))

    t.expireSnapshots(keepLast = 1)

    // the tagged version is retained, so its segment must survive
    t.readTag("v1-audit").agg(max("v")).collect().head.getDouble(0) shouldBe 1.0
  }

  test(".manifests metadata table reports the segment tree") {
    val (cat, _) = fresh()
    val t = cat.table("db.t")
    t.createOrReplace(df((1L to 10L).map(i => (i, 1.0))))
    t.append(df((11L to 20L).map(i => (i, 2.0))))

    val rows = t.manifestsDF.orderBy("min_sequence").collect()
    rows.length shouldBe 2
    rows.map(_.getAs[Long]("entry_count")).sum shouldBe
      t.currentSnapshot.get.entries.size.toLong
    // the append's segment sequences strictly after the create's
    rows(1).getAs[Long]("min_sequence") should be >
      rows(0).getAs[Long]("max_sequence")
    all(rows.map(_.getAs[Long]("length"))) should be > 0L
  }

  test("the pre-segment inline-entry snapshot format still reads") {
    val (cat, wh) = fresh()
    val t = cat.table("db.t")
    t.createOrReplace(df(Seq((1L, 1.0), (2L, 2.0))))
    val s = t.currentSnapshot.get
    s.entries.size shouldBe 1
    val e = s.entries.head

    // hand-write a legacy-format table: same data dir, inline entries
    val legacyLoc = Paths.get(wh, "db", "legacy")
    Files.createDirectories(legacyLoc.resolve("data"))
    Files.move(Paths.get(wh, "db", "t", "data", e.dir),
      legacyLoc.resolve("data").resolve(e.dir))
    Files.createDirectories(legacyLoc.resolve("_meta"))
    val statsJson = e.stats.map { case (c, (mn, mx)) =>
      s""""$c":{"min":"$mn","max":"$mx"}"""
    }.mkString(",")
    val inline =
      s"""{"version":1,"parent":null,"operation":"create-or-replace",
         |"timestampMs":${s.timestampMs},"schema":${jsonStr(s.schema.json)},
         |"partitionCols":[],
         |"entries":[{"dir":"${e.dir}","partition":null,"stats":{$statsJson},"seq":1}],
         |"properties":{},"summary":{}}""".stripMargin
    Files.write(legacyLoc.resolve("_meta").resolve("v00001.json"),
      inline.getBytes(StandardCharsets.UTF_8))

    val legacy = cat.table("db.legacy")
    legacy.read.orderBy("id").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    // and the first commit ON TOP of the legacy format re-homes the
    // manifest into segments
    legacy.append(df(Seq((3L, 3.0))))
    snapshotJson(s"$wh/db/legacy", 2) should include("\"segments\"")
    legacy.read.count() shouldBe 3
  }

  private def jsonStr(s: String): String =
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .writeValueAsString(s)
}
