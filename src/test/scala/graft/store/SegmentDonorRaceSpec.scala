package graft.store

import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** A local FileSystem whose `setTimes` ALWAYS fails — the shim for the
  * donor-race spec below. Everything else (reads, writes, lists,
  * renames) delegates to the real local FS, so LakeTable commits run
  * end-to-end; only the mtime touch is refused. */
class NoTouchFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "notouch"
  override def getUri: URI = URI.create("notouch:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    throw new java.io.IOException("setTimes refused (NoTouchFileSystem shim)")
}

/** Segment-donor liveness vs a racing sweep: reusing a donor segment is
  * only safe after TOUCHING it (the sweep's age guard re-protects a
  * fresh mtime for a full grace window). When the touch itself fails,
  * the commit must NOT claim the donor — it rewrites the entries into
  * fresh segment files — because a sweep whose stat predates the commit
  * could still delete the donor, leaving the new snapshot dangling. */
class SegmentDonorRaceSpec extends SparkSpec {

  private def freshNoTouch(): (LakeCatalog, String) = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.notouch.impl", classOf[NoTouchFileSystem].getName)
    val local = Files.createTempDirectory("donor-race").toString
    (new LakeCatalog(spark, s"notouch://$local"), local)
  }

  private def df(rows: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def segmentFiles(localLocation: String): Set[String] = {
    val dir = Paths.get(localLocation, "_meta", "manifests").toFile
    if (!dir.exists) Set.empty
    else dir.listFiles().map(_.getName).filter(_.startsWith("seg-")).toSet
  }

  private def referencedSegments(localLocation: String, version: Long): Set[String] = {
    val json = new String(Files.readAllBytes(
      Paths.get(localLocation, "_meta", f"v$version%05d.json")),
      StandardCharsets.UTF_8)
    "\"file\"\\s*:\\s*\"([^\"]+)\"".r.findAllMatchIn(json).map(_.group(1)).toSet
  }

  test("a refused donor touch skips reuse: the commit references only fresh segments") {
    val (cat, local) = freshNoTouch()
    val t = cat.table("db.t")
    t.createOrReplace(df((1L to 10L).map(i => (i, 1.0))))
    val tableLocal = s"$local/db/t"
    val donors = segmentFiles(tableLocal)
    donors should not be empty

    t.append(df((11L to 20L).map(i => (i, 2.0))))

    // un-touchable donors were NOT claimed — every referenced segment of
    // the new head is a file this commit wrote itself
    val refs = referencedSegments(tableLocal, t.currentSnapshot.get.version)
    (refs intersect donors) shouldBe empty
    refs should not be empty
    // the donors stay on disk for the PARENT snapshot (expiry owns them)
    donors.subsetOf(segmentFiles(tableLocal)) shouldBe true
    t.read.count() shouldBe 20
  }

  test("after the racing sweep deletes the donors, the head still reads fully") {
    val (cat, local) = freshNoTouch()
    val t = cat.table("db.t")
    t.createOrReplace(df((1L to 10L).map(i => (i, 1.0))))
    val tableLocal = s"$local/db/t"
    val donors = segmentFiles(tableLocal)
    t.append(df((11L to 20L).map(i => (i, 2.0))))

    // simulate the sweep winning the race on the un-touched donors
    donors.foreach(f =>
      Files.delete(Paths.get(tableLocal, "_meta", "manifests", f)))

    // the head referenced none of them, so a FRESH handle reads 20 rows
    val t2 = cat.table("db.t")
    t2.read.count() shouldBe 20
    t2.readWhere(org.apache.spark.sql.functions.col("id") === 15L)
      .count() shouldBe 1
  }

  test("the file:// control path still reuses donors (touch succeeds)") {
    val wh = Files.createTempDirectory("donor-race-ctl").toString
    val t = new LakeCatalog(spark, wh).table("db.t")
    t.createOrReplace(df((1L to 10L).map(i => (i, 1.0))))
    val donors = segmentFiles(s"$wh/db/t")
    t.append(df((11L to 20L).map(i => (i, 2.0))))
    val refs = referencedSegments(s"$wh/db/t", t.currentSnapshot.get.version)
    donors.subsetOf(refs) shouldBe true
  }
}
