package graft.ledger

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.maintenance.{Maintenance, ProcessedTableTracker}
import graft.store.LakeCatalog

class WatermarkSpec extends SparkSpec {

  private def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("wm-test").toString)

  test("ensureWatermarkTables creates both ledgers idempotently") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    Watermark.ensureWatermarkTables(cat) // second call is a no-op
    cat.tableExists(Watermark.CdcTable) shouldBe true
    cat.tableExists(Watermark.MaintenanceTable) shouldBe true
    cat.table(Watermark.CdcTable).read.count() shouldBe 0
    cat.table(Watermark.CdcTable).currentSnapshot.get.version shouldBe 1L
  }

  test("appendCdcWatermark records full and heartbeat rows") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    Watermark.appendCdcWatermark(cat, "dag1", "svc_db", "t1",
      eventCount = 100, maxEventTs = Some(Timestamp.valueOf("2026-01-02 03:04:05")),
      minOffset = Some(10L), maxOffset = Some(109L), batchId = Some(7L),
      processingDurationSec = Some(1.5))
    // heartbeat: zero events, everything else NULL (cdc_pipeline.py:427-439)
    Watermark.appendCdcWatermark(cat, "dag1", "svc_db", "t1",
      eventCount = 0, maxEventTs = None)
    val rows = cat.table(Watermark.CdcTable).read.orderBy("event_count").collect()
    rows.length shouldBe 2
    rows(0).getLong(rows(0).fieldIndex("event_count")) shouldBe 0L
    assert(rows(0).isNullAt(rows(0).fieldIndex("max_event_ts")))
    assert(rows(0).isNullAt(rows(0).fieldIndex("min_offset")))
    rows(1).getLong(rows(1).fieldIndex("max_offset")) shouldBe 109L
    rows(1).getDouble(rows(1).fieldIndex("processing_duration_sec")) shouldBe 1.5
  }

  test("mergeCdcWatermark upserts on (dag, schema, table)") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    Watermark.mergeCdcWatermark(cat, "dag1", "s", "t", 5, None)
    Watermark.mergeCdcWatermark(cat, "dag1", "s", "t", 9, None)
    Watermark.mergeCdcWatermark(cat, "dag2", "s", "t", 3, None)
    val rows = cat.table(Watermark.CdcTable).read
      .select("dag_id", "event_count").orderBy("dag_id").collect()
    rows.map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("dag1", 9L), ("dag2", 3L))
  }

  test("concurrent thread-per-topic appends never lose rows") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    val threads = (1 to 6).map { i =>
      new Thread(() => Watermark.appendCdcWatermark(
        cat, "dag", "s", s"topic$i", i.toLong, None))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    cat.table(Watermark.CdcTable).read.count() shouldBe 6
  }

  test("getLastCompletedMap + shouldRun gating") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    val old = new Timestamp(System.currentTimeMillis() - 10000 * 1000)
    val recent = new Timestamp(System.currentTimeMillis() - 10 * 1000)
    Watermark.appendMaintenanceWatermark(cat, "dag", "s", "t1", "rewrite_data_files",
      old, Some(old), 1.0, "success")
    Watermark.appendMaintenanceWatermark(cat, "dag", "s", "t1", "rewrite_data_files",
      recent, Some(recent), 1.0, "success")
    Watermark.appendMaintenanceWatermark(cat, "dag", "s", "t2", "rewrite_data_files",
      recent, Some(recent), 1.0, "failed", errorMessage = Some("boom"))

    val m = Watermark.getLastCompletedMap(cat, Seq("s.t1", "s.t2", "s.t3"),
      "rewrite_data_files")
    m("s.t1").get.getTime shouldBe recent.getTime // MAX of successes
    m("s.t2") shouldBe None // failures don't count
    m("s.t3") shouldBe None // never run

    Watermark.shouldRun(None, 3600) shouldBe true
    Watermark.shouldRun(m("s.t1"), 3600) shouldBe false // 10s ago < 1h
    Watermark.shouldRun(m("s.t1"), 5) shouldBe true // 10s ago >= 5s
  }

  test("purgeWatermarks drops old rows but keeps newest per key") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    val t = cat.table(Watermark.CdcTable)
    import spark.implicits._
    val dayMs = 24L * 3600 * 1000
    val mk = (table: String, daysAgo: Int, n: Long) =>
      (("dag", "s", table, null, null,
        new Timestamp(System.currentTimeMillis() - daysAgo * dayMs),
        null, null, n, null, null))
    val rows = Seq(
      mk("stale", 30, 1L), mk("stale", 20, 2L), // both old → keep only newest
      mk("mixed", 30, 3L), mk("mixed", 0, 4L) // old+fresh → keep fresh only? old dropped
    ).toDF(Watermark.CdcSchema.fieldNames.toIndexedSeq: _*)
    t.overwrite(rows.select(Watermark.CdcSchema.fieldNames.map(c =>
      col(c).cast(Watermark.CdcSchema(c).dataType)).toIndexedSeq: _*))

    Watermark.purgeWatermarks(cat, retentionDays = 14)
    val kept = t.read.select("table_name", "event_count")
      .orderBy("event_count").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    kept shouldBe Seq(("stale", 2L), ("mixed", 4L))
  }

  test("purge drops retired streams' replay marks, keeps active and idle-heartbeat ones") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    val t = cat.table(Watermark.CdcTable)
    import spark.implicits._
    val dayMs = 24L * 3600 * 1000
    // rows built by hand: appendCdcWatermark stamps processed_at = NOW,
    // so aging a stream needs direct writes (same idiom as the purge test)
    val mk = (table: String, daysAgo: Int, n: Long, batch: java.lang.Long) =>
      (("dag", "s", table, null, null,
        new Timestamp(System.currentTimeMillis() - daysAgo * dayMs),
        null, null, n, null, batch))
    val rows = Seq(
      mk("retired", 30, 10L, 41L), // last batch row far outside retention
      mk("active", 0, 5L, 7L), // batch row today
      mk("idle", 30, 9L, 3L), // old batch row ...
      mk("idle", 0, 0L, null) // ... but heartbeating today = alive
    ).toDF(Watermark.CdcSchema.fieldNames.toIndexedSeq: _*)
    t.overwrite(rows.select(Watermark.CdcSchema.fieldNames.map(c =>
      col(c).cast(Watermark.CdcSchema(c).dataType)).toIndexedSeq: _*))
    t.setProperties(Map(
      "cdc.last-batch.dag.s.retired" -> "41",
      "cdc.last-batch.dag.s.active" -> "7",
      "cdc.last-batch.dag.s.idle" -> "3"))

    Watermark.purgeWatermarks(cat, retentionDays = 14)

    val props = t.properties
    props.contains("cdc.last-batch.dag.s.retired") shouldBe false
    props.get("cdc.last-batch.dag.s.active") shouldBe Some("7")
    // a live-but-idle stream heartbeats every empty round: presence
    // inside retention, even batch-less, keeps its mark
    props.get("cdc.last-batch.dag.s.idle") shouldBe Some("3")
  }

  test("value-guarded property removal keeps a key a racer re-set") {
    // the purge's read-then-remove race: a silent stream's first
    // in-months batch lands a NEW mark value between the live-stream
    // scan and the remove commit — the guard must keep that key
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    val t = cat.table(Watermark.CdcTable)
    t.setProperties(Map(
      "cdc.last-batch.dag.s.silent" -> "41",
      "cdc.last-batch.dag.s.gone" -> "12"))
    // scan-time snapshot (what purgeStaleCdcBatchProps captures) ...
    val scanned = Map(
      "cdc.last-batch.dag.s.silent" -> "41",
      "cdc.last-batch.dag.s.gone" -> "12")
    // ... then the racer commits a fresh batch mark before the remove
    t.setProperties(Map("cdc.last-batch.dag.s.silent" -> "42"))
    t.removePropertiesIfUnchanged(scanned)
    val props = t.properties
    props.get("cdc.last-batch.dag.s.silent") shouldBe Some("42") // racer wins
    props.contains("cdc.last-batch.dag.s.gone") shouldBe false // untouched → dropped
  }

  test("runCompaction records success rows and actually compacts") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    cat.createDatabase("s")
    import spark.implicits._
    cat.table("s.data").createOrReplace(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(8))
    Maintenance.runCompaction(cat, "dag", "s.data")
    val wm = cat.table(Watermark.MaintenanceTable).read
      .select("procedure_type", "status").orderBy("procedure_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    wm shouldBe Seq(("expire_snapshots", "success"), ("rewrite_data_files", "success"))
    cat.table("s.data").read.count() shouldBe 100
    cat.table("s.data").history.count() shouldBe 1 // expire kept only newest
  }

  test("runCompaction with Sort/ZOrder strategies clusters and records the same ledger rows") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    cat.createDatabase("s")
    import spark.implicits._
    cat.table("s.zdata").createOrReplace(
      (for (x <- 1L to 40L; y <- 1L to 40L) yield (x, y)).toDF("x", "y")
        .repartition(8))
    Maintenance.runCompaction(cat, "dag", "s.zdata",
      targetFileBytes = 4 * 1024, strategy = Maintenance.ZOrder(Seq("x", "y")))
    val wm = cat.table(Watermark.MaintenanceTable).read
      .select("procedure_type", "status").orderBy("procedure_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    wm shouldBe Seq(("expire_snapshots", "success"), ("rewrite_data_files", "success"))
    val snap = cat.table("s.zdata").currentSnapshot.get
    snap.operation shouldBe "rewrite-data-files-zorder"
    snap.summary("zorder-by") shouldBe "x,y"
    cat.table("s.zdata").read.count() shouldBe 1600
  }

  test("runCompaction failure records failed + skipped, never throws") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    Maintenance.runCompaction(cat, "dag", "s.missing") // table does not exist
    val wm = cat.table(Watermark.MaintenanceTable).read
      .select("procedure_type", "status", "error_message").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    wm shouldBe Seq(("expire_snapshots", "skipped"), ("rewrite_data_files", "failed"))
  }

  test("runOrphanCleanup records the orphan count") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    cat.createDatabase("s")
    import spark.implicits._
    val t = cat.table("s.o")
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))
    t.overwrite(Seq((2L, "b")).toDF("id", "v"))
    t.expireSnapshots(keepLast = 1)
    Maintenance.runOrphanCleanup(cat, "dag", "s.o", orphanOlderThanDays = 0)
    val row = cat.table(Watermark.MaintenanceTable).read
      .filter(col("procedure_type") === "remove_orphan_files").head
    row.getString(row.fieldIndex("status")) shouldBe "success"
  }

  test("ProcessedTableTracker marks and clears under concurrency") {
    val tr = new ProcessedTableTracker
    val threads = (1 to 8).map(i => new Thread(() => tr.mark(s"t${i % 4}")))
    threads.foreach(_.start()); threads.foreach(_.join())
    tr.getAndClear() shouldBe Set("t0", "t1", "t2", "t3")
    tr.getAndClear() shouldBe Set.empty
  }
}
