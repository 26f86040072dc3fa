package graft.maintenance

import java.nio.file.Files

import graft.SparkSpec
import graft.ledger.Watermark
import graft.store.{CommitConflictException, LakeCatalog}

/** Maintenance racing a live writer: the base-snapshot validation makes
  * a conflicted compaction throw instead of clobbering the writer's
  * commit, and Maintenance must treat that as a benign SKIP (retry next
  * interval), never a failure — the daemon's failure accounting and the
  * follow-on procedures stay clean. */
class MaintenanceConflictSpec extends SparkSpec {

  private def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("maint-conflict").toString)

  test("a commit conflict records 'skipped', not 'failed', and does not gate followers") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    val ok = Maintenance.recorded(cat, "dag", "s.hot", "rewrite_data_files", None) {
      throw new CommitConflictException(
        "rewrite-data-files on s.hot read v3 but the table is at v4", null)
    }
    ok shouldBe true // followers (expire) are not gated by a benign skip
    val row = cat.table(Watermark.MaintenanceTable).read
      .select("procedure_type", "status", "error_message").collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2))).toSeq
    row.map(r => (r._1, r._2)) shouldBe Seq(("rewrite_data_files", "skipped"))
    row.head._3 should include("v4")
  }

  test("non-conflict exceptions still record 'failed' and gate followers") {
    val cat = freshCatalog()
    Watermark.ensureWatermarkTables(cat)
    val ok = Maintenance.recorded(cat, "dag", "s.bad", "rewrite_data_files", None) {
      throw new IllegalStateException("boom")
    }
    ok shouldBe false
    cat.table(Watermark.MaintenanceTable).read
      .select("status").collect().map(_.getString(0)).toSeq shouldBe Seq("failed")
  }
}
