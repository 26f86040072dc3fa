package graft.maintenance

import java.sql.Timestamp

import graft.ledger.Watermark
import graft.store.LakeCatalog

/** Thread-safe tracker of tables modified during a run — only they get
  * compaction afterwards (`/root/reference/src/utils/maintenance.py:24-42`). */
class ProcessedTableTracker {
  private val tables = scala.collection.mutable.Set[String]()

  def mark(fullTableName: String): Unit = synchronized {
    tables += fullTableName; ()
  }

  def getAndClear(): Set[String] = synchronized {
    val out = tables.toSet
    tables.clear()
    out
  }
}

/** Maintenance procedure runners over the LakeTable store, mirroring the
  * reference's Iceberg `CALL` orchestration (`maintenance.py:66-304`):
  * every run appends a `maintenance_watermark` ledger row (success /
  * failed with truncated error / skipped), and NO procedure ever
  * propagates an exception into the pipeline that triggered it.
  */
object Maintenance {

  private def now(): Timestamp = new Timestamp(System.currentTimeMillis())

  private[maintenance] def recorded(
      cat: LakeCatalog,
      dagId: String,
      fqn: String,
      procedureType: String,
      batchId: Option[Long])(
      body: => (Option[Long], Option[Long])): Boolean = {
    val Array(schema, table) = fqn.split('.')
    val wallStart = now()
    val monoStart = System.nanoTime()
    try {
      val (rewritten, added) = body
      Watermark.appendMaintenanceWatermark(cat, dagId, schema, table, procedureType,
        wallStart, Some(now()), (System.nanoTime() - monoStart) / 1e9, "success",
        rewrittenFilesCount = rewritten, addedFilesCount = added, batchId = batchId)
      true
    } catch {
      case e: graft.store.CommitConflictException =>
        // a concurrent writer landed mid-rewrite and the compaction's
        // base-snapshot validation refused to clobber it — benign: the
        // table is healthy, the work just goes to the next interval.
        // Recorded as "skipped" (like an interval gate), not "failed",
        // so the daemon's failure accounting stays clean; follow-on
        // procedures are NOT gated (nothing is broken).
        Watermark.appendMaintenanceWatermark(cat, dagId, schema, table, procedureType,
          wallStart, Some(now()), (System.nanoTime() - monoStart) / 1e9, "skipped",
          errorMessage = Some(Option(e.getMessage).getOrElse(e.toString)),
          batchId = batchId)
        true
      case e: Throwable =>
        Watermark.appendMaintenanceWatermark(cat, dagId, schema, table, procedureType,
          wallStart, Some(now()), (System.nanoTime() - monoStart) / 1e9, "failed",
          errorMessage = Some(Option(e.getMessage).getOrElse(e.toString)),
          batchId = batchId)
        false
    }
  }

  /** Clustering strategy for the compaction pass — the
    * `rewrite_data_files(strategy => ..., sort_order => ...)` procedure
    * arguments: `BinPack` (default), `Sort(cols)` (linear clustering),
    * or `ZOrder(cols)` (multi-dimensional interleaved clustering). */
  sealed trait RewriteStrategy
  case object BinPack extends RewriteStrategy
  final case class Sort(cols: Seq[String]) extends RewriteStrategy
  final case class ZOrder(cols: Seq[String]) extends RewriteStrategy

  /** rewrite_data_files + expire_snapshots in sequence; expire is skipped
    * (and recorded as such) when the rewrite failed (`maintenance.py:66-186`). */
  def runCompaction(
      cat: LakeCatalog,
      dagId: String,
      fqn: String,
      batchId: Option[Long] = None,
      targetFileBytes: Long = 128L * 1024 * 1024,
      strategy: RewriteStrategy = BinPack): Unit = {
    val rewriteOk = recorded(cat, dagId, fqn, "rewrite_data_files", batchId) {
      val (rewritten, added) = strategy match {
        case BinPack => cat.table(fqn).rewriteDataFiles(targetFileBytes)
        case Sort(cols) => cat.table(fqn).rewriteSortedDataFiles(cols, targetFileBytes)
        case ZOrder(cols) => cat.table(fqn).rewriteZOrderedDataFiles(cols, targetFileBytes)
      }
      (Some(rewritten.toLong), Some(added.toLong))
    }

    if (!rewriteOk) {
      val Array(schema, table) = fqn.split('.')
      Watermark.appendMaintenanceWatermark(cat, dagId, schema, table,
        "expire_snapshots", now(), None, 0.0, "skipped",
        errorMessage = Some("Skipped due to preceding procedure failure"),
        batchId = batchId)
      return
    }

    recorded(cat, dagId, fqn, "expire_snapshots", batchId) {
      cat.table(fqn).expireSnapshots(keepLast = 1)
      (None, None)
    }
    ()
  }

  /** `rewrite_position_delete_files`, interval-gated by the caller via
    * the pre-fetched last-success map (`maintenance.py:189-246`;
    * `cdc_pipeline.py:421-425`): folds the table's outstanding
    * merge-on-read equality-delete files into the data entries they
    * mask and clears them, recording (removed delete files, rewritten
    * entries) in the maintenance ledger like the Iceberg procedure's
    * result row. A no-op (0, 0) on copy-on-write tables. */
  def runPositionDeleteCompaction(
      cat: LakeCatalog,
      dagId: String,
      fqn: String,
      batchId: Option[Long] = None): Unit = {
    recorded(cat, dagId, fqn, "rewrite_position_delete_files", batchId) {
      val (removedDeletes, rewritten) = cat.table(fqn).rewritePositionDeleteFiles()
      (Some(removedDeletes.toLong), Some(rewritten.toLong))
    }
    ()
  }

  /** remove_orphan_files with an age threshold (`maintenance.py:249-304`). */
  def runOrphanCleanup(
      cat: LakeCatalog,
      dagId: String,
      fqn: String,
      orphanOlderThanDays: Int = 3): Unit = {
    recorded(cat, dagId, fqn, "remove_orphan_files", None) {
      val cutoff = System.currentTimeMillis() - orphanOlderThanDays * 24L * 3600 * 1000
      val removed = cat.table(fqn).removeOrphanFiles(cutoff)
      (Some(removed.toLong), None)
    }
    ()
  }
}
