package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.store.LakeCatalog

/** Quantifies the driver-side manifest costs under the two-level
  * manifest tree (`LakeTable` scaladoc: snapshot JSON → immutable
  * segment files with cross-commit reuse). The probe grows a
  * partitioned table to >= 1e5 manifest entries through the PUBLIC API
  * (partitioned appends: one entry per partition per append), and at
  * checkpoints measures everything that scales with the manifest:
  *
  *  - append commit wall — with segment reuse this should stay
  *    O(batch), flat in table size (the pre-segment format re-wrote the
  *    whole manifest every commit: 24 MB per append at 1e5 entries);
  *  - commit metadata bytes: snapshot JSON size + NEW segment bytes
  *    this commit wrote (delta of the manifests dir);
  *  - snapshot load wall (segment parse, warm via the immutable cache);
  *  - planning wall: stats-pruning the full entry list for a selective
  *    predicate (driver CPU, O(entries) — the remaining driver bound);
  *  - pruned-read wall: executing the pruned scan (should track the
  *    surviving slice, not the manifest size).
  *
  * Then compacts (`rewriteDataFiles` collapses entries to one per
  * current partition) and re-measures — post-compaction everything
  * returns to the small-table regime, the same `rewrite_manifests`
  * cadence real Iceberg operates on.
  *
  * `runMain graft.ManifestProbe [appends] [partsPerAppend]` (defaults
  * 50 x 2000 = 1e5 entries).
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val appends = args.headOption.map(_.toInt).getOrElse(50)
    val parts = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val spark = GraftSession.builder(appName = "graft-manifest-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cat = new LakeCatalog(spark,
      s"${sys.props("java.io.tmpdir")}/graft_probe_manifest")
    cat.dropTable("probe.wide")
    cat.createDatabase("probe")
    val t = cat.table("probe.wide")

    def batch(i: Int) = spark.range(parts).select(
      col("id").as("p"),
      lit(i.toLong).as("v"),
      (col("id") * i).as("payload"))

    def timed[A](name: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val hfs = new org.apache.hadoop.fs.Path(t.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def metaBytes(): Long = {
      val head = t.currentSnapshot.get.version
      hfs.getFileStatus(new org.apache.hadoop.fs.Path(
        s"${t.location}/_meta/" + f"v$head%05d.json")).getLen
    }

    // total bytes of segment files on disk — the delta across a commit
    // is the metadata that commit actually WROTE (reuse writes nothing)
    def segBytes(): Long = {
      val p = new org.apache.hadoop.fs.Path(s"${t.location}/_meta/manifests")
      if (!hfs.exists(p)) 0L
      else hfs.listStatus(p).map(_.getLen).sum
    }

    def measure(label: String, appendSecs: Double, committedBytes: Long): Unit = {
      val s = t.currentSnapshot.get
      val (_, loadS) = timed("load")(t.snapshot(s.version))
      // planning: stats-prune the WHOLE entry list for one append's slice
      val (pruned, pruneS) = timed("prune")(
        t.prunedEntries(s, col("v") === lit(1L)))
      val (_, readS) = timed("read")(
        t.readWhere(col("v") === lit(1L))
          .write.format("noop").mode("overwrite").save())
      println(f"MANIFEST $label%-16s entries=${s.entries.size}%7d " +
        f"append=${appendSecs}%6.2fs load=${loadS}%6.3fs " +
        f"prune=${pruneS}%6.3fs (survivors=${pruned.size}) " +
        f"pruned_read=${readS}%6.2fs snap=${metaBytes() / 1024}%5d KiB " +
        f"commit_meta=${committedBytes / 1024}%7d KiB")
    }

    val (_, t0s) = timed("create")(t.createOrReplace(batch(0), partitionBy = Seq("p")))
    measure("n=1", t0s, metaBytes() + segBytes())
    val checkpoints = Set(1, appends / 10, appends / 3, 2 * appends / 3, appends - 1)
    (1 until appends).foreach { i =>
      val segBefore = segBytes()
      val (_, s) = timed("append")(t.append(batch(i)))
      if (checkpoints(i)) measure(s"n=${i + 1}", s, metaBytes() + (segBytes() - segBefore))
    }

    // compaction collapses entries to one per CURRENT partition — the
    // rewrite_manifests-cadence reset the ceiling is documented against
    val ((removed, added), compactS) = timed("compact")(t.rewriteDataFiles())
    println(f"MANIFEST compact          rewrote=$removed -> $added entries in ${compactS}%6.2fs")
    val segBefore = segBytes()
    val (_, postAppendS) = timed("append")(t.append(batch(appends)))
    measure("post-compact", postAppendS, metaBytes() + (segBytes() - segBefore))
    val (n, expireS) = timed("expire")(t.expireSnapshots(keepLast = 1))
    println(f"MANIFEST expire           dropped=$n snapshots in ${expireS}%6.2fs")
    measure("post-expire", 0.0, 0L)
    cat.dropTable("probe.wide") // ~1e5 tiny dirs — don't leave them behind
    spark.stop()
  }
}
