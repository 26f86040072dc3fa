package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.LakeTable

/** Incrementally-maintained aggregate table — materialized-view
  * maintenance over an APPEND-ONLY LakeTable source (the ledger /
  * event-stream rollup every warehouse keeps).
  *
  * `refresh` reads ONLY the source rows committed since the last
  * refresh (the store's incremental scan, `LakeTable.changes`),
  * partially aggregates that increment, combines it with the current
  * totals of exactly the touched groups (one broadcast-or-hash join
  * against the rollup table, which is O(groups), not O(source)), and
  * upserts the combined rows. The refreshed source-version watermark
  * rides the SAME merge commit (`rollup.source-version` in the table
  * properties), so a crash between "apply delta" and "advance
  * watermark" cannot double-count: either both landed or neither did —
  * the replay-safety shape of Iceberg-based incremental pipelines.
  *
  * Scale: refresh cost tracks the INCREMENT (the appended slice +
  * an aggregate-sized join), never the source table. Use exact
  * (decimal/integral) measures — their sums are order-independent, so
  * an incrementally-maintained total is bit-equal to a full recompute,
  * which is what the c30 oracle asserts.
  *
  * Restricted to append-only sources by design: a COW rewrite re-emits
  * rewritten rows in `changes` and would double-count. `refresh`
  * REFUSES (rather than corrupts) when a non-append commit entered the
  * range; the recovery is a full rebuild via [[rebuild]].
  */
object Rollup {

  val WatermarkProp = "rollup.source-version"

  /** Set (atomically, on the watermark merge commit) when a MoR-range
    * refresh may have minted n=0 tombstone groups; cleared once a sweep
    * completes. Lets append-only refreshes skip the tombstone probe
    * entirely unless a crashed sweep left debt behind. */
  val PendingSweepProp = "rollup.pending-sweep"

  // NOTE: create-or-replace is deliberately NOT an append op — a
  // replace inside the refresh range invalidates every prior total
  // (the rows the watermark accounted for are gone), so it must refuse
  // and route to rebuild, not silently compound stale state.
  // "publish" is deliberately NOT append-safe either: fastForward never
  // audits the BRANCH lineage, so a branch that ran a COW merge/delete
  // re-surfaces its rewritten rows as adds in `changes` and the rollup
  // would double-count them — refuse and rebuild. "cherry-pick" IS safe
  // (it audits the branch append-only before importing) and `changes`
  // diffs it like an append.
  private val AppendOps = Set("append", "append-evolve", "cherry-pick")

  // Merge-on-read commits fold incrementally too: their NET row change
  // is expressible — `changes` emits the added row versions (inserts +
  // update post-images), `removedChanges` reconstructs the masked-away
  // ones (delete victims + update pre-images) — so the delta is the
  // SIGNED union of both. COW merge/delete/overwrite/compaction stay
  // refused: they rewrite entries, which breaks both scans'
  // entries-only-accumulate assumption.
  private val MorOps = Set("merge-mor", "delete-mor")

  private def aggregated(rows: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String], maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil): DataFrame = {
    val aggs = ((count(lit(1)).as("n") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))) ++
      maxCols.map(c => max(col(c)).as(s"max_$c"))) ++
      minCols.map(c => min(col(c)).as(s"min_$c"))
    rows.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full rebuild: aggregate the WHOLE source at its current version.
    * The bootstrap, and the recovery path after non-append commits. */
  def rebuild(src: LakeTable, dst: LakeTable, groupCols: Seq[String],
      sumCols: Seq[String], maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil): Unit = {
    val v = src.currentSnapshot.get.version
    dst.createOrReplace(
      aggregated(src.read, groupCols, sumCols, maxCols, minCols),
      tableProperties = Map(WatermarkProp -> v.toString))
    ()
  }

  /** Incremental refresh; bootstraps via [[rebuild]] when the rollup
    * does not exist yet. Returns the number of source versions folded
    * in (0 = already current).
    *
    * `maxCols`/`minCols` add MAX/MIN measures — INVERTIBLE under
    * inserts (fold via greatest/least with the current total) but NOT
    * under deletes (the departed row may have been the extremum), so a
    * MoR-range refresh re-aggregates them over exactly the TOUCHED
    * groups from the source — the standard maintenance shape for
    * non-invertible aggregates — while n/sum stay purely incremental.
    * The re-agg's SHUFFLE is O(touched groups' rows); its SCAN is
    * stats/bloom-pruned to entries that can contain touched groups
    * when the key set inlines ([[touchedPrunePredicate]]), and
    * degrades to a full source scan otherwise. */
  def refresh(src: LakeTable, dst: LakeTable, groupCols: Seq[String],
      sumCols: Seq[String], maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil): Long =
      // the refresh's own probe actions (null-group guard, delta
      // materialization, tombstone sweep) all run over aggregate-sized
      // frames — bytes-first coalescing keeps them from paying one
      // local task floor per shuffle partition (see StoreConf)
      graft.store.StoreConf.bytesFirstCoalesce(src.spark) {
    // capture the snapshot ONCE: the version check and the tiny-source
    // heuristic below must observe the same snapshot (a concurrent
    // commit between two currentSnapshot reads could diverge them), and
    // one metadata read per refresh is all a lifecycle-dense table
    // should pay
    val srcSnap = src.currentSnapshot.get
    val srcV = srcSnap.version
    if (!dst.exists) {
      rebuild(src, dst, groupCols, sumCols, maxCols, minCols); return srcV
    }
    val lastV = dst.properties.getOrElse(WatermarkProp,
      throw new IllegalStateException(
        s"${dst.name} exists but carries no $WatermarkProp — not a rollup table")).toLong
    if (srcV == lastV) return 0L
    // driver-side metadata probe — a snapshotsDF collect here would pay
    // one local Spark job per refresh (r10 bench: commit/probe overhead,
    // not data, dominated the lifecycle-dense queries)
    val range = src.operationsBetween(lastV, srcV)
    require(range.forall(op => AppendOps(op) || MorOps(op)),
      s"source ${src.name} had non-append commit(s) since v$lastV " +
        s"(${range.filterNot(op => AppendOps(op) || MorOps(op)).mkString(", ")}) — " +
        "the incremental scan would re-emit rewritten rows; rebuild the " +
        "rollup instead")
    val mor = range.exists(MorOps)
    val addAgg = aggregated(src.changes(lastV, Some(srcV)), groupCols, sumCols,
      if (mor) Nil else maxCols, if (mor) Nil else minCols)
    val base = if (mor) {
      // negative partial aggregate of the masked-away rows, combined
      // with the positive one at aggregate size (both sides are
      // O(groups-touched), the union re-agg is metadata-cheap)
      val remAgg = aggregated(
        src.removedChanges(lastV, Some(srcV)), groupCols, sumCols)
        .select(groupCols.map(col) ++
          ((-col("n")).as("n") +:
            sumCols.map(c => (-col(s"sum_$c")).as(s"sum_$c"))): _*)
      val reAggs = sum(col("n")).as("n") +:
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
      addAgg.unionByName(remAgg)
        .groupBy(groupCols.map(col): _*)
        .agg(reAggs.head, reAggs.tail: _*)
    } else addAgg
    val extrema = mor && (maxCols.nonEmpty || minCols.nonEmpty)
    // the extrema branch runs TWO actions over the delta aggregate
    // (the inline-keys collect, then the merge) — cache it
    val cachedBase =
      if (extrema)
        base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else base
    val delta = (if (extrema) {
      // max/min are non-invertible under deletes: re-aggregate them
      // over exactly the touched groups (the delta keys,
      // aggregate-sized, broadcast into the source scan). A fully-
      // deleted group gets null extrema and n=0 — the sweep removes it.
      // The SCAN side is pruned too: the touched keys are pushed into
      // the store's stats/bloom entry pruning (readWhere) whenever the
      // key set is small enough to inline, so on a group-clustered or
      // partitioned 100 TB source the re-agg plans only the entries
      // that can contain touched groups instead of the whole table.
      // When the keys don't inline (or stats can't help) this falls
      // back to a full-table SCAN — an O(source) IO pass; the shuffle
      // stays O(touched groups' rows) either way.
      val touched = cachedBase.select(groupCols.map(col): _*)
      val exactAggs = maxCols.map(c => max(col(c)).as(s"max_$c")) ++
        minCols.map(c => min(col(c)).as(s"min_$c"))
      // a tiny source (few manifest entries) skips the predicate
      // entirely: pruning can't beat a full scan of a handful of
      // files, and the distinct().collect() behind the predicate is a
      // driver-side Spark action PER refresh — lifecycle-dense tables
      // would pay it four or five times for zero skipped entries
      val exactSrc =
        if (srcSnap.entries.size <= MinEntriesForTouchedPrune)
          src.read
        else touchedPrunePredicate(groupCols, touched)
          .map(src.readWhere).getOrElse(src.read)
      val exact = exactSrc.join(broadcast(touched), groupCols)
        .groupBy(groupCols.map(col): _*)
        .agg(exactAggs.head, exactAggs.tail: _*)
      cachedBase.join(exact, groupCols, "left")
    } else cachedBase)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      refreshDelta(dst, groupCols, sumCols, maxCols, minCols, delta,
        srcV, lastV, mor = mor)
    } finally {
      delta.unpersist()
      if (extrema) cachedBase.unpersist()
      ()
    }
  }

  /** Read-side DERIVED-MEASURE facade: averages over the maintained
    * rollup. AVG is deliberately NOT maintained as state — a running
    * average would need its own (drift-prone) fold, while the ratio of
    * the exactly-maintained components can never drift — so it is
    * derived at read time from the `n` / `sum_<c>` columns every
    * refresh keeps exact. The standard materialized-view treatment of
    * non-summarizable measures; adds one `avg_<c>` DOUBLE per sum
    * column, null for an n=0 tombstone group awaiting its sweep. */
  def readWithAverages(dst: LakeTable, sumCols: Seq[String]): DataFrame =
    sumCols.foldLeft(dst.read)((df, c) =>
      df.withColumn(s"avg_$c",
        when(col("n") =!= 0L,
          col(s"sum_$c").cast("double") / col("n").cast("double"))))

  /** Cap on the touched-group key count inlined into the extrema
    * re-aggregation's pruning predicate; past this the IN-list bloats
    * plan/stats evaluation for little skipping benefit. */
  private[graft] val MaxInlineTouchedKeys = 10000

  /** Sources at or below this many manifest entries skip the touched-
    * keys pruning predicate (and its per-refresh collect action)
    * entirely — scanning a handful of files costs less than the
    * distinct().collect() that would decide what to skip. */
  private[graft] val MinEntriesForTouchedPrune = 8

  /** Entry-pruning predicate for the MoR-extrema re-aggregation scan:
    * the distinct touched values of the FIRST group column, inlined as
    * an IN-list the store's stats/bloom pruning understands
    * ([[graft.store.LakeTable.readWhere]]). A superset predicate by
    * construction (multi-column groups prune on one column; the
    * broadcast join downstream restricts exactly), so this is purely a
    * scan-reduction path — dropping it is always safe. Returns None
    * (full scan) when the key set exceeds [[MaxInlineTouchedKeys]],
    * contains nulls (which `IN` cannot match and the null-group
    * refusal downstream rejects anyway), or is empty. */
  private[graft] def touchedPrunePredicate(groupCols: Seq[String],
      touched: DataFrame): Option[org.apache.spark.sql.Column] = {
    val c = groupCols.head
    val keys = touched.select(col(c)).distinct()
      .limit(MaxInlineTouchedKeys + 1).collect().map(_.get(0))
    if (keys.isEmpty || keys.length > MaxInlineTouchedKeys ||
        keys.contains(null)) None
    else Some(col(c).isInCollection(keys.toIndexedSeq))
  }

  private def refreshDelta(dst: LakeTable, groupCols: Seq[String],
      sumCols: Seq[String], maxCols: Seq[String], minCols: Seq[String],
      delta: DataFrame, srcV: Long, lastV: Long,
      mor: Boolean): Long = {
    // MERGE matches keys with plain (Iceberg) equality, which can never
    // match a NULL group key — a null group would INSERT a duplicate
    // total row instead of replacing its own. Refuse up front (the
    // delta is aggregate-sized, so the probe is cheap); coalesce the
    // group column in the source projection to lift the restriction.
    require(delta.filter(groupCols.map(col(_).isNull).reduce(_ || _)).isEmpty,
      s"rollup group key(s) ${groupCols.mkString(",")} contain NULLs — " +
        "MERGE key equality cannot replace a null-keyed group; coalesce " +
        "the group column to a sentinel before rolling up")
    // combine with the current totals of the touched groups only; the
    // rollup side is aggregate-sized, so this join is cheap at any
    // scale (null-safe equality as belt-and-suspenders under the
    // refusal above)
    val cur = dst.read.select(
      groupCols.map(c => col(c).as(s"__ck_$c")) ++
        (col("n").as("__cur_n") +:
          sumCols.map(c => col(s"sum_$c").as(s"__cur_$c"))) ++
        maxCols.map(c => col(s"max_$c").as(s"__curm_$c")) ++
        minCols.map(c => col(s"min_$c").as(s"__curn_$c")): _*)
    val joinCond = groupCols.map(c => col(c) <=> col(s"__ck_$c")).reduce(_ && _)
    // append-range extrema fold against the current total (greatest/
    // least skip nulls, so a new group takes the delta side); MoR-range
    // extrema are already the exact touched-group re-aggregate → REPLACE
    val extremaOut = maxCols.map(c =>
      (if (mor) col(s"max_$c")
       else greatest(col(s"max_$c"), col(s"__curm_$c"))).as(s"max_$c")) ++
      minCols.map(c =>
        (if (mor) col(s"min_$c")
         else least(col(s"min_$c"), col(s"__curn_$c"))).as(s"min_$c"))
    val combined = delta.join(cur, joinCond, "left")
      .select(groupCols.map(col) ++
        ((col("n") + coalesce(col("__cur_n"), lit(0L))).as("n") +:
          sumCols.map(c =>
            (col(s"sum_$c") + coalesce(col(s"__cur_$c"), lit(0))).as(s"sum_$c"))) ++
        extremaOut: _*)
    // tombstones (n=0 groups) can only be MINTED by a MoR range, so the
    // watermark merge flags pending-sweep=true exactly then; the flag
    // stays set until a sweep completes, covering a crash between this
    // merge and the sweep below even if every later refresh is
    // append-only (which would otherwise serve tombstones forever).
    dst.mergeInto(combined, groupCols,
      extraProperties = Map(WatermarkProp -> srcV.toString) ++
        (if (mor) Map(PendingSweepProp -> "true") else Map.empty))
    // full-recompute parity under MoR deletes: a group whose live row
    // count reached exactly zero must LEAVE the rollup (GROUP BY emits
    // no empty groups). The sweep is a separate idempotent commit AFTER
    // the watermark-carrying merge — a crash between the two leaves
    // only exact n=0 tombstone rows (totals correct, group dead), which
    // the next flagged refresh's sweep removes; it can never
    // double-count. Append-only ranges probe ONLY when the flag is set
    // (one aggregate-sized read, off the hot ingest path otherwise). An
    // append delta that touches a tombstone group lifts its n above
    // zero BEFORE the sweep reads it, so a re-born group is never swept.
    if (mor || dst.properties.get(PendingSweepProp).contains("true")) {
      val dead = dst.read.filter(col("n") === 0).select(groupCols.map(col): _*)
      if (!dead.isEmpty) { dst.deleteWhereExists(dead, groupCols); () }
      dst.setProperties(Map(PendingSweepProp -> "false"))
      ()
    }
    srcV - lastV
  }
}
