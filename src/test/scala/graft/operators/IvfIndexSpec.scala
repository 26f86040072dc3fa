package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.LakeCatalog

class IvfIndexSpec extends SparkSpec {

  import spark.implicits._

  // 3 labeled clusters in 4-d space, slight per-vector jitter
  private def emb = (0L until 30L).map { i =>
    val label = (i % 3).toString
    val base = Array.tabulate(4)(j => if (j == i % 3) 10f else 0f)
    base(3) = (i % 5).toFloat * 0.1f
    (i, base, label)
  }.toDF("vec_id", "embedding", "label")

  private def freshCat =
    new LakeCatalog(spark, Files.createTempDirectory("ivf-wh").toString)

  test("build + query matches the ad-hoc ivfKnn result") {
    val cat = freshCat
    cat.createDatabase("lake")
    val corpus = emb.filter($"vec_id" >= 6)
    val queries = emb.filter($"vec_id" < 6)
    IvfIndex.build(cat, "lake", "ann", corpus)
    val viaIndex = IvfIndex.query(cat, "lake", "ann", queries, k = 3, nprobe = 2)
      .orderBy("query_id", "rank").collect().map(_.toString)
    val adHoc = Similarity.ivfKnn(queries, corpus, k = 3, nprobe = 2)
      .orderBy("query_id", "rank").collect().map(_.toString)
    viaIndex shouldBe adHoc
  }

  test("cells table is cell-partitioned and the probe scan is partition-pruned") {
    val cat = freshCat
    cat.createDatabase("lake")
    IvfIndex.build(cat, "lake", "ann", emb.filter($"vec_id" >= 6))
    val cells = cat.table("lake.ann_cells")
    cells.partitions.nonEmpty shouldBe true
    cells.partitions.forall(_.startsWith("cell=")) shouldBe true
    // a literal filter on the partition column prunes at the scan
    val plan = cells.read.filter($"cell" === "0").queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should not include "PartitionFilters: []"
    // and through readWhere (the query path), at PLANNING time too: the
    // manifest's degenerate partition ranges drop the other cells'
    // entries before any file is opened — plan size tracks nprobe, not
    // the index's cell count
    val (_, planned, total) = cells.readWhereCounted($"cell".isin("0"))
    total shouldBe cells.currentSnapshot.get.entries.size
    planned should be < total
    planned should be >= 1
  }

  test("remove retracts vectors from later probes; centroids untouched") {
    val cat = freshCat
    cat.createDatabase("lake")
    IvfIndex.build(cat, "lake", "ann", emb.filter($"vec_id" >= 6))
    val centsBefore = cat.table("lake.ann_centroids").read
      .collect().map(_.toString).sorted
    val q = emb.filter($"vec_id" === 0L)
    val before = IvfIndex.query(cat, "lake", "ann", q, k = 3, nprobe = 1)
      .collect().map(_.getLong(2))
    before should not be empty
    val victim = before.head
    IvfIndex.remove(cat, "lake", "ann",
      Seq(victim).toDF("vec_id"))
    val after = IvfIndex.query(cat, "lake", "ann", q, k = 3, nprobe = 1)
      .collect().map(_.getLong(2))
    after should not contain victim
    // the frozen quantizer is statistics, not content
    cat.table("lake.ann_centroids").read
      .collect().map(_.toString).sorted shouldBe centsBefore
  }

  test("append: frozen quantizer, old cell files intact, new vectors searchable") {
    val cat = freshCat
    cat.createDatabase("lake")
    IvfIndex.build(cat, "lake", "ann", emb.filter($"vec_id" >= 6))
    val cells = cat.table("lake.ann_cells")
    val centsBefore = cat.table("lake.ann_centroids").read.collect().map(_.toString).sorted
    val dirsBefore = cells.currentSnapshot.get.entries.map(e => (e.dir, e.partition)).toSet
    // a vector unlike anything in the corpus, appended post-build
    val extra = Seq((100L, Array(0f, 0f, 0f, 9f))).toDF("vec_id", "embedding")
    IvfIndex.append(cat, "lake", "ann", extra)
    // centroids untouched (frozen quantizer), appended manifest keeps
    // every pre-append entry (append-only store path)
    cat.table("lake.ann_centroids").read.collect().map(_.toString).sorted shouldBe
      centsBefore
    val dirsAfter = cells.currentSnapshot.get.entries.map(e => (e.dir, e.partition)).toSet
    dirsBefore.subsetOf(dirsAfter) shouldBe true
    dirsAfter.size should be > dirsBefore.size
    // the appended vector is found by a query at its own position
    val probe = Seq((200L, Array(0f, 0f, 0f, 9f))).toDF("vec_id", "embedding")
    val out = IvfIndex.query(cat, "lake", "ann", probe, k = 1, nprobe = 1).collect()
    out.map(_.getLong(2)).toSeq shouldBe Seq(100L) // nearest = itself
    out.map(_.getDouble(3)).toSeq shouldBe Seq(1.0)
  }

  test("rebuild is idempotent (createOrReplace), query works after rebuild") {
    val cat = freshCat
    cat.createDatabase("lake")
    IvfIndex.build(cat, "lake", "ann", emb.filter($"vec_id" >= 6))
    IvfIndex.build(cat, "lake", "ann", emb.filter($"vec_id" >= 6))
    val out = IvfIndex.query(cat, "lake", "ann", emb.filter($"vec_id" < 3), k = 2, nprobe = 1)
    out.count() shouldBe 6 // 3 queries x k=2
  }

  test("rebalance: re-trained centroids, only drifted vectors move, no stale assignments") {
    val cat = freshCat
    cat.createDatabase("lake")
    // 2-d corpus: cluster A on the x-axis, cluster B on the y-axis, and
    // X = (0.45, 0.9) — a B member that a drifted B centroid will lose
    val corpus = (
      (0L until 5L).map(i => (i, Array(1f, 0f), "0")) ++
      (5L until 10L).map(i => (i, Array(0f, 1f), "1")) :+
      ((10L, Array(0.45f, 0.9f), "1"))
    ).toDF("vec_id", "embedding", "label")
    IvfIndex.build(cat, "lake", "ann", corpus)
    // 20 appended vectors at (-0.9, 0.45): nearest frozen centroid is B
    // (cos ≈ 0.38 vs −0.89 against A), and their mass drags the
    // re-trained B centroid to ≈ (−0.675, 0.573) — far enough that X's
    // nearest cell flips to A while every other vector stays put
    val drift = (100L until 120L).map(i => (i, Array(-0.9f, 0.45f)))
      .toDF("vec_id", "embedding")
    IvfIndex.append(cat, "lake", "ann", drift)
    val cells = cat.table("lake.ann_cells")
    // this test pins rebalance's AT-SCALE file-stability contract (only
    // entries holding moved keys are rewritten); disable the tiny-table
    // rewrite short-circuit a 31-vector fixture would otherwise take
    cells.setProperties(
      Map(graft.store.LakeTable.TinyRewriteMaxBytesProp -> "0"))
    cells.read.filter($"vec_id" === 10L).select("cell").head().getString(0) shouldBe "1"
    val cellAEntries = cells.currentSnapshot.get.entries
      .filter(_.partition.contains("cell=0")).map(_.dir).toSet

    val moved = IvfIndex.rebalance(cat, "lake", "ann")

    moved shouldBe 1L
    val after = cells.read.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    after(10L) shouldBe "0" // X moved to A
    (0L until 5L).foreach(i => after(i) shouldBe "0")
    (5L until 10L).foreach(i => after(i) shouldBe "1")
    (100L until 120L).foreach(i => after(i) shouldBe "1")
    // the untouched cell=0 partition kept its original files: the move
    // rewrote only entries holding the moved key (cost tracks MOVES)
    val cellAAfter = cat.table("lake.ann_cells").currentSnapshot.get.entries
      .filter(_.partition.contains("cell=0")).map(_.dir).toSet
    cellAEntries.subsetOf(cellAAfter) shouldBe true
    // no stale assignment survives: every cell equals the argmax over
    // the re-trained centroids
    import graft.functions.VectorFunctions.cosine
    val cents = cat.table("lake.ann_centroids").read
    val argmax = cells.read.select("vec_id", "cell", "embedding")
      .crossJoin(broadcast(cents))
      .withColumn("cos_c", cosine($"embedding", $"centroid"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(desc("cos_c"), $"label")))
      .filter($"rn" === 1)
      .filter($"label" =!= $"cell")
    argmax.count() shouldBe 0L
  }

  // 8 tight orthogonal clusters in 8-d space: enough cells that the
  // hierarchical assign's super-grouping (g = ⌈√8⌉ = 3, 2 probed)
  // actually prunes, and separated enough that its argmax must equal
  // the flat one
  private def emb8 = (0L until 64L).map { i =>
    val label = (i % 8).toString
    val base = Array.tabulate(8)(j => if (j == i % 8) 10f else 0f)
    base((i.toInt % 8 + 1) % 8) = (i % 5).toFloat * 0.1f
    (i, base, label)
  }.toDF("vec_id", "embedding", "label")

  test("hierarchical assign equals the flat argmax on separated clusters") {
    val cat = freshCat
    cat.createDatabase("lake")
    // same corpus, both dispatches: default floor (8 cells ≤ 64 ⇒ flat)
    // vs floor 0 (⇒ two-level for any nlist)
    IvfIndex.build(cat, "lake", "flat", emb8)
    IvfIndex.build(cat, "lake", "hier", emb8, flatMaxCells = 0)
    def assignments(name: String) = cat.table(s"lake.${name}_cells").read
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sorted.toSeq
    assignments("hier") shouldBe assignments("flat")
    // and the full lifecycle stays sane under the hierarchical path:
    // append + rebalance + query, every neighbor from the query's cluster
    IvfIndex.append(cat, "lake", "hier",
      emb8.filter($"vec_id" < 8)
        .select(($"vec_id" + 1000L).as("vec_id"), $"embedding"))
    IvfIndex.rebalance(cat, "lake", "hier") // floor survives the re-train
    cat.table("lake.hier_centroids").properties(
      "ivf.assign.flat-max-cells") shouldBe "0"
    val q = Seq((5000L, Array.tabulate(8)(j => if (j == 2) 10f else 0f)))
      .toDF("vec_id", "embedding")
    val top = IvfIndex.query(cat, "lake", "hier", q, k = 4, nprobe = 2)
      .select("neighbor_id").collect().map(_.getLong(0))
    top should not be empty
    // cluster 2's members are ids ≡ 2 (mod 8), plus the appended +1000s
    all(top.map(id => (id % 1000L) % 8L)) shouldBe 2L
  }

  test("probing every super-group makes the two-level assign exactly flat on ANY data") {
    // groupProbes >= group count degenerates the hierarchy into the
    // exact argmax even on overlapping clusters — the knob's upper
    // anchor (the separated-cluster test pins the default width's
    // equality; this pins that quality loss comes ONLY from unprobed
    // groups). Mixed data: every vector leans toward two clusters.
    import org.apache.spark.sql.functions.{col => c}
    val mixed = (0L until 48L).map { i =>
      val a = Array.tabulate(8)(j =>
        if (j == i % 8) 10f else if (j == (i % 8 + 1) % 8) 6f else 0.3f * (i % 3))
      (i, a, (i % 8).toString)
    }.toDF("vec_id", "embedding", "label")
    val cents = graft.operators.Similarity.labelCentroidVectors(
      mixed.select($"label", $"embedding"))
    def assign(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getString(1)).sorted.toSeq
    val flat = assign(IvfIndex.twoLevelAssign(
      mixed.select($"vec_id", $"embedding"), cents, nlist = 8L, groupProbes = 64))
    val exact = assign(
      mixed.select($"vec_id", $"embedding")
        .crossJoin(org.apache.spark.sql.functions.broadcast(cents))
        .withColumn("cos_c", graft.functions.VectorFunctions.cosine($"embedding", $"centroid"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("vec_id").orderBy(org.apache.spark.sql.functions.desc("cos_c"), c("label"))))
        .filter($"rn" === 1)
        .select($"vec_id", $"label".as("cell")))
    flat shouldBe exact
  }

  test("null embeddings are dropped uniformly by BOTH assign dispatches") {
    // a null vector has no direction — no probe can ever match it. The
    // hazard this pins: the aggregate-based twoLevelAssign eliminates
    // nulls structurally (TopKByScore skips null scores → empty array →
    // explode drops the row) while the flat window path would park them
    // in an arbitrary cell — whether a null-embedding vector appeared
    // in the cells table would then depend on the SIZE dispatch.
    val cat = freshCat
    cat.createDatabase("lake")
    IvfIndex.build(cat, "lake", "nflat", emb8)
    IvfIndex.build(cat, "lake", "nhier", emb8, flatMaxCells = 0)
    val batch = Seq(
      (9001L, Array.tabulate(8)(j => if (j == 3) 9f else 0f)),
      (9002L, null.asInstanceOf[Array[Float]]),
      (9003L, Array.tabulate(8)(j => if (j == 5) 9f else 0f)))
      .toDF("vec_id", "embedding")
    IvfIndex.append(cat, "lake", "nflat", batch)
    IvfIndex.append(cat, "lake", "nhier", batch)
    def appended(name: String) = cat.table(s"lake.${name}_cells").read
      .filter($"vec_id" >= 9000L).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sorted.toSeq
    val flat = appended("nflat")
    appended("nhier") shouldBe flat
    flat.map(_._1) shouldBe Seq(9001L, 9003L) // 9002 dropped by BOTH paths
  }

  test("two-level assign ranks corpus rows with aggregates, not windows") {
    // the vector-side stages must be partial AGGREGATES: a window rank
    // over vec_id would shuffle every scored (vector, candidate) row —
    // N×~3√nlist embedding-dragging rows through the exchange instead
    // of ~N. The only windows allowed are the centroid-side metadata
    // ones (partitioned by label/grp, never by vec_id).
    import org.apache.spark.sql.catalyst.expressions.WindowExpression
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val cents = graft.operators.Similarity.labelCentroidVectors(
      emb8.select($"label", $"embedding"))
    val assigned = IvfIndex.twoLevelAssign(
      emb8.select($"vec_id", $"embedding"), cents, nlist = 8L)
    val vecIdWindows = assigned.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.exists(_.references.exists(
        _.name == "vec_id")) => w
    }
    vecIdWindows shouldBe empty
    // and the aggregates really partial-aggregate: the physical plan
    // carries a partial topK/min stage before any exchange
    val phys = assigned.queryExecution.executedPlan.toString
    phys should include("partial_graft_top_k")
    assigned.count() shouldBe 64L
  }

  test("training is sample-bounded, deterministic, and every vector still assigns") {
    val cat = freshCat
    cat.createDatabase("lake")
    // cap 8 over 64 rows ⇒ a 1-in-8 hash sample trains the quantizer
    IvfIndex.build(cat, "lake", "samp", emb8, trainCap = 8L)
    val cents1 = cat.table("lake.samp_centroids").read
      .orderBy("label").collect().map(_.toString).toSeq
    cents1.size should be <= 8
    // a label the sample missed gets no cell — but EVERY corpus vector
    // is assigned to some surviving cell
    cat.table("lake.samp_cells").read.count() shouldBe 64
    // deterministic: an identical rebuild trains the identical quantizer
    IvfIndex.build(cat, "lake", "samp", emb8, trainCap = 8L)
    cat.table("lake.samp_centroids").read
      .orderBy("label").collect().map(_.toString).toSeq shouldBe cents1
    // under the cap, training reads the whole corpus: bit-identical to
    // the uncapped build — and different from the sampled quantizer
    // (proof the cap actually restricted the training input)
    IvfIndex.build(cat, "lake", "full", emb8, trainCap = 1000000L)
    IvfIndex.build(cat, "lake", "deflt", emb8)
    val centsFull = cat.table("lake.full_centroids").read
      .orderBy("label").collect().map(_.toString).toSeq
    centsFull shouldBe cat.table("lake.deflt_centroids").read
      .orderBy("label").collect().map(_.toString).toSeq
    cents1 should not equal centsFull
  }

  test("retraction after a fold prunes via vec_id blooms to the cells that hold the ids") {
    val cat = freshCat
    cat.createDatabase("lake")
    // sidecars ON (floor 0), tiny-rewrite dispatch OFF: the at-scale plan
    IvfIndex.build(cat, "lake", "ret", emb8, bloomMinBytes = 0L)
    val cells = cat.table("lake.ret_cells")
    cells.setProperties(
      Map(graft.store.LakeTable.TinyRewriteMaxBytesProp -> "0"))
    // fold: one wide entry per cell, each spanning ~the whole id range
    // (ids i ≡ cell mod 8 ⇒ every cell's range covers any small id)
    IvfIndex.compact(cat, "lake", "ret")
    val folded = cells.currentSnapshot.get.entries.size
    // a later generation lands inside the folded id range too
    IvfIndex.append(cat, "lake", "ret",
      emb8.filter($"vec_id" < 8)
        .select(($"vec_id" + 100L).as("vec_id"), $"embedding"))
    // retract ONE vector: key-range stats cannot separate the cells
    // (all ranges cover id 2) — only the per-leaf vec_id blooms can,
    // and they confine the rewrite to the single folded cell=2 entry
    IvfIndex.remove(cat, "lake", "ret", Seq(2L).toDF("vec_id"))
    val snap = cells.currentSnapshot.get
    snap.summary("rewritten-entries").toInt shouldBe 1
    snap.summary("untouched-entries").toInt should be >= folded
    // a replayed retraction of the same id rewrites nothing at all
    IvfIndex.remove(cat, "lake", "ret", Seq(2L).toDF("vec_id"))
    cells.currentSnapshot.get.summary("rewritten-entries").toInt shouldBe 0
    cells.read.filter($"vec_id" === 2L).count() shouldBe 0
    cells.read.count() shouldBe 71 // 64 built + 8 appended - 1 removed
  }

  test("an index built on an EMPTY corpus serves probes and appends") {
    val cat = freshCat
    cat.createDatabase("lake")
    IvfIndex.build(cat, "lake", "ann0", emb.filter($"vec_id" < 0))
    cat.table("lake.ann0_cells").currentSnapshot.get.entries shouldBe empty
    val q = Seq((100L, Array(10f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    IvfIndex.query(cat, "lake", "ann0", q, k = 3, nprobe = 2).count() shouldBe 0
    // appends against an empty (centroid-less) quantizer assign nothing
    // but keep the index consistent; a later rebuild brings it live
    IvfIndex.build(cat, "lake", "ann0", emb.filter($"vec_id" >= 6))
    IvfIndex.query(cat, "lake", "ann0", q, k = 3, nprobe = 2).count() shouldBe 3
  }

  test("nprobe=1 restricts candidates to one cell per query") {
    val cat = freshCat
    cat.createDatabase("lake")
    val corpus = emb.filter($"vec_id" >= 6)
    IvfIndex.build(cat, "lake", "ann", corpus)
    // query vector squarely in cluster 0: all neighbors must share its cell
    val q = Seq((100L, Array(10f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = IvfIndex.query(cat, "lake", "ann", q, k = 5, nprobe = 1)
    val cellsOfNeighbors = cat.table("lake.ann_cells").read
      .join(out.select(col("neighbor_id").as("vec_id")), Seq("vec_id"))
      .select("cell").distinct().count()
    cellsOfNeighbors shouldBe 1
  }
}
