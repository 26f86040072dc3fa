package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.IvfIndex
import graft.store.LakeCatalog

/** The VECTOR-index counterpart of [[DaemonSoakSpec]]: [[StreamDaemon]]
  * rounds driving [[IndexedVecStreams.run]] (probe → neighbors
  * partition → cells append, with in-stream interval compaction), fed
  * by a TPS-paced writer, KILLED twice mid-soak — once in each crash
  * window of the vector path: (1) the neighbors partition landed but
  * the cells-table append (which carries the replay high-water mark)
  * did not and the stream never confirmed the batch (replay re-probes
  * and re-appends against the restored snapshot); (2) the append
  * COMMITTED but the checkpoint was never confirmed (replay must no-op
  * on the high-water guard, duplicating nothing) — each followed by a
  * restart, with one [[IvfIndex.rebalance]] run in-soak between rounds
  * of the second lifetime. Every piece is individually spec'd
  * ([[IndexedVecStreamsSpec]], IvfIndexSpec); this proves they compose:
  * after three daemon lifetimes the neighbors output is exactly-once,
  * the index holds every fed vector exactly once, the high-water mark
  * sits at the last batch, and compaction kept the manifest bounded. */
class VecDaemonSoakSpec extends SparkSpec {

  import spark.implicits._

  private val Dim = 16
  private def vec(axis: Int, scale: Float, tweakAxis: Int = -1,
      tweak: Float = 0f): Array[Float] = {
    val a = Array.fill(Dim)(0f)
    a(axis) = scale
    if (tweakAxis >= 0) a(tweakAxis) = tweak
    a
  }

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Bootstrap corpus: two separated clusters, distinct within-cluster
    * perturbations so every cosine ranking is tie-free. */
  private def bootstrap: DataFrame =
    ((1L to 6L).map(i => (i, vec(0, 10f, 2, 0.001f * i), "A")) ++
      (11L to 16L).map(i => (i, vec(1, 10f, 3, 0.001f * i), "B")))
      .toDF("vec_id", "embedding", "label")

  /** Batch k: one follower of cluster A (probes must rank it against
    * the bootstrap + earlier followers) and one vector on its own axis
    * (orthogonal to everything — its top-k is a deterministic id-order
    * pick among exact zero cosines). */
  private def batchDf(k: Int): DataFrame =
    Seq((1000L + k, vec(0, 10f, 2, 0.01f * k)),
      (2000L + k, vec(4 + k, 10f))).toDF("vec_id", "embedding")

  private def writeBatch(df: DataFrame, dir: String, seq: Int): Unit = {
    val tmp = Files.createTempDirectory("vsoak-batch").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$seq%03d.parquet")
    Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + seq * 60000L)
    ()
  }

  /** Same TPS-paced feeder discipline as [[DaemonSoakSpec]]. */
  private final class Feeder(src: String, ks: Seq[Int], tps: Double) {
    @volatile private var error: Throwable = _
    private val t = new Thread(() => {
      try {
        val start = System.nanoTime()
        ks.zipWithIndex.foreach { case (k, i) =>
          val slot = start + (i * 1e9 / tps).toLong
          val waitNs = slot - System.nanoTime()
          if (waitNs > 0) Thread.sleep(waitNs / 1000000L)
          writeBatch(batchDf(k), src, k)
        }
      } catch { case e: Throwable => error = e }
    }, "vsoak-feeder")
    t.start()
    def dead: Boolean = error != null
    def join(): Unit = {
      t.join()
      if (error != null) throw error
    }
  }

  test("vector daemon soak: paced feed, in-stream compaction, kills in BOTH crash windows, in-soak rebalance — converged") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("vsoak-wh").toString)
    cat.createDatabase("db")
    IvfIndex.build(cat, "db", "ann", bootstrap)
    val src = Files.createTempDirectory("vsoak-src").toString
    val out = Files.createTempDirectory("vsoak-out").toString + "/knn"
    val ckpt = Files.createTempDirectory("vsoak-ckpt").toString
    val signal = Signal.buildSignalPath(
      Files.createTempDirectory("vsoak-sig").toString, "vsoak")
    val cells = cat.table("db.ann_cells")

    def lastBatch: Long =
      cells.properties.get(IvfIndex.BatchProp).map(_.toLong).getOrElse(-1L)

    def daemonLifetime(target: Long, feeder: Feeder,
        betweenRounds: () => Unit = () => ()): (Int, Boolean) = {
      val daemon = new StreamDaemon(spark, cat, Seq("vecs"), "vsoak",
        concurrency = 1, roundIntervalSec = 0, compactionIntervalSec = 86400,
        signalPath = signal, sleepPollSec = 0.05)
      daemon.run { _ =>
        IndexedVecStreams.run(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src),
          cat, "db", "ann", out, ckpt, k = 5, nprobe = 3,
          compactEveryBatches = 2)
          .awaitTermination()
        betweenRounds()
        if (lastBatch >= target || feeder.dead) Signal.requestStop(spark, signal)
      }
    }

    // ---- lifetime 1: batches 0..3 (files 1..4), paced at 10 TPS ----
    val feeder1 = new Feeder(src, 1 to 4, tps = 10.0)
    val (rounds1, clean1) = daemonLifetime(target = 3L, feeder1)
    feeder1.join()
    clean1 shouldBe true
    rounds1 should be >= 1
    lastBatch shouldBe 3L

    // ---- the kill: batch 3's neighbors partition landed, the cells
    // append (carrying the batch-3 high-water mark) did not, and the
    // stream never confirmed the batch: rewind the cells table one
    // commit and drop the checkpoint marker so the restarted stream
    // RE-EXECUTES batch 3 — the re-probe runs against the restored
    // pre-append snapshot (identical candidates), overwrites the same
    // batch_id=3 partition wholesale, and re-appends
    cells.rollbackTo(cells.currentSnapshot.get.version - 1)
    cells.properties(IvfIndex.BatchProp) shouldBe "2"
    val commitMarker = new File(s"$ckpt/commits/3")
    commitMarker.exists() shouldBe true
    commitMarker.delete() shouldBe true
    new File(s"$ckpt/commits/.3.crc").delete()

    // ---- lifetime 2: replay of 3, then 4..7, with ONE in-soak
    // rebalance between daemon rounds (after the replay round drained —
    // the retrain must never race the crash-repair of a half-applied
    // batch, which is exactly the production ordering: maintenance runs
    // between rounds, not inside one) ----
    var rebalanced = false
    val feeder2 = new Feeder(src, 5 to 8, tps = 10.0)
    val (_, clean2) = daemonLifetime(target = 7L, feeder2, betweenRounds = () => {
      if (!rebalanced && lastBatch >= 3L) {
        IvfIndex.rebalance(cat, "db", "ann")
        rebalanced = true
      }
    })
    feeder2.join()
    clean2 shouldBe true
    rebalanced shouldBe true
    lastBatch shouldBe 7L

    // ---- the OTHER crash window: batch 7's cells append COMMITTED but
    // the stream died before confirming the checkpoint — the restarted
    // stream re-executes batch 7, the append must NO-OP on the
    // BatchProp guard (no duplicate vectors) while the re-probe
    // overwrites the batch_id=7 partition wholesale (identical content:
    // the guard also means the probe would see the batch's own vectors,
    // so screenBatch skips the whole re-screen when the mark is ahead)
    val cellsVersionBeforeKill2 = cells.currentSnapshot.get.version
    new File(s"$ckpt/commits/7").delete() shouldBe true
    new File(s"$ckpt/commits/.7.crc").delete()
    val feeder3 = new Feeder(src, 9 to 10, tps = 10.0)
    val (_, clean3) = daemonLifetime(target = 9L, feeder3)
    feeder3.join()
    clean3 shouldBe true
    lastBatch shouldBe 9L

    // ---- convergence: neighbors are exactly-once, exactly right ----
    val got = spark.read.parquet(out)
      .select("query_id", "neighbor_id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString.toLong))
    // every batch 0..9 produced output; each query id in exactly one batch
    got.map(_._3).toSet shouldBe (0L to 9L).toSet
    // exactly-once across the kill/replay: no duplicate (query, neighbor)
    withClue(s"dup rows: ${got.groupBy(identity).filter(_._2.length > 1).keys}") {
      got.length shouldBe got.distinct.length
    }
    got.groupBy(r => (r._1, r._2)).values.foreach(_.length shouldBe 1)
    // a batch never matches itself (probe ran on the pre-append snapshot)
    got.foreach { case (q, n, _) => n should not be q }
    // cluster-A followers rank ONLY within the A universe (bootstrap A
    // members + earlier followers): 5 neighbors each, none from B, none
    // from the orthogonal uniques
    val aUniverse = (1L to 6L).toSet ++ (1 to 10).map(1000L + _).toSet
    (1 to 10).foreach { k =>
      val ns = got.filter(_._1 == 1000L + k).map(_._2)
      ns should have length 5
      ns.toSet.subsetOf(aUniverse) shouldBe true
    }

    // the index holds bootstrap + every fed vector EXACTLY once, across
    // both crash replays, the interval compactions, and the rebalance
    // (the second window's replayed append no-op'd on the guard: the
    // only cells commits after the kill are batches 8 and 9 + compact@8)
    cells.read.count() shouldBe 32
    cells.read.select("vec_id").distinct().count() shouldBe 32
    cells.properties(IvfIndex.BatchProp) shouldBe "9"
    cells.currentSnapshot.get.version should be > cellsVersionBeforeKill2
    // compaction + O(moved) rebalance kept the manifest bounded
    cells.currentSnapshot.get.entries.size should be <= 10
    // and the final index serves probes over everything
    val probe = Seq((9999L, vec(0, 10f, 2, 0.05f))).toDF("vec_id", "embedding")
    val top = IvfIndex.query(cat, "db", "ann", probe, k = 5, nprobe = 3)
      .select("neighbor_id").collect().map(_.getLong(0))
    top should have length 5
    top.toSet.subsetOf(aUniverse) shouldBe true
  }
}
