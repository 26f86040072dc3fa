package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.LshIndex
import graft.store.LakeCatalog

/** The reference's production COMPOSITION, end-to-end in one soak:
  * [[StreamDaemon]]'s round loop driving the index-backed streaming
  * near-dup screen ([[IndexedDocStreams.run]] with in-stream interval
  * compaction), fed by a TPS-paced writer (the Datagen pacing
  * discipline: each batch waits for its schedule slot), stopped by the
  * signal file, KILLED twice mid-soak — once in each crash window:
  * (1) toks committed, bands not, stream checkpoint unconfirmed
  * (replay repairs the bands without duplicating token sets); (2) BOTH
  * index commits landed, checkpoint unconfirmed (replay must no-op
  * wholesale on the high-water guard) — each followed by a restart.
  * Every piece is individually spec'd elsewhere; this spec proves they
  * compose: after three daemon lifetimes the pairs output is
  * exactly-once, the index holds every fed document exactly once, the
  * replay high-water mark is at the last batch, and compaction kept the
  * manifest bounded. */
class DaemonSoakSpec extends SparkSpec {

  import spark.implicits._

  private val near = "the quick brown fox jumps over the lazy dog tonight"
  // every token carries k: batches' "unique" docs share ZERO vocabulary
  // (a shared template would make them near-dups of each other)
  private def uniq(k: Int) =
    s"alpha$k beta$k gamma$k delta$k epsilon$k zeta$k eta$k theta$k"

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  /** Batch k: one true near-dup of the bootstrap doc (and of every
    * earlier batch's near-doc) + one unique doc that pairs with nothing. */
  private def batchDf(k: Int): DataFrame =
    docs((1000L + k, near), (2000L + k, uniq(k)))

  private def writeBatch(df: DataFrame, dir: String, seq: Int): Unit = {
    val tmp = Files.createTempDirectory("soak-batch").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$seq%03d.parquet")
    Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + seq * 60000L)
    ()
  }

  /** TPS-paced feeder (the Datagen pacing rule): batch i waits for its
    * schedule slot `start + i/tps` — a slow write eats into the next
    * slot, never shifts the schedule. A feed failure is captured and
    * rethrown by `join()` — a silently dead feeder would otherwise
    * leave the daemon loop waiting forever for a batch that never
    * lands (an unbounded CI hang instead of a failure). */
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
    }, "soak-feeder")
    t.start()
    def dead: Boolean = error != null
    def join(): Unit = {
      t.join()
      if (error != null) throw error
    }
  }

  test("daemon soak: paced feed, interval compaction, signal stop, kills in BOTH crash windows — converged") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("soak-wh").toString)
    cat.createDatabase("db")
    LshIndex.build(cat, "db", "nd", docs((1L, near)))
    val src = Files.createTempDirectory("soak-src").toString
    val out = Files.createTempDirectory("soak-out").toString + "/pairs"
    val ckpt = Files.createTempDirectory("soak-ckpt").toString
    val signal = Signal.buildSignalPath(
      Files.createTempDirectory("soak-sig").toString, "soak")
    val bandsT = cat.table("db.nd_bands")
    val toksT = cat.table("db.nd_toks")

    def lastBatch: Long =
      bandsT.properties.get(LshIndex.BatchProp).map(_.toLong).getOrElse(-1L)

    // one daemon lifetime: availableNow rounds drain whatever the
    // feeder has landed; the round loop stops (signal) once the index's
    // replay high-water mark shows batch `target` applied — or the
    // feeder died (its join below rethrows the cause)
    def daemonLifetime(target: Long, feeder: Feeder): (Int, Boolean) = {
      val daemon = new StreamDaemon(spark, cat, Seq("docs"), "soak",
        concurrency = 1, roundIntervalSec = 0, compactionIntervalSec = 86400,
        signalPath = signal, sleepPollSec = 0.05)
      daemon.run { _ =>
        IndexedDocStreams.run(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src),
          cat, "db", "nd", out, ckpt, compactEveryBatches = 2)
          .awaitTermination()
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

    // ---- the kill: crash window inside batch 3's two-table commit ----
    // simulate the JVM dying after batch 3's toks append but before its
    // bands append and before the stream confirmed the batch: rewind
    // the bands table one commit (restores the batch-2 guard) and drop
    // the checkpoint's batch-3 commit marker so the restarted stream
    // RE-EXECUTES batch 3 against the repaired state
    bandsT.rollbackTo(bandsT.currentSnapshot.get.version - 1)
    bandsT.properties(LshIndex.BatchProp) shouldBe "2"
    val commitMarker = new File(s"$ckpt/commits/3")
    commitMarker.exists() shouldBe true
    commitMarker.delete() shouldBe true
    // the local FS keeps a checksum sibling; a real crash loses both
    new File(s"$ckpt/commits/.3.crc").delete()

    // ---- lifetime 2: replay of 3, then batches 4..7 (files 5..8) ----
    val feeder2 = new Feeder(src, 5 to 8, tps = 10.0)
    val (_, clean2) = daemonLifetime(target = 7L, feeder2)
    feeder2.join()
    clean2 shouldBe true
    lastBatch shouldBe 7L
    toksT.properties(LshIndex.BatchProp) shouldBe "7"

    // ---- the OTHER crash window: batch 7's BOTH index commits landed
    // but the stream died before confirming the checkpoint — the
    // restarted stream re-executes batch 7 and the screen must no-op
    // wholesale on the high-water guard (no duplicate bands, toks, or
    // pair rows), then proceed to fresh batches ----
    val toksCountBeforeKill2 = toksT.read.count()
    new File(s"$ckpt/commits/7").delete() shouldBe true
    new File(s"$ckpt/commits/.7.crc").delete()
    val feeder3 = new Feeder(src, 9 to 10, tps = 10.0)
    val (_, clean3) = daemonLifetime(target = 9L, feeder3)
    feeder3.join()
    clean3 shouldBe true
    lastBatch shouldBe 9L
    toksT.properties(LshIndex.BatchProp) shouldBe "9"
    toksT.read.count() shouldBe toksCountBeforeKill2 + 4 // batches 8,9 only

    // ---- convergence: pairs are exactly-once, exactly right ----
    // batch k's near-doc pairs with the bootstrap doc AND every earlier
    // near-doc (one signature space across all three daemon lifetimes
    // and both replays); unique docs pair with nothing
    val expected = (for {
      k <- 1 to 10
      b <- 1L +: (1 until k).map(j => 1000L + j)
    } yield (1000L + k, b)).toSet
    val got = spark.read.parquet(out).select("doc_a", "doc_b", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString.toLong))
    got.map(p => (p._1, p._2)).toSet shouldBe expected
    // no duplicate pair rows anywhere (exactly-once across the restart)
    withClue(s"duplicate pair rows: ${got.groupBy(identity).filter(_._2.length > 1).keys.toSeq.sorted}") {
      got.length shouldBe expected.size
    }

    // the index holds bootstrap + every fed doc EXACTLY once (replay 1
    // repaired bands without duplicating token sets; replay 2 no-op'd)
    toksT.read.count() shouldBe 21
    toksT.read.select("doc_id").distinct().count() shouldBe 21
    // interval compaction kept the manifest bounded across the soak
    bandsT.currentSnapshot.get.entries.size should be <= 4
    // and the final index serves probes over everything
    LshIndex.query(cat, "db", "nd", docs((9999L, near)))
      .collect().map(_.getLong(1)).sorted shouldBe
      (1L +: (1 to 10).map(1000L + _)).sorted
  }
}
