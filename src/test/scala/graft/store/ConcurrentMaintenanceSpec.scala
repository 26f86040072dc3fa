package graft.store

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contended merge-on-read writers interleaved with LIVE maintenance
  * (position-delete compaction + snapshot expiry) under concurrent
  * readers — the steady state of a CDC table at scale. The invariants
  * under test:
  *
  *  - a read NEVER observes a half-applied merge: each MoR commit lands
  *    its data dir and its equality-delete file in ONE snapshot claim,
  *    so per key a read sees exactly one row (a torn delete would
  *    surface as a duplicated or vanished key);
  *  - maintenance racing writers lands as clean retry/skip
  *    (CommitConflictException), never corruption;
  *  - every acknowledged writer commit survives to the final state, and
  *    folding the delete files away afterwards changes nothing.
  *
  * Three seeded schedules vary the interleaving. No synchronization
  * exists on the read path — readers go straight at the snapshot head.
  */
class ConcurrentMaintenanceSpec extends SparkSpec {

  test("seeded concurrent MoR writers + maintenance + readers: no torn reads, no lost commits") {
    import spark.implicits._
    val nKeys = 60
    val gens = 2
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val wh = Files.createTempDirectory(s"mor-maint-$seed").toString
      val cat = new LakeCatalog(spark, wh)
      cat.createDatabase("db")
      cat.table("db.t").createOrReplace(
        (0L until nKeys).map(k => (k, 0L)).toDF("id", "gen"),
        tableProperties = Map(
          "write.merge.mode" -> "merge-on-read",
          "write.delete.mode" -> "merge-on-read"))
      val failures = new ConcurrentLinkedQueue[Throwable]()
      val writersDone = new AtomicBoolean(false)
      val maintenanceSkipped = new AtomicInteger()
      val reads = new AtomicInteger()

      // 3 writers on DISJOINT key slices: additive MoR commits retry on
      // lost races, so every merge must land
      val writers = (0 until 3).map { w =>
        new Thread(() => try {
          val keys = (0L until nKeys).filter(_ % 3 == w)
          (1 to gens).foreach { g =>
            Thread.sleep(rnd.nextInt(40))
            cat.table("db.t").mergeIntoMoR(
              keys.map(k => (k, g.toLong)).toDF("id", "gen"), Seq("id"))
          }
        } catch { case e: Throwable => failures.add(e) })
      }

      // maintenance loop: compaction conflicts with racing writers are
      // the EXPECTED skip path (requireParentVersion), never an error
      val maintenance = new Thread(() => try {
        while (!writersDone.get()) {
          Thread.sleep(rnd.nextInt(60))
          try { cat.table("db.t").rewritePositionDeleteFiles(); () }
          catch { case _: CommitConflictException => maintenanceSkipped.incrementAndGet() }
          // expiry performs no commit (it only deletes files already
          // unreferenced by retained snapshots), so it cannot
          // conflict-skip — any throw here is a REAL failure and must
          // redden the seed via the outer catch
          cat.table("db.t").expireSnapshots(keepLast = 12)
        }
      } catch { case e: Throwable => failures.add(e) })
      // readers hammer the head: every key exactly once, generation in
      // range — a half-applied delete would double or drop a key
      val readers = (0 until 2).map(_ => new Thread(() => try {
        while (!writersDone.get()) {
          val rows = cat.table("db.t").read
            .groupBy("id").agg(count(lit(1)).as("c"), max("gen").as("g"))
            .collect()
          reads.incrementAndGet()
          assert(rows.length == nKeys, s"read saw ${rows.length} keys, want $nKeys")
          rows.foreach { r =>
            assert(r.getLong(1) == 1L, s"key ${r.getLong(0)} appeared ${r.getLong(1)} times")
            assert(r.getLong(2) >= 0L && r.getLong(2) <= gens,
              s"key ${r.getLong(0)} at impossible generation ${r.getLong(2)}")
          }
        }
      } catch { case e: Throwable => failures.add(e) }))

      (writers ++ readers :+ maintenance).foreach(_.start())
      writers.foreach(_.join())
      writersDone.set(true)
      (readers :+ maintenance).foreach(_.join())
      failures.forEach(_.printStackTrace())
      assert(failures.isEmpty, s"seed $seed: concurrent schedule had failures")
      assert(reads.get() > 0, "readers never completed a read")

      // every acknowledged commit survived: all keys at the final gen
      def state() = cat.table("db.t").read.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fin = state()
      assert(fin.size == nKeys)
      assert(fin.values.forall(_ == gens.toLong), s"seed $seed: lost update in $fin")
      // and the physical fold converges to the same state
      cat.table("db.t").rewritePositionDeleteFiles()
      assert(state() == fin, s"seed $seed: compaction changed visible state")
      assert(cat.table("db.t").currentSnapshot.get.deleteEntries.isEmpty)
    }
  }

  /** Contended read-modify-write UPDATEs on the SAME row must
    * serialize: each writer's images are computed from the snapshot it
    * read, so a stale image landing after a racer would silently revert
    * the racer's change. The engine surfaces that as
    * `CommitConflictException` (base-snapshot validation); callers
    * retry by RECOMPUTING from the fresh head. Lost updates would show
    * up here as a final counter below the increment total. */
  test("contended UPDATE increments on one row never lose an update (both modes)") {
    import spark.implicits._
    for (mode <- Seq("copy-on-write", "merge-on-read")) {
      val wh = Files.createTempDirectory(s"upd-race-$mode").toString
      val cat = new LakeCatalog(spark, wh)
      cat.createDatabase("db")
      val init = cat.table("db.t")
      init.createOrReplace(Seq((1L, 0L)).toDF("id", "n"),
        tableProperties = Map(
          "write.merge.mode" -> "merge-on-read",
          "write.update.mode" -> mode))
      if (mode == "merge-on-read") // fix the MoR keys for update-mor
        init.mergeIntoMoR(Seq((1L, 0L)).toDF("id", "n"), Seq("id"))
      val failures = new ConcurrentLinkedQueue[Throwable]()
      val perWriter = 4
      val threads = (0 until 3).map { _ =>
        new Thread(() => try {
          (1 to perWriter).foreach { _ =>
            var done = false
            while (!done) {
              try {
                cat.table("db.t").update(col("id") === lit(1L),
                  Map("n" -> (col("n") + lit(1L))))
                done = true
              } catch { case _: CommitConflictException => Thread.sleep(10) }
            }
          }
        } catch { case e: Throwable => failures.add(e) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      failures.forEach(f => fail(s"[$mode] writer failed: $f", f))
      val finalN = cat.table("db.t").read
        .filter(col("id") === 1L).select("n").collect().head.getLong(0)
      withClue(s"[$mode] lost updates: ") { finalN shouldBe 3L * perWriter }
    }
  }
}
