package graft.cdc

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.avro.AvroTestData
import graft.core.TableNaming
import graft.functions.Transforms
import graft.ledger.Watermark
import graft.store.LakeCatalog
import graft.streaming.{Signal, StreamDaemon}

/** The reference's CORE production composition, end-to-end in one soak
  * (`cdc_pipeline.py:254-439` under the round-loop daemon): a
  * TPS-paced Kafka-shaped feed → [[StreamDaemon]] rounds running
  * [[CdcPipeline.runTopicStream]] (foreachBatch MERGE + DELETE on a
  * merge-on-read target, watermark-ledger append, heartbeat on empty
  * rounds, gated position-delete compaction) with the daemon's own
  * interval-gated rewrite compaction, KILLED once in each crash
  * window across three daemon lifetimes:
  *
  *  (1) data committed, watermark row NOT appended (the replay
  *      high-water mark rides the ledger append — it is unset, so the
  *      replay re-applies the batch; the MERGE/DELETE converge
  *      idempotently and the ledger row lands exactly once);
  *  (2) EVERYTHING committed, stream checkpoint unconfirmed (the
  *      replay must no-op WHOLESALE on the guard: no duplicate ledger
  *      row, no data-table commit, and NO heartbeat — the replayed
  *      round is non-empty).
  *
  * Every piece is individually spec'd elsewhere (CdcPipelineSpec,
  * WatermarkSpec, MergeOnReadSpec, StreamDaemonSpec); this soak proves
  * they COMPOSE: after three lifetimes the table state equals the
  * replay oracle, the ledger holds exactly one row per batch, and
  * maintenance kept the MoR table's delete files folded. */
class CdcDaemonSoakSpec extends SparkSpec {

  import spark.implicits._

  // --- Debezium-shaped Avro fixtures (the CdcPipelineSpec shapes) ----

  private val valueSchemaJson =
    """{"type":"record","name":"Envelope","namespace":"dbz.store.TB_ITEM","fields":[
      {"name":"before","type":["null",{"type":"record","name":"Value","fields":[
        {"name":"id","type":"int"},
        {"name":"name","type":["null","string"],"default":null},
        {"name":"amount","type":["null","double"],"default":null},
        {"name":"DT","type":[{"type":"long","connect.version":1,"connect.default":0,
          "connect.name":"io.debezium.time.Timestamp"},"null"],"default":0}
      ]}],"default":null},
      {"name":"after","type":["null","Value"],"default":null},
      {"name":"op","type":"string"},
      {"name":"ts_ms","type":["null","long"],"default":null}
    ]}"""

  private val keySchemaJson =
    """{"type":"record","name":"Key","namespace":"dbz.store.TB_ITEM","fields":[
      {"name":"id","type":"int"}]}"""

  private lazy val valueSchema = new Schema.Parser().parse(valueSchemaJson)
  private lazy val keySchema = new Schema.Parser().parse(keySchemaJson)
  private lazy val recordSchema =
    valueSchema.getField("after").schema().getTypes.get(1)

  private val registry = new InMemorySchemaRegistry(Map(
    1 -> keySchemaJson, 2 -> valueSchemaJson))

  private def keyBytes(id: Int): Array[Byte] =
    AvroTestData.encode(keySchema, _.put("id", id))

  private def valueBytes(op: String, id: Int, name: String, tsMs: Long): Array[Byte] =
    AvroTestData.encode(valueSchema, env => {
      if (op != "d") {
        val v = new GenericData.Record(recordSchema)
        v.put("id", id); v.put("name", name); v.put("amount", id * 1.0)
        v.put("DT", 1600000000000L)
        env.put("after", v)
      }
      env.put("op", op)
      env.put("ts_ms", tsMs)
    })

  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType)))

  /** Batch k: create id 100+k, update the COMMON id 1 (last batch
    * wins), and (k>0) delete the previous batch's created row — every
    * path (insert, cross-batch update, delete) in every batch. */
  private def batchRows(k: Int): Seq[Row] = {
    val base =
      Seq((keyBytes(100 + k), valueBytes("c", 100 + k, s"n$k", 1700000000000L + k)),
        (keyBytes(1), valueBytes("u", 1, s"c$k", 1700000000000L + k))) ++
        (if (k > 0) Seq((keyBytes(100 + k - 1), valueBytes("d", 100 + k - 1, null, 1700000000000L + k)))
        else Nil)
    base.zipWithIndex.map { case ((kb, vb), j) =>
      Row(AvroTestData.confluentFrame(1, kb), AvroTestData.confluentFrame(2, vb),
        "dbz.store.TB_ITEM", 0, k * 10L + j, new Timestamp(1700000000000L + k * 1000L + j))
    }
  }

  private def writeBatch(k: Int, dir: String): Unit = {
    val tmp = Files.createTempDirectory("cdcsoak-batch").toFile
    spark.createDataFrame(batchRows(k).asJava, kafkaSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$k%03d.parquet")
    Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + k * 60000L)
    ()
  }

  /** TPS-paced feeder (the DaemonSoakSpec pacing discipline). */
  private final class Feeder(src: String, ks: Seq[Int], tps: Double) {
    @volatile private var error: Throwable = _
    private val t = new Thread(() => {
      try {
        val start = System.nanoTime()
        ks.zipWithIndex.foreach { case (k, i) =>
          val slot = start + (i * 1e9 / tps).toLong
          val waitNs = slot - System.nanoTime()
          if (waitNs > 0) Thread.sleep(waitNs / 1000000L)
          writeBatch(k, src)
        }
      } catch { case e: Throwable => error = e }
    }, "cdcsoak-feeder")
    t.start()
    def dead: Boolean = error != null
    def join(): Unit = {
      t.join()
      if (error != null) throw error
    }
  }

  test("CDC daemon soak: paced feed, MoR target, kills in BOTH crash windows — ledger exactly-once") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("cdcsoak-wh").toString)
    Watermark.ensureWatermarkTables(cat)
    cat.createDatabase("svc_store")
    val seed = Transforms.withPkHash(
      Transforms.withAuditColumn(Transforms.trimStringColumns(
        Seq((1, "a", 1.0, new Timestamp(1600000000000L)),
          (2, "b", 2.0, new Timestamp(1600000000000L)))
          .toDF("id", "name", "amount", "DT"))), Seq("id"))
    // merge-on-read target: each batch commits O(batch) delete+data
    // files — the heavy-update CDC shape — so the soak also drives the
    // delete-reach read path and the gated position-delete fold
    cat.table("svc_store.tb_item").createOrReplace(seed,
      tableProperties = Map(
        "write.merge.mode" -> "merge-on-read",
        "write.delete.mode" -> "merge-on-read"))

    val src = Files.createTempDirectory("cdcsoak-src").toString
    val ckptRoot = Files.createTempDirectory("cdcsoak-ckpt").toString
    val signal = Signal.buildSignalPath(
      Files.createTempDirectory("cdcsoak-sig").toString, "cdcsoak")
    val ledger = cat.table(Watermark.CdcTable)
    val dataT = cat.table("svc_store.tb_item")
    val ckpt = TableNaming.checkpointPath(ckptRoot, "dag1", "dbz.store.TB_ITEM")

    def highWater: Long =
      Watermark.lastCdcBatch(cat, "dag1", "svc_store", "tb_item").getOrElse(-1L)

    def source(): DataFrame = spark.readStream.schema(kafkaSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)

    // one daemon lifetime: rounds drain the feeder's files; the gated
    // position-delete compaction runs per processed round (lastMap
    // None → shouldRun), the daemon's own rewrite compaction per
    // modified round (interval 0); signal once the high-water mark
    // shows batch `target` fully applied
    def daemonLifetime(target: Long, feeder: Feeder): (Int, Boolean) = {
      val daemon = new StreamDaemon(spark, cat, Seq("dbz.store.TB_ITEM"), "dag1",
        concurrency = 1, roundIntervalSec = 0, compactionIntervalSec = 0,
        signalPath = signal, sleepPollSec = 0.05)
      val ctx = PipelineContext(cat, registry, "dbz.store.TB_ITEM", "dag1", "svc",
        tracker = Some(daemon.tracker),
        positionDeleteInterval = 1,
        positionDeleteLastMap = Some(Map("svc_store.tb_item" -> None)))
      daemon.run { _ =>
        CdcPipeline.runTopicStream(spark, source(), ctx, ckptRoot)
        if (highWater >= target || feeder.dead) Signal.requestStop(spark, signal)
      }
    }

    // ---- lifetime 1: batches 0..3 ----
    val feeder1 = new Feeder(src, 0 to 3, tps = 10.0)
    val (rounds1, clean1) = daemonLifetime(target = 3L, feeder1)
    feeder1.join()
    clean1 shouldBe true
    rounds1 should be >= 1
    highWater shouldBe 3L

    // ---- kill in window 1: batch 3's MERGE/DELETE committed, its
    // watermark row NOT appended. Simulate by popping ledger commits
    // until the high-water mark drops (heartbeat commits after it go
    // with it — a real crash before the append would have none) and
    // dropping the checkpoint's batch-3 confirmation so the restarted
    // stream RE-EXECUTES batch 3 ----
    while (highWater >= 3L)
      ledger.rollbackTo(ledger.currentSnapshot.get.version - 1)
    highWater shouldBe 2L
    new File(s"$ckpt/commits/3").exists() shouldBe true
    new File(s"$ckpt/commits/3").delete() shouldBe true
    new File(s"$ckpt/commits/.3.crc").delete() // a real crash loses both

    // ---- lifetime 2: replay of 3 (guard unset → re-applies, MERGE
    // converges, ledger row lands ONCE), then batches 4..7 ----
    val feeder2 = new Feeder(src, 4 to 7, tps = 10.0)
    val (_, clean2) = daemonLifetime(target = 7L, feeder2)
    feeder2.join()
    clean2 shouldBe true
    highWater shouldBe 7L

    // ---- kill in window 2: batch 7 fully committed on BOTH tables,
    // checkpoint unconfirmed ----
    new File(s"$ckpt/commits/7").delete() shouldBe true
    new File(s"$ckpt/commits/.7.crc").delete()
    val ledgerRowsBefore = ledger.read.count()
    val dataVersionBefore = dataT.currentSnapshot.get.version
    // one direct round, no new files: foreachBatch re-fires for batch 7
    // and must no-op WHOLESALE on the guard — no ledger row, no data
    // commit, and NO heartbeat (the round was non-empty: it processed
    // the replayed batch)
    CdcPipeline.runTopicStream(spark,
      source(), PipelineContext(cat, registry, "dbz.store.TB_ITEM", "dag1", "svc"),
      ckptRoot)
    ledger.read.count() shouldBe ledgerRowsBefore
    dataT.currentSnapshot.get.version shouldBe dataVersionBefore
    highWater shouldBe 7L

    // ---- lifetime 3: batches 8..9 ----
    val feeder3 = new Feeder(src, 8 to 9, tps = 10.0)
    val (_, clean3) = daemonLifetime(target = 9L, feeder3)
    feeder3.join()
    clean3 shouldBe true
    highWater shouldBe 9L

    // ---- convergence: the table equals the replay oracle ----
    // id1 carries the LAST common update; ids 100..108 were deleted by
    // their successor batches; 109 (no successor) survives; seeds stay
    val got = dataT.read.select("id", "name").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    got shouldBe Seq((1, "c9"), (2, "b"), (109, "n9"))

    // ---- ledger exactly-once across both kills and both replays ----
    val batchRowsRead = ledger.read
      .filter($"dag_id" === "dag1" && $"batch_id".isNotNull)
      .select("batch_id", "event_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    withClue(s"ledger batch rows: ${batchRowsRead.sorted}") {
      batchRowsRead.map(_._1).sorted shouldBe (0L to 9L)
    }
    // per-batch event counts survived the replays uninflated
    batchRowsRead.toMap shouldBe (0 to 9).map(k =>
      k.toLong -> (if (k > 0) 3L else 2L)).toMap
    // heartbeats only ever ride empty rounds (event_count 0, no batch)
    ledger.read.filter($"batch_id".isNull).select("event_count")
      .collect().map(_.getLong(0)).toSet should (be(Set(0L)) or be(Set.empty[Long]))

    // ---- maintenance composed in: the MoR table's outstanding delete
    // files were folded by the gated compactions, manifest bounded ----
    dataT.currentSnapshot.get.deleteEntries.size should be <= 3
    dataT.currentSnapshot.get.entries.size should be <= 8
  }
}
