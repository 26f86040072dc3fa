package graft.cdc

import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.avro.AvroTestData
import graft.functions.Transforms
import graft.ledger.Watermark
import graft.maintenance.ProcessedTableTracker
import graft.store.LakeCatalog

/** End-to-end CDC micro-batch processing against the LakeTable store:
  * Avro envelopes (with Confluent framing in the streaming tests) →
  * processBatch → MERGE/DELETE → watermark, mirroring the flow of
  * `cdc_pipeline.py:254-439` without Kafka (the reference's structure
  * makes processBatch callable with a static DataFrame — its own
  * testability seam, SURVEY §7.4.5). */
class CdcPipelineSpec extends SparkSpec {

  // --- Debezium-shaped Avro schemas -----------------------------------

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
    1 -> keySchemaJson, 2 -> valueSchemaJson, 3 -> valueSchemaJson))

  // --- encode helpers -------------------------------------------------

  private def keyBytes(id: Int): Array[Byte] =
    AvroTestData.encode(keySchema, _.put("id", id))

  private def valueBytes(
      op: String,
      id: Int,
      name: String,
      amount: Double,
      dtMs: Long,
      tsMs: Long): Array[Byte] =
    AvroTestData.encode(valueSchema, env => {
      if (op != "d") {
        val v = new GenericData.Record(recordSchema)
        v.put("id", id); v.put("name", name); v.put("amount", amount); v.put("DT", dtMs)
        env.put("after", v)
      }
      env.put("op", op)
      env.put("ts_ms", tsMs)
    })

  /** Post-header-strip batch row shape (processBatch contract). */
  private def batchDf(rows: Seq[(Int, Int, Array[Byte], Array[Byte], Long)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("key_schema_id", IntegerType),
      StructField("value_schema_id", IntegerType),
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType)))
    val data = rows.map { case (ks, vs, k, v, off) =>
      Row(ks, vs, k, v, "dbz.store.TB_ITEM",
        off, new Timestamp(1700000000000L + off * 1000))
    }
    spark.createDataFrame(data.asJava, schema)
  }

  // --- target table bootstrap (the JDBC-batch RTAS path) --------------

  private def bootstrap(): (LakeCatalog, PipelineContext) = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("cdc-e2e").toString)
    Watermark.ensureWatermarkTables(cat)
    cat.createDatabase("svc_store")
    import spark.implicits._
    val base = Seq(
      (1, "a", 10.0, new Timestamp(1600000000000L)),
      (2, "b", 20.0, new Timestamp(1600000000000L)),
      (3, "c", 30.0, new Timestamp(1600000000000L)))
      .toDF("id", "name", "amount", "DT")
    val withMeta = Transforms.withPkHash(
      Transforms.withAuditColumn(Transforms.trimStringColumns(base)), Seq("id"))
    cat.table("svc_store.tb_item").createOrReplace(withMeta)
    val ctx = PipelineContext(cat, registry, "dbz.store.TB_ITEM", "dag1", "svc")
    (cat, ctx)
  }

  private def state(cat: LakeCatalog): Seq[(Int, String, Double)] =
    cat.table("svc_store.tb_item").read
      .select("id", "name", "amount").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq

  // --------------------------------------------------------------------

  test("processBatch: upsert + delete + latest-offset dedup + watermark") {
    val (cat, ctx) = bootstrap()
    val batch = batchDf(Seq(
      (1, 2, keyBytes(2), valueBytes("u", 2, "b2", 21.0, 1600000000000L, 1700000001000L), 10L),
      (1, 2, keyBytes(2), valueBytes("u", 2, "b3", 22.0, 1600000000000L, 1700000002000L), 12L),
      (1, 2, keyBytes(3), valueBytes("d", 3, null, 0.0, 0L, 1700000003000L), 11L),
      (1, 2, keyBytes(4), valueBytes("c", 4, "d", 40.0, 1600000000000L, 1700000004000L), 13L)))

    CdcPipeline.processBatch(batch, batchId = 1L, ctx)

    // id2: highest offset (12) wins → b3; id3 deleted; id4 inserted
    state(cat) shouldBe Seq((1, "a", 10.0), (2, "b3", 22.0), (4, "d", 40.0))

    val wm = cat.table(Watermark.CdcTable).read.head()
    wm.getString(wm.fieldIndex("dag_id")) shouldBe "dag1"
    wm.getString(wm.fieldIndex("iceberg_schema")) shouldBe "svc_store"
    wm.getString(wm.fieldIndex("table_name")) shouldBe "tb_item"
    wm.getLong(wm.fieldIndex("event_count")) shouldBe 4L
    wm.getLong(wm.fieldIndex("min_offset")) shouldBe 10L
    wm.getLong(wm.fieldIndex("max_offset")) shouldBe 13L
    wm.getLong(wm.fieldIndex("batch_id")) shouldBe 1L
  }

  test("processBatch on a merge-on-read target: same net state, zero data rewrites") {
    val (cat, ctx) = bootstrap()
    val t = cat.table("svc_store.tb_item")
    t.setProperties(Map(
      "write.merge.mode" -> "merge-on-read",
      "write.delete.mode" -> "merge-on-read"))
    val baseDirs = t.currentSnapshot.get.entries.map(_.dir).toSet
    val batch = batchDf(Seq(
      (1, 2, keyBytes(2), valueBytes("u", 2, "b2", 21.0, 1600000000000L, 1700000001000L), 10L),
      (1, 2, keyBytes(3), valueBytes("d", 3, null, 0.0, 0L, 1700000003000L), 11L),
      (1, 2, keyBytes(4), valueBytes("c", 4, "d", 40.0, 1600000000000L, 1700000004000L), 13L)))

    CdcPipeline.processBatch(batch, batchId = 1L, ctx)

    // identical net semantics to the COW run...
    state(cat) shouldBe Seq((1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0))
    // ...but the bootstrap data dirs were never rewritten: the upsert
    // and the delete each committed only O(batch) files
    val s = t.currentSnapshot.get
    baseDirs.subsetOf(s.entries.map(_.dir).toSet) shouldBe true
    s.deleteEntries should have size 2
    // maintenance folds the read-side debt without changing the state
    t.rewritePositionDeleteFiles()._1 shouldBe 2
    state(cat) shouldBe Seq((1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0))
  }

  test("Debezium zero-guard flows through: DT=0 lands as NULL") {
    val (cat, ctx) = bootstrap()
    val batch = batchDf(Seq(
      (1, 2, keyBytes(5), valueBytes("c", 5, "e", 50.0, 0L, 1700000005000L), 20L)))
    CdcPipeline.processBatch(batch, 2L, ctx)
    val row = cat.table("svc_store.tb_item").read.filter(col("id") === 5).head()
    assert(row.isNullAt(row.fieldIndex("DT")))
  }

  test("multi-schema batch processes ascending so newest version wins") {
    val (cat, ctx) = bootstrap()
    // same key touched under value-schema ids 3 and 2: slice 2 runs
    // first, slice 3 (the NEWER registered version) merges last and wins
    val batch = batchDf(Seq(
      (1, 3, keyBytes(1), valueBytes("u", 1, "newer-schema", 11.0, 1600000000000L, 1700000007000L), 31L),
      (1, 2, keyBytes(1), valueBytes("u", 1, "older-schema", 12.0, 1600000000000L, 1700000006000L), 30L)))
    CdcPipeline.processBatch(batch, 3L, ctx)
    state(cat).head shouldBe ((1, "newer-schema", 11.0))
  }

  test("missing target table is skipped with no failure") {
    val (cat, _) = bootstrap()
    val ctx = PipelineContext(cat, registry, "dbz.store.TB_MISSING", "dag1", "svc")
    val batch = batchDf(Seq(
      (1, 2, keyBytes(1), valueBytes("u", 1, "x", 1.0, 1600000000000L, 1L), 1L)))
    CdcPipeline.processBatch(batch, 4L, ctx) // must not throw
    cat.tableExists("svc_store.tb_missing") shouldBe false
  }

  test("runTopicStream: file-backed availableNow round, checkpoint, heartbeat, replay") {
    val (cat, ctx0) = bootstrap()
    val tracker = new ProcessedTableTracker
    val ctx = ctx0.copy(tracker = Some(tracker))
    val sourceDir = Files.createTempDirectory("cdc-src").toString
    val checkpointRoot = Files.createTempDirectory("cdc-ckpt").toString

    // Kafka-shaped source files WITH Confluent framing
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType)))
    val frames = Seq(
      (AvroTestData.confluentFrame(1, keyBytes(2)),
        AvroTestData.confluentFrame(2, valueBytes("u", 2, "streamed", 99.0, 1600000000000L, 1700000001000L)), 100L),
      (AvroTestData.confluentFrame(1, keyBytes(3)),
        AvroTestData.confluentFrame(2, valueBytes("d", 3, null, 0.0, 0L, 1700000002000L)), 101L))
    val rows = frames.map { case (k, v, off) =>
      Row(k, v, ctx.topic, 0, off, new Timestamp(1700000000000L + off))
    }
    spark.createDataFrame(rows.asJava, kafkaSchema)
      .write.mode("overwrite").parquet(sourceDir)

    def source(): DataFrame =
      spark.readStream.schema(kafkaSchema).parquet(sourceDir)

    CdcPipeline.runTopicStream(spark, source(), ctx, checkpointRoot)
    state(cat).map(_._1) shouldBe Seq(1, 2) // id3 deleted
    state(cat).find(_._1 == 2).get._2 shouldBe "streamed"
    tracker.getAndClear() shouldBe Set("svc_store.tb_item")
    val wmCount1 = cat.table(Watermark.CdcTable).read.count()

    // second round, no new files: foreachBatch never fires → heartbeat row
    CdcPipeline.runTopicStream(spark, source(), ctx, checkpointRoot)
    val wm = cat.table(Watermark.CdcTable).read
    wm.count() shouldBe wmCount1 + 1
    wm.filter(col("event_count") === 0).count() shouldBe 1L

    // replay from scratch (checkpoint wiped): idempotent MERGE converges
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(checkpointRoot))
    CdcPipeline.runTopicStream(spark, source(), ctx, checkpointRoot)
    state(cat).map(_._1) shouldBe Seq(1, 2)
    state(cat).find(_._1 == 2).get._2 shouldBe "streamed"
  }

  test("property: batched processBatch converges to the replay oracle") {
    // Random CDC workload split across micro-batches must reach exactly
    // the state of a single latest-op-per-key replay — the idempotent-
    // MERGE convergence contract (SURVEY §5c / src/README.md:39).
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val (cat, ctx) = bootstrap()
      val keys = 1 to 12
      val ops = (1 to 60).map { i =>
        val key = keys(rnd.nextInt(keys.length))
        val op = rnd.nextInt(5) match {
          case 0 => "d"
          case 1 => "c"
          case _ => "u"
        }
        (key, op, s"t$trial-v$i", rnd.nextInt(1000).toDouble, 1000L + i)
      }
      // 3 micro-batches in offset order (Kafka delivery order per key)
      ops.grouped(20).zipWithIndex.foreach { case (chunk, bi) =>
        val batch = batchDf(chunk.map { case (k, op, name, amount, off) =>
          (1, 2, keyBytes(k),
            valueBytes(op, k, name, amount, 1600000000000L, 1700000000000L + off),
            off)
        })
        CdcPipeline.processBatch(batch, bi.toLong, ctx)
      }
      // replay oracle: last op per key decides presence and values
      val lastPerKey = ops.groupBy(_._1).view.mapValues(_.maxBy(_._5)).toMap
      val expected = (
        Seq(1, 2, 3).filterNot(k =>
          lastPerKey.get(k).exists(_._2 == "d")).map { k =>
          lastPerKey.get(k) match {
            case Some((_, _, name, amount, _)) => (k, name, amount)
            case None => (k, Seq("", "a", "b", "c")(k), k * 10.0) // untouched seed
          }
        } ++
          lastPerKey.collect {
            case (k, (_, op, name, amount, _)) if k > 3 && op != "d" =>
              (k, name, amount)
          }
      ).sortBy(_._1)
      state(cat) shouldBe expected
    }
  }

  test("stripConfluentHeader extracts ids and payloads as column exprs") {
    val body = Array[Byte](9, 8, 7)
    val framed = AvroTestData.confluentFrame(42, body)
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType)))
    val df = spark.createDataFrame(
      Seq(Row(framed, framed, "t", 0, 1L, new Timestamp(0L))).asJava, schema)
    val out = CdcPipeline.stripConfluentHeader(df).head()
    out.getInt(0) shouldBe 42
    out.getInt(1) shouldBe 42
    out.getAs[Array[Byte]](2).toSeq shouldBe body.toSeq
    out.getAs[Array[Byte]](3).toSeq shouldBe body.toSeq
  }
}
