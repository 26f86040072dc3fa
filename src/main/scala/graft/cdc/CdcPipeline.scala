package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.avro.AvroDecode
import graft.core.TableNaming
import graft.functions.Transforms
import graft.ledger.Watermark
import graft.maintenance.{Maintenance, ProcessedTableTracker}
import graft.store.{LakeCatalog, LakeTable}

/** Schema Registry lookup: id → Avro schema JSON. The HTTP variant of
  * the reference is the `GET /schemas/ids/{id}` endpoint
  * (`cdc_pipeline.py:270`); tests inject an in-memory map. */
trait SchemaRegistry {
  def getSchema(id: Int): String
}

class InMemorySchemaRegistry(schemas: Map[Int, String]) extends SchemaRegistry {
  def getSchema(id: Int): String =
    schemas.getOrElse(id, throw new NoSuchElementException(s"schema id $id"))
}

/** Minimal Confluent-compatible HTTP client with an unbounded-safe LRU
  * cache (schemas are immutable per id). */
class HttpSchemaRegistry(baseUrl: String, cacheSize: Int = 256) extends SchemaRegistry {
  private val cache =
    new java.util.LinkedHashMap[Int, String](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Int, String]): Boolean =
        size() > cacheSize
    }

  // one client for the registry's lifetime — HttpClient pools connections
  private val client = java.net.http.HttpClient.newHttpClient()

  def getSchema(id: Int): String = cache.synchronized {
    Option(cache.get(id)).getOrElse {
      val uri = java.net.URI.create(s"$baseUrl/schemas/ids/$id")
      val req = java.net.http.HttpRequest.newBuilder(uri).GET().build()
      val body = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      val schema = DebeziumSchema.parse(body).get("schema").asText()
      cache.put(id, schema)
      schema
    }
  }
}

/** Per-topic immutable execution context (`cdc_pipeline.py:132-145`).
  * Captured by the foreachBatch closure; never mutated between batches. */
case class PipelineContext(
    catalog: LakeCatalog,
    schemaRegistry: SchemaRegistry,
    topic: String,
    dagId: String,
    service: String,
    scheduledAt: Option[Timestamp] = None,
    tracker: Option[ProcessedTableTracker] = None,
    positionDeleteInterval: Long = 0,
    positionDeleteLastMap: Option[Map[String, Option[Timestamp]]] = None) {

  val (icebergSchema, icebergTable) = TableNaming.topicToTable(service, topic)
  def fullTableName: String = s"$icebergSchema.$icebergTable"
}

/** The Kafka-CDC micro-batch pipeline, ported whole from
  * `/root/reference/src/utils/cdc_pipeline.py:153-439` against the
  * LakeTable store. `processBatch` is callable with a static DataFrame —
  * the reference's own testability seam — and is what foreachBatch runs.
  *
  * Batch DataFrame contract (after Confluent header stripping):
  * `key_schema_id int, value_schema_id int, key binary, value binary,
  *  topic string, offset long, timestamp timestamp`.
  */
object CdcPipeline {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Avro decode → Debezium cast → id_iceberg → conform-to-catalog →
    * latest-offset dedup → (upserts, deletes). None when the target
    * table does not exist (skip-with-warning, `cdc_pipeline.py:184-188`). */
  def transformAndDedup(
      schemaFiltered: DataFrame,
      keySchemaStr: String,
      valueSchemaStr: String,
      debeziumSchema: Map[String, String],
      pkCols: Seq[String],
      table: LakeTable): Option[(DataFrame, DataFrame)] = {

    if (!table.exists) {
      logger.warn(s"Table ${table.name} not found. Skipping.")
      return None
    }

    val decoded = AvroDecode.withDecoded(
      AvroDecode.withDecoded(schemaFiltered, "key", keySchemaStr, "key_s"),
      "value", valueSchemaStr, "value_s")

    val transformed = decoded
      .withColumn("id_iceberg",
        md5(concat_ws("|", pkCols.map(c =>
          DebeziumCast.castColumn(col(s"key_s.$c"),
            debeziumSchema.getOrElse(c, "")).cast("string")): _*)))
      .select(
        (col("value_s.after.*") +:
          Seq(
            col("value_s.op").as("__op"),
            col("offset").as("__offset"),
            timestamp_millis(col("value_s.ts_ms")).as("last_applied_date"),
            col("id_iceberg"))): _*)

    // the live catalog schema is the source of truth for final types
    val catalogSchema = table.schema
    val cdcDf = DebeziumCast.conformToCatalog(
      transformed, catalogSchema, debeziumSchema, extraCols = Seq("__op", "__offset"))

    val dedup = Transforms.latestPerKey(cdcDf, Seq("id_iceberg"), "__offset")
      .drop("__offset")

    Some((
      dedup.filter(col("__op") =!= "d").drop("__op"),
      dedup.filter(col("__op") === "d").drop("__op")))
  }

  /** MERGE the upserts, DELETE the deletes — staged through global temp
    * views suffixed by table name to avoid cross-topic collision, like
    * the reference's SQL path (`cdc_pipeline.py:211-251`).
    *
    * Each side is persisted around its apply: the decode → cast →
    * window-dedup lineage above it is otherwise re-evaluated up to three
    * times per apply (the isEmpty probe, the COW pruning agg/collect,
    * and the rewrite join) — caching the micro-batch-sized result makes
    * those passes one Avro decode instead of three. */
  def applyCdcChanges(
      spark: SparkSession,
      table: LakeTable,
      viewSuffix: String,
      upserts: DataFrame,
      deletes: DataFrame): Unit = {

    val up = upserts.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!up.isEmpty) {
        val viewName = s"upsert_view_$viewSuffix"
        up.createOrReplaceGlobalTempView(viewName)
        logger.info(s"Executing Merge Into for ${table.name}")
        // honors write.merge.mode: COW (default) or merge-on-read — the
        // reference's commented per-table switch (iceberg.py:78-84)
        table.upsert(spark.table(s"global_temp.$viewName"), Seq("id_iceberg"))
      }
    } finally up.unpersist(false)

    val del = deletes.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!del.isEmpty) {
        val viewName = s"delete_view_$viewSuffix"
        del.createOrReplaceGlobalTempView(viewName)
        logger.info(s"Executing Delete for ${table.name}")
        table.deleteMatching(
          spark.table(s"global_temp.$viewName").select("id_iceberg"), Seq("id_iceberg"))
      }
    } finally del.unpersist(false)
  }

  /** One micro-batch (`cdc_pipeline.py:254-339`): persist, resolve the
    * distinct schema ids, process value-schema versions in ASCENDING id
    * order (so the newest version's MERGE lands last and wins), apply,
    * track, and append the batch-stats watermark row. */
  def processBatch(batchDf: DataFrame, batchId: Long, ctx: PipelineContext): Unit = {
    val spark = batchDf.sparkSession
    val startNs = System.nanoTime()
    val table = ctx.catalog.table(ctx.fullTableName)

    // replay high-water guard ([[Watermark.lastCdcBatch]]): a batch
    // whose watermark commit landed is proven fully applied on both
    // the data table and the ledger — a checkpoint-unconfirmed replay
    // must no-op WHOLESALE (the MERGE would converge anyway, but the
    // ledger append would double-count the batch and the re-merge
    // would burn table commits for nothing)
    if (Watermark.lastCdcBatch(ctx.catalog, ctx.dagId,
        ctx.icebergSchema, ctx.icebergTable).exists(_ >= batchId)) {
      logger.info(s"<batch-$batchId> replay of a fully-committed batch " +
        s"for ${ctx.topic}; no-op on the high-water guard")
      return
    }

    logger.info(s"<batch-$batchId> Processing ${ctx.topic}")
    batchDf.persist(StorageLevel.MEMORY_AND_DISK)
    val stats =
      try {
        val valueSchemaIds = batchDf.select("value_schema_id").distinct()
          .collect().map(_.getInt(0))
        val valueSchemaDict = valueSchemaIds
          .map(id => id -> ctx.schemaRegistry.getSchema(id)).toMap
        val keySchemaIds = batchDf.select("key_schema_id").distinct()
          .collect().map(_.getInt(0))
        val keySchemaDict = keySchemaIds
          .map(id => id -> ctx.schemaRegistry.getSchema(id)).toMap

        logger.info(s"${ctx.topic} | Key Schema Ids: ${keySchemaIds.toSeq} | " +
          s"Value Schema Ids: ${valueSchemaIds.toSeq}")

        // ascending schema-id order: old versions first, newest MERGE wins
        for ((valueSchemaId, valueSchemaStr) <- valueSchemaDict.toSeq.sortBy(_._1)) {
          val schemaFiltered = batchDf.filter(col("value_schema_id") === valueSchemaId)
          val debeziumSchema = DebeziumSchema.extract(valueSchemaStr)

          val keyRows = schemaFiltered.select("key_schema_id").distinct().collect()
          if (keyRows.nonEmpty) {
            val keySchemaId = keyRows.head.getInt(0)
            keySchemaDict.get(keySchemaId) match {
              case None =>
                logger.warn(s"Key schema not found for id $keySchemaId")
              case Some(keySchemaStr) =>
                val pkCols = DebeziumSchema.keyColumns(keySchemaStr)
                transformAndDedup(schemaFiltered, keySchemaStr, valueSchemaStr,
                  debeziumSchema, pkCols, table) match {
                  case None => ()
                  case Some((upserts, deletes)) =>
                    applyCdcChanges(spark, table, ctx.icebergTable, upserts, deletes)
                }
            }
          }
        }

        ctx.tracker.foreach(_.mark(ctx.fullTableName))

        batchDf.agg(
          count(lit(1)).as("cnt"),
          date_format(max("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("max_ts"),
          min("offset").as("min_offset"),
          max("offset").as("max_offset")).head()
      } finally batchDf.unpersist()

    Watermark.appendCdcWatermark(
      ctx.catalog, ctx.dagId, ctx.icebergSchema, ctx.icebergTable,
      eventCount = stats.getLong(0),
      maxEventTs = Option(stats.getString(1)).map(Timestamp.valueOf),
      minOffset = Option(stats.get(2)).map(_.asInstanceOf[Long]),
      maxOffset = Option(stats.get(3)).map(_.asInstanceOf[Long]),
      batchId = Some(batchId),
      processingDurationSec = Some((System.nanoTime() - startNs) / 1e9),
      scheduledAt = ctx.scheduledAt)
  }

  /** Strip the Confluent wire header and surface the schema ids — the
    * pre-foreachBatch projection (`cdc_pipeline.py:406-410`), as pure
    * column expressions (no UDF). */
  def stripConfluentHeader(df: DataFrame): DataFrame =
    df.withColumn("key_schema_id", Transforms.confluentSchemaId(col("key")))
      .withColumn("key", Transforms.confluentPayload(col("key")))
      .withColumn("value_schema_id", Transforms.confluentSchemaId(col("value")))
      .withColumn("value", Transforms.confluentPayload(col("value")))
      .selectExpr("key_schema_id", "value_schema_id", "key", "value",
        "topic", "offset", "timestamp")

  /** One availableNow streaming round for a topic
    * (`cdc_pipeline.py:347-439`): read the stream, strip headers,
    * foreachBatch(processBatch) with a per-topic checkpoint, then the
    * gated position-delete compaction and the heartbeat row when no
    * batch ran. `sourceDf` is the Kafka-shaped streaming DataFrame
    * (file-backed in tests; spark-sql-kafka in production). */
  def runTopicStream(
      spark: SparkSession,
      sourceDf: DataFrame,
      ctx: PipelineContext,
      checkpointRoot: String): Unit = {

    val checkpointPath = TableNaming.checkpointPath(checkpointRoot, ctx.dagId, ctx.topic)
    logger.info(s"Starting stream for topic: ${ctx.topic}, checkpoint: $checkpointPath")

    @volatile var processed = false
    val query = stripConfluentHeader(sourceDf)
      .writeStream
      .foreachBatch { (batchDf: DataFrame, batchId: Long) =>
        processBatch(batchDf, batchId, ctx)
        processed = true
      }
      .option("checkpointLocation", checkpointPath)
      .queryName(ctx.topic)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    // gated position-delete compaction (MoR analog, cdc_pipeline.py:421-425)
    if (processed && ctx.positionDeleteInterval > 0) {
      ctx.positionDeleteLastMap.foreach { lastMap =>
        val key = ctx.fullTableName
        if (Watermark.shouldRun(lastMap.getOrElse(key, None), ctx.positionDeleteInterval))
          Maintenance.runPositionDeleteCompaction(ctx.catalog, ctx.dagId, key)
      }
    }

    // availableNow never calls foreachBatch on an empty round — record a
    // heartbeat watermark so liveness is observable (cdc_pipeline.py:427-439)
    if (!processed)
      Watermark.appendCdcWatermark(
        ctx.catalog, ctx.dagId, ctx.icebergSchema, ctx.icebergTable,
        eventCount = 0, maxEventTs = None, scheduledAt = ctx.scheduledAt)
  }
}
