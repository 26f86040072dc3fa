package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.avro.AvroDecode
import graft.cdc.SchemaRegistry
import graft.functions.Transforms

/** Raw-zone archive pipeline: Kafka Avro values → date-partitioned
  * parquet APPEND (`/root/reference/src/kafka_to_s3.py:52-156`). The
  * output layout `year=yyyy/month=MM/day=dd[/hour=HH]` is the
  * Hive-partitioned raw zone that downstream batch loads and external
  * engines prune on — at 100 TB the append-per-microbatch pattern keeps
  * the archive write O(batch), and the partition dirs bound any replay.
  */
object RawArchive {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** `kafka_to_s3.py:39-44`. */
  val PartitionFormat: Map[String, String] = Map(
    "year" -> "yyyy",
    "month" -> "MM",
    "day" -> "dd",
    "hour" -> "HH")

  /** Derive Hive partition columns from the Kafka timestamp. */
  def withDatePartitions(df: DataFrame, partitionCols: Seq[String]): DataFrame =
    partitionCols.foldLeft(df) { (acc, c) =>
      PartitionFormat.get(c) match {
        case Some(fmt) => acc.withColumn(c, date_format(col("timestamp"), fmt))
        case None => acc
      }
    }

  /** One micro-batch: per-schema-id Avro decode → `value.*` expansion →
    * date partition columns → parquet append (`kafka_to_s3.py:52-97`).
    * Batch contract: `value_schema_id int, value binary (header
    * stripped), timestamp timestamp`. */
  def processBatch(
      batchDf: DataFrame,
      batchId: Long,
      outputPath: String,
      partitionCols: Seq[String],
      registry: SchemaRegistry): Unit = {
    batchDf.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val rowCount = batchDf.count()
      if (rowCount == 0) {
        logger.info(s"Batch $batchId is empty, skipping.")
        return
      }
      val schemaIds = batchDf.select("value_schema_id").distinct()
        .collect().map(_.getInt(0))
      for (schemaId <- schemaIds) {
        val slice = batchDf.filter(col("value_schema_id") === schemaId)
        if (!slice.isEmpty) {
          val decoded = AvroDecode
            .withDecoded(slice, "value", registry.getSchema(schemaId), "value_s")
            .select(col("value_s.*"), col("timestamp"))
          withDatePartitions(decoded, partitionCols)
            .drop("timestamp")
            .write.format("parquet")
            .partitionBy(partitionCols: _*)
            .mode("append")
            .save(outputPath)
        }
      }
      logger.info(s"Batch $batchId: processed $rowCount records.")
    } finally batchDf.unpersist()
  }

  /** Continuous stream into the raw zone: processingTime trigger (the
    * archive variant runs forever, unlike the availableNow CDC rounds),
    * per-topic checkpoint + FAIR pool (`kafka_to_s3.py:106-156`). */
  def runRawStream(
      spark: SparkSession,
      sourceDf: DataFrame,
      topic: String,
      outputPath: String,
      checkpointPath: String,
      partitionCols: Seq[String],
      registry: SchemaRegistry,
      trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery = {
    val transformed = sourceDf
      .withColumn("value_schema_id", Transforms.confluentSchemaId(col("value")))
      .withColumn("value", Transforms.confluentPayload(col("value")))
      .select("value_schema_id", "value", "timestamp")
    transformed.writeStream
      .foreachBatch { (batchDf: DataFrame, batchId: Long) =>
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", topic)
        processBatch(batchDf, batchId, outputPath, partitionCols, registry)
      }
      .option("checkpointLocation", checkpointPath)
      .outputMode("append")
      .trigger(trigger)
      .queryName(topic)
      .start()
  }
}
