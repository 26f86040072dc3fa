package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka stream-source configuration
  * (`/root/reference/src/utils/cdc_pipeline.py:384-395`): the full
  * option map is built as data so the per-topic startingOffsets
  * override, throttling, and loss tolerance are unit-testable without a
  * broker (no kafka connector jar ships in this image; `load` composes
  * against spark-sql-kafka when present).
  */
object KafkaSource {

  case class Config(
      bootstrapServers: String,
      topic: String,
      maxOffsetsPerTrigger: Long = 1000000L, // submit-command/README.md:112
      startingOffsets: String = "earliest",
      /** Per-topic partition→offset map (the v1-migration override):
        * serialized as `{"topic":{"0":100}}` (`cdc_pipeline.py:389-392`). */
      startingOffsetsByPartition: Option[Map[String, Long]] = None,
      failOnDataLoss: Boolean = false)

  def options(c: Config): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> c.bootstrapServers,
    "subscribe" -> c.topic,
    "maxOffsetsPerTrigger" -> c.maxOffsetsPerTrigger.toString,
    "startingOffsets" -> startingOffsetsJson(c),
    "failOnDataLoss" -> c.failOnDataLoss.toString)

  /** Global position name, or the per-topic JSON override. */
  def startingOffsetsJson(c: Config): String =
    c.startingOffsetsByPartition match {
      case None => c.startingOffsets
      case Some(byPartition) =>
        val inner = byPartition.toSeq.sortBy(_._1.toInt)
          .map { case (p, off) => s""""$p": $off""" }
          .mkString("{", ", ", "}")
        s"""{"${c.topic}": $inner}"""
    }

  /** The configured reader BEFORE `.load()` — the seam the contract
    * spec inspects: `.load()` needs the spark-sql-kafka jar (absent in
    * this image), but the option surface the reference builds
    * (`cdc_pipeline.py:384-395`) is fully constructed here. */
  def reader(spark: SparkSession, c: Config): org.apache.spark.sql.streaming.DataStreamReader =
    options(c)
      .foldLeft(spark.readStream.format("kafka")) { case (r, (k, v)) => r.option(k, v) }

  def load(spark: SparkSession, c: Config): DataFrame =
    reader(spark, c).load()
}
