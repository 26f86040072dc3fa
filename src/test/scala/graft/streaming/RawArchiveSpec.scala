package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.avro.AvroTestData
import graft.cdc.InMemorySchemaRegistry

class RawArchiveSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"Event","fields":[
      {"name":"id","type":"int"},
      {"name":"kind","type":["null","string"],"default":null}]}"""
  private lazy val schema = new Schema.Parser().parse(schemaJson)
  private val registry = new InMemorySchemaRegistry(Map(7 -> schemaJson))

  private def frame(id: Int, kind: String): Array[Byte] =
    AvroTestData.confluentFrame(7, AvroTestData.encode(schema, r => {
      r.put("id", id); r.put("kind", kind)
    }))

  test("withDatePartitions derives the hive partition columns") {
    import spark.implicits._
    val df = Seq(Timestamp.valueOf("2026-03-05 14:00:00")).toDF("timestamp")
    val out = RawArchive.withDatePartitions(df, Seq("year", "month", "day", "hour")).head()
    (out.getString(1), out.getString(2), out.getString(3), out.getString(4)) shouldBe
      (("2026", "03", "05", "14"))
  }

  test("raw stream: avro decode -> date-partitioned parquet append") {
    val sourceDir = Files.createTempDirectory("raw-src").toString
    val outDir = Files.createTempDirectory("raw-out").toString + "/archive"
    val ckpt = Files.createTempDirectory("raw-ckpt").toString

    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType)))
    val rows = Seq(
      Row(null, frame(1, "click"), "t", 0, 1L, Timestamp.valueOf("2026-03-05 10:00:00")),
      Row(null, frame(2, "view"), "t", 0, 2L, Timestamp.valueOf("2026-03-06 11:00:00")))
    spark.createDataFrame(rows.asJava, kafkaSchema)
      .write.mode("overwrite").parquet(sourceDir)

    val q = RawArchive.runRawStream(
      spark,
      spark.readStream.schema(kafkaSchema).parquet(sourceDir),
      topic = "t",
      outputPath = outDir,
      checkpointPath = ckpt,
      partitionCols = Seq("year", "month", "day"),
      registry = registry,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()

    val out = spark.read.parquet(outDir)
    out.count() shouldBe 2
    out.columns.toSet shouldBe Set("id", "kind", "year", "month", "day")
    out.filter(col("day") === "05").head().getAs[Int]("id") shouldBe 1
    // append semantics: replay the same batch from a fresh checkpoint
    val ckpt2 = Files.createTempDirectory("raw-ckpt2").toString
    val q2 = RawArchive.runRawStream(spark,
      spark.readStream.schema(kafkaSchema).parquet(sourceDir),
      "t", outDir, ckpt2, Seq("year", "month", "day"), registry,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q2.awaitTermination()
    spark.read.parquet(outDir).count() shouldBe 4
  }
}
