package graft.streaming

import org.apache.spark.sql.streaming.DataStreamReader

import graft.SparkSpec

/** Option-surface contract for the Kafka stream source: the image ships
  * no spark-sql-kafka jar, so `.load()` can never run here — but a
  * future image may add it, and the contract that must then hold is the
  * exact option map the reference builds (`cdc_pipeline.py:384-395`):
  * bootstrap servers under the `kafka.` prefix, `subscribe` (not
  * assign/pattern), throttling via `maxOffsetsPerTrigger`, the
  * per-topic `startingOffsets` JSON override in python-json.dumps
  * rendering, and `failOnDataLoss=false`. This spec pins those strings
  * on the REAL DataStreamReader (not just the options Map), by
  * reflecting the reader's accumulated option state — so a drive-by
  * "cleanup" of KafkaSource.reader cannot silently drop an option. */
class KafkaSourceContractSpec extends SparkSpec {

  /** The reader's accumulated options: scan the object's fields for the
    * map that carries "subscribe" (DataStreamReader keeps them in a
    * private CaseInsensitiveMap whose field name is version-dependent —
    * matching by content survives renames). */
  private def readerOptions(r: DataStreamReader): Map[String, String] = {
    def fields(c: Class[_]): Seq[java.lang.reflect.Field] =
      if (c == null) Nil else c.getDeclaredFields.toSeq ++ fields(c.getSuperclass)
    fields(r.getClass).flatMap { f =>
      f.setAccessible(true)
      f.get(r) match {
        case m: scala.collection.Map[_, _]
            if m.keys.exists(_.toString.equalsIgnoreCase("subscribe")) =>
          Some(m.map { case (k, v) => k.toString.toLowerCase -> v.toString }.toMap)
        case _ => None
      }
    }.headOption.getOrElse(
      fail("no option map found on DataStreamReader — reflection seam moved"))
  }

  test("global startingOffsets: the five reference options, nothing else") {
    val c = KafkaSource.Config("broker1:9092,broker2:9092", "pfx.shop.orders")
    val opts = readerOptions(KafkaSource.reader(spark, c))
    opts shouldBe Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "pfx.shop.orders",
      "maxoffsetspertrigger" -> "1000000",
      "startingoffsets" -> "earliest",
      "failondataloss" -> "false")
  }

  test("per-topic startingOffsets override renders the reference's json.dumps shape") {
    val c = KafkaSource.Config("b:9092", "pfx.shop.orders",
      maxOffsetsPerTrigger = 250000L,
      startingOffsetsByPartition = Some(Map("0" -> 100L, "2" -> 7L, "1" -> 250L)))
    val opts = readerOptions(KafkaSource.reader(spark, c))
    // python: json.dumps({topic: {"0": 100, "1": 250, "2": 7}}) — ", " and
    // ": " separators, partitions in numeric order
    opts("startingoffsets") shouldBe
      """{"pfx.shop.orders": {"0": 100, "1": 250, "2": 7}}"""
    opts("maxoffsetspertrigger") shouldBe "250000"
  }

  test("failOnDataLoss can be enabled but defaults to the reference's false") {
    val c = KafkaSource.Config("b:9092", "t", failOnDataLoss = true)
    readerOptions(KafkaSource.reader(spark, c))("failondataloss") shouldBe "true"
    KafkaSource.options(KafkaSource.Config("b:9092", "t"))("failOnDataLoss") shouldBe "false"
  }
}
