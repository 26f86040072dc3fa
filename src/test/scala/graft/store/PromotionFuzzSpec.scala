package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.SparkSpec

/** Type-promotion fuzz: files written as int32 / decimal(12,2) across
  * MULTIPLE ROW GROUPS with dictionary AND plain encodings must read
  * back row-for-row identical after the metadata-only
  * `alterColumnType` widening (int→long, decimal(12,2)→(18,2)).
  *
  * Exists to hunt the r9/r10 driver-only c28 hash divergence locally:
  * the driver's generator seed produces parquet value distributions —
  * and therefore encodings and page layouts — the seed-42 local data
  * may never hit, so this spec forces the layout axes directly
  * (dictionary on/off, tiny row groups and pages, extreme and null
  * values) instead of hoping a dataset happens to cover them.
  */
class PromotionFuzzSpec extends SparkSpec {

  import spark.implicits._

  private def render(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case d: java.math.BigDecimal => d.toPlainString
      case x => String.valueOf(x) // int 5 and long 5 both render "5"
    }.mkString("|")).sorted.toSeq

  private def adversarial(seed: Int, n: Int): DataFrame = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val id: java.lang.Integer = i match {
        case 0 => Int.MinValue
        case 1 => Int.MaxValue
        case 2 => -1
        case 3 => 0
        case _ => rng.nextInt()
      }
      // heavy repeats → dictionary-encodable; nulls every ~50 rows
      val dup: java.lang.Integer =
        if (i % 50 == 7) null else Int.box(rng.nextInt(40) - 20)
      val price: java.math.BigDecimal = i match {
        case 4 => new java.math.BigDecimal("9999999999.99")
        case 5 => new java.math.BigDecimal("-9999999999.99")
        case _ if i % 61 == 13 => null
        case _ => new java.math.BigDecimal(
          f"${rng.nextLong() % 10000000000L}%d.${rng.nextInt(100)}%02d")
      }
      (id, dup, price)
    }
    rows.toDF("id", "dup", "price")
      .select($"id".cast("int").as("id"), $"dup".cast("int").as("dup"),
        $"price".cast("decimal(12,2)").as("price"))
  }

  Seq(true, false).foreach { dict =>
    test(s"widened read equals pre-promotion content (dictionary=$dict, multi-row-group)") {
      val hc = spark.sparkContext.hadoopConfiguration
      val saved = Seq("parquet.enable.dictionary", "parquet.block.size",
        "parquet.page.size").map(k => k -> Option(hc.get(k)))
      try {
        hc.set("parquet.enable.dictionary", dict.toString)
        hc.set("parquet.block.size", "65536") // force several row groups
        hc.set("parquet.page.size", "8192")   // and several pages each
        val cat = new LakeCatalog(spark,
          Files.createTempDirectory(s"promo-fuzz-$dict").toString)
        cat.createDatabase("db")
        val t = cat.table("db.promoted")
        // one file, many row groups: the widened reader walks every
        // page-decode path (dictionary, plain, definition levels)
        t.createOrReplace(adversarial(if (dict) 17 else 31, 60000)
          .repartition(1))
        val before = render(t.read)
        t.alterColumnType("id", LongType)
        t.alterColumnType("dup", LongType)
        t.alterColumnType("price", DecimalType(18, 2))
        val after = render(t.read)
        after.length shouldBe 60000
        after shouldBe before
      } finally saved.foreach {
        case (k, Some(v)) => hc.set(k, v)
        case (k, None) => hc.unset(k)
      }
    }
  }
}
