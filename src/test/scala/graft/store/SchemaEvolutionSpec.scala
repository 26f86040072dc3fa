package graft.store

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("evo-wh").toString)
    cat.createDatabase("lake")
    val t = cat.table("lake.evolving")
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t
  }

  test("appendEvolve widens the schema; old files read null for the new column") {
    val t = freshTable
    t.appendEvolve(Seq((3L, "c", 30)).toDF("id", "v", "extra"))
    t.schema.fieldNames.toSeq shouldBe Seq("id", "v", "extra")
    val rows = t.read.orderBy("id").collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L)
    rows(0).isNullAt(2) shouldBe true // pre-evolution file: null-filled
    rows(2).getInt(2) shouldBe 30
  }

  test("mergeIntoEvolve: upsert batch with a new column widens and applies in one commit") {
    val t = freshTable
    t.mergeIntoEvolve(
      Seq((2L, "B", 20), (3L, "c", 30)).toDF("id", "v", "extra"), Seq("id"))
    t.schema.fieldNames.toSeq shouldBe Seq("id", "v", "extra")
    t.currentSnapshot.get.operation shouldBe "merge-evolve"
    val rows = t.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
    // 1 untouched (null new col), 2 updated, 3 inserted
    rows.toSeq shouldBe Seq((1L, "a", -1), (2L, "B", 20), (3L, "c", 30))
  }

  test("mergeIntoEvolve without new columns degrades to a plain upsert") {
    val t = freshTable
    t.mergeIntoEvolve(Seq((1L, "A")).toDF("id", "v"), Seq("id"))
    t.schema.fieldNames.toSeq shouldBe Seq("id", "v")
    t.read.orderBy("id").collect().map(_.getString(1)).toSeq shouldBe Seq("A", "b")
  }

  test("appendEvolve fills table columns the batch lacks with nulls") {
    val t = freshTable
    t.appendEvolve(Seq(Tuple1(4L)).toDF("id"))
    val r = t.read.filter($"id" === 4L).head()
    r.isNullAt(1) shouldBe true
    t.schema.fieldNames.toSeq shouldBe Seq("id", "v") // no widening happened
  }

  test("plain append stays strict: a batch missing a stored column fails") {
    val t = freshTable
    an[AnalysisException] should be thrownBy
      t.append(Seq(Tuple1(9L)).toDF("id"))
  }

  test("merge and stats-pruned reads work across the evolution boundary") {
    val t = freshTable
    t.appendEvolve(Seq((3L, "c", 30), (4L, "d", 40)).toDF("id", "v", "extra"))
    t.mergeInto(Seq((2L, "B", 20)).toDF("id", "v", "extra"), Seq("id"))
    val rows = t.read.orderBy("id").collect()
    rows.length shouldBe 4
    rows(1).getString(1) shouldBe "B"
    rows(1).getInt(2) shouldBe 20
    // new column is stats-prunable on post-evolution entries, and
    // conservative (kept) for pre-evolution entries without stats
    t.readWhere($"extra" >= 40).collect().map(_.getLong(0)).toSeq shouldBe Seq(4L)
  }

  test("evolution commits record the added column count") {
    val t = freshTable
    val snap = t.appendEvolve(Seq((5L, "e", 1.5)).toDF("id", "v", "score"))
    snap.summary("added-columns") shouldBe "1"
    snap.operation shouldBe "append-evolve"
  }

  test("alterColumnType: metadata-only widening, mixed generations read under one schema") {
    import org.apache.spark.sql.types._
    val cat = new LakeCatalog(spark, Files.createTempDirectory("promo-wh").toString)
    cat.createDatabase("lake")
    val t = cat.table("lake.promoted")
    t.createOrReplace(Seq((1, "a", 1.5f), (2, "b", 2.5f)).toDF("id", "v", "score"))
    val entriesBefore = t.currentSnapshot.get.entries

    t.alterColumnType("id", LongType)
    t.alterColumnType("score", DoubleType)

    // metadata-only: no data entry was rewritten by the promotions
    t.currentSnapshot.get.entries shouldBe entriesBefore
    t.currentSnapshot.get.operation shouldBe "alter-column-type"
    t.schema("id").dataType shouldBe LongType
    t.schema("score").dataType shouldBe DoubleType
    // keys beyond int range are appendable post-promotion; the batch's
    // long/double columns pass conform uncast
    t.append(Seq((10000000001L, "c", 3.5)).toDF("id", "v", "score"))
    val rows = t.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    rows.toSeq shouldBe Seq((1L, "a", 1.5), (2L, "b", 2.5), (10000000001L, "c", 3.5))
    // merges reach across both file generations
    t.mergeInto(Seq((1L, "A", 9.0), (10000000001L, "C", 9.5)).toDF("id", "v", "score"),
      Seq("id"))
    t.read.orderBy("id").collect().map(_.getString(1)).toSeq shouldBe Seq("A", "b", "C")
  }

  test("alterColumnType: decimal precision growth at fixed scale; stats pruning survives") {
    import org.apache.spark.sql.types._
    val cat = new LakeCatalog(spark, Files.createTempDirectory("promo-dec-wh").toString)
    cat.createDatabase("lake")
    val t = cat.table("lake.promoted_dec")
    t.createOrReplace(
      Seq((1L, "11.25"), (2L, "22.50")).toDF("id", "p")
        .select($"id", $"p".cast("decimal(6,2)").as("p")))
    t.alterColumnType("p", DecimalType(14, 2))
    t.append(Seq((3L, "123456789012.75")).toDF("id", "p")
      .select($"id", $"p".cast("decimal(14,2)").as("p")))
    t.read.orderBy("id").collect().map(_.getDecimal(1).toPlainString).toSeq shouldBe
      Seq("11.25", "22.50", "123456789012.75")
    // legacy narrow-decimal stats strings still prune under the wide type
    t.readWhere($"p" >= new java.math.BigDecimal("100.00"))
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(3L)
  }

  test("alterColumnType refuses narrowing, scale changes, and the bucket column") {
    import org.apache.spark.sql.types._
    val cat = new LakeCatalog(spark, Files.createTempDirectory("promo-ref-wh").toString)
    cat.createDatabase("lake")
    val t = cat.table("lake.promoted_refuse")
    t.createOrReplace(Seq((1L, 5, "x")).toDF("id", "n", "v"),
      bucketBy = Some(("n", 4)))
    an[IllegalArgumentException] should be thrownBy
      t.alterColumnType("id", IntegerType) // narrowing
    an[IllegalArgumentException] should be thrownBy
      t.alterColumnType("v", IntegerType) // string -> int is not a promotion
    an[IllegalArgumentException] should be thrownBy
      t.alterColumnType("n", LongType) // bucket column: hash-sensitive
    an[IllegalArgumentException] should be thrownBy
      t.alterColumnType("missing", LongType)
  }
}
