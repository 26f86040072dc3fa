package graft.tools

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.store.LakeCatalog

/** Convergence spec for the [[Datagen]] workload generator (the §5
  * test-strategy artifact the reference covers with its Faker
  * notebook): a seeded insert/update/delete workload applied through
  * the store's REAL commits must leave the table equal to a plain-
  * Scala replay of the same op log — every op keyed, every value
  * regenerated, nulls included. */
class DatagenSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("qty", IntegerType),
    StructField("price", DecimalType(12, 2)),
    StructField("score", DoubleType),
    StructField("active", BooleanType),
    StructField("created", DateType),
    StructField("updated_at", TimestampType),
    StructField("payload", BinaryType)))

  /** Render one value for order-free comparison (bytes and decimals
    * have identity-based / scale-sensitive equals). */
  private def norm(v: Any): Any = v match {
    case b: Array[Byte] => b.toVector
    case d: java.math.BigDecimal => d.toPlainString
    case other => other
  }

  private def freshTable(tag: String) = {
    val wh = Files.createTempDirectory(s"datagen-$tag").toString
    val cat = new LakeCatalog(spark, wh)
    cat.createDatabase("gen")
    cat.table("gen.workload")
  }

  /** Seeded workload through the given write mode must leave the table
    * equal to the plain-Scala replay of its op log. */
  private def convergence(tag: String, seed: Long, mor: Boolean): Unit = {
    val t = freshTable(tag)
    t.createOrReplace(Datagen.bulkDf(spark, schema, "id", 50, seed = 7L))
    // model bootstrap: what bulkDf wrote, read back once (the ops below
    // never depend on these values — only on keys — so this read does
    // not weaken the oracle for the mutation paths under test)
    val keyIdx = schema.fieldIndex("id")
    val model = scala.collection.mutable.Map.empty[Long, Seq[Any]]
    t.read.collect().foreach(r => model(r.getLong(keyIdx)) = r.toSeq.map(norm))

    val log = Datagen.runWorkload(spark, t, "id", ops = 40, seed = seed,
      batchRows = 2, mor = mor)
    log.foreach {
      case Datagen.Insert(rows) =>
        rows.foreach(r => model(r.getLong(keyIdx)) = r.toSeq.map(norm))
      case Datagen.Update(rows) =>
        rows.foreach { r =>
          val k = r.getLong(keyIdx)
          assert(model.contains(k), s"update invented key $k")
          model(k) = r.toSeq.map(norm)
        }
      case Datagen.Delete(rows) =>
        rows.foreach { r =>
          val k = r.getLong(0)
          assert(model.remove(k).isDefined, s"delete of unknown key $k")
        }
    }
    // all three op kinds must actually have run at 60/20/20 over 40 ops
    log.collect { case i: Datagen.Insert => i } should not be empty
    log.collect { case u: Datagen.Update => u } should not be empty
    log.collect { case d: Datagen.Delete => d } should not be empty

    val physicalRows = t.read.collect()
    // toMap below collapses duplicate keys — assert the PHYSICAL row
    // count first, so a merge that left two rows for one key (e.g. a
    // source batch sampled with replacement) cannot hide behind it
    physicalRows.length shouldBe model.size
    val got = physicalRows
      .map(r => r.getLong(keyIdx) -> r.toSeq.map(norm)).toMap
    got.keySet shouldBe model.keySet
    model.foreach { case (k, exp) =>
      withClue(s"key $k: ") { got(k) shouldBe exp }
    }
  }

  // both write modes under the identical reference-shaped workload;
  // extra seeds via GRAFT_SOAK_N (the RollupSoakSpec convention) turn
  // this into the reference-shaped store soak
  private val seeds: Seq[Long] = {
    val n = sys.env.get("GRAFT_SOAK_N").map(_.toInt).getOrElse(1)
    (0 until n).map(i => 11L + 13L * i)
  }
  test("tps pacing holds each op to its schedule slot without changing the op log") {
    val wh = Files.createTempDirectory("dg-tps").toString
    val cat = new LakeCatalog(spark, wh)
    cat.createDatabase("gen")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType)))
    def fresh(name: String) = {
      val t = cat.table(s"gen.$name")
      t.createOrReplace(Datagen.bulkDf(spark, schema, "id", 10, 3L))
      t
    }
    // lower bound is deterministic: op k waits for slot (k-1)/tps, so
    // 5 ops at 2 tps cannot finish before 2 s after the first op began
    // (no upper bound — a loaded host only ADDS wall)
    val t0 = System.nanoTime()
    val pacedLog = Datagen.runWorkload(spark, fresh("paced"), "id",
      ops = 5, seed = 17L, tps = 2.0)
    val elapsed = (System.nanoTime() - t0) / 1e9
    elapsed should be >= 2.0
    // pacing must not leak into the seeded op sequence
    val freeLog = Datagen.runWorkload(spark, fresh("free"), "id",
      ops = 5, seed = 17L)
    pacedLog shouldBe freeLog
  }

  seeds.foreach { seed =>
    test(s"seeded COW workload (seed $seed) converges to the replayed op-log model") {
      convergence(s"cow$seed", seed, mor = false)
    }
    test(s"seeded MoR workload (seed $seed) converges to the replayed op-log model") {
      convergence(s"mor$seed", seed, mor = true)
    }
  }

  test("bulkDf is schema-shaped, deterministic, and nulls at ~the requested rate") {
    val n = 4000L
    val df = Datagen.bulkDf(spark, schema, "id", n, seed = 3L)
    df.schema.fields.map(f => f.name -> f.dataType).toSeq shouldBe
      schema.fields.map(f => f.name -> f.dataType).toSeq
    df.count() shouldBe n
    // deterministic: a second identical plan yields identical rows
    val again = Datagen.bulkDf(spark, schema, "id", n, seed = 3L)
    df.exceptAll(again).count() shouldBe 0
    // 10% nulls per nullable field, ±4σ over 4000 draws
    val nameNulls = df.filter(df("name").isNull).count().toDouble / n
    nameNulls should be > 0.06
    nameNulls should be < 0.14
    df.filter(df("id").isNull).count() shouldBe 0
  }

  test("rowFor respects nullability and the key column") {
    val rng = new Random(5L)
    val rows = (1 to 300).map(i => Datagen.rowFor(schema, "id", i.toLong, rng))
    rows.zipWithIndex.foreach { case (r, i) =>
      r.getLong(0) shouldBe (i + 1).toLong
    }
    // key never null even though id is in the schema; nullables do null
    val nulls = rows.count(_.isNullAt(schema.fieldIndex("name")))
    nulls should be > 10
    nulls should be < 70
    // every non-null value matches its declared type via Row round-trip
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    df.count() shouldBe 300
  }
}
