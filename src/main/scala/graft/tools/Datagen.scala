package graft.tools

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import java.sql.{Date, Timestamp}

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.GraftSession
import graft.store.{LakeCatalog, LakeTable}

/** Type-driven random-workload generator for a [[LakeTable]] — the
  * Scala counterpart of the reference's Faker datagen notebook
  * (`tests/06.datagen_iceberg.ipynb` cells 0-1): rows are generated
  * FROM THE TABLE SCHEMA per Spark type, nullable fields go NULL at a
  * configurable rate (the reference's 10%), and the workload mixes
  * insert/update/delete at configurable ratios (60/20/20) against a
  * key column — updates regenerate every non-key field of sampled
  * existing keys, deletes remove sampled keys.
  *
  * Two deliberate departures from the reference, both Spark-first:
  *
  *  - **Determinism**: everything derives from a seeded [[Random]], so
  *    a spec can replay the exact op sequence against a plain-Scala
  *    model and assert convergence (final table state == replayed
  *    model) — the property the reference's notebook exercises by eye.
  *  - **Real mutation ops**: the reference simulates update/delete by
  *    rewriting the WHOLE table with `mode("overwrite")` (notebook
  *    cell 1); here they are the store's actual MERGE / DELETE WHERE
  *    EXISTS commits, so a soak drives the code paths production
  *    would.
  *
  * Per-op batches are driver-built (like the reference's, and bounded
  * by `batchRows`); [[bulkDf]] is the distributed path for seeding
  * large tables — `spark.range` plus column expressions, no driver
  * materialization, scales to any row count.
  */
object Datagen {

  /** One applied operation, for model replay in specs. */
  sealed trait Op { def rows: Seq[Row] }
  final case class Insert(rows: Seq[Row]) extends Op
  final case class Update(rows: Seq[Row]) extends Op
  /** `rows` carry only the key column's value in position 0. */
  final case class Delete(rows: Seq[Row]) extends Op

  /** Random value for one field, never null (nullability is decided by
    * the caller). Mirrors the reference's per-type menu: bounded ints,
    * full-range longs kept positive, short text, positive doubles with
    * 3 fraction digits, scale-respecting decimals, booleans, bounded
    * binary, this-decade dates and timestamps. */
  private def randomValue(dt: DataType, rng: Random): Any = dt match {
    case IntegerType => rng.nextInt(Int.MaxValue)
    case LongType => rng.nextLong() & Long.MaxValue
    case ShortType => rng.nextInt(Short.MaxValue).toShort
    case StringType => Range(0, 2 + rng.nextInt(12))
      .map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    case DoubleType => math.floor(rng.nextDouble() * 1e9) / 1e3
    case FloatType => (math.floor(rng.nextDouble() * 1e6) / 1e2).toFloat
    case d: DecimalType =>
      new JBigDecimal(rng.nextDouble() * math.pow(10, (d.precision - d.scale).min(9).toDouble),
        new MathContext(d.precision))
        .setScale(d.scale, RoundingMode.HALF_UP)
    case BooleanType => rng.nextBoolean()
    case BinaryType => { val b = new Array[Byte](1 + rng.nextInt(32)); rng.nextBytes(b); b }
    case DateType => new Date(
      Date.valueOf("2020-01-01").getTime + rng.nextInt(3653).toLong * 86400000L)
    case TimestampType => new Timestamp(
      Timestamp.valueOf("2020-01-01 00:00:00").getTime +
        (rng.nextDouble() * 3653 * 86400000L).toLong)
    case other => throw new IllegalArgumentException(
      s"Datagen does not generate $other — extend randomValue")
  }

  /** One row for `schema` with `key` in the key column; every nullable
    * non-key field independently NULL at `nullRate` (reference: 10%). */
  def rowFor(schema: StructType, keyCol: String, key: Long, rng: Random,
      nullRate: Double = 0.1): Row =
    Row.fromSeq(schema.fields.toSeq.map { f =>
      if (f.name == keyCol) key
      else if (f.nullable && rng.nextDouble() < nullRate) null
      else randomValue(f.dataType, rng)
    })

  /** Distributed bulk generator: `n` schema-shaped rows with keys
    * `0 until n`, built from `spark.range` + column expressions — the
    * 100 TB seeding path (no driver-side rows; `rand(seed)` keeps it
    * deterministic per partition layout). */
  def bulkDf(spark: SparkSession, schema: StructType, keyCol: String,
      n: Long, seed: Long, nullRate: Double = 0.1): DataFrame = {
    def gen(f: StructField, i: Int): org.apache.spark.sql.Column = {
      val r = rand(seed + i)
      val v = f.dataType match {
        case IntegerType => floor(r * Int.MaxValue).cast("int")
        case LongType => floor(r * 1e15).cast("long")
        case StringType => md5(concat_ws("-", col("id"), lit(i)))
        case DoubleType => round(r * 1e6, 3)
        case d: DecimalType => round(r * 1e6, d.scale).cast(d)
        case BooleanType => r > 0.5
        case DateType => date_add(lit("2020-01-01").cast("date"),
          floor(r * 3653).cast("int"))
        case TimestampType => timestamp_seconds(
          unix_timestamp(lit("2020-01-01 00:00:00")) + floor(r * 3653L * 86400).cast("long"))
        case BinaryType => unhex(md5(concat_ws("-", col("id"), lit(i))))
        case other => throw new IllegalArgumentException(
          s"Datagen.bulkDf does not generate $other")
      }
      (if (f.nullable) when(rand(seed + 7919 + i) < nullRate, lit(null)).otherwise(v)
       else v).as(f.name)
    }
    spark.range(n).select(schema.fields.toSeq.zipWithIndex.map {
      case (f, _) if f.name == keyCol => col("id").cast(f.dataType).as(keyCol)
      case (f, i) => gen(f, i)
    }: _*)
  }

  /** Run `ops` seeded insert/update/delete transactions against `t`.
    *
    * Ratios follow the reference's 60/20/20 default; each transaction
    * touches `batchRows` rows (the reference uses 1 — keep it small,
    * the point is commit DENSITY, not volume). Updates and deletes
    * sample keys from the LIVE key set tracked driver-side (seeded →
    * replayable), so they always hit existing rows like the
    * reference's `df.take(n)` does, without reading the table back
    * between ops. `mor = true` drives the merge-on-read write path
    * (equality-delete commits) instead of copy-on-write — same op
    * log, same convergence contract, the store's other write mode
    * under the identical workload. `tps > 0` paces the loop at that
    * many transactions per second (the reference notebook's configured
    * TPS): each op waits for its schedule slot `start + k/tps`; a slow
    * op eats its own slack — pacing never skips or reorders ops, so
    * the op log stays seed-replayable regardless of host speed.
    * Returns the op log for model replay. */
  def runWorkload(spark: SparkSession, t: LakeTable, keyCol: String,
      ops: Int, seed: Long, insertRatio: Double = 0.6,
      updateRatio: Double = 0.2, batchRows: Int = 1,
      nullRate: Double = 0.1, mor: Boolean = false,
      tps: Double = 0.0): Seq[Op] = {
    require(insertRatio >= 0 && updateRatio >= 0 && insertRatio + updateRatio <= 1.0,
      "ratios must be non-negative and sum to at most 1 (delete takes the rest)")
    val schema = t.read.schema
    require(schema.fieldNames.contains(keyCol), s"no key column $keyCol")
    val rng = new Random(seed)
    var nextKey = 1000000L // above any seeded key range
    val live = scala.collection.mutable.ArrayBuffer.empty[Long]
    val log = scala.collection.mutable.ArrayBuffer.empty[Op]
    def df(rows: Seq[Row], s: StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s)
    val startNanos = System.nanoTime()
    (1 to ops).foreach { k =>
      if (tps > 0) {
        val slotNanos = startNanos + ((k - 1) * 1e9 / tps).toLong
        val waitMs = (slotNanos - System.nanoTime()) / 1_000_000L
        if (waitMs > 0) Thread.sleep(waitMs)
      }
      val dice = rng.nextDouble()
      if (dice < insertRatio || live.isEmpty) {
        val rows = (1 to batchRows).map { _ =>
          val k = nextKey; nextKey += 1; live += k
          rowFor(schema, keyCol, k, rng, nullRate)
        }
        t.append(df(rows, schema))
        log += Insert(rows)
      } else if (dice < insertRatio + updateRatio) {
        // sample keys WITHOUT replacement: a merge source carrying the
        // same key twice would leave two physical rows for that key
        // (upsert anti-joins the target, not the source against itself),
        // diverging from the last-wins replay model
        val keys = rng.shuffle(live.toVector).take(batchRows.min(live.size))
        val rows = keys.map(k => rowFor(schema, keyCol, k, rng, nullRate))
        if (mor) t.mergeIntoMoR(df(rows, schema), Seq(keyCol))
        else t.mergeInto(df(rows, schema), Seq(keyCol))
        log += Update(rows)
      } else {
        val keys = (1 to batchRows.min(live.size))
          .map(_ => live.remove(rng.nextInt(live.size))).distinct
        val keySchema = StructType(Seq(schema(keyCol)))
        val keyDf = df(keys.map(Row(_)), keySchema)
        if (mor) t.deleteWhereExistsMoR(keyDf, Seq(keyCol))
        else t.deleteWhereExists(keyDf, Seq(keyCol))
        log += Delete(keys.map(Row(_)))
      }
    }
    log.toSeq
  }

  /** CLI: `runMain graft.tools.Datagen [warehouse] [ops] [seed] [tps]` —
    * creates a reference-shaped mixed-type table, seeds it, runs the
    * 60/20/20 workload, prints the op mix and final row count. */
  def main(args: Array[String]): Unit = {
    val wh = args.headOption.getOrElse(
      s"${sys.props("java.io.tmpdir")}/graft_datagen")
    val ops = args.drop(1).headOption.map(_.toInt).getOrElse(30)
    val seed = args.drop(2).headOption.map(_.toLong).getOrElse(42L)
    val tps = args.drop(3).headOption.map(_.toDouble).getOrElse(0.0)
    val spark = GraftSession.builder(appName = "graft-datagen").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("qty", IntegerType),
      StructField("price", DecimalType(12, 2)),
      StructField("score", DoubleType),
      StructField("active", BooleanType),
      StructField("created", DateType),
      StructField("updated_at", TimestampType)))
    val cat = new LakeCatalog(spark, wh)
    cat.createDatabase("gen")
    cat.dropTable("gen.workload")
    val t = cat.table("gen.workload")
    t.createOrReplace(bulkDf(spark, schema, "id", 1000, seed))
    val log = runWorkload(spark, t, "id", ops, seed, tps = tps)
    val mix = log.groupBy(_.getClass.getSimpleName).view.mapValues(_.size).toMap
    println(s"DATAGEN ops=$ops mix=$mix rows=${t.read.count()} " +
      s"version=${t.currentSnapshot.map(_.version).getOrElse(-1L)}")
    spark.stop()
  }
}
