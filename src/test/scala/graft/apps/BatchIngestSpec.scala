package graft.apps

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.LakeCatalog

class BatchIngestSpec extends SparkSpec {

  import spark.implicits._

  test("conformSnapshot: trim + audit + pk hash") {
    val df = Seq((1, "  padded  "), (2, "x")).toDF("id", "name")
    val out = BatchIngest.conformSnapshot(df, Seq("id"), "last_applied_date")
    out.columns.toSeq shouldBe Seq("id", "name", "last_applied_date", "id_iceberg")
    val r = out.orderBy("id").head()
    r.getString(1) shouldBe "padded"
    r.getString(3) shouldBe
      org.apache.commons.codec.digest.DigestUtils.md5Hex("1")
  }

  test("parquetToLake: UTC normalize, audit rename, RTAS with pk properties") {
    val raw = Files.createTempDirectory("raw").toString
    Seq(
      (1, "a", new Timestamp(1700000000000L)),
      (2, "b", new Timestamp(1700000060000L)))
      .toDF("id", "name", "update_ts_dms")
      .write.mode("overwrite").parquet(raw)

    val cat = new LakeCatalog(spark, Files.createTempDirectory("wh").toString)
    BatchIngest.parquetToLake(spark, cat, raw, "svc_shop", "users", Seq("id"))

    val t = cat.table("svc_shop.users")
    t.exists shouldBe true
    val out = t.read
    out.columns.toSeq should contain allOf ("last_applied_date", "id_iceberg")
    out.columns should not contain "update_ts_dms"
    out.count() shouldBe 2
    t.properties("write.metadata.delete-after-commit.enabled") shouldBe "true"
    t.properties("history.expire.max-snapshot-age-ms") shouldBe "86400000"

    // no PK → no identity column, no metadata GC properties
    BatchIngest.parquetToLake(spark, cat, raw, "svc_shop", "nopk", Nil)
    val t2 = cat.table("svc_shop.nopk")
    t2.read.columns should not contain "id_iceberg"
    t2.properties.contains("write.metadata.delete-after-commit.enabled") shouldBe false
  }

  test("re-running parquetToLake replaces the table (RTAS semantics)") {
    val raw = Files.createTempDirectory("raw2").toString
    Seq((1, "v1")).toDF("id", "name").write.mode("overwrite").parquet(raw)
    val cat = new LakeCatalog(spark, Files.createTempDirectory("wh2").toString)
    BatchIngest.parquetToLake(spark, cat, raw, "s", "t", Seq("id"))

    Seq((9, "v2")).toDF("id", "name").write.mode("overwrite").parquet(raw)
    BatchIngest.parquetToLake(spark, cat, raw, "s", "t", Seq("id"))
    val rows = cat.table("s.t").read.select("id").collect().map(_.getInt(0)).toSeq
    rows shouldBe Seq(9)
    cat.table("s.t").currentSnapshot.get.version shouldBe 2L
  }

  test("atomicOverwriteParquet swaps complete snapshots and never leaves stage dirs") {
    val dir = Files.createTempDirectory("raw3")
    val out = dir.resolve("zone").toString
    BatchIngest.atomicOverwriteParquet(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), out)
    spark.read.parquet(out).count() shouldBe 2
    // second overwrite replaces, doesn't merge
    BatchIngest.atomicOverwriteParquet(spark, Seq((9, "z")).toDF("id", "v"), out)
    spark.read.parquet(out).select("id").head().getInt(0) shouldBe 9
    // a stage dir a crashed run left behind is swept, not accumulated
    val stale = dir.resolve(".zone.staging-deadbeef")
    Files.createDirectory(stale)
    BatchIngest.atomicOverwriteParquet(spark, Seq((7, "q")).toDF("id", "v"), out)
    Files.exists(stale) shouldBe false
    // the destination's parent holds ONLY the destination afterwards
    val leftovers = new java.io.File(dir.toString).listFiles().map(_.getName).toSeq
    leftovers shouldBe Seq("zone")
    // and a failing WRITE leaves the previous complete snapshot intact
    val bad = spark.range(1).selectExpr("assert_true(id > 0) AS boom", "id")
    an[Exception] should be thrownBy
      BatchIngest.atomicOverwriteParquet(spark, bad, out)
    spark.read.parquet(out).select("id").head().getInt(0) shouldBe 7
    new java.io.File(dir.toString).listFiles().map(_.getName).toSeq shouldBe Seq("zone")
  }

  test("atomicOverwriteParquet crash windows always keep one complete snapshot") {
    val dir = Files.createTempDirectory("raw4")
    val out = dir.resolve("zone").toString
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    BatchIngest.atomicOverwriteParquet(spark, Seq((1, "a")).toDF("id", "v"), out)
    // crash window: a previous run died AFTER moving the live dir aside
    // and BEFORE swapping its stage in — the aside copy is the only
    // complete snapshot; the next run must RESTORE it, not sweep it
    fs.rename(new org.apache.hadoop.fs.Path(out),
      new org.apache.hadoop.fs.Path(dir.resolve(".zone.old-cafebabe").toString))
    Files.createDirectory(dir.resolve(".zone.staging-cafebabe")) // its torn stage
    BatchIngest.atomicOverwriteParquet(spark, Seq((2, "b")).toDF("id", "v"), out)
    spark.read.parquet(out).select("id").head().getInt(0) shouldBe 2
    // crash window: died AFTER the swap, BEFORE dropping the aside copy
    // — live dir is newer; the stale aside is dropped, never restored
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir.resolve(".zone.old-deadbeef").toString))
    BatchIngest.atomicOverwriteParquet(spark, Seq((3, "c")).toDF("id", "v"), out)
    spark.read.parquet(out).select("id").head().getInt(0) shouldBe 3
    new java.io.File(dir.toString).listFiles().map(_.getName).toSeq shouldBe Seq("zone")
  }
}
