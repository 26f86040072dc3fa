package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The migration-runbook surface (`migrate_v2_naming.sql`): table
  * rename across schemas, column rename, and row UPDATE — plus the
  * UPDATE mode dispatch and the scale shapes each one commits
  * (stats-pruned COW for updates, O(matched) for MoR updates, one
  * validated rewrite for column renames, pure metadata move for table
  * renames). */
class MigrationSpec extends SparkSpec {

  private def freshCatalog(): LakeCatalog = {
    val wh = Files.createTempDirectory("migration-test").toString
    new LakeCatalog(spark, wh)
  }

  private def df(rows: Seq[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "status", "amount")
  }

  private def state(t: LakeTable): Seq[(Long, String, Double)] =
    t.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  // -------------------------------------------------------------------
  // renameTable
  // -------------------------------------------------------------------

  test("renameTable moves a table across schemas without touching data") {
    val cat = freshCatalog()
    cat.createDatabase("ops_bronze")
    val t = cat.table("ops_bronze.watermark")
    t.createOrReplace(df(Seq((1L, "a", 1.0), (2L, "b", 2.0))))
    val v = t.currentSnapshot.get.version

    cat.renameTable("ops_bronze.watermark", "di_ops.watermark")

    cat.tableExists("ops_bronze.watermark") shouldBe false
    val moved = cat.table("di_ops.watermark")
    moved.exists shouldBe true
    moved.currentSnapshot.get.version shouldBe v // history moved intact
    state(moved) shouldBe Seq((1L, "a", 1.0), (2L, "b", 2.0))
    cat.listTables("di_ops") shouldBe Seq("watermark")
  }

  test("the full runbook rolls back to the original state (migrate_v2_naming.sql note 3)") {
    // forward: rename table across schemas, rename column, migrate values
    val cat = freshCatalog()
    cat.createDatabase("ops_bronze")
    val rows = Seq((1L, "store_bronze", 1.0), (2L, "di_other", 2.0))
    cat.table("ops_bronze.cdc_watermark").createOrReplace(df(rows))
    cat.renameTable("ops_bronze.cdc_watermark", "di_ops.cdc_watermark")
    val t = cat.table("di_ops.cdc_watermark")
    t.renameColumn("status", "iceberg_schema")
    t.updateWhere(col("iceberg_schema") === lit("store_bronze"),
      Map("iceberg_schema" -> lit("local_store")))
    cat.dropDatabase("ops_bronze")

    // rollback, in the runbook's documented order (before the DROPs it
    // is fully reversible): un-update, un-rename column, un-rename table
    t.updateWhere(col("iceberg_schema") === lit("local_store"),
      Map("iceberg_schema" -> lit("store_bronze")))
    t.renameColumn("iceberg_schema", "status")
    cat.renameTable("di_ops.cdc_watermark", "ops_bronze.cdc_watermark")
    cat.dropDatabase("di_ops")

    state(cat.table("ops_bronze.cdc_watermark")) shouldBe rows
    cat.listTables("di_ops") shouldBe empty
  }

  test("dropDatabase is RESTRICT: refuses while tables remain") {
    val cat = freshCatalog()
    cat.table("db.t").createOrReplace(df(Seq((1L, "a", 1.0))))
    an[IllegalArgumentException] should be thrownBy cat.dropDatabase("db")
    state(cat.table("db.t")) shouldBe Seq((1L, "a", 1.0)) // survived
    cat.dropTable("db.t")
    cat.dropDatabase("db")
    cat.listTables("db") shouldBe empty
  }

  test("renameTable refuses a missing source and an existing target") {
    val cat = freshCatalog()
    cat.createDatabase("db")
    an[IllegalArgumentException] should be thrownBy
      cat.renameTable("db.nope", "db.other")
    cat.table("db.a").createOrReplace(df(Seq((1L, "a", 1.0))))
    cat.table("db.b").createOrReplace(df(Seq((2L, "b", 2.0))))
    an[IllegalArgumentException] should be thrownBy
      cat.renameTable("db.a", "db.b")
    // both survive untouched
    state(cat.table("db.a")) shouldBe Seq((1L, "a", 1.0))
    state(cat.table("db.b")) shouldBe Seq((2L, "b", 2.0))
  }

  // -------------------------------------------------------------------
  // renameColumn
  // -------------------------------------------------------------------

  test("renameColumn carries every row under the new name, pre-rename files included") {
    val t = freshCatalog().table("db.t")
    t.createOrReplace(df(Seq((1L, "a", 1.0))))
    t.append(df(Seq((2L, "b", 2.0)))) // second physical file, old column name
    t.renameColumn("status", "iceberg_schema")

    t.schema.fieldNames.toSeq shouldBe Seq("id", "iceberg_schema", "amount")
    t.read.orderBy("id").select("id", "iceberg_schema").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (2L, "b")) // a by-name read of old files would yield nulls
    // time travel below the rename still presents the OLD schema
    val preRename = t.currentSnapshot.get.version - 1
    t.readVersion(preRename).columns.toSeq shouldBe Seq("id", "status", "amount")
  }

  test("renameColumn follows partition columns and keeps stats pruning alive") {
    val t = freshCatalog().table("db.t")
    val rows = (1L to 40L).map(i => (i, s"s${i % 4}", i.toDouble))
    t.createOrReplace(df(rows.take(20)), partitionBy = Seq("status"))
    t.append(df(rows.drop(20)))
    t.renameColumn("id", "row_id")

    t.currentSnapshot.get.partitionCols shouldBe Seq("status")
    t.renameColumn("status", "bucket_name")
    t.currentSnapshot.get.partitionCols shouldBe Seq("bucket_name")
    // the renamed column still answers a range read correctly
    t.readWhere(col("row_id") <= lit(3L)).orderBy("row_id").select("row_id")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L)
    t.read.count() shouldBe 40
    t.schema.fieldNames.toSeq shouldBe Seq("row_id", "bucket_name", "amount")
  }

  test("renameColumn on a bucketed table re-derives the bucket from the renamed column") {
    val t = freshCatalog().table("db.t")
    val rows = (1L to 40L).map(i => (i, s"s$i", i.toDouble))
    t.createOrReplace(df(rows), bucketBy = Some(("id", 4)))
    val bucketsBefore =
      t.currentSnapshot.get.entries.flatMap(_.partition).toSet

    t.renameColumn("id", "row_id")

    val s = t.currentSnapshot.get
    s.properties("bucket.column") shouldBe "row_id"
    s.partitionCols shouldBe Seq(LakeTable.BucketCol)
    // same hash of the same values → identical bucket layout
    s.entries.flatMap(_.partition).toSet shouldBe bucketsBefore
    t.read.count() shouldBe 40
    // a bucket-pruned merge keyed on the renamed column still works
    t.mergeInto(df(Seq((1L, "S1", 100.0))).withColumnRenamed("id", "row_id"),
      Seq("row_id"))
    t.read.filter(col("row_id") === 1L).select("status")
      .collect().head.getString(0) shouldBe "S1"
  }

  test("renameColumn on a MoR table folds outstanding deletes and renames the keys") {
    val t = freshCatalog().table("db.t")
    t.createOrReplace(df(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))),
      tableProperties = Map("write.merge.mode" -> "merge-on-read"))
    t.mergeIntoMoR(df(Seq((2L, "B", 20.0))), Seq("id"))
    t.currentSnapshot.get.deleteEntries should not be empty

    t.renameColumn("id", "doc_id")
    val s = t.currentSnapshot.get
    s.deleteEntries shouldBe empty // folded into the rewrite
    s.properties(LakeTable.MorKeysProp) shouldBe "doc_id"
    t.read.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (2L, "B"), (3L, "c"))
    // the renamed key keeps working for the next MoR write
    t.mergeIntoMoR(t.read.filter(col("doc_id") === 3L)
      .withColumn("status", lit("C")), Seq("doc_id"))
    t.read.filter(col("doc_id") === 3L).select("status")
      .collect().head.getString(0) shouldBe "C"
  }

  test("renameColumn rejects unknown and colliding names") {
    val t = freshCatalog().table("db.t")
    t.createOrReplace(df(Seq((1L, "a", 1.0))))
    an[IllegalArgumentException] should be thrownBy t.renameColumn("nope", "x")
    an[IllegalArgumentException] should be thrownBy t.renameColumn("status", "amount")
  }

  // -------------------------------------------------------------------
  // updateWhere / update dispatch
  // -------------------------------------------------------------------

  test("updateWhere rewrites matching rows and leaves range-disjoint entries untouched") {
    val t = freshCatalog().table("db.t")
    // three appends with disjoint id ranges → three entries with tight stats
    t.createOrReplace(df((1L to 10L).map(i => (i, "v1", i.toDouble))))
    t.append(df((11L to 20L).map(i => (i, "v1", i.toDouble))))
    t.append(df((21L to 30L).map(i => (i, "v1", i.toDouble))))
    val before = t.currentSnapshot.get

    t.updateWhere(col("id") <= lit(5L), Map("status" -> lit("v2")))

    val after = t.currentSnapshot.get
    // only the first entry's range overlaps id<=5: the other two dirs survive
    after.entries.map(_.dir).intersect(before.entries.map(_.dir)).size shouldBe 2
    after.summary("untouched-entries") shouldBe "2"
    t.read.filter(col("status") === "v2").count() shouldBe 5
    t.read.filter(col("status") === "v1").count() shouldBe 25
    t.read.count() shouldBe 30
  }

  test("updateWhere evaluates every assignment against the OLD row (SET a=b, b=a swaps)") {
    val cat = freshCatalog()
    import spark.implicits._
    val t = cat.table("db.swap")
    t.createOrReplace(Seq((1L, "left", "right")).toDF("id", "a", "b"))
    t.updateWhere(col("id") === 1L, Map("a" -> col("b"), "b" -> col("a")))
    t.read.select("a", "b").collect().head match {
      case r => (r.getString(0), r.getString(1)) shouldBe (("right", "left"))
    }
  }

  test("update dispatches on write.update.mode: MoR commits O(matched), keys protected") {
    val t = freshCatalog().table("db.t")
    t.createOrReplace(df((1L to 30L).map(i => (i, "v1", i.toDouble))),
      tableProperties = Map(
        "write.merge.mode" -> "merge-on-read",
        "write.update.mode" -> "merge-on-read"))
    t.mergeIntoMoR(df(Seq((1L, "v1", 1.0))), Seq("id")) // fixes MoR keys
    val before = t.currentSnapshot.get

    t.update(col("id") <= lit(5L), Map("status" -> lit("v2")))

    val after = t.currentSnapshot.get
    // additive: every pre-existing data dir still referenced untouched
    after.entries.map(_.dir) should contain allElementsOf before.entries.map(_.dir)
    after.deleteEntries.size shouldBe before.deleteEntries.size + 1
    t.read.filter(col("status") === "v2").count() shouldBe 5
    t.read.count() shouldBe 30
    // key columns cannot be assigned under MoR
    an[IllegalArgumentException] should be thrownBy
      t.update(col("id") === 1L, Map("id" -> lit(99L)))
  }

  test("the runbook's optional CTAS relocation: rewrite under the new path, drop the old") {
    // migrate_v2_naming.sql note 1: when the S3 path itself must match
    // the V2 naming, CTAS to the new location + DROP old (history is
    // deliberately lost — the documented trade-off vs RENAME)
    val cat = freshCatalog()
    val old = cat.table("store_bronze.tb_lower")
    old.createOrReplace(df(Seq((1L, "a", 1.0), (2L, "b", 2.0))))
    old.append(df(Seq((3L, "c", 3.0))))

    cat.createDatabase("local_store")
    val moved = cat.table("local_store.tb_lower")
    moved.createOrReplace(old.read, tableProperties = old.properties)
    cat.dropTable("store_bronze.tb_lower")
    cat.dropDatabase("store_bronze")

    state(moved) shouldBe Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    moved.currentSnapshot.get.version shouldBe 1L // fresh history
    cat.tableExists("store_bronze.tb_lower") shouldBe false
  }

  test("a no-op UPDATE commits nothing in either mode") {
    val cow = freshCatalog().table("db.cow")
    cow.createOrReplace(df(Seq((1L, "a", 1.0), (10L, "b", 10.0))))
    val vCow = cow.currentSnapshot.get.version
    // stats-prunable miss (outside [1,10]) — no scan, no commit
    cow.updateWhere(col("id") === lit(-1L), Map("status" -> lit("x")))
    cow.currentSnapshot.get.version shouldBe vCow
    // stats-coarse miss (inside [1,10] but matching no row): the probe
    // must catch it — no byte-identical rewrite commit
    cow.updateWhere(col("id") === lit(5L), Map("status" -> lit("x")))
    cow.currentSnapshot.get.version shouldBe vCow

    val mor = freshCatalog().table("db.mor")
    mor.createOrReplace(df(Seq((1L, "a", 1.0))),
      tableProperties = Map(
        "write.merge.mode" -> "merge-on-read",
        "write.update.mode" -> "merge-on-read"))
    mor.mergeIntoMoR(df(Seq((1L, "a", 1.0))), Seq("id"))
    val vMor = mor.currentSnapshot.get.version
    mor.update(col("id") === lit(-1L), Map("status" -> lit("x")))
    // no stats-less empty delete file that would mask every entry
    mor.currentSnapshot.get.version shouldBe vMor
  }

  test("renameColumn carries the synced column comment to the new name") {
    val t = freshCatalog().table("db.t")
    t.createOrReplace(df(Seq((1L, "a", 1.0))))
    t.setProperties(Map("comment.col.status" -> "CDC op flag"))
    t.renameColumn("status", "op_flag")
    val props = t.currentSnapshot.get.properties
    props.get("comment.col.op_flag") shouldBe Some("CDC op flag")
    props.contains("comment.col.status") shouldBe false
  }

  test("dropDatabase refuses a directory without a claimed snapshot (in-flight table)") {
    val cat = freshCatalog()
    cat.createDatabase("db")
    // simulate a table mid-first-commit: data dir exists, no version file
    Files.createDirectories(
      java.nio.file.Paths.get(cat.warehouse, "db", "landing", "data", "d0"))
    an[IllegalArgumentException] should be thrownBy cat.dropDatabase("db")
    Files.exists(java.nio.file.Paths.get(
      cat.warehouse, "db", "landing", "data", "d0")) shouldBe true
  }

  test("dropDatabase refuses a stray plain file, not just child dirs") {
    val cat = freshCatalog()
    cat.createDatabase("db")
    val stray = java.nio.file.Paths.get(cat.warehouse, "db", "export.csv")
    Files.write(stray, "id,v\n1,2\n".getBytes)
    val e = intercept[IllegalArgumentException](cat.dropDatabase("db"))
    e.getMessage should include("export.csv")
    Files.exists(stray) shouldBe true // RESTRICT left it in place
    Files.delete(stray)
    cat.dropDatabase("db") // emptied ⇒ drop proceeds
    cat.listTables("db") shouldBe empty
  }

  test("updateWhere validates column names and leaves a conflict-free history") {
    val t = freshCatalog().table("db.t")
    t.createOrReplace(df(Seq((1L, "a", 1.0))))
    an[IllegalArgumentException] should be thrownBy
      t.updateWhere(col("id") === 1L, Map("nope" -> lit("x")))
    t.currentSnapshot.get.operation shouldBe "create-or-replace" // nothing committed
  }
}
