package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-spec evolution (Iceberg semantics): the spec change is a
  * metadata-only commit; entries written before it KEEP their layout
  * and stay readable, entries written after lay out under the new
  * spec, and every rewrite path stays correct across the mix — the
  * trap being a partition-PRUNED rewrite making a prune decision about
  * a legacy-layout entry against the wrong spec (a silent lost
  * update). Compaction migrates the whole table to the current spec,
  * Iceberg's documented recipe. */
class PartitionEvolutionSpec extends SparkSpec {

  private def fresh(): LakeTable = {
    val wh = Files.createTempDirectory("evolve-test").toString
    new LakeCatalog(spark, wh).table("db.t")
  }

  private def df(rows: Seq[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "region", "amount")
  }

  test("unpartitioned → partitioned: mixed layouts read; new writes lay out partitioned") {
    val t = fresh()
    t.createOrReplace(df(Seq((1L, "eu", 1.0), (2L, "us", 2.0))))
    t.currentSnapshot.get.entries.head.partition shouldBe None

    t.updatePartitionSpec(Seq("region"))
    t.currentSnapshot.get.partitionCols shouldBe Seq("region")
    t.currentSnapshot.get.operation shouldBe "update-partition-spec"

    t.append(df(Seq((3L, "eu", 3.0), (4L, "ap", 4.0))))
    val s = t.currentSnapshot.get
    // legacy entry still layout-less; the append's entries carry
    // region=... leaf paths
    s.entries.count(_.partition.isEmpty) shouldBe 1
    s.entries.flatMap(_.partition).toSet shouldBe Set("region=eu", "region=ap")
    t.read.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq shouldBe Seq((1L, "eu"), (2L, "us"), (3L, "eu"), (4L, "ap"))
    // stats-pruned filtered read still works over the mix
    t.readWhere(col("id") >= 3L).orderBy("id").collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(3L, 4L)
  }

  test("partitioned → unpartitioned: legacy dir-name values are still recovered") {
    val t = fresh()
    t.createOrReplace(df(Seq((1L, "eu", 1.0), (2L, "us", 2.0))),
      partitionBy = Seq("region"))
    t.updatePartitionSpec(Seq.empty)
    t.append(df(Seq((3L, "ap", 3.0))))
    val s = t.currentSnapshot.get
    s.partitionCols shouldBe empty
    s.entries.count(_.partition.isDefined) shouldBe 2 // the legacy leaves
    // region for rows 1-2 lives only in legacy dir names — must survive
    t.read.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq shouldBe Seq((1L, "eu"), (2L, "us"), (3L, "ap"))
  }

  test("partition-pruned MERGE after evolution still updates rows in legacy entries") {
    val t = fresh()
    // rows land in an UNPARTITIONED entry...
    t.createOrReplace(df(Seq((1L, "eu", 1.0), (2L, "us", 2.0))))
    t.updatePartitionSpec(Seq("region"))
    t.append(df(Seq((3L, "eu", 3.0))))
    // ...then a merge keyed on id only routes to the MATCHES-SCAN tier
    // (the partition column is not a merge key, so the layout prune is
    // not provably sound); the legacy entry has no region=... dir
    // value, and the scan must still find and rewrite its matched row
    t.mergeInto(df(Seq((1L, "eu", 100.0))), Seq("id"))
    t.read.filter(col("id") === 1L).select("amount")
      .collect().head.getDouble(0) shouldBe 100.0
    t.read.count() shouldBe 3
    // the rewrite migrated the legacy slice: no layout-less entry left
    t.currentSnapshot.get.entries.count(_.partition.isEmpty) shouldBe 0
  }

  test("DELETE WHERE EXISTS after evolution reaches legacy entries too") {
    val t = fresh()
    t.createOrReplace(df(Seq((1L, "eu", 1.0), (2L, "us", 2.0))))
    t.updatePartitionSpec(Seq("region"))
    t.deleteWhereExists(df(Seq((2L, "us", 0.0))), Seq("id"))
    t.read.orderBy("id").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }

  test("rewriteDataFiles migrates every legacy entry to the current spec") {
    val t = fresh()
    t.createOrReplace(df(Seq((1L, "eu", 1.0), (2L, "us", 2.0))))
    t.updatePartitionSpec(Seq("region"))
    t.rewriteDataFiles()
    val s = t.currentSnapshot.get
    s.entries.count(_.partition.isEmpty) shouldBe 0
    s.entries.flatMap(_.partition).toSet shouldBe Set("region=eu", "region=us")
    t.read.count() shouldBe 2
  }

  test("evolution refuses on bucket-laid-out tables and unknown columns") {
    val t = fresh()
    t.createOrReplace(df(Seq((1L, "eu", 1.0))), bucketBy = Some(("id", 4)))
    an[IllegalArgumentException] should be thrownBy
      t.updatePartitionSpec(Seq("region"))
    val t2 = fresh()
    t2.createOrReplace(df(Seq((1L, "eu", 1.0))))
    an[IllegalArgumentException] should be thrownBy
      t2.updatePartitionSpec(Seq("nope"))
  }
}
