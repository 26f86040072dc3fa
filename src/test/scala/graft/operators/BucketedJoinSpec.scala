package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-level proof of the two scale mechanics a 100 TB layout depends
  * on: co-bucketed tables join WITHOUT a shuffle, and partitioned
  * layouts prune directories at planning time. Both are assertions on
  * the physical plan, not on row counts — a correct-but-shuffling plan
  * fails here even though its results would pass the oracle. */
class BucketedJoinSpec extends SparkSpec {

  import spark.implicits._

  test("co-bucketed tables sort-merge join with zero shuffle exchanges") {
    val n = 1000
    val facts = (1 to n).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
    val dims = (0L until 97L).map(k => (k, s"dim_$k")).toDF("k", "name")
    for (t <- Seq("graft_bj_facts", "graft_bj_dims")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a crashed prior run can leave the managed location behind
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    facts.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bj_facts")
    dims.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bj_dims")

    // AQE wraps the plan in AdaptiveSparkPlanExec before execution; turn
    // it off for the assertion so the static plan is inspectable (the
    // bucketed no-shuffle property itself is not AQE-dependent)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("graft_bj_facts")
        .join(spark.table("graft_bj_dims").hint("merge"), Seq("k"))
      joined.count() shouldBe n
      val plan = joined.queryExecution.executedPlan
      plan.collect { case j: SortMergeJoinExec => j } should not be empty
      // the whole point of co-bucketing: neither side shuffles
      plan.collect { case e: ShuffleExchangeExec => e } shouldBe empty
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("partitioned parquet prunes directories at planning time") {
    val dir = Files.createTempDirectory("graft-part").toString
    (1 to 300).map(i => (i.toLong, s"d${i % 3}"))
      .toDF("id", "dt")
      .write.mode("overwrite").partitionBy("dt").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("dt") === "d1")
    pruned.count() shouldBe 100

    // the partition filter must reach the scan, and the scan's resolved
    // file listing must contain ONLY the matching directory
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    scans should have length 1
    scans.head.toString should include("PartitionFilters")
    val listing = scans.head.selectedPartitions
    listing.partitionCount shouldBe 1
    listing.toPartitionArray.foreach(
      _.filePath.toString should include("dt=d1"))
  }
}
