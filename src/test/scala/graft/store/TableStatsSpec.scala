package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ANALYZE / Puffin-analog table statistics: HLL NDV sketches pinned to
  * a snapshot version, unioned incrementally over pure-append history,
  * fully re-analyzed after row-rewriting commits. */
class TableStatsSpec extends SparkSpec {

  private def freshTable(): LakeTable =
    new LakeCatalog(spark, Files.createTempDirectory("stats-test").toString)
      .table("db.stats_t")

  private def df(ids: Range, status: String): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, status, i * 1.0)).toDF("id", "status", "amount")
  }

  test("analyze records exact rowCount and accurate NDV per column") {
    val t = freshTable()
    t.createOrReplace(df(0 until 500, "a").union(df(0 until 500, "b")))
    val st = t.analyze(Seq("id", "status"))
    st.version shouldBe t.currentSnapshot.get.version
    st.rowCount shouldBe 1000L
    st.ndv("status") shouldBe 2L // tiny cardinalities are HLL-exact
    st.ndv("id").toDouble shouldBe 500.0 +- 25.0 // 5% band
    t.ndv("status") shouldBe Some(2L)
    t.ndv("missing") shouldBe None
  }

  test("refreshStats unions the append increment without recounting the base") {
    val t = freshTable()
    t.createOrReplace(df(0 until 400, "a"))
    t.analyze(Seq("id", "status"))
    t.append(df(400 until 600, "b"))
    t.append(df(600 until 700, "c"))
    val st = t.refreshStats()
    st.version shouldBe t.currentSnapshot.get.version
    st.rowCount shouldBe 700L
    st.ndv("status") shouldBe 3L
    st.ndv("id").toDouble shouldBe 700.0 +- 35.0
    // refresh at head is a no-op returning the same stats
    t.refreshStats().version shouldBe st.version
  }

  test("a row-rewriting commit forces a full re-analyze with exact counts") {
    val t = freshTable()
    t.createOrReplace(df(0 until 300, "a"))
    t.analyze(Seq("id", "status"))
    // merge rewrites rows: incremental union would overcount
    import spark.implicits._
    t.mergeInto(Seq((5L, "z", 9.9)).toDF("id", "status", "amount"), Seq("id"))
    val st = t.refreshStats()
    st.rowCount shouldBe 300L // not 301: the merge updated, not added
    st.ndv("status") shouldBe 2L
  }

  test("stats survive reload and only the newest stats file is kept") {
    val t = freshTable()
    t.createOrReplace(df(0 until 100, "a"))
    t.analyze(Seq("id"))
    t.append(df(100 until 200, "b"))
    t.refreshStats()
    val fs = new org.apache.hadoop.fs.Path(t.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statsFiles = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"${t.location}/stats")).map(_.getPath.getName)
    statsFiles.length shouldBe 1
    t.stats.get.rowCount shouldBe 200L
  }

  test("non-HLL columns are filtered; all-unsupported analyze fails fast") {
    val t = freshTable()
    t.createOrReplace(df(0 until 10, "a"))
    val st = t.analyze(Seq("id", "amount")) // amount: double, unsupported
    st.ndv.keySet shouldBe Set("id")
    an[IllegalArgumentException] should be thrownBy t.analyze(Seq("amount"))
  }

  test("stats is None before any analyze") {
    val t = freshTable()
    t.createOrReplace(df(0 until 10, "a"))
    t.stats shouldBe None
    t.ndv("id") shouldBe None
  }
}
