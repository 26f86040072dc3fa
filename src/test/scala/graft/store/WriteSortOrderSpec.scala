package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `write.sort-order`: ingest-time clustering — every write lands
  * range-distributed, locally sorted files so the sort key carries
  * tight per-file ranges from the first commit. */
class WriteSortOrderSpec extends SparkSpec {

  import spark.implicits._

  private def freshCatalog() =
    new LakeCatalog(spark, Files.createTempDirectory("sort-wh").toString)

  /** ids deliberately shuffled so an unsorted write interleaves them. */
  private def shuffled = new scala.util.Random(42).shuffle((0L until 400L).toList)
    .map(i => (i, s"s$i")).toDF("id", "s")

  private def fileRanges(t: LakeTable): Seq[(Long, Long)] = {
    val dir = t.currentSnapshot.get.entries.head.dir
    val files = new java.io.File(s"${t.location}/data/$dir")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.map { f =>
      val r = spark.read.parquet(f).agg(min("id"), max("id")).head()
      (r.getLong(0), r.getLong(1))
    }
  }

  test("sorted write produces range-disjoint, internally sorted files") {
    val t = freshCatalog().table("db.sorted")
    // keep AQE from coalescing the tiny fixture's range partitions
    // into one file — at real batch sizes the ranges survive on size
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try t.createOrReplace(shuffled,
      tableProperties = Map("write.sort-order" -> "id"))
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val ranges = fileRanges(t).sortBy(_._1)
    ranges.size should be >= 2
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => hi should be < lo2
      case _ => ()
    }
    // rows inside a file are sorted on the key
    val dir = t.currentSnapshot.get.entries.head.dir
    val firstFile = new java.io.File(s"${t.location}/data/$dir")
      .listFiles().filter(_.getName.endsWith(".parquet")).head.getPath
    val ids = spark.read.parquet(firstFile).select("id").collect().map(_.getLong(0)).toSeq
    ids shouldBe ids.sorted
    t.read.count() shouldBe 400L
    t.readWhere(col("id").between(100L, 110L)).count() shouldBe 11L
  }

  test("without sort-order the same shuffled batch interleaves file ranges") {
    val t = freshCatalog().table("db.unsorted")
    t.createOrReplace(shuffled.repartition(4))
    val ranges = fileRanges(t).sortBy(_._1)
    ranges.size should be >= 2
    // at least one adjacent pair overlaps (round-robin spread)
    ranges.sliding(2).exists {
      case Seq((_, hi), (lo2, _)) => hi >= lo2
      case _ => false
    } shouldBe true
  }

  test("partitioned writes sort within each leaf") {
    val t = freshCatalog().table("db.sorted_part")
    val rows = new scala.util.Random(7).shuffle((0L until 200L).toList)
      .map(i => (i, s"p${i % 2}", i * 1.0)).toDF("id", "pt", "v")
    t.createOrReplace(rows, partitionBy = Seq("pt"),
      tableProperties = Map("write.sort-order" -> "id"))
    val s = t.currentSnapshot.get
    val leaf = s.entries.head
    val leafDir = new java.io.File(
      s"${t.location}/data/${leaf.dir}/${leaf.partition.get}")
    val file = leafDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val ids = spark.read.parquet(file.getPath).select("id")
      .collect().map(_.getLong(0)).toSeq
    ids shouldBe ids.sorted
    t.read.count() shouldBe 200L
  }

  test("zorder(x,y) sort-order clusters each write on the interleaved curve") {
    val t = freshCatalog().table("db.zsorted")
    // a 20x20 grid, shuffled: after a z-ordered write each FILE covers
    // a compact curve segment, so per-file x AND y ranges are both
    // narrow — a linear sort on x would leave y spanning the full range
    val rows = new scala.util.Random(11).shuffle(
      (for (x <- 0L until 20L; y <- 0L until 20L) yield (x, y)).toList)
      .map { case (x, y) => (x * 20 + y, x, y) }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try t.createOrReplace(rows.toDF("id", "x", "y"),
      tableProperties = Map("write.sort-order" -> "zorder(x, y)"))
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val dir = t.currentSnapshot.get.entries.head.dir
    val files = new java.io.File(s"${t.location}/data/$dir")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.size should be >= 2
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // every file's span is a fraction of the 0..19 domain on BOTH axes
    all(spans.map(s => math.max(s._1, s._2))) should be <= 14L
    t.read.count() shouldBe 400L
    t.readWhere(col("x").between(0L, 4L) && col("y").between(0L, 4L))
      .count() shouldBe 25L
  }

  test("appends and merges inherit the sort order from table properties") {
    val t = freshCatalog().table("db.sorted_app")
    t.createOrReplace(shuffled, tableProperties = Map("write.sort-order" -> "id"))
    t.append(new scala.util.Random(9).shuffle((400L until 800L).toList).map(i => (i, s"s$i")).toDF("id", "s"))
    val newest = t.currentSnapshot.get.entries.map(_.dir).distinct
      .filterNot(t.snapshot(1L).entries.map(_.dir).distinct.contains).head
    val files = new java.io.File(s"${t.location}/data/$newest")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    val ids = spark.read.parquet(files.head.getPath).select("id")
      .collect().map(_.getLong(0)).toSeq
    ids shouldBe ids.sorted
    t.read.count() shouldBe 800L
  }
}
