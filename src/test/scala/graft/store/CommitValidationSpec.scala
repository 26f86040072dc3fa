package graft.store

import java.nio.file.Files

import graft.SparkSpec

/** Harvest validation for committer-v2 writes: the manifest harvest
  * trusts a directory listing of the freshly-written dir, so a stray
  * data file left by an abandoned task attempt (partial task commit +
  * retry with a different file set — the MAPREDUCE-7282 class) would
  * be committed as live rows. The net: the dir's file count is checked
  * against the commit protocol's OWN per-task-commit report
  * (`numFiles`), and a surplus fails the write BEFORE the manifest
  * commit. */
class CommitValidationSpec extends SparkSpec {
  import spark.implicits._

  test("committedFileCount captures the protocol's report for the bracketed write") {
    val dir = Files.createTempDirectory("cv").toString
    val abs = s"$dir/data/${java.util.UUID.randomUUID().toString.take(18)}"
    val reported = LakeTable.committedFileCount {
      (1 to 90).map(i => (i.toLong, s"v$i", i % 3))
        .toDF("id", "v", "p")
        .repartition(2)
        .write.mode("errorifexists")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("p").parquet(abs)
    }
    val onDisk = Files.walk(java.nio.file.Paths.get(abs)).iterator()
    var n = 0L
    onDisk.forEachRemaining { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith("."))
        n += 1
    }
    reported shouldBe Some(n)
    n should be > 0L
  }

  test("a stray file in the written dir fails the commit; the report's absence degrades") {
    val wh = Files.createTempDirectory("cv2").toString
    val cat = new LakeCatalog(spark, wh)
    cat.createDatabase("db")
    val t = cat.table("db.hv")
    t.createOrReplace((1L to 20L).toDF("id"))
    val dataDir = new java.io.File(s"$wh/db/hv/data")
      .listFiles().filter(_.isDirectory).head
    val files = dataDir.listFiles().count(f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    // consistent dir + honest report: passes
    t.validateHarvest(dataDir.toString, Some(files.toLong))
    // stray attempt output appears in the listing but not in the report
    val legit = dataDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val stray = new java.io.File(dataDir, "part-99999-deadbeef.c000.snappy.parquet")
    Files.copy(legit.toPath, stray.toPath)
    val ex = intercept[IllegalStateException] {
      t.validateHarvest(dataDir.toString, Some(files.toLong))
    }
    ex.getMessage should include("stray task-attempt output")
    // no report captured (listener-bus lag / drop): fail-open, no throw
    t.validateHarvest(dataDir.toString, None)
    // deficit (report larger than the listing) warns, never aborts
    t.validateHarvest(dataDir.toString, Some(files.toLong + 10))
  }

  test("every store write validates live: an append still lands green end-to-end") {
    val wh = Files.createTempDirectory("cv3").toString
    val cat = new LakeCatalog(spark, wh)
    cat.createDatabase("db")
    val t = cat.table("db.live")
    t.createOrReplace(
      (1L to 60L).map(i => (i, (i % 4).toString)).toDF("id", "p"),
      partitionBy = Seq("p"))
    t.append((61L to 80L).map(i => (i, (i % 4).toString)).toDF("id", "p"))
    t.read.count() shouldBe 80
  }

  test("the capture is wait-free: no write in the bracket yields None, fast") {
    // the old status-store poll burned its full 5 s cap whenever no
    // matching execution appeared — the accumulator bracket just sees
    // zero candidates and returns immediately (this is the property
    // that keeps stream-heavy sessions, whose listener bus lags by
    // seconds, from paying diagnostics latency on every commit)
    val t0 = System.nanoTime()
    val reported = LakeTable.committedFileCount {
      spark.range(10).count() // an action, but not a file write
      ()
    }
    val wallMs = (System.nanoTime() - t0) / 1e6
    reported shouldBe None
    wallMs should be < 2000.0
  }

  test("concurrent foreign writes keep the abort sound: max semantics") {
    // a write on ANOTHER thread registers its own "number of written
    // files" metric inside our bracket; committedFileCount returns the
    // max, so found > reported still implies a genuine surplus (it
    // exceeds EVERY candidate write's count) and can never false-abort
    val dir = Files.createTempDirectory("cvc").toString
    // a foreign-thread failure must surface as the test's OWN failure
    // cause, not as an inexplicable max=1 assertion miss downstream
    @volatile var foreignFailure: Option[Throwable] = None
    val reported = LakeTable.committedFileCount {
      val foreign = new Thread(() =>
        try (1 to 40).map(i => (i.toLong, s"f$i")).toDF("id", "v")
          .repartition(4)
          .write.mode("errorifexists").parquet(s"$dir/foreign")
        catch { case scala.util.control.NonFatal(e) => foreignFailure = Some(e) })
      foreign.start()
      (1L to 10L).toDF("id").coalesce(1)
        .write.mode("errorifexists").parquet(s"$dir/mine")
      foreign.join()
    }
    foreignFailure.foreach(e => fail("foreign write failed", e))
    // the registry scan abandons (None) if a GC collected a bracket
    // entry mid-test — name the cause instead of a bare NoSuchElement
    withClue("committedFileCount returned None (scan abandoned or no metric captured): ") {
      reported.isDefined shouldBe true
    }
    // both writes' metrics are candidates; max >= the larger (4 files)
    reported.get should be >= 4L
  }
}
