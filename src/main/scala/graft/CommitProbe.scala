package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.store.{LakeCatalog, StoreTiming}

/** Phase-level profiler for the table-store commit path:
  * `runMain graft.CommitProbe [sfDir] [iters]` replays the c07
  * (partitioned COW) and c12 (bucketed COW) lifecycles with a timer
  * around each store operation, so commit-machinery cost (write +
  * footer stats + snapshot/segment serialization) is separable from
  * the Spark job cost of the same stage. Companion to ScaleProbe /
  * ManifestProbe: run before and after commit-path changes. */
object CommitProbe {

  /** A probe-run catalog over a WIPED warehouse dir: every probe rung
    * builds its tables from scratch, and a leftover warehouse from a
    * previous run would otherwise (a) trip watermark guards on
    * maintained tables (a re-run's createOrReplace is a non-append
    * commit under the old watermark) and (b) accumulate pre-replace
    * data files in /tmp forever (createOrReplace never GCs prior
    * versions). Wiping at the source fixes the whole class — no
    * per-table dropTable bookkeeping to forget. */
  private def freshCatalog(spark: org.apache.spark.sql.SparkSession, path: String): graft.store.LakeCatalog = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    new graft.store.LakeCatalog(spark, path)
  }

  /** Volume ladder over the bench-top-5 lifecycle shape: the SAME 13
    * sequential commits (createOrReplace + 11 appends + MoR merge +
    * MoR delete) at ×1 / ×10 / ×100 rows per commit. The 100 TB claim
    * under test is that lifecycle cost tracks COMMIT COUNT, not data
    * volume — per-commit machinery (job floor + snapshot/segment/
    * footer metadata) amortizes as each commit carries more rows, so
    * wall must grow far sublinearly across the two decades.
    * `runMain graft.CommitProbe <sfDir> ladder`. */
  private def lifecycleLadder(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit = {
    val base = SparkEntry.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    // rungs by rows-per-commit: ~1.2k / ~12.5k / ~125k (x100 replicates
    // the sf0.1 orders table 10x with disjoint key offsets so the MoR
    // merge/delete keys keep the same selectivity at every rung)
    def replicate(n: Int) = (0 until n)
      .map(i => base.withColumn("o_orderkey",
        col("o_orderkey") + lit(i.toLong * 100_000_000L)))
      .reduce(_ unionByName _)
    val rungs = Seq(
      ("x1", base.filter(col("o_orderkey") % 10 === 0)),
      ("x10", base),
      ("x100", replicate(10)))
    // commits split on a HASH of the key so every rung gets 12 equal
    // non-empty slices regardless of how the rung's source was sampled
    def slice(df: org.apache.spark.sql.DataFrame, i: Int) =
      df.filter(pmod(hash(col("o_orderkey")), lit(12)) === i)
    // absorb JIT/plan-compile warmup so rung x1 isn't first-run-inflated
    locally {
      val whW = s"${sys.props("java.io.tmpdir")}/graft_cprobe_ladder_warm"
      val catW = freshCatalog(spark, whW)
      catW.createDatabase("lake")
      val tw = catW.table("lake.warm")
      val w = base.filter(col("o_orderkey") % 100 === 0)
      tw.createOrReplace(slice(w, 0))
      tw.append(slice(w, 1))
      tw.mergeIntoMoR(slice(w, 2).withColumn("o_orderstatus", lit("W")),
        Seq("o_orderkey"))
      tw.deleteWhereExistsMoR(slice(w, 3), Seq("o_orderkey"))
      tw.read.write.format("noop").mode("overwrite").save()
    }
    val walls = rungs.map { case (label, src) =>
      val cached = src.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = cached.count()
      val wh = s"${sys.props("java.io.tmpdir")}/graft_cprobe_ladder_$label"
      val cat = freshCatalog(spark, wh)
      cat.createDatabase("lake")
      val t = cat.table("lake.orders_ladder")
      val t0 = System.nanoTime()
      t.createOrReplace(slice(cached, 0))
      (1 until 12).foreach(i => t.append(slice(cached, i)))
      t.mergeIntoMoR(
        cached.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderstatus", lit("Z")), Seq("o_orderkey"))
      t.deleteWhereExistsMoR(
        cached.filter(col("o_orderkey") % 103 === 0), Seq("o_orderkey"))
      t.read.select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      cached.unpersist()
      println(f"PROBE lifecycle $label%-5s rows/commit ~${rows / 12}%-8d wall $wall%8.2f s")
      wall
    }
    walls.sliding(2).zip(Seq("x1->x10", "x10->x100")).foreach {
      case (Seq(w0, w1), hop) =>
        println(f"PROBE lifecycle ratio $hop: wall ${w1 / w0}%.2f for 10x rows/commit")
    }

    // the c33/c45 shape on the same rungs: a Rollup REFRESHED AFTER
    // EVERY COMMIT (incremental maintenance folds the commit's delta,
    // never rescans the table) — refresh cost must track DELTA size,
    // so the maintained lifecycle should show the same sublinear slope
    import graft.operators.Rollup
    val rollWalls = rungs.map { case (label, src) =>
      val cached = src.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.count()
      val wh = s"${sys.props("java.io.tmpdir")}/graft_cprobe_rladder_$label"
      val cat = freshCatalog(spark, wh)
      cat.createDatabase("lake")
      val t = cat.table("lake.orders_rladder")
      val dst = cat.table("lake.orders_rladder_rollup")
      def refresh() =
        Rollup.refresh(t, dst, Seq("o_orderstatus"), Seq("o_totalprice"))
      val t0 = System.nanoTime()
      t.createOrReplace(slice(cached, 0)); refresh()
      (1 until 12).foreach { i => t.append(slice(cached, i)); refresh() }
      t.mergeIntoMoR(
        cached.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderstatus", lit("Z")), Seq("o_orderkey"))
      refresh()
      t.deleteWhereExistsMoR(
        cached.filter(col("o_orderkey") % 103 === 0), Seq("o_orderkey"))
      refresh()
      dst.read.orderBy("o_orderstatus")
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      cached.unpersist()
      println(f"PROBE maintained $label%-5s wall $wall%8.2f s (14 refreshes)")
      wall
    }
    rollWalls.sliding(2).zip(Seq("x1->x10", "x10->x100")).foreach {
      case (Seq(w0, w1), hop) =>
        println(f"PROBE maintained ratio $hop: wall ${w1 / w0}%.2f for 10x rows/commit")
    }
  }

  /** Break-even measurement behind `write.stats.distributed-min-files`
    * (`runMain graft.CommitProbe <sfDir> stats [latencyMs]`): time the
    * footer-stats harvest of an N-file write both driver-side (the
    * sequential fold the unpartitioned write path uses) and as the one
    * distributed job, across file-count decades. Local-FS footer opens
    * are ~ms, so the local break-even UNDERSTATES the distributed win
    * on an object store (one round-trip per driver-side open); the
    * default threshold is set from this probe, biased high so
    * streaming micro-commits never pay a job launch.
    *
    * The optional `latencyMs` injects a measured sleep per footer open
    * — IN THE PROBE ONLY, production paths untouched — to model the
    * object-store round-trip (10–50 ms is a realistic S3 GET range):
    * the driver fold pays it N times sequentially, the distributed job
    * pays it once per file but overlapped across tasks, so the probe
    * shows where the crossover lands when opens are no longer ~ms. */
  private def statsHarvestProbe(
      spark: org.apache.spark.sql.SparkSession, latencyMs: Long): Unit = {
    import graft.store.FooterHarvest
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("amount", org.apache.spark.sql.types.DoubleType)))
    val prunable = FooterHarvest.prunableCols(schema)
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(8, 32, 64, 128, 512, 1024).foreach { n =>
      val dir = s"${sys.props("java.io.tmpdir")}/graft_cprobe_stats_$n"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
      spark.range(n * 200L)
        .select(col("id"), concat(lit("s"), col("id") % 7).as("s"),
          (col("id") * 1.5).as("amount"))
        .repartition(n).write.parquet(dir)
      val files = fs.listStatus(p).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
      def bestOf3(f: => Unit): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      val driver = bestOf3 {
        files.foldLeft(FooterHarvest.EmptyPartial) { (acc, f) =>
          if (latencyMs > 0) Thread.sleep(latencyMs)
          FooterHarvest.merge(prunable, acc,
            FooterHarvest.filePartial(f, conf, prunable))
        }
        ()
      }
      val dist = bestOf3 {
        if (latencyMs == 0) {
          FooterHarvest.distributed(spark, files.map("" -> _), schema)
        } else {
          // probe-local replica of FooterHarvest.distributed's job shape
          // (same slicing) with the per-open sleep inside the task — the
          // production method has no injection seam on purpose
          val bc = spark.sparkContext.broadcast(
            new graft.store.FooterHarvest.SerializableConf(conf))
          // the PRODUCTION slicing formula, shared so the injected
          // latency models the real job shape (r21 ADVICE)
          val slices = FooterHarvest.sliceCount(
            spark.sparkContext.defaultParallelism, files.size)
          spark.sparkContext.parallelize(files, slices)
            .mapPartitions { it =>
              val c = bc.value.value
              var acc = FooterHarvest.EmptyPartial
              it.foreach { f =>
                Thread.sleep(latencyMs)
                acc = FooterHarvest.merge(prunable, acc,
                  FooterHarvest.filePartial(f, c, prunable))
              }
              Iterator.single(acc)
            }
            .collect()
            .reduce(FooterHarvest.merge(prunable, _, _))
          bc.destroy()
        }
        ()
      }
      println(f"PROBE stats-harvest n=$n%-5d lat=${latencyMs}ms driver $driver%7.3f s  distributed $dist%7.3f s  ratio ${driver / dist}%5.2f")
      fs.delete(p, true)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-commit-probe", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.drop(1).headOption.contains("ladder")) {
      lifecycleLadder(spark, sfDir)
      spark.stop()
      return
    }
    if (args.drop(1).headOption.contains("stats")) {
      // a typo'd flag should print usage, not a NumberFormatException
      // after full session startup (r21 ADVICE)
      val latencyMs = args.drop(2).headOption match {
        case None => 0L
        case Some(v) => scala.util.Try(v.toLong).getOrElse {
          System.err.println(
            s"usage: CommitProbe <sfDir> stats [latencyMs] — got '$v'")
          spark.stop()
          return
        }
      }
      statsHarvestProbe(spark, latencyMs)
      spark.stop()
      return
    }
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(3)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  PHASE $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = SparkEntry.table(spark, sfDir, "orders")
    StoreTiming.enable()

    (1 to iters).foreach { it =>
      println(s"== c07 shape (partitioned COW), iter $it ==")
      val wh = s"${sys.props("java.io.tmpdir")}/graft_cprobe_p$it"
      val cat = freshCatalog(spark, wh)
      cat.createDatabase("lake")
      val t = cat.table("lake.orders_part")
      val part = base.select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
      time("createOrReplace")(t.createOrReplace(part, partitionBy = Seq("o_year")))
      val source = part
        .filter(col("o_orderkey") % 50 === 1 && col("o_year") === "1995")
        .withColumn("o_orderstatus", lit("M"))
      time("mergeInto")(t.mergeInto(source, Seq("o_orderkey")))
      time("deleteWhereExists")(t.deleteWhereExists(
        part.filter(col("o_orderkey") % 50 === 2 && col("o_year") === "1995"),
        Seq("o_orderkey")))
      time("read+order")(t.read
        .select("o_orderkey", "o_orderstatus", "o_year")
        .orderBy("o_orderkey")
        .write.format("noop").mode("overwrite").save())

      println(s"== c12 shape (bucketed COW), iter $it ==")
      val wh2 = s"${sys.props("java.io.tmpdir")}/graft_cprobe_b$it"
      val cat2 = freshCatalog(spark, wh2)
      cat2.createDatabase("lake")
      val tb = cat2.table("lake.orders_bucketed")
      val nb = base.select("o_orderkey", "o_orderstatus", "o_totalprice")
      time("createOrReplace")(
        tb.createOrReplace(nb, bucketBy = Some(("o_orderkey", 16))))
      time("mergeInto")(tb.mergeInto(
        nb.filter(col("o_orderkey") % 11 === 0).withColumn("o_orderstatus", lit("B")),
        Seq("o_orderkey")))
      time("deleteWhereExists")(tb.deleteWhereExists(
        nb.filter(col("o_orderkey") % 13 === 0), Seq("o_orderkey")))
      time("read+order")(tb.read
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .write.format("noop").mode("overwrite").save())

      // The bench-top-5 shape (s18/c45/c33/c35): MANY SEQUENTIAL TINY
      // commits to one unpartitioned table — per-commit machinery, not
      // data volume, dominates these. 12 small appends + 2 MoR ops.
      println(s"== lifecycle shape (13 tiny sequential commits), iter $it ==")
      val wh3 = s"${sys.props("java.io.tmpdir")}/graft_cprobe_l$it"
      val cat3 = freshCatalog(spark, wh3)
      cat3.createDatabase("lake")
      val tl = cat3.table("lake.orders_lifecycle")
      val tiny = base.select("o_orderkey", "o_orderstatus", "o_totalprice")
      time("createOrReplace")(
        tl.createOrReplace(tiny.filter(col("o_orderkey") % 12 === 0)))
      time("12 tiny appends")((1 to 11).foreach(i =>
        tl.append(tiny.filter(col("o_orderkey") % 12 === i))))
      time("mergeIntoMoR")(tl.mergeIntoMoR(
        tiny.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderstatus", lit("Z")), Seq("o_orderkey")))
      time("deleteWhereMoR")(tl.deleteWhereExistsMoR(
        tiny.filter(col("o_orderkey") % 103 === 0), Seq("o_orderkey")))
      time("read+order")(tl.read
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .write.format("noop").mode("overwrite").save())
    }

    // floor isolation: the same TINY cached batch appended through the
    // store vs written raw by Spark — the delta is the store's per-
    // commit overhead, the raw number is the Spark-job floor no store
    // change can shave
    println("== tiny-append floor (1k cached rows, 10 reps) ==")
    val tinyDf = base.select("o_orderkey", "o_orderstatus", "o_totalprice")
      .limit(1000).cache()
    tinyDf.count()
    val whF = s"${sys.props("java.io.tmpdir")}/graft_cprobe_f"
    val catF = freshCatalog(spark, whF)
    catF.createDatabase("lake")
    val tf = catF.table("lake.floor_probe")
    tf.createOrReplace(tinyDf)
    time("10 store appends")((1 to 10).foreach(_ => tf.append(tinyDf)))
    time("10 raw spark writes")((1 to 10).foreach(i =>
      tinyDf.write.mode("overwrite").parquet(s"$whF/raw_$i")))

    // phase attribution across ALL iterations (commit.build-entries
    // CONTAINS the data.* phases it triggers — read as a tree)
    println("== StoreTiming phase report (all iters) ==")
    StoreTiming.report().foreach { case (phase, n, sec) =>
      println(f"  PHASE $phase%-24s calls=$n%-5d total=$sec%8.2f s  avg=${sec / n * 1000}%7.1f ms")
    }
    spark.stop()
  }
}
