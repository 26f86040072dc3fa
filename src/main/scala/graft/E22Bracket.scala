package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.IvfIndex
import graft.store.LakeCatalog

/** Quiet-host A/B for the e22 lifecycle at `ivf.assign.group-probes`
  * 3 vs 4 — the r18 verdict's one `weak` item: the p=4 default was
  * adopted on ladder BUILD walls, but the bench head times the full
  * build → append → rebalance → query lifecycle, and its r18 reading
  * carried a ~1.4–1.5× host-normalized residual of which only ~1.25×
  * was predicted by the wider assign. This probe attributes the
  * residual: the exact e22 stages (StoreQueries.e22), with the probe
  * width set EXPLICITLY at build (the property pins, so append and
  * rebalance inherit it), p values INTERLEAVED rep by rep so a host
  * phase shift hits both arms equally. Per-stage walls printed per
  * rep; rep 1 carries plan compile (the bench head's shape), reps 2+
  * are steady state.
  *
  * Usage: `runMain graft.E22Bracket [reps]` (default 3) with
  * SPARK_GRAFT_SF_DIR set like Bench.
  */
object E22Bracket {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-e22-bracket", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = SparkEntry.table(spark, sfDir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()

    def lifecycle(p: Int, rep: Int): Map[String, Double] = {
      val tag = s"e22brkt_p${p}_r$rep"
      val wh = s"${sys.props("java.io.tmpdir")}/graft_warehouse_$tag"
      val cat = new LakeCatalog(spark, wh)
      cat.createDatabase("lake")
      def timed[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (_, tb) = timed(IvfIndex.build(cat, "lake", "annrb",
        emb.filter(col("vec_id") >= 5 && col("vec_id") < 400), groupProbes = p))
      val (_, ta) = timed(IvfIndex.append(cat, "lake", "annrb",
        emb.filter(col("vec_id") >= 400)))
      val (moved, tr) = timed(IvfIndex.rebalance(cat, "lake", "annrb"))
      val (n, tq) = timed(IvfIndex
        .query(cat, "lake", "annrb", emb.filter(col("vec_id") < 5), k = 5, nprobe = 3)
        .orderBy("query_id", "rank")
        .write.format("noop").mode("overwrite").save())
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(wh), true)
      val _ = n
      Map("build" -> tb, "append" -> ta, "rebalance" -> tr, "query" -> tq,
        "total" -> (tb + ta + tr + tq), "moved" -> moved.toDouble)
    }

    def r2(d: Double) = math.rint(d * 100) / 100
    val rows = for (rep <- 1 to reps; p <- Seq(3, 4)) yield {
      val m = lifecycle(p, rep)
      println(s"""{"probe":"e22-bracket","rep":$rep,"p":$p,""" +
        s""""build":${r2(m("build"))},"append":${r2(m("append"))},""" +
        s""""rebalance":${r2(m("rebalance"))},"query":${r2(m("query"))},""" +
        s""""total":${r2(m("total"))},"moved":${m("moved").toLong}}""")
      (p, rep, m)
    }
    val steady = rows.filter(_._2 > 1)
    def med(xs: Seq[Double]) = {
      val s = xs.sorted; if (s.isEmpty) 0.0 else s(s.size / 2)
    }
    Seq(3, 4).foreach { p =>
      val t = steady.collect { case (`p`, _, m) => m("total") }
      val a = steady.collect { case (`p`, _, m) => m("rebalance") + m("append") }
      println(s"""{"probe":"e22-bracket-summary","p":$p,""" +
        s""""steady_total_med":${r2(med(t))},"steady_assign_med":${r2(med(a))}}""")
    }
    spark.stop()
  }
}
