package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.IvfIndex
import graft.store.{LakeCatalog, StoreTiming}

/** Diagnostic: the ivf ladder's x100 BUILD wall, phase-attributed
  * (the ladder only phase-instruments the append). Reproduces the
  * rung exactly: 100 perturbed replicas, nlist=1000, cells table
  * partitioned by cell with bloom sidecars. `runMain
  * graft.IvfBuildProbe [mult]`. */
object IvfBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-ivf-build-probe", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def replica(i: Int): DataFrame = base.select(
      (col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
      (if (i == 0) col("embedding")
       else transform(col("embedding"),
         (x, d) => x + when(d === 0, lit(i * 1e-3f)).otherwise(lit(0f)))).as("embedding"),
      (col("label") + lit(i * 10000)).as("label"))
    val corpus = (0 until mult).map(replica).reduce(_ unionByName _)
      .repartition(par)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus rows: ${corpus.count()}")
    val wh = s"${sys.props("java.io.tmpdir")}/graft_probe_ivfbuild_$mult"
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(wh), true)
    val cat = new LakeCatalog(spark, wh)
    cat.createDatabase("probe")
    StoreTiming.enable()
    StoreTiming.reset()
    val t0 = System.nanoTime()
    IvfIndex.build(cat, "probe", "ann", corpus)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"PROBE ivf_build x$mult wall $wall%.2f s")
    StoreTiming.report().foreach { case (p, n, sec) =>
      println(f"  PHASE $p%-28s calls=$n%-4d total=$sec%8.2f s")
    }
    spark.stop()
  }
}
