package graft

import graft.core.GraftSession

/** Ad-hoc per-query profiler: `runMain graft.Profile <sfDir> <iters> q1 q2 …`
  * (all queries when none named). Times each query `iters` times into the
  * noop sink so codegen/JIT warmup is visible and steady-state cost is
  * separable from first-run cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession
      .builder(appName = "graft-profile", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else names.map(n => n -> SparkEntry.queries(n))
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    qs.foreach { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val g0 = gcMillis()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, (gcMillis() - g0) / 1e3)
      }
      // local mode: driver JVM == executor JVM, so the GC delta is the
      // whole-query GC cost (same basis as the bench's gc_sec)
      println(f"PROFILE $name%-28s " +
        times.map { case (t, g) => f"$t%.2f(gc $g%.2f)" }.mkString("  "))
    }
    spark.stop()
  }
}
