package graft

import graft.core.GraftSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Timing sinks each result into the `noop` v2 sink
  * so the full plan executes (a bare `.count()` lets Catalyst prune the
  * projections being measured); failures are reported in an `errors` map
  * with a -1 timing instead of being swallowed as ~0s successes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder(appName = "graft-bench", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Neutral warmup: initialize codegen/shuffle/parquet machinery once so
    // the alphabetically-first query doesn't absorb session bring-up. No
    // query work is precomputed (different tables/plans).
    spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 10).as("k"))
      .count().write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop")
      .mode("overwrite").save()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def js(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => js(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => js(k) + ":" + js(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"sf":"$sfDir"}"""
    // Per-query timings go to a file and an EARLY stdout line; the driver
    // keeps only a ~2 KB tail of stdout and parses the LAST line as JSON,
    // so the final line must be a compact summary (r04's 4.8 KB full line
    // overflowed the tail window and parsed as null).
    val detailPath = java.nio.file.Paths.get(
      sys.props.getOrElse("user.dir", "."), "bench_detail.json").toAbsolutePath
    val detailWritten =
      try {
        java.nio.file.Files.write(detailPath,
          fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        true
      } catch { case _: Throwable => false }
    println(fullJson)
    // stop() BEFORE the final print: the compact JSON must be the last
    // stdout line for the driver's parser (session shutdown logs at INFO
    // are suppressed, but ordering makes it robust regardless of level).
    spark.stop()
    // advertise the detail file only when it actually landed
    val detail = if (detailWritten) s""","detail":${js(detailPath.toString)}""" else ""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${errors.size},"sf":"$sfDir"$detail}""")
  }
}
