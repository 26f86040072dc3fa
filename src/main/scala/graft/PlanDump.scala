package graft

import graft.core.GraftSession

/** Writes the FULL `.explain("formatted")` output of named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence
  * the optimization rounds commit. Usage:
  * `runMain graft.PlanDump <sfDir> <tag> <suffix> q1 q2 ...`
  * Measurement-only: never on any query path. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-plandump", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLAN $n -> plans/$tag/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
