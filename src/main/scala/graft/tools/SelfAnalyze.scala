package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end check of [[EventLogAnalyzer]] against a REAL event log:
  * start a session with `spark.eventLog.enabled`, run a representative
  * mix (FAIR-pool jobs with job groups, SQL execution, a streaming
  * query), stop, then analyze the log this very run produced. The spec
  * fixtures pin the parsing contract; this main pins it to what Spark
  * 4 actually writes. `runMain graft.tools.SelfAnalyze [outDir]`.
  */
object SelfAnalyze {
  def main(args: Array[String]): Unit = {
    val logDir = args.headOption.getOrElse(
      Files.createTempDirectory("graft-evlog").toString)
    Files.createDirectories(Paths.get(logDir))
    val spark = SparkSession.builder()
      .appName("graft-self-analyze")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", logDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // topic-shaped job groups (the Gantt source)
    spark.sparkContext.setJobGroup("g-orders", "svc.db.orders")
    spark.range(200000).groupBy(($"id" % 100).as("k")).count()
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobGroup("g-events", "svc.db.events")
    spark.range(200000).select(($"id" * 2).as("v"))
      .join(spark.range(1000).select($"id".as("v")), "v")
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.clearJobGroup()

    // a SQL execution (statement-type stats)
    spark.sql("SELECT count(*) FROM range(100000) WHERE id % 7 = 0").collect()

    // a short streaming query (lifecycle + progress sections)
    val src = Files.createTempDirectory("sa-src")
    Seq(1, 2, 3).toDF("n").write.mode("overwrite").parquet(src.toString)
    val q = spark.readStream.schema("n INT").parquet(src.toString)
      .groupBy().count()
      .writeStream.format("noop").outputMode("complete")
      .queryName("sa_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    spark.stop()

    val report = EventLogAnalyzer.analyzeDir(Paths.get(logDir))
    println(s"SELFCHECK topics=${report.timeline.map(_.topic).sorted.mkString(",")}")
    println(s"SELFCHECK jobs_per_topic=${report.timeline.map(_.jobCount).sum}")
    println(s"SELFCHECK max_concurrent=${report.maxConcurrentTopics}")
    println(s"SELFCHECK executors=${report.memory.executors.size} " +
      s"heap0=${report.memory.executors.headOption.map(_.heapBytes).getOrElse(0L)} " +
      s"peak0=${report.memory.executors.headOption.map(_.peakExecBytes).getOrElse(0L)}")
    println(s"SELFCHECK shuffle_write=${report.memory.totalShuffleWrite} " +
      s"shuffle_read=${report.memory.totalShuffleRead}")
    println(s"SELFCHECK sql=${report.sql.map(s => s"${s.statementType}:${s.count}").sorted.mkString(",")}")
    println(s"SELFCHECK streaming_queries=${report.streamingQueries.map(q0 => s"${q0.name}:${q0.succeeded}").mkString(",")}")
    println(s"SELFCHECK streaming_batches=${report.streaming.size}")
    println(s"SELFCHECK pools=${report.pools.keySet.toSeq.sorted.mkString(",")}")
    println(s"SELFCHECK config_shuffle=${report.config.getOrElse("spark.sql.shuffle.partitions", "?")}")
    println(s"SELFCHECK gc=${report.gcHealth} cpu=${report.cpuHealth} mem=${report.memory.memoryHealth}")
    report.ganttLines(40).foreach(l => println(s"SELFCHECK gantt $l"))
    println(report.render)
  }
}
