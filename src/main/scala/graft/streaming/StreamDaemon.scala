package graft.streaming

import java.util.concurrent.{ConcurrentLinkedQueue, Semaphore}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.SparkSession

import graft.ledger.Watermark
import graft.maintenance.{Maintenance, ProcessedTableTracker}
import graft.store.LakeCatalog

/** Concurrency + daemon control flow of the CDC apps
  * (`/root/reference/src/kafka_to_iceberg.py:128-167`,
  * `/root/reference/src/kafka_to_iceberg_stream.py:225-312`).
  *
  * One driver thread per topic, bounded by a semaphore; each thread pins
  * its Spark jobs to a FAIR scheduler pool named after the topic so a
  * slow topic cannot starve the others (local properties are
  * thread-local in the JVM — no pinned-thread workaround needed, unlike
  * the PySpark original). Errors are collected, never thrown across
  * threads.
  */
object StreamRunner {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Run `body(topic)` on a thread per topic, at most `concurrency` at
    * once. Returns (topic, error) pairs; an empty result = clean round. */
  def runTopicsConcurrently(
      spark: SparkSession,
      topics: Seq[String],
      concurrency: Int)(
      body: String => Unit): Seq[(String, Throwable)] = {
    val semaphore = new Semaphore(concurrency)
    val errors = new ConcurrentLinkedQueue[(String, Throwable)]()
    val threads = topics.map { topic =>
      new Thread(
        () => {
          semaphore.acquire()
          try {
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", topic)
            spark.sparkContext.setJobGroup(topic, s"cdc-$topic", true)
            body(topic)
          } catch {
            case e: Throwable =>
              logger.error(s"Topic $topic failed: ${e.getMessage}")
              errors.add(topic -> e)
          } finally {
            spark.sparkContext.clearJobGroup()
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
            semaphore.release()
          }
        },
        s"cdc-$topic")
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    errors.asScala.toSeq
  }

  /** Flush the Hadoop FileSystem cache so a broken cached client is
    * re-created on next access (`kafka_to_iceberg_stream.py:101-109`). */
  def flushFileSystemCache(): Unit = FileSystem.closeAll()
}

/** Round-loop daemon: run availableNow rounds over all topics until the
  * stop signal appears, with consecutive-failure accounting and a
  * compaction phase over the tables each round actually modified
  * (`kafka_to_iceberg_stream.py:225-312`). */
class StreamDaemon(
    spark: SparkSession,
    catalog: LakeCatalog,
    topics: Seq[String],
    dagId: String,
    concurrency: Int = 3,
    roundIntervalSec: Long = 300,
    compactionIntervalSec: Long = 14400,
    maxConsecutiveFailures: Int = 3,
    signalPath: String,
    sleepPollSec: Double = 10.0) {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)
  val tracker = new ProcessedTableTracker

  /** Runs until signal or failure limit. `runTopic` performs one
    * availableNow round for one topic (CdcPipeline.runTopicStream bound
    * to a source). Returns (roundsRun, cleanExit). */
  def run(runTopic: String => Unit): (Int, Boolean) = {
    var consecutiveFailures = 0
    var round = 0
    var clean = true

    while (clean && !Signal.checkStopSignal(spark, signalPath)) {
      round += 1
      val roundStartNs = System.nanoTime()
      logger.info(s"=== Round $round: processing ${topics.size} topics ===")

      val errors = StreamRunner.runTopicsConcurrently(spark, topics, concurrency)(runTopic)

      if (errors.nonEmpty) {
        consecutiveFailures += 1
        logger.error(s"Round $round had ${errors.size} error(s). " +
          s"Consecutive failures: $consecutiveFailures/$maxConsecutiveFailures")
        if (consecutiveFailures >= maxConsecutiveFailures) {
          logger.error("Too many consecutive failures. Exiting.")
          clean = false
        } else {
          logger.warn("Flushing Hadoop FileSystem cache to recover stale clients.")
          StreamRunner.flushFileSystemCache()
        }
      } else {
        consecutiveFailures = 0
        // compaction phase: only tables this round modified, interval-gated
        val modified = tracker.getAndClear()
        if (modified.nonEmpty) {
          val lastMap = Watermark.getLastCompletedMap(
            catalog, modified.toSeq, "rewrite_data_files")
          modified.foreach { fqn =>
            if (Watermark.shouldRun(lastMap.getOrElse(fqn, None), compactionIntervalSec))
              Maintenance.runCompaction(catalog, dagId, fqn)
          }
        }

        val elapsedSec = (System.nanoTime() - roundStartNs) / 1e9
        val sleepSec = roundIntervalSec - elapsedSec
        if (sleepSec > 0) {
          logger.info(f"Round $round took $elapsedSec%.0fs. Sleeping $sleepSec%.0fs.")
          if (Signal.interruptibleSleep(spark, signalPath, sleepSec, sleepPollSec)) {
            logger.warn("Stop signal detected during sleep. Exiting.")
            Signal.cleanupStopSignal(spark, signalPath)
            return (round, true)
          }
        }
      }
    }
    Signal.cleanupStopSignal(spark, signalPath)
    (round, clean)
  }
}
