package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Filesystem-signal graceful shutdown, ported from the reference's
  * S3-signal module (`/root/reference/src/utils/signal.py`). The signal
  * is the EXISTENCE of a file at a well-known path; any filesystem the
  * Hadoop API can reach works (local for tests, object stores in prod).
  */
object Signal {

  /** `{root}/spark/signal/{dagId}` (`signal.py:24-26`). */
  def buildSignalPath(root: String, dagId: String): String =
    s"$root/spark/signal/$dagId"

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Existence check; any error reads as "no signal" (`signal.py:29-37`). */
  def checkStopSignal(spark: SparkSession, signalPath: String): Boolean =
    try {
      val (fs, p) = fsFor(spark, signalPath)
      fs.exists(p)
    } catch { case _: Exception => false }

  def requestStop(spark: SparkSession, signalPath: String): Unit = {
    val (fs, p) = fsFor(spark, signalPath)
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Delete the signal file if present (`signal.py:40-52`). */
  def cleanupStopSignal(spark: SparkSession, signalPath: String): Unit =
    try {
      val (fs, p) = fsFor(spark, signalPath)
      if (fs.exists(p)) { fs.delete(p, false); () }
    } catch { case _: Exception => () }

  /** Sleep up to `seconds`, polling the signal every `pollSeconds`;
    * returns true when the signal interrupted the sleep
    * (`kafka_to_iceberg_stream.py:112-119`). */
  def interruptibleSleep(
      spark: SparkSession,
      signalPath: String,
      seconds: Double,
      pollSeconds: Double = 10.0): Boolean = {
    val deadlineNs = System.nanoTime() + (seconds * 1e9).toLong
    while (System.nanoTime() < deadlineNs) {
      if (checkStopSignal(spark, signalPath)) return true
      val remainingMs = math.max(0L, (deadlineNs - System.nanoTime()) / 1000000)
      Thread.sleep(math.min((pollSeconds * 1000).toLong, remainingMs))
    }
    false
  }
}

/** Micro-batch progress logger + signal-driven graceful shutdown
  * (`signal.py:60-112`): on every progress/idle event, when the stop
  * signal exists, all active streaming queries are stopped. */
class BatchProgressListener(
    signalSpark: Option[SparkSession] = None,
    signalPath: Option[String] = None)
  extends StreamingQueryListener {

  import StreamingQueryListener._

  @volatile var stoppedBySignal: Boolean = false

  private def checkSignal(): Unit =
    for (s <- signalSpark; p <- signalPath)
      if (Signal.checkStopSignal(s, p)) {
        stoppedBySignal = true
        s.streams.active.foreach(_.stop())
      }

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    log(s"[Stream] Started: ${event.name} (runId=${event.runId})")

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    log(s"[Stream] ${p.name} batch=${p.batchId} | rows=${p.numInputRows} | " +
      f"in=${p.inputRowsPerSecond}%.1f/s out=${p.processedRowsPerSecond}%.1f/s")
    checkSignal()
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = checkSignal()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    event.exception match {
      case Some(e) => log(s"[Stream] Terminated with error: $e")
      case None => log(s"[Stream] Terminated gracefully (id=${event.id})")
    }

  private val logger = org.slf4j.LoggerFactory.getLogger(classOf[BatchProgressListener])
  private def log(msg: String): Unit = logger.info(msg)
}
