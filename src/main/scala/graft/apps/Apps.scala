package graft.apps

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.cdc.{CdcPipeline, HttpSchemaRegistry, PipelineContext}
import graft.core.{GraftSession, Settings}
import graft.jdbc.{DbSettings, MySqlManager, SparkJdbcExecutor, SqlServerManager}
import graft.ledger.Watermark
import graft.maintenance.{Maintenance, ProcessedTableTracker}
import graft.store.LakeCatalog
import graft.streaming.{BatchProgressListener, KafkaSource, Signal, StreamDaemon}
import graft.validate.SchemaValidate

/** `--key value` CLI parsing shared by the app mains, mirroring each
  * reference script's argparse surface (`kafka_to_iceberg.py:31-58`). */
object AppArgs {

  case class Parsed(values: Map[String, String]) {
    def apply(key: String): String = values.getOrElse(key,
      throw new IllegalArgumentException(s"missing required argument --$key"))
    def get(key: String): Option[String] = values.get(key)
    def getOrElse(key: String, default: String): String = values.getOrElse(key, default)
    def int(key: String, default: Int): Int = values.get(key).map(_.toInt).getOrElse(default)
    def long(key: String, default: Long): Long = values.get(key).map(_.toLong).getOrElse(default)
  }

  def parse(args: Array[String]): Parsed = {
    val pairs = Iterator.unfold(args.toList) {
      case key :: value :: rest if key.startsWith("--") && !value.startsWith("--") =>
        Some((key.stripPrefix("--").replace('-', '_') -> value, rest))
      case key :: rest if key.startsWith("--") =>
        Some((key.stripPrefix("--").replace('-', '_') -> "true", rest))
      case Nil => None
      case other :: _ =>
        throw new IllegalArgumentException(s"unexpected argument: $other")
    }
    Parsed(pairs.toMap)
  }

  /** Base64 `{"topic": {"0": 100}}` per-topic offsets map
    * (`kafka_to_iceberg_stream.py` main). */
  def decodeOffsetsMap(b64: String): Map[String, Map[String, Long]] = {
    import scala.jdk.CollectionConverters._
    val json = new String(java.util.Base64.getDecoder.decode(b64),
      java.nio.charset.StandardCharsets.UTF_8)
    val node = graft.cdc.DebeziumSchema.parse(json)
    node.properties().iterator().asScala.map { topicEntry =>
      topicEntry.getKey -> topicEntry.getValue.properties().iterator().asScala
        .map(p => p.getKey -> p.getValue.asLong()).toMap
    }.toMap
  }
}

/** Shared bring-up for the app mains. */
private[apps] object AppContext {
  def settings(args: AppArgs.Parsed): Settings =
    Settings.load(args.get("env_file").map(java.nio.file.Paths.get(_)))

  /** Batch apps exclude SimplifyCasts like the reference
    * (`mysql_to_iceberg.py:107`) so deliberate trim/UTC re-cast
    * projections survive optimization. */
  def spark(appName: String, batch: Boolean = false): SparkSession =
    GraftSession.getOrCreate(appName, excludeSimplifyCasts = batch)

  /** Local-path warehouses (file:/…) work as-is; object-store paths come
    * from the settings. */
  def catalog(spark: SparkSession, s: Settings): LakeCatalog =
    new LakeCatalog(spark, if (s.storage.catalogType == "local")
      s.storage.dataPath
    else s.warehouse)

  def dbManager(spark: SparkSession, s: Settings) = {
    val db = s.database.getOrElse(
      throw new IllegalArgumentException("DATABASE__* settings are required"))
    val ds = DbSettings(db.dbType, db.host, db.port, db.user, db.password)
    val exec = new SparkJdbcExecutor(spark)
    if (db.dbType == "sqlserver") new SqlServerManager(ds, exec)
    else new MySqlManager(ds, exec)
  }
}

/** `mysql_to_iceberg.py` / `sqlserver_to_iceberg.py`:
  * `--service --table [--num-partitions] [--env-file]`. */
object JdbcToLakeApp {
  def main(args: Array[String]): Unit = {
    val a = AppArgs.parse(args)
    val s = AppContext.settings(a)
    val spark = AppContext.spark("jdbc_to_lake", batch = true)
    try BatchIngest.jdbcToLake(spark, AppContext.dbManager(spark, s),
      AppContext.catalog(spark, s), a("service").toLowerCase, a("table"),
      a.int("num_partitions", 8))
    finally spark.stop()
  }
}

/** `mysql_to_parquet.py`: raw-zone snapshot overwrite. */
object JdbcToParquetApp {
  def main(args: Array[String]): Unit = {
    val a = AppArgs.parse(args)
    val s = AppContext.settings(a)
    val spark = AppContext.spark("jdbc_to_parquet", batch = true)
    try BatchIngest.jdbcToParquet(spark, AppContext.dbManager(spark, s),
      a("table"), a.int("num_partitions", 8), a("output_path"))
    finally spark.stop()
  }
}

/** `parquet_to_iceberg.py`: `--input-path --service --table --pk-cols`. */
object ParquetToLakeApp {
  def main(args: Array[String]): Unit = {
    val a = AppArgs.parse(args)
    val s = AppContext.settings(a)
    val spark = AppContext.spark("parquet_to_lake", batch = true)
    val (schema, table) = graft.core.TableNaming
      .mysqlSourceToTable(a("service"), a("table"))
    try BatchIngest.parquetToLake(spark, AppContext.catalog(spark, s),
      a("input_path"), schema, table,
      a.getOrElse("pk_cols", "").split(',').filter(_.nonEmpty).toSeq,
      recursive = a.getOrElse("recursive", "false").toBoolean)
    finally spark.stop()
  }
}

/** `kafka_to_iceberg_stream.py`: the round-loop CDC daemon
  * (`--dag-id --service --topics --concurrency --round-interval
  * --compaction-interval --position-delete-interval
  * [--starting-offsets-map] [--scheduled-at] [--env-file]`). */
object KafkaToLakeStreamApp {
  def main(args: Array[String]): Unit = {
    val a = AppArgs.parse(args)
    val s = AppContext.settings(a)
    val kafka = s.kafka.getOrElse(
      throw new IllegalArgumentException("KAFKA__* settings are required"))
    val spark = AppContext.spark("kafka_to_lake_stream")
    val cat = AppContext.catalog(spark, s)
    val topics = a("topics").split(',').toSeq
    val dagId = a("dag_id")
    val signalPath = Signal.buildSignalPath(s"s3a://${s.storage.bucket}", dagId)
    val offsetsMap = a.get("starting_offsets_map")
      .map(AppArgs.decodeOffsetsMap).getOrElse(Map.empty)
    val registry = new HttpSchemaRegistry(kafka.schemaRegistry)
    val scheduledAt = a.get("scheduled_at").map(Timestamp.valueOf)

    spark.streams.addListener(
      new BatchProgressListener(Some(spark), Some(signalPath)))
    Watermark.ensureWatermarkTables(cat)

    val daemon = new StreamDaemon(spark, cat, topics, dagId,
      concurrency = a.int("concurrency", 3),
      roundIntervalSec = a.long("round_interval", 300),
      compactionIntervalSec = a.long("compaction_interval", 14400),
      signalPath = signalPath)

    val positionDeleteInterval = a.long("position_delete_interval", 0)
    val (_, clean) = daemon.run { topic =>
      val pdcMap =
        if (positionDeleteInterval > 0)
          Some(Watermark.getLastCompletedMap(cat,
            topics.map(t => graft.core.TableNaming.topicToTable(a("service"), t))
              .map { case (sc, t) => s"$sc.$t" },
            "rewrite_position_delete_files"))
        else None
      val ctx = PipelineContext(cat, registry, topic, dagId,
        a("service").toLowerCase, scheduledAt, Some(daemon.tracker),
        positionDeleteInterval, pdcMap)
      val source = KafkaSource.load(spark, KafkaSource.Config(
        kafka.bootstrapServers, topic,
        maxOffsetsPerTrigger = kafka.maxOffsetsPerTrigger,
        startingOffsets = kafka.startingOffsets,
        startingOffsetsByPartition = offsetsMap.get(topic)))
      CdcPipeline.runTopicStream(spark, source, ctx, s"s3a://${s.storage.bucket}/iceberg")
    }
    spark.stop()
    if (!clean) sys.exit(1)
  }
}

/** `iceberg_maintenance.py`: purge → compaction over ops ledgers →
  * discovered-table orphan cleanup. */
object LakeMaintenanceApp {
  def main(args: Array[String]): Unit = {
    val a = AppArgs.parse(args)
    val s = AppContext.settings(a)
    val spark = AppContext.spark("lake_maintenance")
    val cat = AppContext.catalog(spark, s)
    val dagId = a.getOrElse("dag_id", "maintenance")
    try {
      Watermark.ensureWatermarkTables(cat)
      Watermark.purgeWatermarks(cat, a.int("retention_days", 7))
      for (t <- cat.listTables(Watermark.OpsSchema))
        Maintenance.runCompaction(cat, dagId, s"${Watermark.OpsSchema}.$t")
      for (schema <- a.getOrElse("schemas", "").split(',').filter(_.nonEmpty);
           t <- cat.listTables(schema))
        Maintenance.runOrphanCleanup(cat, dagId, s"$schema.$t",
          a.int("orphan_older_than_days", 3))
    } finally spark.stop()
  }
}

/** `schema_validate.py`: `--service --table [--env-file]`. */
object SchemaValidateApp {
  def main(args: Array[String]): Unit = {
    val a = AppArgs.parse(args)
    val s = AppContext.settings(a)
    val spark = AppContext.spark("schema_validate")
    try {
      val manager = AppContext.dbManager(spark, s)
      val (schema, table) =
        if (manager.settings.dbType == "sqlserver")
          graft.core.TableNaming.sqlServerSourceToTable(a("service"), a("table"))
        else graft.core.TableNaming.mysqlSourceToTable(a("service"), a("table"))
      val findings = SchemaValidate.validateAll(manager, a("table"),
        AppContext.catalog(spark, s).table(s"$schema.$table"))
      findings.foreach(f => System.err.println(s"[${f.check}] ${f.message}"))
    } finally spark.stop()
  }
}
