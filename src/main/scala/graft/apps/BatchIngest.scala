package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.TableNaming
import graft.functions.Transforms
import graft.jdbc.{BaseDatabaseManager, JdbcReader}
import graft.store.{LakeCatalog, Snapshot}

/** The three batch pipelines of the reference, composed from the layers
  * below (`/root/reference/src/mysql_to_iceberg.py:24-62`,
  * `mysql_to_parquet.py:24-59`, `parquet_to_iceberg.py:38-87`):
  *
  *  1. JDBC → lake table: partitioned read → trim → audit column →
  *     id_iceberg PK hash → RTAS
  *  2. JDBC → parquet raw zone: same read path, `update_ts_dms` audit
  *     name, plain overwrite
  *  3. parquet raw zone → lake table: UTC-normalize → rename audit col
  *     back → PK hash → RTAS
  *
  * PK-dependent tableProperties follow the RTAS contract (metadata GC
  * props only when an identity exists, `iceberg.py:79-96`).
  */
object BatchIngest {

  private def pkProperties(pkCols: Seq[String]): Map[String, String] =
    if (pkCols.isEmpty) Map.empty
    else Map(
      "write.metadata.delete-after-commit.enabled" -> "true",
      "write.metadata.previous-versions-max" -> "5",
      "history.expire.max-snapshot-age-ms" -> "86400000")

  /** Shared snapshot transform: trim CHAR padding, stamp the audit
    * column, add the synthetic identity when a PK exists. */
  def conformSnapshot(df: DataFrame, pkCols: Seq[String], auditCol: String): DataFrame = {
    val trimmed = Transforms.trimStringColumns(df)
    val audited = trimmed.withColumn(auditCol,
      org.apache.spark.sql.functions.current_timestamp())
    if (pkCols.nonEmpty) Transforms.withPkHash(audited, pkCols) else audited
  }

  /** Pipeline 1: full-table JDBC snapshot → lake RTAS. */
  def jdbcToLake(
      spark: SparkSession,
      manager: BaseDatabaseManager,
      catalog: LakeCatalog,
      service: String,
      sourceTable: String,
      numPartitions: Int,
      database: String = "",
      bucketCount: Int = 0): Snapshot = {
    val (schema, table) =
      if (manager.settings.dbType == "sqlserver")
        TableNaming.sqlServerSourceToTable(service, sourceTable)
      else TableNaming.mysqlSourceToTable(service, sourceTable)
    val pkCols = manager.primaryKey(sourceTable)
    val df = JdbcReader.readJdbcTable(spark, manager, sourceTable, numPartitions, database)
    val out = conformSnapshot(df, pkCols, "last_applied_date")
    catalog.createDatabase(schema)
    // bucketCount > 0 opts into the hash-bucket layout on id_iceberg so
    // downstream CDC merges bucket-prune (the reference ships this
    // disabled, iceberg.py:94 - same default here)
    val bucketBy =
      if (bucketCount > 0 && pkCols.nonEmpty) Some(("id_iceberg", bucketCount))
      else None
    catalog.table(s"$schema.$table").createOrReplace(out,
      tableProperties = pkProperties(pkCols), bucketBy = bucketBy)
  }

  /** Pipeline 2: JDBC snapshot → raw-zone parquet overwrite
    * (`mysql_to_parquet.py:50-59`; audit column named update_ts_dms). */
  def jdbcToParquet(
      spark: SparkSession,
      manager: BaseDatabaseManager,
      sourceTable: String,
      numPartitions: Int,
      outputPath: String,
      database: String = ""): Unit = {
    val df = JdbcReader.readJdbcTable(spark, manager, sourceTable, numPartitions, database)
    atomicOverwriteParquet(spark, conformSnapshot(df, Nil, "update_ts_dms"), outputPath)
  }

  /** Overwrite `outputPath` with `df` as parquet WITHOUT ever exposing a
    * torn snapshot, and without ever holding FEWER than one complete
    * copy. The session runs committer v2 with _SUCCESS markers
    * disabled — safe for the lake store (visibility = snapshot claim
    * over a fresh UUID dir) but not for a direct overwrite sink, where
    * a mid-job failure would leave partially-written part files visible
    * with no completion marker for parquetToLake to check. So: stage
    * into a hidden sibling dir, move the live dir ASIDE (rename, never
    * delete), swap the stage in, and only then drop the aside copy.
    * Every crash window keeps a complete snapshot on disk:
    *
    *  - during/after the stage write: live dir untouched;
    *  - after live→aside, before stage→live: the sweep on the NEXT run
    *    restores the aside copy (the stage dir, which may be torn, is
    *    the one that gets deleted);
    *  - after stage→live, before the aside delete: next run sees the
    *    new live dir and just drops the stale aside.
    *
    * A rename failure restores the aside copy in-process and rethrows.
    * rename() is atomic on HDFS/local; on an object store front this
    * with a rename-capable layer. */
  def atomicOverwriteParquet(
      spark: SparkSession, df: DataFrame, outputPath: String): Unit = {
    val out = new org.apache.hadoop.fs.Path(outputPath)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = Option(out.getParent).getOrElse(
      throw new java.io.IOException(s"no parent dir for $out"))
    if (fs.exists(parent)) {
      // restore-or-drop aside dirs first: if a previous run died between
      // its live→aside and stage→live renames, the aside copy IS the
      // last complete snapshot — put it back before sweeping anything
      fs.listStatus(parent).map(_.getPath)
        .filter(_.getName.startsWith(s".${out.getName}.old-"))
        .foreach { old =>
          if (fs.exists(out)) { fs.delete(old, true); () }
          // a failed restore must STOP the run: proceeding would sweep
          // the (torn) stage dirs and later delete this aside copy —
          // the only complete snapshot — as stale
          else if (!fs.rename(old, out))
            throw new java.io.IOException(s"restore $old -> $out failed")
        }
      // then sweep stage dirs (possibly torn — never a last copy)
      fs.listStatus(parent).map(_.getPath)
        .filter(_.getName.startsWith(s".${out.getName}.staging-"))
        .foreach(fs.delete(_, true))
    }
    val uuid = java.util.UUID.randomUUID
    val tmp = new org.apache.hadoop.fs.Path(parent, s".${out.getName}.staging-$uuid")
    val aside = new org.apache.hadoop.fs.Path(parent, s".${out.getName}.old-$uuid")
    // a failed stage WRITE is the one failure where deleting the stage
    // dir is safe (it is torn and the live dir was never touched)
    try df.write.mode("overwrite").parquet(tmp.toString)
    catch { case e: Throwable => fs.delete(tmp, true); throw e }
    val hadLive = fs.exists(out)
    if (hadLive && !fs.rename(out, aside))
      throw new java.io.IOException(s"rename $out -> $aside failed")
    if (!fs.rename(tmp, out)) {
      // put the previous snapshot back before failing; the stage dir is
      // complete (the write finished) but unreachable — next run sweeps it.
      // If the restore ALSO fails, say so loudly: until the next run's
      // sweep restores the aside copy, readers see NO live dir at all.
      val restored = !hadLive || fs.rename(aside, out)
      throw new java.io.IOException(s"rename $tmp -> $out failed" +
        (if (restored) ""
         else s"; restoring the previous snapshot also failed — no live " +
           s"dir until the next run's sweep restores the copy at $aside"))
    }
    if (hadLive) { fs.delete(aside, true); () }
  }

  /** Pipeline 3: raw-zone parquet → lake RTAS
    * (`parquet_to_iceberg.py:38-87`): UTC-normalize all timestamps,
    * rename the DMS audit column back, hash the PK. */
  def parquetToLake(
      spark: SparkSession,
      catalog: LakeCatalog,
      inputPath: String,
      schema: String,
      table: String,
      pkCols: Seq[String],
      recursive: Boolean = false,
      bucketCount: Int = 0): Snapshot = {
    val raw = spark.read
      .option("recursiveFileLookup", recursive.toString)
      .parquet(inputPath)
    val utc = Transforms.convertTimestampsToUtc(raw)
    val renamed =
      if (utc.columns.contains("update_ts_dms"))
        utc.withColumnRenamed("update_ts_dms", "last_applied_date")
      else utc
    val out =
      if (pkCols.nonEmpty) Transforms.withPkHash(renamed, pkCols) else renamed
    catalog.createDatabase(schema)
    val bucketBy =
      if (bucketCount > 0 && pkCols.nonEmpty) Some(("id_iceberg", bucketCount))
      else None
    catalog.table(s"$schema.$table").createOrReplace(out,
      tableProperties = pkProperties(pkCols), bucketBy = bucketBy)
  }
}
