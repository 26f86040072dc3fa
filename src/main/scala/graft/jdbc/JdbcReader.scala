package graft.jdbc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned JDBC read planning + execution
  * (`/root/reference/src/utils/database.py:442-492`).
  *
  * The PLAN is separated from the LOAD so the planning logic — partition
  * key discovery, source-side min/max bounds, NULL-bounds fallback, and
  * the dialect-specific alias quoting — is unit-testable without a live
  * database. At scale the plan is what matters: N executors each issue
  * one range-predicated query, so the source table streams out in
  * parallel instead of through a single connection.
  */
object JdbcReader {

  /** A resolved read: base JDBC options + optional range partitioning. */
  case class ReadPlan(
      options: Map[String, String],
      table: String,
      partition: Option[Partitioning])

  case class Partitioning(
      column: String,
      lowerBound: String,
      upperBound: String,
      numPartitions: Int)

  /** MySQL quotes bound-query aliases with backticks, SQL Server with
    * single quotes (`database.py:469-470`). */
  def boundQuery(manager: BaseDatabaseManager, table: String, column: String): String = {
    val q = if (manager.settings.dbType == "sqlserver") "'" else "`"
    s"SELECT min($column) as ${q}lower$q, max($column) as ${q}upper$q FROM $table"
  }

  /** Resolve the read plan: no partition key → plain read; key with NULL
    * bounds (empty table) → plain read with a warning; else range split. */
  def plan(
      manager: BaseDatabaseManager,
      table: String,
      numPartitions: Int,
      database: String = ""): ReadPlan = {
    val options = manager.jdbcOptions(database)
    manager.partitionKey(table) match {
      case None => ReadPlan(options, table, None)
      case Some(column) =>
        val bounds = manager.executor
          .query(options, boundQuery(manager, table, column))
          .collect().headOption
        bounds match {
          case Some(row) if !row.isNullAt(0) =>
            ReadPlan(options, table, Some(Partitioning(
              column, String.valueOf(row.get(0)), String.valueOf(row.get(1)),
              numPartitions)))
          case _ => ReadPlan(options, table, None) // empty/NULL bounds fallback
        }
    }
  }

  def load(spark: SparkSession, p: ReadPlan): DataFrame = {
    val reader = spark.read.format("jdbc").options(p.options).option("dbtable", p.table)
    p.partition match {
      case None => reader.load()
      case Some(part) =>
        reader
          .option("partitionColumn", part.column)
          .option("lowerBound", part.lowerBound)
          .option("upperBound", part.upperBound)
          .option("numPartitions", part.numPartitions.toString)
          .load()
    }
  }

  /** The one-call form of the reference (`read_jdbc_table`). */
  def readJdbcTable(
      spark: SparkSession,
      manager: BaseDatabaseManager,
      table: String,
      numPartitions: Int,
      database: String = ""): DataFrame =
    load(spark, plan(manager, table, numPartitions, database))
}
