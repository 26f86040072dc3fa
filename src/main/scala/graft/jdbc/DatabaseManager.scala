package graft.jdbc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source-database metadata managers, mirroring
  * `/root/reference/src/utils/database.py:107-434`.
  *
  * Every metadata query below runs INSIDE the source database (JDBC
  * `query` option), not in Spark — pushdown of PK discovery, partition
  * key selection, row counts, comments and nullability. The
  * `JdbcExecutor` seam lets unit tests stub the source DB with literal
  * DataFrames while production uses the real JDBC reader.
  */
case class DbSettings(
    dbType: String, // "mysql" | "sqlserver"
    host: String,
    port: Int,
    user: String,
    password: String)

trait JdbcExecutor {
  def query(options: Map[String, String], sql: String): DataFrame
}

class SparkJdbcExecutor(spark: SparkSession) extends JdbcExecutor {
  def query(options: Map[String, String], sql: String): DataFrame =
    spark.read.format("jdbc").options(options).option("query", sql).load()
}

abstract class BaseDatabaseManager(val settings: DbSettings, val executor: JdbcExecutor) {

  private val IdentifierRe = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Reject unsafe SQL identifiers before interpolation
    * (`database.py:118-126`). */
  protected def validateIdentifier(name: String): String = {
    require(IdentifierRe.matches(name), s"Invalid SQL identifier: '$name'")
    name
  }

  protected def run(sql: String, database: String = ""): DataFrame =
    executor.query(jdbcOptions(database), sql)

  def jdbcOptions(database: String = ""): Map[String, String]

  /** PK column names in ordinal order. */
  def primaryKey(table: String): Seq[String]

  /** Best range-partition column (identity/auto-increment else first
    * numeric/date column), or None. */
  def partitionKey(table: String): Option[String]

  /** (column name, raw column type) in ordinal order. */
  def schemaOf(table: String): Seq[(String, String)]

  /** {table_rows, table_size(MB)}. */
  def metadata(table: String): Map[String, String]

  def columnComments(table: String): Map[String, String]

  def tableComment(table: String): Option[String]

  def nullableInfo(table: String): Map[String, Boolean]
}

/** MySQL dialect (`database.py:177-292`): `db.table` naming,
  * INFORMATION_SCHEMA metadata, backtick bound-query quoting. */
class MySqlManager(settings: DbSettings, executor: JdbcExecutor)
  extends BaseDatabaseManager(settings, executor) {

  private def parse(table: String): (String, String) = {
    val parts = table.split('.')
    require(parts.length == 2, s"MySQL table name must be 'schema.table', got: '$table'")
    (validateIdentifier(parts(0)), validateIdentifier(parts(1)))
  }

  def jdbcOptions(database: String = ""): Map[String, String] = Map(
    "url" -> (s"jdbc:mysql://${settings.host}:${settings.port}/$database" +
      "?zeroDateTimeBehavior=convertToNull&useUnicode=true&characterEncoding=UTF-8"),
    "driver" -> "com.mysql.cj.jdbc.Driver",
    "user" -> settings.user,
    "password" -> settings.password)

  def primaryKey(table: String): Seq[String] = {
    val (schema, t) = parse(table)
    run(s"""SELECT COLUMN_NAME
            FROM information_schema.KEY_COLUMN_USAGE
            WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$t'
              AND CONSTRAINT_NAME = 'PRIMARY'
            ORDER BY TABLE_SCHEMA, TABLE_NAME, ORDINAL_POSITION""")
      .collect().map(_.getString(0)).toSeq
  }

  /** Auto-increment column if any, else the first numeric/date column
    * (self-join on INFORMATION_SCHEMA, `database.py:209-231`). */
  def partitionKey(table: String): Option[String] = {
    val (schema, t) = parse(table)
    run(s"""SELECT c.COLUMN_NAME
            FROM INFORMATION_SCHEMA.COLUMNS AS c
            JOIN (SELECT TABLE_SCHEMA, TABLE_NAME,
                         MIN(ORDINAL_POSITION) AS min_ordinal,
                         MIN(CASE WHEN EXTRA = 'auto_increment'
                                  THEN ORDINAL_POSITION END) AS extra_ordinal
                  FROM INFORMATION_SCHEMA.COLUMNS
                  WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$t'
                    AND (DATA_TYPE IN ('int','bigint','date','datetime','timestamp')
                         OR EXTRA LIKE 'auto_increment')
                  GROUP BY TABLE_SCHEMA, TABLE_NAME) AS p
              ON c.TABLE_SCHEMA = p.TABLE_SCHEMA AND c.TABLE_NAME = p.TABLE_NAME
             AND c.ORDINAL_POSITION = COALESCE(p.extra_ordinal, p.min_ordinal)
            ORDER BY c.TABLE_SCHEMA, c.TABLE_NAME, c.ORDINAL_POSITION""")
      .collect().headOption.map(_.getString(0))
  }

  def schemaOf(table: String): Seq[(String, String)] = {
    val (schema, t) = parse(table)
    run(s"""SELECT COLUMN_NAME, COLUMN_TYPE
            FROM information_schema.COLUMNS
            WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$t'
            ORDER BY ORDINAL_POSITION""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  def metadata(table: String): Map[String, String] = {
    val (schema, t) = parse(table)
    val df = run(s"""SELECT TABLE_ROWS,
                     ROUND(((data_length + index_length) / 1024.0 / 1024.0), 0)
                       AS TABLE_SIZE
                     FROM information_schema.TABLES
                     WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$t'""")
    (for (row <- df.collect(); c <- df.columns)
      yield c.toLowerCase -> String.valueOf(row.getAs[Any](c))).toMap
  }

  def columnComments(table: String): Map[String, String] = {
    val (schema, t) = parse(table)
    run(s"""SELECT COLUMN_NAME, COLUMN_COMMENT
            FROM information_schema.COLUMNS
            WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$t'
            ORDER BY ORDINAL_POSITION""")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  def tableComment(table: String): Option[String] = {
    val (schema, t) = parse(table)
    run(s"""SELECT TABLE_COMMENT
            FROM information_schema.TABLES
            WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$t'""")
      .collect().headOption.map(_.getString(0)).filter(c => c != null && c.nonEmpty)
  }

  def nullableInfo(table: String): Map[String, Boolean] = {
    val (schema, t) = parse(table)
    run(s"""SELECT COLUMN_NAME, IS_NULLABLE
            FROM information_schema.COLUMNS
            WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$t'
            ORDER BY ORDINAL_POSITION""")
      .collect().map(r => r.getString(0) -> (r.getString(1) == "YES")).toMap
  }
}

/** SQL Server dialect (`database.py:295-434`): `db.schema.table` naming,
  * sys.* catalog views, TOP-1 partition key discovery. */
class SqlServerManager(settings: DbSettings, executor: JdbcExecutor)
  extends BaseDatabaseManager(settings, executor) {

  private def parse(table: String): (String, String, String) = {
    val parts = table.split('.')
    require(parts.length == 3,
      s"SQL Server table name must be 'db.schema.table', got: '$table'")
    (validateIdentifier(parts(0)), validateIdentifier(parts(1)),
      validateIdentifier(parts(2)))
  }

  def jdbcOptions(database: String = ""): Map[String, String] = {
    val dbProp = if (database.nonEmpty) s";databaseName=$database" else ""
    Map(
      "url" -> s"jdbc:sqlserver://${settings.host}:${settings.port}$dbProp;encrypt=false;",
      "driver" -> "com.microsoft.sqlserver.jdbc.SQLServerDriver",
      "user" -> settings.user,
      "password" -> settings.password)
  }

  def primaryKey(table: String): Seq[String] = {
    val (db, schema, t) = parse(table)
    run(
      s"""SELECT t.TABLE_CATALOG AS TABLE_SCHEMA, t.TABLE_NAME,
                 c.COLUMN_NAME, c.ORDINAL_POSITION
          FROM INFORMATION_SCHEMA.TABLE_CONSTRAINTS t
          JOIN INFORMATION_SCHEMA.KEY_COLUMN_USAGE c
            ON c.CONSTRAINT_NAME = t.CONSTRAINT_NAME
          WHERE t.CONSTRAINT_TYPE = 'PRIMARY KEY'
            AND t.TABLE_CATALOG = '$db' AND t.TABLE_SCHEMA = '$schema'
            AND t.TABLE_NAME = '$t'""", db)
      .sort("TABLE_SCHEMA", "TABLE_NAME", "ORDINAL_POSITION")
      .collect().map(_.getAs[String]("COLUMN_NAME")).toSeq
  }

  def partitionKey(table: String): Option[String] = {
    val (db, schema, t) = parse(table)
    run(
      s"""SELECT TOP 1 c.COLUMN_NAME
          FROM INFORMATION_SCHEMA.COLUMNS AS c
          WHERE c.TABLE_CATALOG = '$db' AND c.TABLE_SCHEMA = '$schema'
            AND c.TABLE_NAME = '$t'
            AND (DATA_TYPE IN ('date','datetime','datetime2','timestamp') OR
                 COLUMNPROPERTY(OBJECT_ID(CONCAT(c.TABLE_SCHEMA, '.', c.TABLE_NAME)),
                                COLUMN_NAME, 'IsIdentity') = 1)
          ORDER BY (CASE WHEN COLUMNPROPERTY(OBJECT_ID(CONCAT(c.TABLE_SCHEMA, '.',
                         c.TABLE_NAME)), COLUMN_NAME, 'IsIdentity') = 1
                    THEN 0 ELSE 1 END),
                   ORDINAL_POSITION""", db)
      .collect().headOption.map(_.getString(0))
  }

  def schemaOf(table: String): Seq[(String, String)] = {
    val (db, schema, t) = parse(table)
    run(
      s"""SELECT COLUMN_NAME, DATA_TYPE AS COLUMN_TYPE, ORDINAL_POSITION
          FROM INFORMATION_SCHEMA.COLUMNS
          WHERE TABLE_CATALOG = '$db' AND TABLE_SCHEMA = '$schema'
            AND TABLE_NAME = '$t'""", db)
      .sort("ORDINAL_POSITION")
      .collect().map(r => (r.getAs[String]("COLUMN_NAME"), r.getAs[String]("COLUMN_TYPE")))
      .toSeq
  }

  def metadata(table: String): Map[String, String] = {
    val (db, schema, t) = parse(table)
    val df = run(
      s"""SELECT p.rows AS TABLE_ROWS,
                 CAST((SUM(a.total_pages) * 8.0) / 1024 AS FLOAT) AS TABLE_SIZE
          FROM sys.tables AS t
          INNER JOIN sys.indexes AS i
            ON t.object_id = i.object_id
           AND t.object_id = OBJECT_ID(CONCAT('$schema', '.', '$t'))
          INNER JOIN sys.partitions AS p
            ON i.object_id = p.object_id AND i.index_id = p.index_id
          INNER JOIN sys.allocation_units AS a
            ON p.partition_id = a.container_id
          GROUP BY t.name, p.rows""", db)
    (for (row <- df.collect(); c <- df.columns)
      yield c.toLowerCase -> String.valueOf(row.getAs[Any](c))).toMap
  }

  def columnComments(table: String): Map[String, String] = {
    val (db, _, t) = parse(table)
    run(
      s"""SELECT c.name AS COLUMN_NAME,
                 CAST(ep.value AS NVARCHAR(4000)) AS COLUMN_COMMENT
          FROM sys.columns c
          INNER JOIN sys.tables t ON c.object_id = t.object_id
          LEFT JOIN sys.extended_properties ep
            ON ep.major_id = c.object_id AND ep.minor_id = c.column_id
           AND ep.name = 'MS_Description'
          WHERE t.name = '$t'
          ORDER BY c.column_id""", db)
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).getOrElse("")).toMap
  }

  def tableComment(table: String): Option[String] = {
    val (db, _, t) = parse(table)
    run(
      s"""SELECT CAST(ep.value AS NVARCHAR(4000)) AS TABLE_COMMENT
          FROM sys.tables t
          INNER JOIN sys.extended_properties ep
            ON ep.major_id = t.object_id AND ep.minor_id = 0
           AND ep.name = 'MS_Description'
          WHERE t.name = '$t'""", db)
      .collect().headOption.map(_.getString(0)).filter(c => c != null && c.nonEmpty)
  }

  def nullableInfo(table: String): Map[String, Boolean] = {
    val (db, schema, t) = parse(table)
    run(
      s"""SELECT COLUMN_NAME, IS_NULLABLE
          FROM INFORMATION_SCHEMA.COLUMNS
          WHERE TABLE_CATALOG = '$db' AND TABLE_SCHEMA = '$schema'
            AND TABLE_NAME = '$t'
          ORDER BY ORDINAL_POSITION""", db)
      .collect().map(r => r.getString(0) -> (r.getString(1) == "YES")).toMap
  }
}
