package graft.types

import org.apache.spark.sql.types._

/** Source-DB → Spark type mapping layer.
  *
  * Reproduces the reference's two dialect tables and the special-case
  * conversion rules (`/root/reference/src/utils/database.py:13-104`):
  *  - MySQL `tinyint(1)` → BooleanType (matches the MySQL JDBC driver)
  *  - MySQL `decimal(p,s)` → DecimalType(p,s); `decimal(p)` → scale 0
  *  - two-word types ("int unsigned") fall back to the first word when the
  *    full phrase has no mapping
  *  - anything unknown → StringType (lossless fallback)
  */
object DbTypeMap {

  /** `/root/reference/src/utils/database.py:13-41`. Bare `decimal` (no
    * precision) maps to MySQL's default DECIMAL(10,0). */
  val mysql: Map[String, DataType] = Map(
    "char" -> StringType,
    "varchar" -> StringType,
    "text" -> StringType,
    "tinytext" -> StringType,
    "mediumtext" -> StringType,
    "longtext" -> StringType,
    "tinyint" -> IntegerType,
    "smallint" -> IntegerType,
    "mediumint" -> IntegerType,
    "int" -> IntegerType,
    "int unsigned" -> LongType,
    "bigint" -> LongType,
    "float" -> FloatType,
    "double" -> DoubleType,
    "decimal" -> DecimalType(10, 0),
    "boolean" -> BooleanType,
    "blob" -> BinaryType,
    "tinyblob" -> BinaryType,
    "mediumblob" -> BinaryType,
    "longblob" -> BinaryType,
    "time" -> TimestampType,
    "date" -> DateType,
    "datetime" -> TimestampType,
    "timestamp" -> TimestampType,
    "enum" -> StringType,
    "set" -> StringType,
    "json" -> StringType
  )

  /** `/root/reference/src/utils/database.py:43-72`. Notable differences
    * from MySQL: smallint → Short, tinyint → Byte, fixed DecimalType for
    * decimal/numeric/money, `time` → String (not timestamp). */
  val sqlServer: Map[String, DataType] = Map(
    "bigint" -> LongType,
    "int" -> IntegerType,
    "smallint" -> ShortType,
    "tinyint" -> ByteType,
    "bit" -> BooleanType,
    "decimal" -> DecimalType(38, 10),
    "numeric" -> DecimalType(38, 10),
    "money" -> DecimalType(19, 4),
    "smallmoney" -> DecimalType(10, 4),
    "float" -> DoubleType,
    "real" -> FloatType,
    "date" -> DateType,
    "datetime" -> TimestampType,
    "datetime2" -> TimestampType,
    "smalldatetime" -> TimestampType,
    "time" -> StringType,
    "char" -> StringType,
    "varchar" -> StringType,
    "text" -> StringType,
    "nchar" -> StringType,
    "nvarchar" -> StringType,
    "ntext" -> StringType,
    "binary" -> BinaryType,
    "varbinary" -> BinaryType,
    "image" -> BinaryType,
    "uniqueidentifier" -> StringType,
    "xml" -> StringType,
    "sql_variant" -> StringType
  )

  private val TypeNameRe = "^\\w+(?:\\s+\\w+)?".r
  private val DigitsRe = "\\d+".r

  /** Convert a raw DB column-type string (e.g. "varchar(255)",
    * "decimal(12,2)", "int unsigned zerofill") to a Spark DataType.
    * `dbType` is "mysql" or "sqlserver" (`database.py:75-104`). */
  def convertDbTypeToSpark(columnType: String, dbType: String): DataType = {
    val typeMap = if (dbType == "mysql") mysql else sqlServer
    TypeNameRe.findFirstIn(columnType.toLowerCase.trim) match {
      case Some(typeName) =>
        lazy val params = DigitsRe.findAllIn(columnType).toList
        if (typeName == "tinyint" && dbType == "mysql" && params.headOption.contains("1"))
          BooleanType
        else if (typeName == "decimal" && dbType == "mysql" && params.nonEmpty) {
          if (params.length >= 2) DecimalType(params(0).toInt, params(1).toInt)
          else DecimalType(params.head.toInt, 0)
        } else
          typeMap.get(typeName) match {
            case Some(t) => t
            case None =>
              // "int unsigned zerofill" → regex kept "int unsigned" but an
              // unmapped two-word phrase retries with its first word.
              val firstWord =
                if (typeName.contains(' ')) Some(typeName.split("\\s+")(0)) else None
              firstWord.flatMap(typeMap.get).getOrElse(StringType)
          }
      case None => StringType
    }
  }
}
