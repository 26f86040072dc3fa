package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium semantic-type casts — the behavior-critical wire-value
  * decoding layer (`/root/reference/src/utils/cdc_pipeline.py:78-124`).
  *
  * Debezium encodes MySQL temporals as plain numbers on the wire:
  *  - `io.debezium.time.Date`            int days since epoch
  *  - `io.debezium.time.MicroTime`       long µs since midnight
  *  - `io.debezium.time.Timestamp`       long ms since epoch (source wall
  *    clock in Asia/Seoul — shifted to UTC on decode)
  *  - `io.debezium.time.MicroTimestamp`  long µs since epoch (same shift)
  *  - `io.debezium.time.ZonedTimestamp`  ISO-8601 string, passed through
  *
  * The `=!= 0` guard on (Micro)Timestamp filters values force-injected by
  * the Avro schema's `default: 0` — `isNotNull` alone is NOT sufficient
  * (`cdc_pipeline.py:104-106`); such rows decode to NULL, not epoch.
  *
  * All casts are built-in column expressions: per-row, codegen'd, no
  * shuffle — at 100 TB this is free map-side work fused into the scan.
  */
object DebeziumCast {

  val Date = "io.debezium.time.Date"
  val MicroTime = "io.debezium.time.MicroTime"
  val Timestamp = "io.debezium.time.Timestamp"
  val MicroTimestamp = "io.debezium.time.MicroTimestamp"
  val ZonedTimestamp = "io.debezium.time.ZonedTimestamp"

  /** The source DB's wall-clock zone for ms/µs epoch timestamps. */
  val SourceZone = "Asia/Seoul"

  def castColumn(column: Column, debeziumType: String): Column =
    debeziumType match {
      case Date =>
        date_add(lit("1970-01-01"), column.cast(IntegerType))
      case MicroTime =>
        // long/int division is double division in Spark SQL, matching the
        // reference's float `column / 1_000_000`.
        to_utc_timestamp(timestamp_seconds(column / lit(1000000)), "UTC")
      case Timestamp =>
        val isValid = column.isNotNull && column =!= 0
        when(isValid, to_utc_timestamp(timestamp_millis(column), SourceZone))
          .otherwise(lit(null).cast(TimestampType))
      case MicroTimestamp =>
        val isValid = column.isNotNull && column =!= 0
        when(isValid, to_utc_timestamp(timestamp_micros(column), SourceZone))
          .otherwise(lit(null).cast(TimestampType))
      case _ => column // ZonedTimestamp and non-temporal types pass through
    }

  /** Schema-conforming projection: semantic-cast each catalog column, then
    * cast to the live catalog type — the catalog is the source of truth
    * for final types (`cdc_pipeline.py:190-197`). `extraCols` are carried
    * through unchanged (e.g. `__op`, `__offset`). */
  def conformToCatalog(
      df: DataFrame,
      catalogSchema: StructType,
      debeziumTypes: Map[String, String],
      extraCols: Seq[String] = Nil): DataFrame = {
    val conformed = catalogSchema.fields.toSeq.map { f =>
      castColumn(col(f.name), debeziumTypes.getOrElse(f.name, ""))
        .cast(f.dataType)
        .as(f.name)
    }
    df.select(conformed ++ extraCols.map(col): _*)
  }
}
