package graft.validate

import org.apache.spark.sql.types.StructType

import graft.jdbc.BaseDatabaseManager
import graft.store.LakeTable
import graft.types.DbTypeMap

/** Source-DB vs lake-table schema validation + comment sync — the five
  * checks of `/root/reference/src/schema_validate.py:37-203`, as pure
  * functions over (source metadata, table schema) so each is unit
  * testable without a database. `validateAll` wires them to a
  * DatabaseManager and a LakeTable; comments are persisted as table
  * properties (`comment` / `comment.col.<name>`), the store's analog of
  * ALTER … COMMENT DDL.
  */
object SchemaValidate {

  /** Meta columns the engine itself adds — excluded from comparison
    * (`schema_validate.py:22`). */
  val MetaColumns: Set[String] = Set("last_applied_date", "id_iceberg")

  case class Finding(check: String, message: String)

  private def dataCols(schema: StructType): Seq[String] =
    schema.fields.map(_.name).filterNot(MetaColumns).toSeq

  /** Column count, unreflected columns, order, and type equality
    * (`schema_validate.py:37-84`). */
  def compareColumns(
      sourceSchema: Seq[(String, String)],
      tableSchema: StructType,
      dbType: String): Seq[Finding] = {
    val findings = Seq.newBuilder[Finding]
    val sourceCols = sourceSchema.map(_._1)
    val lakeCols = dataCols(tableSchema)

    if (sourceCols.length != lakeCols.length)
      findings += Finding("column_count",
        s"Column count mismatch: source=${sourceCols.length}, table=${lakeCols.length}")

    val lakeSet = lakeCols.map(_.toLowerCase).toSet
    val unreflected = sourceCols.filterNot(c => lakeSet(c.toLowerCase))
    if (unreflected.nonEmpty)
      findings += Finding("unreflected",
        s"Unreflected columns (in source but not in table): ${unreflected.mkString(", ")}")

    val srcSet = sourceCols.map(_.toLowerCase).toSet
    val matchedSource = sourceCols.filter(c => lakeSet(c.toLowerCase)).map(_.toLowerCase)
    val matchedLake = lakeCols.filter(c => srcSet(c.toLowerCase)).map(_.toLowerCase)
    if (matchedSource != matchedLake)
      findings += Finding("column_order", "Column order mismatch")

    val lakeByName = tableSchema.fields
      .filterNot(f => MetaColumns(f.name)).map(f => f.name.toLowerCase -> f).toMap
    for ((colName, sourceType) <- sourceSchema;
         field <- lakeByName.get(colName.toLowerCase)) {
      val expected = DbTypeMap.convertDbTypeToSpark(sourceType, dbType)
      if (expected.getClass != field.dataType.getClass)
        findings += Finding("type",
          s"Type mismatch for '$colName': source=$sourceType -> " +
            s"expected=$expected, actual=${field.dataType}")
    }
    findings.result()
  }

  /** Nullable parity (`schema_validate.py:117-144`). */
  def compareNullable(
      sourceNullable: Map[String, Boolean],
      tableSchema: StructType): Seq[Finding] = {
    val lakeByName = tableSchema.fields
      .filterNot(f => MetaColumns(f.name)).map(f => f.name.toLowerCase -> f).toMap
    val mismatches = for {
      (colName, isNullable) <- sourceNullable.toSeq.sortBy(_._1)
      field <- lakeByName.get(colName.toLowerCase)
      if field.nullable != isNullable
    } yield s"$colName(source=$isNullable, table=${field.nullable})"
    if (mismatches.isEmpty) Nil
    else Seq(Finding("nullable", s"Nullable mismatches: ${mismatches.mkString(", ")}"))
  }

  /** Source PK vs synthetic id_iceberg presence
    * (`schema_validate.py:147-170`). */
  def comparePrimaryKeys(
      sourcePks: Seq[String],
      tableSchema: StructType): Seq[Finding] = {
    val hasIdIceberg = tableSchema.fieldNames.contains("id_iceberg")
    if (sourcePks.nonEmpty && !hasIdIceberg)
      Seq(Finding("primary_key",
        s"Source has PK ${sourcePks.mkString(",")} but table has no id_iceberg column"))
    else if (sourcePks.isEmpty && hasIdIceberg)
      Seq(Finding("primary_key", "Source has no PK but table has id_iceberg column"))
    else Nil
  }

  /** Which column comments need syncing: present in source, column exists,
    * and differs from the current value (`schema_validate.py:87-114`). */
  def columnCommentSyncPlan(
      sourceComments: Map[String, String],
      tableSchema: StructType,
      currentComments: Map[String, String]): Seq[(String, String)] = {
    val lakeCols = tableSchema.fieldNames.map(c => c.toLowerCase -> c).toMap
    sourceComments.toSeq.sortBy(_._1).flatMap { case (colName, comment) =>
      if (comment == null || comment.isEmpty) None
      else lakeCols.get(colName.toLowerCase).flatMap { actual =>
        if (currentComments.getOrElse(actual, "") == comment) None
        else Some(actual -> comment)
      }
    }
  }

  // ------------------------------------------------------------------
  // wired form
  // ------------------------------------------------------------------

  def columnCommentsOf(table: LakeTable): Map[String, String] =
    table.properties.collect {
      case (k, v) if k.startsWith("comment.col.") => k.stripPrefix("comment.col.") -> v
    }

  /** Run all five checks + comment sync for one table; returns findings
    * (empty = clean). Comment updates are committed to the table's
    * properties. */
  def validateAll(
      manager: BaseDatabaseManager,
      sourceTable: String,
      table: LakeTable): Seq[Finding] = {
    val schema = table.schema
    val sourceSchema = manager.schemaOf(sourceTable)

    val findings =
      compareColumns(sourceSchema, schema, manager.settings.dbType) ++
        compareNullable(manager.nullableInfo(sourceTable), schema) ++
        comparePrimaryKeys(manager.primaryKey(sourceTable), schema)

    // column comment sync
    val plan = columnCommentSyncPlan(
      manager.columnComments(sourceTable), schema, columnCommentsOf(table))
    if (plan.nonEmpty)
      table.setProperties(plan.map { case (c, v) => s"comment.col.$c" -> v }.toMap)

    // table comment sync (skip when unchanged, schema_validate.py:173-203)
    manager.tableComment(sourceTable).foreach { comment =>
      if (!table.properties.get("comment").contains(comment))
        table.setProperties(Map("comment" -> comment))
    }

    findings
  }
}
