package graft.cdc

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Debezium Avro schema introspection.
  *
  * `extract` walks a Debezium Envelope schema (JSON) to a
  * `{column → connector-type}` map, mirroring
  * `/root/reference/src/utils/cdc_pipeline.py:30-75`:
  *  - locate the `before`/`after` field whose union type carries the
  *    record definition (the `after` branch references it by name, so the
  *    record literal is found on `before`)
  *  - per column, unwrap `["null", T]` unions to the first non-null branch
  *  - prefer the `connect.name` annotation over the raw Avro `type`
  *
  * `keyColumns` lists the key-schema field names in declared order
  * (`cdc_pipeline.py:293-294`) — the composite-PK column order feeding
  * the `id_iceberg` hash, where order is part of the identity.
  */
object DebeziumSchema {

  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** `{column name → Debezium connector type}` from an Envelope schema. */
  def extract(envelopeJson: String): Map[String, String] =
    extract(parse(envelopeJson))

  def extract(schema: JsonNode): Map[String, String] = {
    val envelopeFields = fields(schema)

    // find the embedded Value record on the before/after union
    val valueSchema: Option[JsonNode] = envelopeFields.iterator
      .filter(f => {
        val n = f.path("name").asText("")
        n == "before" || n == "after"
      })
      .flatMap { f =>
        val t = f.path("type")
        if (t.isArray) t.asScala.find(td => td.isObject && td.has("fields"))
        else None
      }
      .take(1)
      .toList
      .headOption

    valueSchema match {
      case None => Map.empty
      case Some(vs) =>
        fields(vs).flatMap { colField =>
          val colName = colField.path("name").asText("")
          if (colName.isEmpty) None
          else
            actualTypeDef(colField.path("type")).flatMap { td =>
              val dbzType =
                if (td.isObject)
                  Option(td.get("connect.name")).map(_.asText())
                    .orElse(Option(td.get("type")).map(_.asText()))
                else if (td.isTextual) Some(td.asText())
                else None
              dbzType.map(colName -> _)
            }
        }.toMap
    }
  }

  /** Key-schema field names, in declared (PK) order. */
  def keyColumns(keySchemaJson: String): Seq[String] =
    fields(parse(keySchemaJson)).map(_.path("name").asText())

  /** First non-"null" branch of a union, or the type itself. */
  private def actualTypeDef(typeInfo: JsonNode): Option[JsonNode] =
    if (typeInfo.isArray)
      typeInfo.asScala.find(item => !(item.isTextual && item.asText() == "null"))
    else if (typeInfo.isMissingNode || typeInfo.isNull) None
    else Some(typeInfo)

  private def fields(node: JsonNode): Seq[JsonNode] = {
    val f = node.path("fields")
    if (f.isArray) f.asScala.toSeq else Seq.empty
  }
}
