package graft.ingest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** JSON schema DSL ⇄ Spark `StructType` codec.
  *
  * Mirrors the reference's data-source schema DSL (the `schema` field
  * of a data-source definition): type enum at
  * `lib/src/data_source/schema.rs:12-46`, `to_arrow_data_type` at
  * `schema.rs:49-148`, reverse mapping at `schema.rs:150-238`, field
  * shape `{name, dataType, nullable}` at `schema.rs:386-410`.
  *
  * Arrow types with no Spark equivalent follow the documented
  * widening rules (SURVEY.md §1.2):
  *   - UInt8/16/32 widen to the next signed size; UInt64 → Decimal(20,0)
  *   - Float16 → Float
  *   - Decimal256 precision capped at 38 (error above)
  *   - Time32/Time64 → Long (micros since midnight)
  *   - Timestamp collapses to µs; tz=None → TimestampNTZ
  *   - Duration / Interval(DayTime) → DayTimeInterval,
  *     Interval(YearMonth) → YearMonthInterval
  */
object SchemaDsl {

  private val mapper = new ObjectMapper()

  final case class SchemaDslException(msg: String) extends RuntimeException(msg)

  /** Parse `[{"name":…,"dataType":…,"nullable":…}, …]` (or
    * `{"fields":[…]}`) into a StructType.
    */
  def fromJson(json: String): StructType = {
    val root = mapper.readTree(json)
    val fields = root match {
      case a: ArrayNode => a
      case o: ObjectNode if o.has("fields") => o.get("fields")
      case _ => throw SchemaDslException(s"schema must be a field array: $json")
    }
    StructType(fields.elements().asScala.map(parseField).toSeq)
  }

  private def parseField(f: JsonNode): StructField = {
    val name = Option(f.get("name")).map(_.asText())
      .getOrElse(throw SchemaDslException(s"field missing name: $f"))
    val nullable = Option(f.get("nullable")).forall(_.asBoolean(true))
    StructField(name, parseType(f), nullable)
  }

  /** dataType may be a bare string ("Int64") or the field node itself
    * carries parameters (precision/scale/unit/timeZone/fields/…).
    */
  private def parseType(f: JsonNode): DataType = {
    val tn = Option(f.get("dataType")).map(_.asText())
      .getOrElse(throw SchemaDslException(s"field missing dataType: $f"))
    parseTypeName(tn, f)
  }

  private def parseTypeName(tn: String, f: JsonNode): DataType = tn match {
    case "Boolean" => BooleanType
    case "Int8" => ByteType
    case "Int16" => ShortType
    case "Int32" => IntegerType
    case "Int64" | "Integer" | "Int" => LongType
    // unsigned: widen to preserve the value range (schema.rs:56-59)
    case "UInt8" => ShortType
    case "UInt16" => IntegerType
    case "UInt32" => LongType
    case "UInt64" => DecimalType(20, 0)
    case "Float16" | "Float32" => FloatType
    case "Float64" | "Float" => DoubleType
    case "Decimal128" | "Decimal256" | "Decimal" =>
      val p = Option(f.get("precision")).map(_.asInt()).getOrElse(38)
      val s = Option(f.get("scale")).map(_.asInt()).getOrElse(0)
      if (p > 38) throw SchemaDslException(
        s"precision $p exceeds Spark's max 38 (Decimal256 divergence)")
      DecimalType(p, s)
    case "Timestamp" =>
      // unit collapses to µs; absent tz ⇒ NTZ (SURVEY §1.2)
      if (f.hasNonNull("timeZone")) TimestampType else TimestampNTZType
    case "Date32" | "Date64" | "Date" => DateType
    case "Time32" | "Time64" | "Time" => LongType // micros since midnight
    case "Duration" => DayTimeIntervalType()
    case "Interval" =>
      Option(f.get("intervalUnit")).map(_.asText()).getOrElse("DayTime") match {
        case "YearMonth" => YearMonthIntervalType()
        case _ => DayTimeIntervalType()
      }
    case "String" | "Utf8" | "LargeUtf8" => StringType
    case "List" | "LargeList" =>
      val item = Option(f.get("item"))
        .map(n => if (n.isTextual) parseTypeName(n.asText(), f) else parseType(n))
        .getOrElse(throw SchemaDslException(s"List missing item: $f"))
      ArrayType(item, containsNull = true)
    case "Map" =>
      val k = Option(f.get("key"))
        .map(n => if (n.isTextual) parseTypeName(n.asText(), f) else parseType(n))
        .getOrElse(StringType)
      val v = Option(f.get("value"))
        .map(n => if (n.isTextual) parseTypeName(n.asText(), f) else parseType(n))
        .getOrElse(StringType)
      MapType(k, v, valueContainsNull = true)
    case "Struct" =>
      val fs = Option(f.get("fields"))
        .getOrElse(throw SchemaDslException(s"Struct missing fields: $f"))
      // nested fields forced nullable (schema.rs:118)
      StructType(fs.elements().asScala.map(parseField).map(_.copy(nullable = true)).toSeq)
    case "Binary" | "LargeBinary" | "Unknown" => BinaryType
    case "Dictionary" => StringType // encoding, not a logical type
    case other => throw SchemaDslException(s"unsupported dataType: $other")
  }

  /** Render a StructType back to the DSL (the "describe table"
    * direction, `schema.rs:150-238`). Lossy exactly where the forward
    * direction widens.
    */
  def toJson(schema: StructType): String = {
    val arr = mapper.createArrayNode()
    schema.fields.foreach(f => arr.add(fieldToNode(f)))
    mapper.writeValueAsString(arr)
  }

  private def fieldToNode(f: StructField): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("name", f.name)
    writeType(n, f.dataType)
    n.put("nullable", f.nullable)
    n
  }

  private def writeType(n: ObjectNode, dt: DataType): Unit = dt match {
    case BooleanType => n.put("dataType", "Boolean"): Unit
    case ByteType => n.put("dataType", "Int8"): Unit
    case ShortType => n.put("dataType", "Int16"): Unit
    case IntegerType => n.put("dataType", "Int32"): Unit
    case LongType => n.put("dataType", "Int64"): Unit
    case FloatType => n.put("dataType", "Float32"): Unit
    case DoubleType => n.put("dataType", "Float64"): Unit
    case d: DecimalType =>
      n.put("dataType", "Decimal128")
      n.put("precision", d.precision)
      n.put("scale", d.scale): Unit
    case TimestampType =>
      n.put("dataType", "Timestamp")
      n.put("unit", "Microsecond")
      n.put("timeZone", "UTC"): Unit
    case TimestampNTZType =>
      n.put("dataType", "Timestamp")
      n.put("unit", "Microsecond"): Unit
    case DateType => n.put("dataType", "Date32"): Unit
    case _: DayTimeIntervalType => n.put("dataType", "Duration"): Unit
    case _: YearMonthIntervalType =>
      n.put("dataType", "Interval")
      n.put("intervalUnit", "YearMonth"): Unit
    case StringType => n.put("dataType", "String"): Unit
    case BinaryType => n.put("dataType", "Binary"): Unit
    case ArrayType(et, _) =>
      n.put("dataType", "List")
      val item = mapper.createObjectNode()
      item.put("name", "item")
      writeType(item, et)
      item.put("nullable", true)
      n.set[com.fasterxml.jackson.databind.JsonNode]("item", item)
    case MapType(kt, vt, _) =>
      n.put("dataType", "Map")
      val k = mapper.createObjectNode(); writeType(k, kt)
      val v = mapper.createObjectNode(); writeType(v, vt)
      n.set[com.fasterxml.jackson.databind.JsonNode]("key", k)
      n.set[com.fasterxml.jackson.databind.JsonNode]("value", v)
    case st: StructType =>
      n.put("dataType", "Struct")
      val fs = mapper.createArrayNode()
      st.fields.foreach(f => fs.add(fieldToNode(f)))
      n.set[com.fasterxml.jackson.databind.JsonNode]("fields", fs)
    case other =>
      n.put("dataType", other.sql): Unit
  }
}
