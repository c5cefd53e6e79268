package graft

import graft.ingest.SchemaDsl
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaDslSpec extends AnyFunSuite {

  test("basic scalar types parse") {
    val s = SchemaDsl.fromJson(
      """[{"name":"a","dataType":"Int64"},
         {"name":"b","dataType":"String","nullable":false},
         {"name":"c","dataType":"Float64"},
         {"name":"d","dataType":"Boolean"}]""")
    assert(s == StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", StringType, nullable = false),
      StructField("c", DoubleType, nullable = true),
      StructField("d", BooleanType, nullable = true))))
  }

  test("unsigned ints widen to preserve range") {
    val s = SchemaDsl.fromJson(
      """[{"name":"u8","dataType":"UInt8"},{"name":"u16","dataType":"UInt16"},
         {"name":"u32","dataType":"UInt32"},{"name":"u64","dataType":"UInt64"}]""")
    assert(s.fields.map(_.dataType).toSeq ==
      Seq(ShortType, IntegerType, LongType, DecimalType(20, 0)))
  }

  test("decimal precision over 38 rejected (Decimal256 divergence)") {
    val e = intercept[SchemaDsl.SchemaDslException](
      SchemaDsl.fromJson("""[{"name":"d","dataType":"Decimal256","precision":76,"scale":10}]"""))
    assert(e.msg.contains("38"))
  }

  test("timestamp tz presence selects TZ vs NTZ") {
    val s = SchemaDsl.fromJson(
      """[{"name":"t1","dataType":"Timestamp","unit":"Nanosecond","timeZone":"UTC"},
         {"name":"t2","dataType":"Timestamp","unit":"Millisecond"}]""")
    assert(s("t1").dataType == TimestampType)
    assert(s("t2").dataType == TimestampNTZType)
  }

  test("nested list/map/struct") {
    val s = SchemaDsl.fromJson(
      """[{"name":"xs","dataType":"List","item":"Int32"},
         {"name":"m","dataType":"Map","key":"String","value":"Int64"},
         {"name":"st","dataType":"Struct","fields":[
            {"name":"x","dataType":"Int32","nullable":false},
            {"name":"y","dataType":"String"}]}]""")
    assert(s("xs").dataType == ArrayType(IntegerType, containsNull = true))
    assert(s("m").dataType == MapType(StringType, LongType, valueContainsNull = true))
    // nested struct fields forced nullable (schema.rs:118)
    assert(s("st").dataType == StructType(Seq(
      StructField("x", IntegerType, nullable = true),
      StructField("y", StringType, nullable = true))))
  }

  test("round-trip: StructType -> json -> StructType is stable") {
    val orig = StructType(Seq(
      StructField("a", LongType),
      StructField("b", StringType, nullable = false),
      StructField("c", DecimalType(12, 3)),
      StructField("d", ArrayType(DoubleType, containsNull = true)),
      StructField("e", StructType(Seq(StructField("x", IntegerType)))),
      StructField("f", MapType(StringType, LongType)),
      StructField("g", DateType),
      StructField("h", TimestampType),
      StructField("i", TimestampNTZType),
      StructField("j", BinaryType)))
    val back = SchemaDsl.fromJson(SchemaDsl.toJson(orig))
    assert(back == orig)
  }

  test("unknown type rejected") {
    intercept[SchemaDsl.SchemaDslException](
      SchemaDsl.fromJson("""[{"name":"x","dataType":"Frobnicate"}]"""))
  }
}
