package graft

import graft.ingest.{IngestOptions, Readers}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

class ReadersSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("csv bytes with header + inference") {
    val df = Readers.csvBytes(spark,
      "a,b,c\n1,x,2.5\n2,y,3.5\n".getBytes(StandardCharsets.UTF_8))
    assert(df.schema.map(_.dataType) == Seq(IntegerType, StringType, DoubleType))
    assert(df.count() == 2)
  }

  test("csv row-limited inference pins schema from sample") {
    // value in row 3 would widen column a to string; inferSchemaRows=2
    // pins int from the sample — later rows that don't parse become null
    // (Spark PERMISSIVE mode), matching "infer over first N" semantics.
    val bytes = "a\n1\n2\noops\n".getBytes(StandardCharsets.UTF_8)
    val df = Readers.csvBytes(spark, bytes, IngestOptions(inferSchemaRows = 2))
    assert(df.schema.head.dataType == IntegerType)
    assert(df.count() == 3)
  }

  test("csv custom delimiter, no header") {
    val df = Readers.csvBytes(spark, "1|x\n2|y\n".getBytes(StandardCharsets.UTF_8),
      IngestOptions(hasHeader = false, delimiter = '|'))
    assert(df.columns.length == 2)
    assert(df.count() == 2)
  }

  test("json document (top-level array) decodes nested structs") {
    val df = Readers.jsonDocument(spark,
      """[{"id":1,"tags":["a","b"],"meta":{"x":1}},
          {"id":2,"tags":[],"meta":{"x":2}}]""")
    assert(df.count() == 2)
    assert(df.schema("tags").dataType.isInstanceOf[ArrayType])
    assert(df.schema("meta").dataType.isInstanceOf[StructType])
  }

  test("json document with jsonPath slice") {
    val df = Readers.jsonDocument(spark,
      """{"data":{"rows":[{"v":1},{"v":2},{"v":3}]}}""",
      IngestOptions(jsonPath = Some("$.data.rows[*]")))
    assert(df.count() == 3)
    assert(df.select("v").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("json document requireNormalize: positional arrays to named columns") {
    val df = Readers.jsonDocument(spark,
      """[["name","age"],["alice","30"],["bob","40"]]""",
      IngestOptions(requireNormalize = true))
    assert(df.columns.toSeq == Seq("age", "name") || df.columns.toSeq == Seq("name", "age"))
    assert(df.count() == 2)
  }

  test("ndjson bytes") {
    val df = Readers.ndJsonBytes(spark,
      "{\"a\":1}\n{\"a\":2}\n".getBytes(StandardCharsets.UTF_8))
    assert(df.count() == 2)
  }

  test("explicit schema DSL overrides inference") {
    val schema = graft.ingest.SchemaDsl.fromJson(
      """[{"name":"a","dataType":"Int64"},{"name":"b","dataType":"String"}]""")
    val df = Readers.csvBytes(spark, "a,b\n1,x\n".getBytes(StandardCharsets.UTF_8),
      IngestOptions(schema = Some(schema)))
    assert(df.schema("a").dataType == LongType)
  }

  test("format sniffing: content-type wins, extension fallback") {
    assert(Readers.sniffFormat(Some("text/csv"), Some("x.parquet")).contains("csv"))
    assert(Readers.sniffFormat(None, Some("x.parquet")).contains("parquet"))
    assert(Readers.sniffFormat(Some("application/octet-stream"), Some("d.jsonl")).contains("ndJson"))
    assert(Readers.sniffFormat(None, Some("noext")).isEmpty)
  }
}
