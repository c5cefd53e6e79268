package graft

import graft.serve.ResponseEncoders
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream

class EncodersSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def df = {
    import spark.implicits._
    Seq((1L, "a,b", 1.5), (2L, "plain", 2.5), (3L, "q\"uote", Double.NaN))
      .toDF("id", "s", "x")
  }

  test("json array encoding") {
    val json = new String(ResponseEncoders.encodeToBytes(
      df.filter("id < 3"), ResponseEncoders.JsonFormat))
    assert(json == """[{"id":1,"s":"a,b","x":1.5},{"id":2,"s":"plain","x":2.5}]""")
  }

  test("json renders timestamps ISO-8601 and arrays/structs nested") {
    import spark.implicits._
    val d = Seq(1).toDF("i").selectExpr(
      "TIMESTAMP_NTZ '2024-03-01 12:30:45' AS t",
      "array(1,2) AS xs", "named_struct('k', 7) AS st", "CAST(NULL AS STRING) AS n")
    val json = new String(ResponseEncoders.encodeToBytes(d, ResponseEncoders.JsonFormat))
    assert(json == """[{"t":"2024-03-01T12:30:45","xs":[1,2],"st":{"k":7},"n":null}]""")
  }

  test("csv encoding quotes per RFC-4180") {
    val csv = new String(ResponseEncoders.encodeToBytes(df, ResponseEncoders.CsvFormat))
    val lines = csv.split("\n").toSeq
    assert(lines.head == "id,s,x")
    assert(lines(1) == "1,\"a,b\",1.5")
    assert(lines(2) == "2,plain,2.5")
    assert(lines(3) == "3,\"q\"\"uote\",NaN")
  }

  test("arrow ipc stream round-trips through Arrow Java reader") {
    val bytes = ResponseEncoders.encodeToBytes(df, ResponseEncoders.ArrowFormat)
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() == 3)
      var rows = 0L
      while (reader.loadNextBatch()) rows += root.getRowCount
      assert(rows == 3)
    } finally { reader.close(); alloc.close() }
  }

  test("arrow ipc ingest round-trips a frame losslessly (write -> readIpcBytes)") {
    import spark.implicits._
    val src = Seq((1L, "a", 1.5, Seq(1, 2)), (2L, "b", Double.NaN, Seq.empty[Int]))
      .toDF("id", "s", "x", "xs")
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.spark.sql.graftbridge.ArrowBridge.writeIpcStream(src, out, batchRows = 1)
      out.toByteArray
    }
    val back = graft.ingest.Readers.arrowBytes(spark, bytes)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s", "x", "xs"))
    val rows = back.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "a" &&
      rows(0).getSeq[Int](3) == Seq(1, 2))
    assert(rows(1).getDouble(2).isNaN)
  }

  test("arrow ipc FILE framing (ARROW1 magic) ingests too") {
    import spark.implicits._
    val src = Seq((10, "x"), (20, "y")).toDF("v", "s")
    // produce file-format bytes with Arrow Java directly
    val alloc = new RootAllocator()
    val streamBytes = {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.spark.sql.graftbridge.ArrowBridge.writeIpcStream(src, out)
      out.toByteArray
    }
    val reader = new ArrowStreamReader(new ByteArrayInputStream(streamBytes), alloc)
    val fileBytes = try {
      val root = reader.getVectorSchemaRoot
      val out = new java.io.ByteArrayOutputStream()
      val ch = java.nio.channels.Channels.newChannel(out)
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
      w.start()
      while (reader.loadNextBatch()) w.writeBatch()
      w.end(); w.close()
      out.toByteArray
    } finally { reader.close(); alloc.close() }
    assert(fileBytes.startsWith("ARROW1".getBytes("US-ASCII")))
    val back = graft.ingest.Readers.arrowBytes(spark, fileBytes)
    assert(back.orderBy("v").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((10, "x"), (20, "y")))
  }

  test("arrow ipc of empty result still carries schema") {
    val bytes = ResponseEncoders.encodeToBytes(df.filter("id < 0"), ResponseEncoders.ArrowFormat)
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      assert(reader.getVectorSchemaRoot.getSchema.getFields.size() == 3)
      var rows = 0L
      while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
      assert(rows == 0)
    } finally { reader.close(); alloc.close() }
  }

  test("format negotiation: body format wins, then Accept, default json") {
    import ResponseEncoders._
    assert(negotiate(Some("csv"), Some("application/vnd.apache.arrow.stream")) == CsvFormat)
    assert(negotiate(None, Some("application/vnd.apache.arrow.stream")) == ArrowFormat)
    assert(negotiate(None, Some("text/csv")) == CsvFormat)
    assert(negotiate(None, None) == JsonFormat)
  }
}
