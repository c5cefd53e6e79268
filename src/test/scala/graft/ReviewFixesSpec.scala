package graft

import graft.ingest.DeltaReader
import graft.sqlcompat.SqlRewrite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

class ReviewFixesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("DISTINCT ON keeps LIMIT outside the window and restores order") {
    val out = SqlRewrite.rewrite(
      "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v DESC LIMIT 5")
    assert(out.contains("OVER (PARTITION BY k ORDER BY k, v DESC)"), out)
    assert(out.endsWith("ORDER BY __graft_o0, __graft_o1 DESC LIMIT 5"), out)
    // executable end-to-end
    import spark.implicits._
    Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v").createOrReplaceTempView("t")
    val rows = spark.sql(SqlRewrite.rewrite(
      "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v DESC LIMIT 1"))
      .collect()
    assert(rows.toSeq.map(r => (r.getInt(0), r.getInt(1))) == Seq((1, 20)))
  }

  test("delta replay seeds from a checkpoint when early commits are gone") {
    val dir = Files.createTempDirectory("graft-delta").toString
    val logDir = s"$dir/_delta_log"
    Files.createDirectories(Paths.get(logDir))
    import spark.implicits._
    // data files
    Seq(1L, 2L).toDF("data").coalesce(1).write.parquet(s"$dir/part-f0")
    Seq(3L, 4L).toDF("data").coalesce(1).write.parquet(s"$dir/part-f1")
    Seq(5L).toDF("data").coalesce(1).write.parquet(s"$dir/part-f2")
    def onePart(d: String): String = {
      val f = new java.io.File(s"$dir/$d").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val tgt = s"$d.parquet"
      Files.move(f.toPath, Paths.get(s"$dir/$tgt"))
      tgt
    }
    val (f0, f1, f2) = (onePart("part-f0"), onePart("part-f1"), onePart("part-f2"))
    val schemaString =
      """{"type":"struct","fields":[{"name":"data","type":"long","nullable":true,"metadata":{}}]}"""
    // checkpoint at version 1 holds metaData + adds for f0, f1
    val cpSchema = StructType(Seq(
      StructField("metaData", StructType(Seq(
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType))))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType))))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType))))))
    val cpRows = java.util.Arrays.asList(
      Row(Row(schemaString, Seq.empty[String]), null, null),
      Row(null, Row(f0, Map.empty[String, String]), null),
      Row(null, Row(f1, Map.empty[String, String]), null))
    val cpDir = Files.createTempDirectory("graft-cp").toString
    spark.createDataFrame(cpRows, cpSchema).coalesce(1)
      .write.mode("overwrite").parquet(cpDir)
    val cpFile = new java.io.File(cpDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(cpFile.toPath,
      Paths.get(s"$logDir/00000000000000000001.checkpoint.parquet"))
    Files.writeString(Paths.get(s"$logDir/_last_checkpoint"),
      """{"version":1,"size":3}""")
    // version 2 json commit: remove f0, add f2  (v0/v1 jsons were vacuumed)
    Files.writeString(Paths.get(s"$logDir/00000000000000000002.json"),
      s"""{"remove":{"path":"$f0","dataChange":true}}
         |{"add":{"path":"$f2","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    // latest = checkpoint state + v2
    val latest = DeltaReader.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(latest == Seq(3L, 4L, 5L), s"got $latest")
    // time travel to the checkpoint version itself
    val v1 = DeltaReader.read(spark, dir, Some(1L)).collect().map(_.getLong(0)).sorted.toSeq
    assert(v1 == Seq(1L, 2L, 3L, 4L), s"got $v1")
  }

  test("upload over the size cap is rejected without buffering") {
    val server = new graft.serve.GraftServer(spark)
    server.uploadLimitBytes = 1024
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String, ct: String) =
        client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
          .header("Content-Type", ct)
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      post("/session?id=cap", "", "application/json")
      val b = "B"
      val big = s"--$b\r\n" +
        "Content-Disposition: form-data; name=\"t\"; filename=\"t.csv\"\r\n\r\n" +
        ("x," * 2000) + s"\r\n--$b--\r\n"
      val r = post("/session/cap/datasource/upload", big, s"multipart/form-data; boundary=$b")
      assert(r.statusCode() == 400, r.body())
      assert(r.body().contains("exceeds limit"))
    } finally server.stop()
  }

  test("session removal deletes its spool directory and caches") {
    val mgr = new graft.engine.SessionManager(spark)
    try {
      val h = mgr.create(Some("spool"))
      val df = graft.ingest.Readers.csvBytes(h.spark, "a\n1\n".getBytes,
        graft.ingest.IngestOptions(spoolDir = Some(h.spoolDir)))
      mgr.registerTable(h, df, graft.engine.DataSourceDef("t", "csv", None, None))
      assert(Files.list(h.spoolDir).count() > 0)
      val spoolPath = h.spoolDir
      mgr.remove("spool")
      assert(!Files.exists(spoolPath), "spool dir must be deleted with the session")
    } finally mgr.shutdown()
  }

  test("session id with quotes is JSON-escaped in responses") {
    val server = new graft.serve.GraftServer(spark)
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      val client = HttpClient.newHttpClient()
      val r = client.send(HttpRequest.newBuilder(
          URI.create(s"""$base/session?id=x%22%2C%22admin%22%3Atrue"""))
        .POST(HttpRequest.BodyPublishers.ofString("")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
      // must parse as JSON with the id intact, no injected field
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.body())
      assert(n.get("id").asText() == """x","admin":true""")
      assert(n.get("admin") == null)
    } finally server.stop()
  }
}
