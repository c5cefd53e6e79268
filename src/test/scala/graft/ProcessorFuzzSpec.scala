package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.serve.GraftServer

/** Generated-scenario fuzz of the REST processor surfaces, the
  * IndexLifecycleFuzzSpec treatment for the merge- and
  * post-processor doors: random merge chains (direction mixes,
  * colliding columns, removeAfterMerged) and random post-processor
  * chains go through the one-shot HTTP door, and every result is
  * cross-checked against DIRECT DataFrame composition of the same
  * scenario (no JSON parsing, no session registry, no chain state) —
  * so the fuzz pins the HTTP plumbing, not just the kernels.
  */
@org.scalatest.tags.Slow
class ProcessorFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkFixture.spark
  private lazy val server = { val s = new GraftServer(spark); s.start(); s }
  private lazy val base = s"http://127.0.0.1:${server.boundPort}"
  private val client = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  override def afterAll(): Unit = server.stop()

  private def post(path: String, body: String) =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  // ------------------------------------------------------------ helpers

  /** Rows as a sorted multiset of per-row sorted (col, normalized
    * value) lists — order-free comparison with numeric equality (the
    * JSON door renders doubles as decimal text).
    */
  private def canon(rows: Seq[Map[String, Any]]): Seq[Seq[(String, String)]] =
    rows.map(_.toSeq.sortBy(_._1).map { case (k, v) => (k, normalize(v)) })
      .sortBy(_.mkString("|"))

  private def normalize(v: Any): String = v match {
    case null => "null"
    case d: Double => BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    case f: Float => BigDecimal(f.toDouble).bigDecimal.stripTrailingZeros.toPlainString
    case n: java.math.BigDecimal => n.stripTrailingZeros.toPlainString
    case other => other.toString
  }

  private def dfRows(df: DataFrame): Seq[Map[String, Any]] = {
    val cols = df.columns
    df.collect().toSeq.map(r => cols.zipWithIndex.map { case (c, i) =>
      c -> r.get(i) }.toMap)
  }

  private def jsonRows(body: String): Seq[Map[String, Any]] = {
    import scala.jdk.CollectionConverters._
    mapper.readTree(body).elements().asScala.toSeq.map { row =>
      row.properties().asScala.map { e =>
        val v = e.getValue
        val a: Any =
          if (v.isNull) null
          else if (v.isIntegralNumber) v.asLong()
          else if (v.isNumber) new java.math.BigDecimal(v.asText())
          else v.asText()
        e.getKey -> a
      }.toMap
    }
  }

  private def assertSameRows(restBody: String, expected: DataFrame,
      clue: String): Unit = {
    val got = canon(jsonRows(restBody))
    val want = canon(dfRows(expected))
    assert(got == want, s"$clue\nrest=$got\nexpected=$want")
  }

  /** Inline-JSON datasource node from local rows. */
  private def dsNode(name: String, rows: Seq[Map[String, Any]]): ObjectNode = {
    val arr = mapper.createArrayNode()
    rows.foreach { r =>
      val o = mapper.createObjectNode()
      r.foreach {
        case (k, v: Long) => o.put(k, v)
        case (k, v: String) => o.put(k, v)
        case (k, v) => o.put(k, v.toString)
      }
      arr.add(o): Unit
    }
    val ds = mapper.createObjectNode()
    ds.put("format", "json")
    ds.put("name", name)
    ds.put("data", mapper.writeValueAsString(arr))
    ds
  }

  private def localDf(rows: Seq[Map[String, Any]], cols: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    // build via JSON so column types match the REST door's json ingest
    val json = rows.map { r =>
      val o = mapper.createObjectNode()
      r.foreach {
        case (k, v: Long) => o.put(k, v)
        case (k, v: String) => o.put(k, v)
        case (k, v) => o.put(k, v.toString)
      }
      mapper.writeValueAsString(o)
    }
    import spark.implicits._
    spark.read.json(json.toDS).select(cols.map(col): _*)
  }

  // ------------------------------------------------------------ merge fuzz

  test("fuzz: generated merge-processor chains match direct composition") {
    val rnd = new scala.util.Random(0x5eed9003L)
    for (trial <- 1 to 30) {
      val nBase = 4 + rnd.nextInt(8)
      val baseCols = Seq("id", "k", "v", "s")
      val baseRows: Seq[Map[String, Any]] = (0 until nBase).map(i => Map(
        "id" -> i.toLong, "k" -> rnd.nextInt(3).toLong,
        "v" -> rnd.nextInt(50).toLong, "s" -> s"s${rnd.nextInt(3)}"))

      val nRowTargets = rnd.nextInt(3) // 0..2, merged first (schema must equal base's)
      val rowTargets = (1 to nRowTargets).map { j =>
        val rows: Seq[Map[String, Any]] = (0 until 2 + rnd.nextInt(4)).map(i => Map(
          "id" -> (100L * j + i), "k" -> rnd.nextInt(3).toLong,
          "v" -> rnd.nextInt(50).toLong, "s" -> s"s${rnd.nextInt(3)}"))
        (s"r$j", rows)
      }
      // duplicate a base row sometimes so distinct=true actually bites
      val rowTargetsFinal = rowTargets.map { case (n, rows) =>
        if (rnd.nextBoolean() && rows.nonEmpty) (n, rows :+ baseRows.head) else (n, rows)
      }
      val nColTargets = rnd.nextInt(3) // 0..2
      val colTargets = (1 to nColTargets).map { j =>
        // "v" collides with the base on purpose; w-name collides with
        // an earlier target half the time
        val wName = if (j > 1 && rnd.nextBoolean()) "w1" else s"w$j"
        val rows: Seq[Map[String, Any]] = (0 until 3).map(i => Map(
          "tk" -> i.toLong, "v" -> (1000L * j + i), wName -> rnd.nextInt(9).toLong))
        (s"c$j", rows, Seq("tk", "v", wName))
      }

      // request: row merges (union into base) then column merges
      val processors = mapper.createArrayNode()
      val distinct = rnd.nextBoolean()
      if (rowTargetsFinal.nonEmpty) {
        val m = mapper.createObjectNode()
        m.put("direction", "row"); m.put("baseTable", "base")
        val tt = m.putArray("targetTables")
        rowTargetsFinal.foreach(t => tt.add(t._1): Unit)
        m.putObject("options").put("distinct", distinct)
        processors.add(m): Unit
      }
      colTargets.foreach { case (name, _, _) =>
        val m = mapper.createObjectNode()
        m.put("direction", "column"); m.put("baseTable", "base")
        val t = m.putArray("targets").addObject()
        t.put("table", name)
        t.putArray("baseKeys").add("k")
        t.putArray("targetKeys").add("tk")
        if (rnd.nextBoolean())
          m.putObject("options").put("removeAfterMerged", true)
        processors.add(m): Unit
      }

      val req = mapper.createObjectNode()
      val dss = req.putArray("dataSources")
      dss.add(dsNode("base", baseRows))
      rowTargetsFinal.foreach(t => dss.add(dsNode(t._1, t._2)): Unit)
      colTargets.foreach(t => dss.add(dsNode(t._1, t._2)): Unit)
      req.set[ArrayNode]("processors", processors)
      req.putObject("query").put("sql", "SELECT * FROM base")

      val r = post("/dataframe/query", mapper.writeValueAsString(req))
      assert(r.statusCode() == 200, s"trial $trial: ${r.body()}")

      // direct composition, same order, no HTTP/session machinery
      var expected = localDf(baseRows, baseCols)
      if (rowTargetsFinal.nonEmpty) {
        expected = graft.ops.MergeProcessor.mergeRows(expected,
          rowTargetsFinal.map(t => localDf(t._2, baseCols)), distinct)
      }
      colTargets.foreach { case (name, rows, cols) =>
        expected = graft.ops.MergeProcessor.mergeColumns(expected, Seq(
          graft.ops.MergeProcessor.ColumnTarget(
            name, localDf(rows, cols), Seq("k"), Seq("tk"))))
      }
      assertSameRows(r.body(), expected, s"merge trial $trial")
    }
  }

  test("removeAfterMerged drops the target for the rest of the request") {
    def req(remove: Boolean): String = {
      val baseRows: Seq[Map[String, Any]] =
        Seq(Map("id" -> 0L, "k" -> 0L), Map("id" -> 1L, "k" -> 1L))
      val tRows: Seq[Map[String, Any]] =
        Seq(Map("tk" -> 0L, "w" -> 7L), Map("tk" -> 1L, "w" -> 8L))
      val r = mapper.createObjectNode()
      val dss = r.putArray("dataSources")
      dss.add(dsNode("base", baseRows)); dss.add(dsNode("t", tRows))
      val m = r.putArray("processors").addObject()
      m.put("direction", "column"); m.put("baseTable", "base")
      val t = m.putArray("targets").addObject()
      t.put("table", "t")
      t.putArray("baseKeys").add("k"); t.putArray("targetKeys").add("tk")
      m.putObject("options").put("removeAfterMerged", remove)
      // the query still references the TARGET table directly
      r.putObject("query").put("sql", "SELECT count(*) AS n FROM t")
      mapper.writeValueAsString(r)
    }
    assert(post("/dataframe/query", req(remove = false)).statusCode() == 200)
    val gone = post("/dataframe/query", req(remove = true))
    assert(gone.statusCode() == 500, gone.body())
  }

  // ------------------------------------------------------------ connector fuzz

  test("fuzz: connector-scheme datasources under generated params + refresh") {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(0x5eed9005L)
    // one registry entry, many generated shapes: authority picks the
    // generator, path carries a multiplier, pluginOptions the row
    // count — exactly the reference's scheme-dispatched plugin shape
    graft.serve.Connectors.register("fuzzgen", (sp, uri, opts, _) => {
      val n = opts.get("rows").map(_.asLong()).getOrElse(1L)
      val mult = uri.getPath.stripPrefix("/").toLong
      uri.getAuthority match {
        case "ints" => sp.range(n).toDF("v").select((col("v") * mult).as("v"))
        case "pairs" => sp.range(n).toDF("v")
          .select(col("v"), (col("v") % mult).as("m"))
        case other => throw new IllegalArgumentException(s"unknown generator $other")
      }
    })
    for (trial <- 1 to 12) {
      val sid = s"connfuzz$trial"
      assert(post(s"/session?id=$sid", "").statusCode() == 200)
      try {
        val kind = if (rnd.nextBoolean()) "ints" else "pairs"
        val rows = 1 + rnd.nextInt(20)
        val mult = 1 + rnd.nextInt(5)
        val r = post(s"/session/$sid/datasource",
          s"""{"format":"arrow","name":"g","location":"fuzzgen://$kind/$mult",
              "pluginOptions":{"rows":$rows}}""")
        assert(r.statusCode() == 200, s"trial $trial: ${r.body()}")
        val q = post(s"/session/$sid/query",
          """{"sql":"SELECT count(*) AS n, sum(v) AS s FROM g"}""")
        assert(q.statusCode() == 200, s"trial $trial: ${q.body()}")
        val node = mapper.readTree(q.body()).elements().asScala.next()
        val expSum = (0L until rows).map(_ * (if (kind == "ints") mult else 1)).sum
        assert(node.get("n").asLong() == rows, s"trial $trial: ${q.body()}")
        assert(node.get("s").asLong() == expSum, s"trial $trial: ${q.body()}")
        // refresh must re-dispatch with the ORIGINAL location+options
        assert(post(s"/session/$sid/datasource/g/refresh", "").statusCode() == 200)
        val q2 = post(s"/session/$sid/query",
          """{"sql":"SELECT count(*) AS n FROM g"}""")
        assert(mapper.readTree(q2.body()).elements().asScala.next()
          .get("n").asLong() == rows, s"trial $trial post-refresh: ${q2.body()}")
        // unknown authority inside the connector -> clean request error,
        // not a wedged session
        val bad = post(s"/session/$sid/datasource",
          s"""{"format":"arrow","name":"bad","location":"fuzzgen://nope/1",
              "pluginOptions":{"rows":1}}""")
        assert(bad.statusCode() >= 400, s"trial $trial: ${bad.body()}")
        val still = post(s"/session/$sid/query",
          """{"sql":"SELECT count(*) AS n FROM g"}""")
        assert(still.statusCode() == 200, s"trial $trial session wedged: ${still.body()}")
      } finally {
        client.send(HttpRequest.newBuilder(URI.create(s"$base/session/$sid"))
          .DELETE().build(), HttpResponse.BodyHandlers.ofString()): Unit
      }
    }
  }

  // ------------------------------------------------------ post-processor fuzz

  test("fuzz: generated post-processor chains match direct composition") {
    val rnd = new scala.util.Random(0x5eed9004L)
    for (trial <- 1 to 30) {
      val n = 6 + rnd.nextInt(10)
      val baseCols = Seq("id", "g", "c", "xv")
      val rows: Seq[Map[String, Any]] = (0 until n).map(i => Map(
        "id" -> i.toLong, "g" -> s"g${rnd.nextInt(3)}",
        "c" -> s"c${rnd.nextInt(2)}", "xv" -> rnd.nextInt(100).toLong))

      // chain generation with schema tracking so options stay valid
      var schema = baseCols
      var local = localDf(rows, baseCols)
      val chain = mapper.createArrayNode()
      val steps = 1 + rnd.nextInt(3)
      for (_ <- 1 to steps) {
        val canPivot = Seq("g", "c", "xv").forall(schema.contains)
        val canSplit = schema.contains("id")
        val choice = rnd.nextInt(3) match {
          case 0 if canPivot => "pivot-table"
          case 1 if canSplit => "hash-split"
          case _ => "select-columns"
        }
        val p = mapper.createObjectNode()
        p.put("module", choice)
        val opts = p.putObject("pluginOptions")
        choice match {
          case "pivot-table" =>
            opts.put("values", "xv"); opts.put("columns", "c")
            opts.putArray("index").add("g")
            val cVals = local.select(col("c")).distinct()
              .collect().map(_.getString(0)).sorted.toSeq
            local = local.groupBy(col("g")).pivot("c")
              .agg(avg(col("xv"))).orderBy(col("g"))
            schema = "g" +: cVals
          case "hash-split" =>
            opts.put("idColumn", "id")
            val splits =
              if (rnd.nextBoolean()) Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
              else Seq("a" -> 0.5, "b" -> 0.5)
            if (splits.head._1 == "a" || rnd.nextBoolean()) {
              val sa = opts.putArray("splits")
              splits.foreach { case (nm, f) =>
                val o = sa.addObject(); o.put("name", nm); o.put("fraction", f): Unit
              }
            } // else: omit -> server default must equal the 80/10/10 local
            local = graft.pipeline.Sampling.hashSplit(local, "id", splits)
            schema = schema :+ "split"
          case _ =>
            val keep = rnd.shuffle(schema).take(1 + rnd.nextInt(schema.size))
            val ca = opts.putArray("columns")
            keep.foreach(ca.add(_): Unit)
            local = local.select(keep.map(col): _*)
            schema = keep
        }
        chain.add(p): Unit
      }

      val req = mapper.createObjectNode()
      req.putArray("dataSources").add(dsNode("t", rows))
      val q = req.putObject("query")
      q.put("sql", "SELECT * FROM t")
      q.set[ArrayNode]("postProcessors", chain)
      val r = post("/dataframe/query", mapper.writeValueAsString(req))
      assert(r.statusCode() == 200, s"trial $trial: ${r.body()}")
      assertSameRows(r.body(), local, s"post-processor trial $trial")
    }
  }

  test("fuzz: text-rebuild processors match the library operators") {
    val rnd = new scala.util.Random(0x5eed9042L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 20) {
      val w = 2 + rnd.nextInt(4)
      val boiler = (0 until w * 2).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val rows: Seq[Map[String, Any]] = (0 until 20).map { i =>
        val body = (0 until 3 + rnd.nextInt(10))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        Map("doc_id" -> i.toLong,
          "text" -> (if (rnd.nextDouble() < 0.4) s"$boiler $body" else body))
      }
      val local = localDf(rows, Seq("doc_id", "text"))
      val useChunks = rnd.nextBoolean()
      val maxDf = 1 + rnd.nextInt(3)
      val p = mapper.createObjectNode()
      val opts = p.putObject("pluginOptions")
      opts.put("textColumn", "text"); opts.put("idColumn", "doc_id")
      val expected = if (useChunks) {
        p.put("module", "drop-common-chunks")
        opts.put("chunkTokens", w); opts.put("maxDf", maxDf)
        graft.pipeline.Dedup.dropCommonChunks(local, "text", "doc_id", w, maxDf.toLong)
      } else {
        p.put("module", "drop-duplicated-spans")
        opts.put("windowTokens", w)
        graft.pipeline.Dedup.dropDuplicatedSpans(local, "text", "doc_id", w, minOccurs = 2)
      }
      val chain = mapper.createArrayNode(); chain.add(p): Unit
      val req = mapper.createObjectNode()
      req.putArray("dataSources").add(dsNode("t", rows))
      val q = req.putObject("query")
      q.put("sql", "SELECT * FROM t")
      q.set[ArrayNode]("postProcessors", chain)
      val r = post("/dataframe/query", mapper.writeValueAsString(req))
      assert(r.statusCode() == 200, s"trial $trial: ${r.body()}")
      assertSameRows(r.body(), expected,
        s"rebuild trial $trial (${p.get("module").asText()} w=$w)")
    }
  }

  test("fuzz: nfc-normalize processor matches the library expression") {
    val rnd = new scala.util.Random(0x5eed9043L)
    val marks = Seq('\u0301', '\u0302', '\u0308', '\u0327', '\u030A')
    for (trial <- 1 to 10) {
      val rows: Seq[Map[String, Any]] = (0 until 15).map { i =>
        val sb = new StringBuilder
        (0 until 2 + rnd.nextInt(8)).foreach { _ =>
          sb += ('a' + rnd.nextInt(26)).toChar
          if (rnd.nextDouble() < 0.5) sb += marks(rnd.nextInt(marks.size))
        }
        Map("doc_id" -> i.toLong, "text" -> sb.toString)
      }
      val local = localDf(rows, Seq("doc_id", "text"))
      val expected = local.withColumn("text",
        graft.functions.TextNormalizeExpressions.nfc(col("text")))
      val p = mapper.createObjectNode()
      p.put("module", "nfc-normalize")
      p.putObject("pluginOptions").put("textColumn", "text")
      val chain = mapper.createArrayNode(); chain.add(p): Unit
      val req = mapper.createObjectNode()
      req.putArray("dataSources").add(dsNode("t", rows))
      val q = req.putObject("query")
      q.put("sql", "SELECT * FROM t")
      q.set[ArrayNode]("postProcessors", chain)
      val r = post("/dataframe/query", mapper.writeValueAsString(req))
      assert(r.statusCode() == 200, s"trial $trial: ${r.body()}")
      assertSameRows(r.body(), expected, s"nfc trial $trial")
    }
    // contract errors stay 400-class: missing option, unknown column
    val bad = mapper.createObjectNode()
    bad.put("module", "nfc-normalize"); bad.putObject("pluginOptions")
    val chain = mapper.createArrayNode(); chain.add(bad): Unit
    val req = mapper.createObjectNode()
    req.putArray("dataSources").add(dsNode("t", Seq(Map("doc_id" -> 1L, "text" -> "x"))))
    val q = req.putObject("query")
    q.put("sql", "SELECT * FROM t")
    q.set[ArrayNode]("postProcessors", chain)
    val r = post("/dataframe/query", mapper.writeValueAsString(req))
    assert(r.statusCode() >= 400 && r.statusCode() < 500, r.body())
  }
}
