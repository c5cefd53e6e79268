package graft

import graft.pipeline.AnnIndex
import graft.serve.GraftServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Generative fuzz of the ANN-index REST lifecycle (r6 advice #8):
  * randomized build/rebuild/append/search/drop sequences through the
  * HTTP routes, with every 200-search cross-checked against the
  * library call on the same registered handle — so the whole HTTP
  * layer (JSON param parsing, registry keying, dir fingerprinting,
  * response encoding) is pinned to the library semantics the
  * AnnIndexSpec/oracle queries already prove. A second leg interleaves
  * two sessions from two threads to shake out cross-session races.
  */
@org.scalatest.tags.Slow
class IndexLifecycleFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val server = { val s = new GraftServer(SparkFixture.spark); s.start(); s }
  private lazy val base = s"http://127.0.0.1:${server.boundPort}"
  private val client = HttpClient.newHttpClient()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override def afterAll(): Unit = server.stop()

  private def post(path: String, body: String) =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(path: String) =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def delete(path: String) =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())

  private def mkSession(sid: String): Unit = {
    assert(post(s"/session?id=$sid", "").statusCode() == 200)
    val r = post(s"/session/$sid/datasource",
      s"""{"format":"parquet","name":"embeddings",
          "location":"${SparkFixture.sfDir}/embeddings.parquet"}""")
    assert(r.statusCode() == 200, r.body())
  }

  private lazy val corpus =
    SparkFixture.spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
  private lazy val maxId: Long = {
    import org.apache.spark.sql.functions._
    corpus.agg(max(col("vec_id"))).collect()(0).getLong(0)
  }

  /** REST search vs the library on the session's registered handle:
    * ids must match in order, scores to 1e-9 (same kernel, same
    * handle — the tolerance only absorbs JSON double round-trip).
    */
  private def checkSearch(sid: String, name: String,
      rnd: scala.util.Random): Unit = {
    val hd = AnnIndex.get(s"$sid/$name").getOrElse(
      fail(s"handle $sid/$name vanished"))
    val k = 1 + rnd.nextInt(8)
    val nprobe = 1 + rnd.nextInt(hd.numCells)
    val rerank = if (rnd.nextBoolean()) 0 else k + rnd.nextInt(10)
    val qid = rnd.nextInt(maxId.toInt + 1).toLong
    val resp = post(s"/session/$sid/index/$name/search",
      s"""{"queryId":$qid,"k":$k,"nprobe":$nprobe,"rerank":$rerank,
          "table":"embeddings"}""")
    assert(resp.statusCode() == 200, resp.body())
    val restRows = {
      val n = mapper.readTree(resp.body())
      (0 until n.size()).map { i =>
        val r = n.get(i)
        val score = if (r.has("cos_sim")) r.get("cos_sim").asDouble()
          else r.get("adc_sim").asDouble()
        (r.get("vec_id").asLong(), score)
      }
    }
    val libRows = AnnIndex.searchTopK(corpus, hd, qid, k, nprobe, rerank)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(restRows.map(_._1) == libRows.map(_._1),
      s"$sid/$name qid=$qid k=$k nprobe=$nprobe rerank=$rerank: " +
        s"rest=${restRows.map(_._1)} lib=${libRows.map(_._1)}")
    restRows.zip(libRows).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9, s"score drift $a vs $b")
    }
  }

  test("60 randomized REST lifecycle scenarios agree with the library") {
    val rnd = new scala.util.Random(4242)
    val sessions = Seq("fz1", "fz2")
    sessions.foreach(mkSession)
    try {
      var built = Map.empty[(String, String), Boolean] // (sid, name) -> exists
      for (i <- 1 to 60) {
        val sid = sessions(rnd.nextInt(sessions.size))
        val name = s"ix${rnd.nextInt(3)}" // small pool → reuse + rebuild paths
        rnd.nextInt(10) match {
          case n if n <= 5 =>
            // build (or reuse, or param-change rebuild)
            val m = Seq(4, 8, 16)(rnd.nextInt(3)) // divides dim=64
            val ksub = Seq(8, 16)(rnd.nextInt(2))
            val numCells = 2 + rnd.nextInt(7)
            val seeded = rnd.nextBoolean()
            val b = post(s"/session/$sid/index",
              s"""{"name":"$name","table":"embeddings","vecCol":"embedding",
                  "idCol":"vec_id","numCells":$numCells,"m":$m,"ksub":$ksub,
                  "seeded":$seeded}""")
            assert(b.statusCode() == 200, s"build $sid/$name: ${b.body()}")
            // the response must reflect THIS request's params, never a
            // previous definition's (the atomic-rebuild contract)
            val bn = mapper.readTree(b.body())
            assert(bn.get("m").asInt() == m && bn.get("ksub").asInt() == ksub,
              s"stale handle served: ${b.body()} vs m=$m ksub=$ksub")
            built += (sid, name) -> true
            checkSearch(sid, name, rnd)
          case 6 | 7 if built.getOrElse((sid, name), false) =>
            checkSearch(sid, name, rnd)
          case 8 if built.getOrElse((sid, name), false) =>
            // append the corpus again (duplicate ids are documented as
            // duplicate candidates — the library twin sees the same
            // codes, so search comparison stays exact)
            val a = post(s"/session/$sid/index/$name/append",
              """{"table":"embeddings"}""")
            assert(a.statusCode() == 200, a.body())
            checkSearch(sid, name, rnd)
          case 9 if built.getOrElse((sid, name), false) =>
            val dir = AnnIndex.get(s"$sid/$name").get.dir
            assert(delete(s"/session/$sid/index/$name").statusCode() == 200)
            assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)),
              s"dir survives DROP: $dir")
            assert(get(s"/session/$sid/index/$name").statusCode() == 404)
            built += (sid, name) -> false
          case _ =>
            // op on an unbuilt name: search/append/drop must 404, not 500
            val r = post(s"/session/$sid/index/$name/search",
              """{"queryId":0,"k":3,"table":"embeddings"}""")
            assert(r.statusCode() == 404, s"expected 404: ${r.body()}")
        }
        // registries stay session-scoped at every step
        val listed = mapper.readTree(get(s"/session/$sid/index").body())
        val mine = (0 until listed.size()).map(listed.get(_).asText()).toSet
        val expected = built.collect { case ((s, n), true) if s == sid => n }.toSet
        assert(mine == expected, s"$sid registry drift: $mine vs $expected")
      }
    } finally sessions.foreach(s => delete(s"/session/$s"))
  }

  test("two sessions interleaved from two threads: no 5xx, no cross-talk") {
    val sessions = Seq("fzc1", "fzc2")
    sessions.foreach(mkSession)
    try {
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = sessions.zipWithIndex.map { case (sid, ti) =>
        new Thread(() => {
          val rnd = new scala.util.Random(100 + ti)
          try {
            for (_ <- 1 to 15) {
              val name = s"cx${rnd.nextInt(2)}"
              rnd.nextInt(4) match {
                case 0 | 1 =>
                  val b = post(s"/session/$sid/index",
                    s"""{"name":"$name","table":"embeddings",
                        "vecCol":"embedding","idCol":"vec_id",
                        "numCells":${2 + rnd.nextInt(4)},
                        "m":${Seq(4, 8)(rnd.nextInt(2))},"ksub":8,
                        "seeded":${rnd.nextBoolean()}}""")
                  if (b.statusCode() >= 500)
                    errors.add(s"$sid build 5xx: ${b.body()}")
                case 2 =>
                  val r = post(s"/session/$sid/index/$name/search",
                    """{"queryId":1,"k":3,"table":"embeddings"}""")
                  if (r.statusCode() != 200 && r.statusCode() != 404)
                    errors.add(s"$sid search ${r.statusCode()}: ${r.body()}")
                case _ =>
                  val d = delete(s"/session/$sid/index/$name")
                  if (d.statusCode() != 200 && d.statusCode() != 404)
                    errors.add(s"$sid drop ${d.statusCode()}: ${d.body()}")
              }
              // a session only ever lists its own indexes
              val listed = mapper.readTree(get(s"/session/$sid/index").body())
              (0 until listed.size()).map(listed.get(_).asText()).foreach { n =>
                if (!n.startsWith("cx")) errors.add(s"$sid lists foreign $n")
              }
            }
          } catch { case t: Throwable => errors.add(s"$sid thread died: $t") }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(300000))
      assert(errors.isEmpty, errors.toArray.mkString("; "))
      // registry keys never leak across sessions
      assert(!AnnIndex.list().exists(k =>
        k.startsWith("fzc1/") && k.contains("fzc2")), AnnIndex.list().toString)
    } finally sessions.foreach(s => delete(s"/session/$s"))
  }

  test("graph door lifecycle: staged append/repair agree with the library; concurrent appends serialize without lost updates") {
    import org.apache.spark.sql.functions._
    val sid = "fzg1"
    mkSession(sid)
    try {
      val thr = 4L * (maxId + 1L) / 5L
      def view(name: String, sql: String): Unit =
        assert(post(s"/session/$sid/query",
          s"""{"sql":"CREATE OR REPLACE TEMP VIEW $name AS $sql"}""")
          .statusCode() == 200)
      val half = thr + (maxId + 1L - thr) / 2L
      view("gc0", s"SELECT * FROM embeddings WHERE vec_id < $thr")
      view("gb1", s"SELECT * FROM embeddings WHERE vec_id >= $thr AND vec_id < $half")
      view("gb2", s"SELECT * FROM embeddings WHERE vec_id >= $half")
      val b = post(s"/session/$sid/index",
        """{"name":"gfz","table":"gc0","type":"graph","vecCol":"embedding",
           "idCol":"vec_id","graphK":4,"buildRounds":1}""")
      assert(b.statusCode() == 200, b.body())
      // REST search vs the library on the registered handle — exact
      // (same kernel, same walk; tolerance absorbs the JSON double)
      def crossCheck(table: String, libTable: String,
          qids: Seq[Long]): Unit = {
        val hd = graft.pipeline.GraphIndex.get(s"$sid/gfz").get
        val resp = post(s"/session/$sid/index/gfz/search",
          s"""{"table":"$table","queryIds":[${qids.mkString(",")}],
              "k":4,"beamWidth":8,"hops":2}""")
        assert(resp.statusCode() == 200, resp.body())
        val n = mapper.readTree(resp.body())
        val restRows = (0 until n.size()).map { i =>
          val r = n.get(i)
          (r.get("query_id").asLong(), r.get("neighbor_id").asLong(),
            r.get("cosine").asDouble())
        }.sorted
        // the door's views live in the SESSION's spark; the library
        // leg reads an identical view registered in the fixture spark
        val corpusDf = SparkFixture.spark.table(libTable)
        val libRows = graft.pipeline.GraphAnn.graphSearchTopK(corpusDf,
          "embedding", "vec_id", hd, qids, k = 4, beamWidth = 8, hops = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getDouble(2))).toSeq.sorted
        assert(restRows.map(t => (t._1, t._2)) == libRows.map(t => (t._1, t._2)),
          s"REST/library divergence on $table: $restRows vs $libRows")
        restRows.zip(libRows).foreach { case ((_, _, a), (_, _, bb)) =>
          assert(math.abs(a - bb) < 1e-9, s"score drift $a vs $bb")
        }
      }
      // the temp views live in the SERVER's session-scoped spark —
      // register twins in the fixture session for the library leg
      val emb = corpus
      emb.where(col("vec_id") < thr).createOrReplaceTempView("fz_gc0")
      crossCheck("gc0", "fz_gc0", Seq(1L, 2L))
      // CONCURRENT appends of DISJOINT batches, both claiming the
      // SAME pre-append corpus: they serialize inside the registry's
      // per-key compute, so the loser starts from the WINNER's new
      // version and must fail the staleness guard LOUDLY (its
      // corpusTable no longer matches) — an optimistic-concurrency
      // conflict, never a silent lost update
      val results = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, String)]()
      val threads = Seq("gb1", "gb2").map { bt =>
        new Thread(() => {
          val r = post(s"/session/$sid/index/gfz/append",
            s"""{"table":"$bt","corpusTable":"gc0","beamWidth":8,"hops":2}""")
          results.add((bt, r.statusCode(), r.body()))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(300000))
      val rs = results.toArray(Array.empty[(String, Int, String)]).toSeq
      val winners = rs.filter(_._2 == 200)
      assert(winners.size == 1,
        s"exactly one concurrent append must win: $rs")
      val loser = rs.filterNot(_._2 == 200).head
      assert(loser._3.contains("different corpus"),
        s"the losing append must fail the staleness guard loudly: $loser")
      val hd1 = graft.pipeline.GraphIndex.get(s"$sid/gfz").get
      val winBatch = winners.head._1
      val expectedN = thr + (if (winBatch == "gb1") half - thr
        else maxId + 1L - half)
      assert(hd1.n == expectedN,
        s"post-append n must be corpus + winner batch: ${hd1.n} vs $expectedN")
      // the winner's union serves and cross-checks
      val winUnionSql = if (winBatch == "gb1")
        s"SELECT * FROM embeddings WHERE vec_id < $half"
      else s"SELECT * FROM embeddings WHERE vec_id < $thr OR vec_id >= $half"
      view("gu1", winUnionSql)
      if (winBatch == "gb1")
        emb.where(col("vec_id") < half).createOrReplaceTempView("fz_gu1")
      else emb.where(col("vec_id") < thr || col("vec_id") >= half)
        .createOrReplaceTempView("fz_gu1")
      // query the WINNER batch's first id (whichever batch won the
      // race, its vectors must be servable post-append)
      val batchQid = if (winBatch == "gb1") thr else half
      crossCheck("gu1", "fz_gu1", Seq(1L, batchQid))
      // repair against the winner's corpus: tombstone every 13th id
      view("gdead", s"SELECT vec_id FROM ($winUnionSql) WHERE vec_id % 13 = 3")
      val rp = post(s"/session/$sid/index/gfz/repair",
        """{"deletedTable":"gdead","corpusTable":"gu1"}""")
      assert(rp.statusCode() == 200, rp.body())
      val hd2 = graft.pipeline.GraphIndex.get(s"$sid/gfz").get
      assert(hd2.n < hd1.n && hd2.dir != hd1.dir, s"${hd2.n} vs ${hd1.n}")
      // the compacted live corpus serves and cross-checks (non-dense)
      view("glive", s"SELECT * FROM ($winUnionSql) WHERE vec_id % 13 <> 3")
      emb.where((col("vec_id") < thr ||
          (if (winBatch == "gb1") col("vec_id") < half && col("vec_id") >= thr
          else col("vec_id") >= half)) && col("vec_id") % 13 =!= 3)
        .createOrReplaceTempView("fz_glive")
      crossCheck("glive", "fz_glive", Seq(1L, 2L))
      // dead queries are gone: searching a tombstoned id is loud
      val sd = post(s"/session/$sid/index/gfz/search",
        """{"table":"glive","queryIds":[3],"k":2,"beamWidth":4,"hops":1}""")
      assert(sd.statusCode() != 200, sd.body())
    } finally {
      delete(s"/session/$sid"): Unit
      assert(!graft.pipeline.GraphIndex.list().exists(_.startsWith(sid + "/")))
    }
  }
}
