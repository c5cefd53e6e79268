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
}
