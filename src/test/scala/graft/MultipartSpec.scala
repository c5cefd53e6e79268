package graft

import graft.serve.Multipart
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

class MultipartSpec extends AnyFunSuite {

  test("parser splits parts, reads headers and bodies") {
    val b = "XBOUND"
    val body = (s"--$b\r\n" +
      "Content-Disposition: form-data; name=\"t1\"; filename=\"t1.csv\"\r\n" +
      "Content-Type: text/csv\r\n\r\n" +
      "a,b\n1,2\n" +
      s"\r\n--$b\r\n" +
      "Content-Disposition: form-data; name=\"t2\"; filename=\"d.jsonl\"\r\n\r\n" +
      "{\"x\":1}\n" +
      s"\r\n--$b--\r\n").getBytes(StandardCharsets.UTF_8)
    val parts = Multipart.parse(body, b)
    assert(parts.length == 2)
    assert(parts(0).name.contains("t1"))
    assert(parts(0).contentType.contains("text/csv"))
    assert(new String(parts(0).body) == "a,b\n1,2\n")
    assert(parts(1).filename.contains("d.jsonl"))
    assert(new String(parts(1).body) == "{\"x\":1}\n")
  }

  test("boundary extraction from content-type") {
    assert(Multipart.boundaryOf("multipart/form-data; boundary=abc").contains("abc"))
    assert(Multipart.boundaryOf("multipart/form-data; boundary=\"q z\"").contains("q z"))
    assert(Multipart.boundaryOf("application/json").isEmpty)
  }

  test("upload route ingests a csv part as a queryable table") {
    val server = new graft.serve.GraftServer(SparkFixture.spark)
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String, ct: String) =
        client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
          .header("Content-Type", ct)
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      post("/session?id=up", "", "application/json")
      val b = "GRAFTBOUNDARY"
      val multipart = s"--$b\r\n" +
        "Content-Disposition: form-data; name=\"sales\"; filename=\"sales.csv\"\r\n" +
        "Content-Type: text/csv\r\n\r\n" +
        "region,amt\neast,10\nwest,20\neast,5\n" +
        s"\r\n--$b--\r\n"
      val up = post("/session/up/datasource/upload", multipart,
        s"multipart/form-data; boundary=$b")
      assert(up.statusCode() == 200, up.body())
      val q = post("/session/up/query",
        """{"sql":"SELECT region, sum(amt) AS s FROM sales GROUP BY region ORDER BY region"}""",
        "application/json")
      assert(q.body() == """[{"region":"east","s":15},{"region":"west","s":20}]""")
      // an uploaded table has no recorded location/data to re-read:
      // refresh must be a clear 409, not ingest's "location or data
      // required" 400
      val rf = post("/session/up/datasource/sales/refresh", "", "application/json")
      assert(rf.statusCode() == 409, s"${rf.statusCode()} ${rf.body()}")
      assert(rf.body().contains("no refreshable source"), rf.body())
    } finally server.stop()
  }
}
