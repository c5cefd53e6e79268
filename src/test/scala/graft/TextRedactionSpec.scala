package graft

import graft.pipeline.TextRedaction
import org.scalatest.funsuite.AnyFunSuite

class TextRedactionSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("default rules scrub emails, phones, SSNs, cards, IPs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567 now"),
      (2L, "ssn 123-45-6789 card 4111 1111 1111 1111 ip 10.0.0.1"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = TextRedaction.scrub(docs, "text")
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(out(1L)._1.contains("<EMAIL>"), out(1L)._1)
    assert(out(1L)._1.contains("<PHONE>"), out(1L)._1)
    assert(!out(1L)._1.contains("example.co.uk"))
    assert(out(2L)._1.contains("<SSN>") && out(2L)._1.contains("<CARD>") &&
      out(2L)._1.contains("<IP>"), out(2L)._1)
    assert(out(3L)._1 == "nothing sensitive here")
    assert(out(3L)._2 == 0L)
    assert(out(1L)._2 >= 2L)
  }

  test("repetition stats flag degenerate text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "foo bar foo bar foo bar foo bar"),
      (2L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val m = graft.pipeline.TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) > 0.5, s"degenerate doc should score high: ${m(1L)}")
    assert(m(2L) < 0.2, s"healthy doc should score low: ${m(2L)}")
  }
}
