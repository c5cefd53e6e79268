package graft

import graft.pipeline.TextChunker
import org.scalatest.funsuite.AnyFunSuite

class TextChunkerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("non-overlapping chunks partition the tokens exactly") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 12).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val rows = TextChunker.chunk(docs, "text", "doc_id", windowTokens = 5, strideTokens = 5)
      .orderBy("chunk_id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("n_tokens")).toSeq == Seq(5L, 5L, 2L))
    assert(rows(0).getAs[String]("chunk_text") == "w1 w2 w3 w4 w5")
    assert(rows(2).getAs[String]("chunk_text") == "w11 w12")
    // reassembling the chunks restores the document
    assert(rows.map(_.getAs[String]("chunk_text")).mkString(" ") ==
      (1 to 12).map(i => s"w$i").mkString(" "))
  }

  test("overlapping chunks share stride-to-window tokens") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = TextChunker.chunk(docs, "text", "doc_id", windowTokens = 6, strideTokens = 4)
      .orderBy("chunk_id").collect()
    // starts at 0, 4, 8 → 3 chunks
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("chunk_text") == "t1 t2 t3 t4 t5 t6")
    assert(rows(1).getAs[String]("chunk_text") == "t5 t6 t7 t8 t9 t10")
    assert(rows(2).getAs[String]("chunk_text") == "t9 t10")
  }

  test("short and empty docs produce exactly one chunk") {
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val rows = TextChunker.chunk(docs, "text", "doc_id", 50, 40)
      .orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Int]("chunk_id") == 0))
    assert(rows(0).getAs[String]("chunk_text") == "solo")
  }
}
