package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior of the round-6 operators: empty sides,
  * corpora smaller than the requested parameters, token-free
  * documents. Every case must be a defined result or a CLEAR error —
  * never an NPE or a silent wrong answer.
  */
class EdgeCasesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("asofJoinSkewed: empty right keeps left unmatched; empty left is empty") {
    val left = Seq((1L, 1L, 100L), (2L, 2L, 200L)).toDF("lid", "k", "ts")
    val right = Seq.empty[(Long, Long, Long, Double)].toDF("rid", "k", "ts", "v")
    val out = graft.ops.TemporalJoins.asofJoinSkewed(
      left, right, "k", "ts", "ts", Seq("v"), bucketWidth = 50L).collect()
    assert(out.length == 2 && out.forall(_.isNullAt(3)))
    assert(graft.ops.TemporalJoins.asofJoinSkewed(
      left, right, "k", "ts", "ts", Seq("v"), bucketWidth = 50L,
      inner = true).count() == 0)
    val out2 = graft.ops.TemporalJoins.asofJoinSkewed(
      right.select(col("rid").as("lid"), col("k"), col("ts")),
      left.select(col("lid").as("rid"), col("k"), col("ts"),
        col("ts").cast("double").as("v")),
      "k", "ts", "ts", Seq("v"), bucketWidth = 50L).count()
    assert(out2 == 0)
  }

  test("AnnIndex.build on an empty corpus fails with a clear message") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_empty").toString
    try {
      val e = intercept[IllegalArgumentException] {
        graft.pipeline.AnnIndex.build(empty, "embedding", "vec_id", dir,
          numCells = 4, m = 4, ksub = 4)
      }
      assert(e.getMessage.contains("empty corpus"), e.getMessage)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("vocabCoverage and qualityGateSignals are empty on an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.pipeline.TextAnalysis.vocabCoverage(empty, "text").count() == 0)
    assert(graft.pipeline.TextAnalysis.qualityGateSignals(
      empty, "text", "doc_id").count() == 0)
  }

  test("md5 twins: shingle-free docs pair with nothing, empty text still signs") {
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    // two tokens < shingleN=3 -> no shingles -> no signatures -> no pairs
    assert(graft.pipeline.Dedup.minHashLshMd5(d, "text", "doc_id").count() == 0)
    // split("") = [""] -> one empty token; the signature is defined
    val sigs = graft.pipeline.Dedup.simHashMd5(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.size == 3 && sigs.contains(3L))
  }

  test("seeded searches cap at the corpus: k and seeds larger than the data") {
    val tiny = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // ksub larger than the corpus: seedCodebooks takes what exists
    val hits = graft.pipeline.Pq.searchTopKSeeded(tiny, "embedding",
      "vec_id", queryId = 0L, k = 10, m = 1, ksub = 16)
    assert(hits.count() == 2) // corpus minus the query row
    val ivf = graft.pipeline.Ivf.searchTopKSeeded(tiny, "embedding",
      "vec_id", queryId = 0L, k = 10, numCells = 3, nprobe = 3)
    assert(ivf.count() == 2)
  }

  test("round-9 rebuilds: empty/degenerate corpora are defined, never NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.pipeline.Dedup.dropCommonChunks(
      empty, "text", "doc_id", 4, 2L).count() == 0)
    assert(graft.pipeline.Dedup.dropDuplicatedSpans(
      empty, "text", "doc_id", 3).count() == 0)
    assert(graft.pipeline.TextAnalysis.pmiCollocations(
      empty, "text", 10, 1L).count() == 0)
    assert(graft.pipeline.TextAnalysis.vocabOverlap(
      empty, "text", "doc_id").count() == 0)
    // a one-doc corpus: nothing is ever common/duplicated across docs
    val one = Seq((7L, "just one tiny doc here")).toDF("doc_id", "text")
    val c = graft.pipeline.Dedup.dropCommonChunks(one, "text", "doc_id", 3, 1L)
      .collect().head
    assert(c.getString(1) == "just one tiny doc here" && c.getLong(4) == 0L)
    // empty-STRING doc: one empty token, rebuild keeps it verbatim
    val blank = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    val b = graft.pipeline.Dedup.dropCommonChunks(blank, "text", "doc_id", 3, 2L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(b == Set(("", 1L, 1L)))
    // all-duplicate corpus under spans: everything is covered
    val dup = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val s = graft.pipeline.Dedup.dropDuplicatedSpans(dup, "text", "doc_id", 5)
      .collect()
    assert(s.forall(r => r.getString(1) == "" && r.getLong(3) == 0L))
  }

  test("round-9 params: bad arguments fail fast with clear messages") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.dropCommonChunks(df, "text", "doc_id", 0, 2L)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.dropCommonChunks(df, "text", "doc_id", 4, 0L)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.dropDuplicatedSpans(df, "text", "doc_id", 1)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.TextAnalysis.pmiCollocations(df, "text", 0, 1L)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Similarity.randomProject(
        Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding"), "embedding", "vec_id", 1, 0)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Sampling.lengthBuckets(df, "text", "doc_id", Seq(16, 1))
    }
  }
}
