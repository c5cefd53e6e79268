package graft

import graft.functions.SketchExpressions
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: the one-pass sketch kernels must be
  * bit-identical to the exploded/aggregated reference formulations.
  */
class SketchKernelsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("SimHash64 kernel is bit-identical to the exploded aggregate form") {
    val docs = spark.read.parquet(s"${SparkFixture.sfDir}/documents.parquet")
    val kernel = Dedup.simHash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simHashAgg(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel.size == agg.size)
    agg.foreach { case (id, sig) =>
      assert(kernel(id) == sig, s"doc $id: kernel=${kernel(id)} agg=$sig")
    }
  }

  test("SimHash64 edge cases: empty, all-space, multibyte") {
    import spark.implicits._
    val edge = Seq(
      (1L, ""), (2L, "   "), (3L, "héllo wörld héllo"),
      (4L, " padded  tokens "), (5L, "solo")
    ).toDF("doc_id", "text")
    val kernel = Dedup.simHash(edge, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simHashAgg(edge, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == agg, s"kernel=$kernel agg=$agg")
    assert(!kernel.contains(1L) && !kernel.contains(2L),
      "token-less docs must be dropped, like the exploded form")
  }

  test("MinHashSig: identical shingle sets give identical signatures") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "THE  QUICK brown fox jumps over the lazy dog"), // same canon set
      (3L, "completely different content about spark engines today")
    ).toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"),
      graft.functions.ShingleHashes(col("text"), 3).as("sh_arr"))
    val sigs = Dedup.minHashSignatures(
        sets.withColumnRenamed("doc_id", "id"), 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "identical sets must share a signature")
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 16)
  }

  test("MinHashSig minima match a per-slot explicit computation") {
    import spark.implicits._
    val arr = Seq((1L, Array(7L, 42L, -3L, 0L))).toDF("id", "sh_arr")
    val sig = arr.select(SketchExpressions.minHashSig(col("sh_arr"), 4).as("sig"))
      .collect().head.getSeq[Long](0)
    val expected = (0 until 4).map { k =>
      Array(7L, 42L, -3L, 0L).map(sh =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(sh, k.toLong)).min
    }
    assert(sig == expected)
  }

  test("minHashLsh still finds near-dups and exact dups (restructured)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content about spark engines"),
      (4L, "THE  QUICK brown fox jumps over the lazy dog"),
      (5L, "der hund und die katze und der vogel nicht hier")
    ).toDF("doc_id", "text")
    val got = Dedup.minHashLsh(docs, "text", "doc_id",
      shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    val exact = got.find(t => t._1 == 1L && t._2 == 4L).get
    assert(exact._3 == 1.0, "exact dup after normalization has jaccard 1.0")
  }

  test("ngramJaccardPairs (posting-list form) matches on the fixed corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content about spark engines"),
      (4L, "THE  QUICK brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 4L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("SignLshBucket kernel is bit-identical to the fold formulation") {
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
    for (nPlanes <- Seq(1, 4, 8)) {
      val both = emb.select(
        col("vec_id"),
        graft.pipeline.Similarity.lshBucket(col("embedding"), nPlanes).as("k"),
        graft.pipeline.Similarity.lshBucketFold(col("embedding"), nPlanes).as("f"))
        .collect()
      both.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"vec ${r.getLong(0)} nPlanes=$nPlanes: kernel=${r.getLong(1)} fold=${r.getLong(2)}"))
      assert(both.nonEmpty)
    }
  }

  test("tokenCount arithmetic identity vs size(split)") {
    import spark.implicits._
    val texts = Seq("", " ", "a", "a b", "a  b", " a b ", "one two three").toDF("t")
    val rows = texts.select(
      graft.pipeline.TextAnalysis.tokenCount(col("t")).as("fast"),
      size(split(col("t"), " ")).cast("long").as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("punct/upper counts match the regex formulation") {
    import spark.implicits._
    val texts = Seq("Hello, World! How are you?", "no punct here", "ALL CAPS.").toDF("t")
    val rows = texts.select(
      graft.pipeline.TextAnalysis.punctCount(col("t")).as("p"),
      length(regexp_replace(col("t"), "[^.,;:!?]", "")).cast("long").as("pr"),
      graft.pipeline.TextAnalysis.upperCount(col("t")).as("u"),
      length(regexp_replace(col("t"), "[^A-Z]", "")).cast("long").as("ur")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"punct: $r")
      assert(r.getLong(2) == r.getLong(3), s"upper: $r")
    }
  }
}
