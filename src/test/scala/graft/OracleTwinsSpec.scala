package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The oracle-twin variants (s16-s18, d12, d13) exist so DuckDB can
  * reconstruct each sketch family's full pipeline in SQL — their
  * primary check is the driver's hash compare. These tests pin the
  * operator-level invariants that make the twins trustworthy stand-ins
  * for the quality-path (trained / seeded-RNG) variants.
  */
class OracleTwinsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val emb =
    spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
  private lazy val docs =
    spark.read.parquet(s"${SparkFixture.sfDir}/documents.parquet")

  test("seeded IVF at full probe equals brute force exactly") {
    val full = graft.pipeline.Ivf.searchTopKSeeded(emb, "embedding",
      "vec_id", queryId = 0L, k = 10, numCells = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = graft.pipeline.Similarity.bruteForceTopK(emb, "embedding",
      "vec_id", queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == brute,
      "probing every cell must be exhaustive — same rows, same doubles")
  }

  test("seeded LSH candidates are a bucket-consistent subset of brute force") {
    val hits = graft.pipeline.Similarity.lshTopKSeeded(emb, "embedding",
      "vec_id", queryId = 0L, k = 10, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.nonEmpty && hits.length <= 10)
    // scores descend with id tie-break, and every score equals the
    // exact kernel cosine for that id (no approximation in scoring)
    assert(hits.sameElements(hits.sortBy(h => (-h._2, h._1))))
    val exact = graft.pipeline.Similarity.bruteForceTopK(emb, "embedding",
      "vec_id", queryId = 0L, k = 2000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    hits.foreach { case (id, s) => assert(exact(id) == s) }
  }

  test("md5 MinHash twin finds the exact duplicates the kernel path finds") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different document about spark plans here")
    ).toDF("doc_id", "text")
    val pairs = graft.pipeline.Dedup.minHashLshMd5(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "identical docs must band together")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the unrelated doc must not pair")
  }

  test("md5 SimHash twin: identical texts agree, signatures are 32-bit") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val sigs = graft.pipeline.Dedup.simHashMd5(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L), "same token set, same signature")
    assert(sigs.values.forall(s => s >= 0L && s < (1L << 32)),
      "signatures must fit 32 bits")
    // determinism on the real corpus
    val a = graft.pipeline.Dedup.simHashMd5(docs, "text", "doc_id")
      .orderBy("id").limit(20).collect().toSeq
    val b = graft.pipeline.Dedup.simHashMd5(docs, "text", "doc_id")
      .orderBy("id").limit(20).collect().toSeq
    assert(a == b)
  }
}
