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

  test("seeded indexed IVF-PQ at full probe equals the flat seeded PQ twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s20_spec").toString
    try {
      val h = graft.pipeline.AnnIndex.buildSeeded(emb, "embedding", "vec_id",
        dir, numCells = 8, m = 8, ksub = 16)
      // full probe = no cell pruning, so the persisted-index round trip
      // (codes written at build, read back partition-filtered) must
      // reproduce the flat seeded scan bit for bit
      val indexed = graft.pipeline.AnnIndex.searchTopK(emb, h, queryId = 0L,
        k = 10, nprobe = 8, rerank = 0, roundAdc = true)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val flat = graft.pipeline.Pq.searchTopKSeeded(emb, "embedding",
        "vec_id", queryId = 0L, k = 10, m = 8, ksub = 16)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(indexed == flat,
        "full probe over the persisted seeded index must equal the flat scan")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("batch seeded LSH equals the single-query twin per query") {
    val batch = graft.pipeline.Similarity.lshTopKSeededBatch(emb,
      emb.filter(col("vec_id") < 3), "embedding", "vec_id", "vec_id",
      k = 5, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(batch.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    (0L to 2L).foreach { qid =>
      val single = graft.pipeline.Similarity.lshTopKSeeded(emb, "embedding",
        "vec_id", qid, k = 5, nPlanes = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val mine = batch.filter(_._1 == qid).sortBy(_._4)
        .map(t => (t._2, t._3)).toSeq
      assert(mine == single,
        s"query $qid: batch ranks must reproduce the single-query twin")
    }
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
