package graft

import org.scalatest.funsuite.AnyFunSuite

/** Retrieval-quality guard: the approximate search paths must keep a
  * floor of recall against the exact brute-force top-k — a silent
  * quality regression (broken bucketing, wrong probe ranking) fails
  * here even while rows-only correctness checks stay green. All
  * randomness in both paths is deterministic (hash-derived planes,
  * hash-sampled k-means init), so measured recall is stable.
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sfDir

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val exact = ids(graft.pipeline.Similarity.bruteForceTopK(
    emb, "embedding", "vec_id", queryId = 0L, k = 10))

  test("sign-LSH top-k recall floor vs brute force") {
    val lsh = ids(graft.pipeline.Similarity.lshTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 10, nPlanes = 4))
    val recall = (lsh & exact).size / 10.0
    info(s"LSH recall@10 = $recall")
    // single-bucket probe of 4-plane sign-LSH examines ~1/16 of the
    // corpus; measured (deterministic) recall here is 0.2 — the floor
    // pins it so a bucketing bug that zeroes recall fails loudly
    assert(recall >= 0.2, s"LSH recall collapsed: $recall")
  }

  test("multi-probe LSH lifts recall over single-probe at the same nPlanes") {
    def lsh(mp: Boolean) = ids(graft.pipeline.Similarity.lshTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 10, nPlanes = 4,
      multiProbe = mp))
    val single = (lsh(false) & exact).size / 10.0
    val multi = (lsh(true) & exact).size / 10.0
    info(s"LSH recall@10: single-probe = $single, multi-probe = $multi")
    // all probe buckets are distinct single-bit flips, so the
    // candidate set strictly contains the single-probe one: recall
    // can only grow. The strict `>` pins the measured lift on this
    // corpus (0.2 -> higher); if it ever degenerates to equality the
    // probe expansion is broken.
    assert(multi > single,
      s"multi-probe must lift recall: single=$single multi=$multi")
    assert(multi >= 0.5, s"multi-probe recall floor: $multi")
  }

  test("batch LSH equals single-query LSH per query id") {
    // same corpus (query row excluded, mirroring lshTopK's semantics)
    for (mp <- Seq(false, true)) {
      val single = graft.pipeline.Similarity.lshTopK(
          emb, "embedding", "vec_id", queryId = 0L, k = 10, nPlanes = 4,
          multiProbe = mp)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val batch = graft.pipeline.Similarity.lshTopKBatch(
          emb.where(org.apache.spark.sql.functions.col("vec_id") =!= 0L),
          emb.where(org.apache.spark.sql.functions.col("vec_id") === 0L),
          "embedding", "vec_id", "vec_id", k = 10, nPlanes = 4,
          multiProbe = mp)
        .orderBy(org.apache.spark.sql.functions.col("rank"))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(batch == single, s"multiProbe=$mp: batch and single diverge")
    }
  }

  test("IVF top-k recall floor vs brute force, and recall grows with nprobe") {
    def ivf(nprobe: Int) = ids(graft.pipeline.Ivf.searchTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 10,
      numCells = 8, nprobe = nprobe, iters = 2))
    val r3 = (ivf(3) & exact).size / 10.0
    val r8 = (ivf(8) & exact).size / 10.0
    info(s"IVF recall@10: nprobe=3 -> $r3, nprobe=8 -> $r8")
    assert(r3 >= 0.3, s"IVF nprobe=3 recall collapsed: $r3")
    assert(r8 == 1.0, "nprobe = numCells must be exhaustive")
    assert(r8 >= r3, "recall must not shrink as nprobe grows")
  }
}
