package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization mechanics + retrieval quality. Codebook
  * training is deterministic (hash-ordered sample, fixed Lloyd
  * iterations), so every assertion is stable.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sfDir

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("seeded codebooks are the first-k-by-id subvectors; search is deterministic") {
    val books = graft.pipeline.Pq.seedCodebooks(emb, "embedding", "vec_id",
      m = 8, ksub = 16)
    assert(books.length == 8 && books.forall(_.length == 16))
    // codebook j, code c == subvector j of the vector with the c-th
    // smallest vec_id — the property that makes s16 oracle-expressible
    val first = emb.orderBy(col("vec_id")).limit(16)
      .select(transform(col("embedding"), _.cast("double")))
      .collect().map(_.getSeq[Double](0).toArray)
    (0 until 8).foreach { j =>
      (0 until 16).foreach { c =>
        assert(books(j)(c).toSeq == first(c).slice(j * 8, (j + 1) * 8).toSeq)
      }
    }
    val a = graft.pipeline.Pq.searchTopKSeeded(emb, "embedding", "vec_id",
      queryId = 0L, k = 10, m = 8, ksub = 16).collect().toSeq
    val b = graft.pipeline.Pq.searchTopKSeeded(emb, "embedding", "vec_id",
      queryId = 0L, k = 10, m = 8, ksub = 16).collect().toSeq
    assert(a == b && a.size == 10)
  }

  test("encode emits m codes per row, each within [0, ksub)") {
    val books = graft.pipeline.Pq.trainCodebooks(
      emb, "embedding", "vec_id", m = 8, ksub = 16, iters = 2,
      maxTrainRows = 1000)
    assert(books.length == 8)
    assert(books.forall(cb => cb.nonEmpty && cb.length <= 16))
    assert(books.forall(_.forall(_.length == 8))) // 64 / m
    val coded = graft.pipeline.Pq.encode(emb, "embedding", books)
    val bad = coded.where(size(col("codes")) =!= 8 ||
        exists(col("codes"), c => c < 0 || c >= 16))
      .count()
    assert(bad == 0, "codes out of range")
  }

  test("encode picks the L2-nearest codebook entry (spot check vs local)") {
    val books = graft.pipeline.Pq.trainCodebooks(
      emb, "embedding", "vec_id", m = 8, ksub = 16, iters = 2,
      maxTrainRows = 1000)
    val rows = graft.pipeline.Pq.encode(emb, "embedding", books)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")),
        col("codes"))
      .orderBy(col("vec_id")).limit(20).collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val codes = r.getSeq[Int](2)
      (0 until 8).foreach { j =>
        val slice = v.slice(j * 8, (j + 1) * 8)
        val best = books(j).zipWithIndex.minBy { case (c, code) =>
          val d = slice.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, code)
        }._2
        assert(codes(j) == best,
          s"vec ${r.getLong(0)} subspace $j: got ${codes(j)}, want $best")
      }
    }
  }

  test("ADC approximates exact cosine within quantization error") {
    // ADC score vs exact cosine on the same (query, candidate) pairs:
    // the approximation error is bounded by the codebooks' resolution;
    // on this corpus the mean absolute gap stays well under 0.2
    val adc = graft.pipeline.Pq.searchTopK(emb, "embedding", "vec_id",
      queryId = 0L, k = 50, m = 8, ksub = 16, iters = 3, rerank = 0)
    val exact = graft.pipeline.Similarity.bruteForceTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 500)
    val joined = adc.join(exact.withColumnRenamed("cos_sim", "exact_sim"),
        "vec_id")
      .select(avg(abs(col("adc_sim") - col("exact_sim"))).as("mae"))
      .collect().head.getDouble(0)
    info(f"ADC mean |err| vs exact cosine = $joined%.4f")
    assert(joined < 0.2, s"ADC diverged from exact cosine: mae=$joined")
  }

  test("PQ+rerank recall floor vs brute force; rerank lifts recall") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = ids(graft.pipeline.Similarity.bruteForceTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 10))
    val pure = ids(graft.pipeline.Pq.searchTopK(emb, "embedding", "vec_id",
      queryId = 0L, k = 10, m = 16, ksub = 16, iters = 3, rerank = 0))
    val rr = ids(graft.pipeline.Pq.searchTopK(emb, "embedding", "vec_id",
      queryId = 0L, k = 10, m = 16, ksub = 16, iters = 3, rerank = 30))
    val pureR = (pure & exact).size / 10.0
    val rrR = (rr & exact).size / 10.0
    info(s"PQ recall@10 (m=16, ksub=16): ADC-only = $pureR, rerank(30) = $rrR")
    assert(pureR >= 0.4, s"ADC recall collapsed: $pureR")
    assert(rrR >= pureR, "exact re-rank must not lower recall")
    assert(rrR >= 0.7, s"reranked recall floor: $rrR")
  }

  test("IVF-PQ with nprobe = numCells and full rerank equals brute force") {
    val n = emb.count().toInt
    val full = graft.pipeline.Pq.searchTopKIvf(emb, "embedding", "vec_id",
        queryId = 0L, k = 10, numCells = 8, nprobe = 8, m = 16, ksub = 16,
        iters = 2, rerank = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = graft.pipeline.Similarity.bruteForceTopK(
        emb, "embedding", "vec_id", queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact, "exhaustive IVF-PQ must equal brute force")
  }

  test("IVF-PQ recall floor at partial probe; more probes never hurt") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = ids(graft.pipeline.Similarity.bruteForceTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 10))
    def ivfpq(np: Int) = ids(graft.pipeline.Pq.searchTopKIvf(
      emb, "embedding", "vec_id", queryId = 0L, k = 10, numCells = 8,
      nprobe = np, m = 16, ksub = 16, iters = 2, rerank = 30))
    val r4 = (ivfpq(4) & exact).size / 10.0
    val r8 = (ivfpq(8) & exact).size / 10.0
    info(s"IVF-PQ recall@10: nprobe=4 -> $r4, nprobe=8 -> $r8")
    assert(r4 >= 0.4, s"IVF-PQ recall collapsed: $r4")
    assert(r8 >= r4, "recall must not shrink as nprobe grows")
  }

  test("batch PQ equals single-query ADC per query id") {
    // both paths must train their codebooks on the SAME frame (the
    // full corpus), or Lloyd means differ and scores diverge — so the
    // batch runs over the full corpus and the query's self-row is
    // dropped post hoc; the remaining ranked (id, score) sequence
    // must equal single-query searchTopK's exactly
    val single = graft.pipeline.Pq.searchTopK(emb, "embedding", "vec_id",
        queryId = 0L, k = 10, m = 16, ksub = 16, iters = 2, rerank = 0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = graft.pipeline.Pq.searchTopKBatch(emb,
        emb.where(col("vec_id") === 0L),
        "embedding", "vec_id", "vec_id", k = 11, m = 16, ksub = 16,
        iters = 2)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
      .filterNot(_._1 == 0L).take(10).toSeq
    assert(batch == single, s"batch and single ADC diverge")
  }

  test("batch PQ rejects an unbounded query set") {
    val err = intercept[IllegalArgumentException](
      graft.pipeline.Pq.searchTopKBatch(emb, emb, "embedding", "vec_id",
        "vec_id", k = 5, m = 16, ksub = 16, maxQueryRows = 10))
    assert(err.getMessage.contains("maxQueryRows"))
  }

  test("rerank >= corpus is exhaustive-equivalent on the candidate set") {
    // with rerank covering the whole corpus the ADC stage can't drop
    // a true neighbor: result must equal brute force exactly
    val n = emb.count().toInt
    val rr = graft.pipeline.Pq.searchTopK(emb, "embedding", "vec_id",
        queryId = 0L, k = 10, m = 8, ksub = 16, iters = 3, rerank = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = graft.pipeline.Similarity.bruteForceTopK(
        emb, "embedding", "vec_id", queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rr == exact, "full-rerank PQ must equal brute force")
  }
}
