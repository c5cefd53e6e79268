package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns.
  *
  * At 100 TB the embedding store is the memory bill: float32 → int8
  * cuts it 4× at a small recall cost, which is why scalar
  * quantization is the first lever in every large ANN deployment
  * (FAISS SQ8, ScaNN). The base variant uses a FIXED clip range
  * [lo, hi] so quantization is a pure per-element expression —
  * deterministic, engine-portable (differentially tested against
  * DuckDB), no corpus-stats pass, no shuffle. [[trainRange]] adds the
  * data-dependent range: one exact min/max aggregation over the
  * corpus (order-independent, so still deterministic) feeding the
  * SAME kernel — the FAISS `SQ8 train()` analogue. Real embedding
  * distributions rarely fill a guessed clip range; training removes
  * the clipping error entirely and shrinks bucket width to the
  * observed spread.
  *
  * Codes are signed bytes: q = round((x − lo) / (hi − lo) · 255) −
  * 128, clamped to [−128, 127]; dequantize is the affine inverse at
  * the bucket midpoint scale.
  */
object Quantize {

  def quantizeElem(x: Column, lo: Double, hi: Double): Column = {
    val scaled = round((x.cast("double") - lit(lo)) / lit(hi - lo) * lit(255.0)) - lit(128)
    greatest(lit(-128), least(lit(127), scaled)).cast("byte")
  }

  def dequantizeElem(q: Column, lo: Double, hi: Double): Column =
    (q.cast("double") + lit(128.0)) / lit(255.0) * lit(hi - lo) + lit(lo)

  /** Append `outCol`: the int8-quantized vector. */
  def scalarQuantize(df: DataFrame, vecCol: String, lo: Double, hi: Double,
      outCol: String = "qvec"): DataFrame =
    df.withColumn(outCol, transform(col(vecCol), x => quantizeElem(x, lo, hi)))

  /** The data-dependent clip range: exact global (min, max) over every
    * element of every vector. One partial-aggregated pass — each map
    * partition folds its vectors to a single (min, max) pair before
    * the (all-to-one, 16-byte) exchange, so the cost is one corpus
    * scan regardless of size, and min/max are order-independent so
    * the trained range is deterministic. Degenerate corpora (all
    * elements equal) get a ±0.5 pad so hi > lo always holds.
    */
  def trainRange(df: DataFrame, vecCol: String): (Double, Double) = {
    val row = df.agg(
      min(array_min(col(vecCol).cast("array<double>"))).as("lo"),
      max(array_max(col(vecCol).cast("array<double>"))).as("hi"))
      .head()
    require(!row.isNullAt(0), "cannot train a range on an empty corpus")
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    if (hi > lo) (lo, hi) else (lo - 0.5, hi + 0.5)
  }

  /** [[scalarQuantize]] with the clip range trained from the corpus
    * itself; returns the trained range alongside the coded frame
    * (dequantization needs it — it is the index's metadata, exactly
    * like FAISS's `ScalarQuantizer.trained` array).
    */
  def scalarQuantizeTrained(df: DataFrame, vecCol: String,
      outCol: String = "qvec"): (DataFrame, Double, Double) = {
    val (lo, hi) = trainRange(df, vecCol)
    (scalarQuantize(df, vecCol, lo, hi, outCol), lo, hi)
  }

  /** Reconstructed float vector from codes. */
  def dequantize(qvec: Column, lo: Double, hi: Double): Column =
    transform(qvec, q => dequantizeElem(q, lo, hi))

  /** Worst per-dimension absolute reconstruction error of a vector —
    * bounded by (hi − lo)/255/2 + clipping error outside [lo, hi].
    */
  def maxReconstructionError(vec: Column, qvec: Column, lo: Double, hi: Double): Column =
    array_max(zip_with(vec, dequantize(qvec, lo, hi),
      (x, r) => abs(x.cast("double") - r)))

  /** Scalar-quantization BIT-WIDTH sweep — reconstruction MSE and
    * worst-case error at every candidate bit width, from ONE corpus
    * scan: each width is just a different level count in the same
    * affine round-trip, so the whole memory-vs-fidelity curve
    * (the number read before choosing SQ8 vs SQ4 storage) is
    * arithmetic over a |bits|-row broadcast. Completes the
    * quantization tuning-audit pair with [[graft.pipeline.Pq
    * .distortionReport]] (PQ's resolution check); expect MSE to fall
    * ~4× per bit (uniform-quantizer noise ∝ step²).
    *
    * Map-only; only (bits, sq_sum, mx, n) scalars reach the
    * |bits|-row aggregation. Per-element errors are bit-exact (the
    * s06 affine spelling); `mse` carries ROUND(6) for engine sum
    * order, `max_abs_err` is exact.
    *
    * @return (bits, n_values, mse, max_abs_err) ordered by bits
    */
  def bitsSweep(df: DataFrame, vecCol: String, lo: Double, hi: Double,
      bitsList: Seq[Int] = Seq(2, 4, 6, 8)): DataFrame = {
    require(bitsList.nonEmpty && bitsList == bitsList.sorted &&
      bitsList.distinct == bitsList && bitsList.forall(b => b >= 1 && b <= 16),
      "bits must be sorted distinct in [1,16]")
    require(hi > lo, "hi must exceed lo")
    val ls = broadcast(df.sparkSession.createDataFrame(
        bitsList.map(b => (b.toLong, ((1 << b) - 1).toDouble)))
      .toDF("bits", "lev"))
    val rng = hi - lo
    def err(x: Column) = x.cast("double") -
      (greatest(lit(0.0), least(col("lev"),
        round((x.cast("double") - lit(lo)) / lit(rng) * col("lev")))) /
        col("lev") * lit(rng) + lit(lo))
    df.select(col(vecCol).as("v")).crossJoin(ls)
      .select(col("bits"),
        aggregate(transform(col("v"), x => err(x) * err(x)),
          lit(0.0), _ + _).as("sq_sum"),
        array_max(transform(col("v"), x => abs(err(x)))).as("mx"),
        size(col("v")).cast("long").as("n"))
      .groupBy(col("bits"))
      .agg(sum(col("n")).as("n_values"),
        round(sum(col("sq_sum")) / sum(col("n")).cast("double"), 6).as("mse"),
        max(col("mx")).as("max_abs_err"))
      .orderBy(col("bits"))
  }

  /** Bit-width DECISION — [[bitsSweep]] turned into the one-row
    * verdict a quantized-index build acts on: the SMALLEST bit width
    * whose corpus MSE meets `targetMse` (storage is the thing being
    * minimized; error is the constraint), falling back to the largest
    * candidate — flagged unmet — when none qualifies. Reports the
    * chosen width's full sweep row so the build manifest records the
    * error actually accepted.
    *
    * Scale shape: the sweep's one corpus scan; the decision is a
    * |bits|-row sort-limit.
    *
    * @return one row (bits, n_values, mse, max_abs_err, target_mse,
    *         met 0/1)
    */
  def bitsDecision(df: DataFrame, vecCol: String, lo: Double, hi: Double,
      targetMse: Double,
      bitsList: Seq[Int] = Seq(2, 4, 6, 8)): DataFrame = {
    require(targetMse > 0.0, "targetMse must be positive")
    val sweep = bitsSweep(df, vecCol, lo, hi, bitsList)
      .withColumn("met", (col("mse") <= lit(targetMse)).cast("long"))
    // smallest qualifying width, else the largest candidate: one
    // deterministic sort over |bits| rows
    sweep
      .orderBy(col("met").desc,
        when(col("met") === 1L, col("bits")).otherwise(-col("bits")))
      .limit(1)
      .select(col("bits"), col("n_values"), col("mse"), col("max_abs_err"),
        lit(targetMse).as("target_mse"), col("met"))
  }

  /** Brute-force cosine top-k over DEQUANTIZED vectors — the scan
    * side of a quantized index: the corpus holds int8 codes (4×
    * smaller), reconstruction happens on the fly in the scan stage.
    */
  def quantizedTopK(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, lo: Double, hi: Double): DataFrame = {
    val coded = scalarQuantize(emb, vecCol, lo, hi)
      .select(col(idCol), dequantize(col("qvec"), lo, hi).as("rvec"))
    val q = emb.where(col(idCol) === lit(queryId))
      .select(col(vecCol).cast("array<double>").as("q_vec"))
    graft.ops.ScaleOps.fanOut(coded).where(col(idCol) =!= lit(queryId))
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", Similarity.cosine(col("rvec"), col("q_vec")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Two-stage retrieval: SQ8 shortlist → exact re-rank — THE
    * production ANN memory/quality trade (FAISS's
    * quantizer-then-refine): stage 1 scans the 4×-smaller
    * reconstructed-int8 corpus for a top-`shortlist` candidate set
    * (all quantization error can do is rank candidates slightly
    * wrong — recall is protected by shortlist ≫ k), stage 2 computes
    * EXACT cosine only for those `shortlist` full-precision vectors
    * and takes the final top-k. Deterministic end to end (id
    * tie-breaks in both stages), so the full two-stage trajectory is
    * SQL-replayable.
    *
    * Scale shape: stage 1 is the quantized scan (at 100 TB the int8
    * codes are the only corpus-sized read — a quarter of the float
    * I/O, and the reconstruction rides the codegen'd projection);
    * stage 2's shortlist is k-bounded driver-free work: the id set
    * broadcasts back as a semi-join build side, so the full-precision
    * leg touches `shortlist` rows, not the corpus.
    *
    * @return (idCol, cos_sim) — exact cosines, final top-k order
    */
  /** Retrieval-quality audit: nDCG@k of the quantized (SQ8
    * reconstructed) ranking against the exact-cosine ranking, per
    * query — the evaluation every ANN deployment runs before trusting
    * the approximation with ranking-sensitive work (recall@k counts
    * hits; nDCG also charges the approximation for returning them in
    * the wrong ORDER). Relevance is binary membership in the exact
    * top-k; DCG discounts by 1/log₂(rank+1); IDCG is the constant
    * all-hits-in-order sum, folded i-ascending on both engines.
    *
    * Scale shape: both legs are the batch-scan contract — queries
    * broadcast, ONE pass over the quantized codes and ONE over the
    * full-precision vectors, per-query WindowGroupLimit; the audit
    * join is (k × queries)-sized. Self-pairs excluded from both legs.
    *
    * @return (query_id, n_hits, ndcg) — ndcg ROUND(6)
    */
  def retrievalNdcg(emb: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, queryIdCol: String, k: Int,
      lo: Double, hi: Double): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol))
    def leg(corpus: DataFrame, vec: Column): DataFrame =
      graft.ops.ScaleOps.fanOut(corpus)
        .crossJoin(broadcast(q))
        .where(col(idCol) =!= col("query_id"))
        .withColumn("sim", Similarity.cosine(vec, col("q_vec")))
        .withColumn("rank", row_number().over(wq))
        .where(col("rank") <= k)
        .select(col("query_id"), col(idCol), col("rank"))
    val approx = leg(
      scalarQuantize(emb, vecCol, lo, hi)
        .select(col(idCol), dequantize(col("qvec"), lo, hi).as("rvec")),
      col("rvec"))
    val exact = leg(emb.select(col(idCol), col(vecCol)), col(vecCol).cast("array<double>"))
      .select(col("query_id"), col(idCol), lit(1L).as("hit"))
    // IDCG: left fold i-ascending — the same sequential order as the
    // oracle's list_sum, so the constant agrees to the last ulp class
    // ROUND(6) absorbs
    val idcg = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    approx.join(exact, Seq("query_id", idCol), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        (round(sum(when(col("hit") === 1L,
            lit(1.0) / log2(col("rank").cast("double") + lit(1.0)))
          .otherwise(lit(0.0))) / lit(idcg), 6) + lit(0.0)).as("ndcg"))
  }

  def rerankedTopK(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, shortlist: Int,
      lo: Double, hi: Double): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val short = quantizedTopK(emb, vecCol, idCol, queryId, shortlist, lo, hi)
      .select(col(idCol))
    val q = emb.where(col(idCol) === lit(queryId))
      .select(col(vecCol).cast("array<double>").as("q_vec"))
    emb.join(broadcast(short), Seq(idCol), "left_semi")
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", Similarity.cosine(col("v"), col("q_vec")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
