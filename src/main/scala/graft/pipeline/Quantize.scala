package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns.
  *
  * At 100 TB the embedding store is the memory bill: float32 → int8
  * cuts it 4× at a small recall cost, which is why scalar
  * quantization is the first lever in every large ANN deployment
  * (FAISS SQ8, ScaNN). This variant uses a FIXED clip range [lo, hi]
  * so quantization is a pure per-element expression — deterministic,
  * engine-portable (differentially tested against DuckDB), no
  * corpus-stats pass, no shuffle. A data-dependent range would add
  * one min/max aggregation (exact, order-independent) feeding the
  * same kernel.
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

  /** Reconstructed float vector from codes. */
  def dequantize(qvec: Column, lo: Double, hi: Double): Column =
    transform(qvec, q => dequantizeElem(q, lo, hi))

  /** Worst per-dimension absolute reconstruction error of a vector —
    * bounded by (hi − lo)/255/2 + clipping error outside [lo, hi].
    */
  def maxReconstructionError(vec: Column, qvec: Column, lo: Double, hi: Double): Column =
    array_max(zip_with(vec, dequantize(qvec, lo, hi),
      (x, r) => abs(x.cast("double") - r)))

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
}
