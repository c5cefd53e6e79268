package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Sampling for a 100 TB corpus must be (a) reproducible across runs
  * and engines — a re-run of the pipeline must pick the same rows, or
  * every downstream artifact changes; (b) skew-proof — `ORDER BY
  * rand()` breaks both. The pseudo-random key here is `md5(id)`:
  * uniformly distributed, stable everywhere (`rand()` is neither),
  * and cheap.
  *
  * Scale shape: one hash-partition shuffle by stratum; each stratum
  * reduces to its top-k inside the window — output is k rows per
  * stratum regardless of stratum skew. (A pathologically hot stratum
  * still funnels through one reducer for ranking; if that bites,
  * pre-filter with an approximate per-stratum threshold first.)
  */
object Sampling {

  /** k deterministic rows per stratum, ranked by md5 of the id (ties
    * broken by the id itself, so the pick is total and stable).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val key: Column = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col(strataCol)).orderBy(key, col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }
}
