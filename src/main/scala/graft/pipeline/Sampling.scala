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

  /** The shared deterministic-rank contract: rows ranked within each
    * stratum by md5 of the id, ties broken by the id itself — total,
    * stable, and mirrored verbatim by the DuckDB oracle text of t06
    * and t10. Both samplers MUST rank through here.
    */
  private def withSampleRank(df: DataFrame, strataCol: String,
      idCol: String): DataFrame = {
    val key: Column = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col(strataCol)).orderBy(key, col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
  }

  /** k deterministic rows per stratum, ranked by md5 of the id (ties
    * broken by the id itself, so the pick is total and stable).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame =
    withSampleRank(df, strataCol, idCol).where(col("sample_rank") <= k)

  /** Deterministic data-mixing resampler: per-stratum quota plus
    * epoch upsampling — the "data mixture" step of training-set
    * assembly (e.g. 3 epochs of wiki, 1 epoch of web crawl). For each
    * stratum in `mix`, keeps its quota of rows by the same stable
    * md5-of-id rank as [[stratifiedSample]], then replicates each
    * kept row once per epoch with an `epoch` index column. Strata not
    * in `mix` are dropped (quota 0).
    *
    * Scale shape: one hash-partition shuffle by stratum for the rank
    * window; the epoch replication is a generator in the same stage —
    * output rows are produced where the input partition lives, so
    * upsampling never shuffles. The `mix` CASE expressions are pure
    * literals folded into codegen.
    */
  def sourceMix(df: DataFrame, strataCol: String, idCol: String,
      mix: Map[String, (Int, Int)]): DataFrame = {
    val quota = mix.foldLeft(lit(0)) { case (acc, (s, (q, _))) =>
      when(col(strataCol) === s, lit(q)).otherwise(acc)
    }
    val epochs = mix.foldLeft(lit(0)) { case (acc, (s, (_, e))) =>
      when(col(strataCol) === s, lit(e)).otherwise(acc)
    }
    withSampleRank(df, strataCol, idCol)
      // epochs guard: sequence(1, 0) would DESCEND and emit [1, 0]
      .where(col("sample_rank") <= quota && epochs > 0)
      .withColumn("epoch", explode(sequence(lit(1), epochs)))
      .withColumn("epoch", col("epoch").cast("long"))
  }
}
