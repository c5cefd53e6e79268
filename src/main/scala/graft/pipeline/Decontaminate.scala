package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training
  * documents that share word n-gram shingles with an evaluation /
  * benchmark set, so eval answers don't leak into the training mix.
  *
  * Scale shape: both sides reduce to (id, 64-bit shingle hash) rows
  * inside the scan stage (the one-pass
  * [[graft.functions.ShingleHashes]] kernel — no per-shingle string
  * ever materializes), so the join moves 16-byte tuples, never
  * documents. The benchmark side is the small one by construction
  * (eval suites are thousands of docs against a 100 TB corpus): AQE
  * broadcasts its distinct shingle set when it fits, and otherwise
  * the join hash-partitions on the shingle hash — either plan touches
  * each corpus shingle exactly once.
  */
object Decontaminate {

  /** Per-candidate contamination counts: (id, n_hits) where n_hits =
    * number of DISTINCT word n-gram shingles the candidate shares
    * with ANY benchmark document. Candidates with zero overlap are
    * absent (filter semantics: join, not left join) — the common case
    * at scale, so the output is proportional to contamination, not
    * corpus size. Downstream policy (drop / review thresholds) is the
    * caller's.
    */
  def contaminationCounts(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame = {
    // hashedShingles emits distinct (id, shingle) rows (the kernel
    // dedupes per doc), so count(*) after the join is exactly the
    // distinct-shared-shingle count — no countDistinct shuffle needed
    val benchShingles = Dedup.hashedShingles(benchmark, textCol, idCol, n)
      .select(col("shingle")).distinct()
    Dedup.hashedShingles(candidates, textCol, idCol, n)
      .join(benchShingles, Seq("shingle"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The actionable form: the candidate corpus with every document
    * sharing >= `minHits` distinct shingles with the benchmark
    * REMOVED (left-anti join on the flagged id set — ids only, so
    * the anti-join side is tiny and typically broadcast; document
    * text never reshuffles).
    */
  def removeContaminated(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3, minHits: Long = 1): DataFrame = {
    val flagged = contaminationCounts(candidates, benchmark, textCol, idCol, n)
      .where(col("n_hits") >= minHits)
      .select(col("id"))
    candidates.join(flagged, candidates(idCol) === flagged("id"), "left_anti")
  }
}
