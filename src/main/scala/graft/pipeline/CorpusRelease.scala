package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The COMPOSED text-corpus release run — the text family's d34/m24:
  * the nightly job that turns a raw crawl into a releasable training
  * corpus, with the audit trail a release manifest records. Stages in
  * production order, each one a published operator:
  *
  *  1. near-dup dedup (d11's keep-min-id over the n-gram Jaccard
  *     closure) — duplicates drop first so later stages don't count
  *     the same content twice;
  *  2. benchmark decontamination (t13's ≥ `minHits` shared-shingle
  *     rule) over the dedup survivors;
  *  3. quality gate (t02's heuristic score ≥ `minQuality`) over what
  *     remains.
  *
  * The stage drop-counts are attributed in that order (a doc that is
  * both a dup and contaminated counts as a dup drop), so the counts
  * sum exactly: input = dedup_dropped + contam_dropped +
  * quality_dropped + kept.
  */
object CorpusRelease {

  /** Scale shape: the dedup side is d06/d11's pair + eager closure
    * (digests shuffle, text never does); contamination is one
    * hash-keyed join with the benchmark side broadcast (t09's shape);
    * the quality score is a scan-stage projection. The per-doc flag
    * frame (id, source, quality, 2 booleans) is scope-cached and
    * feeds every leg of the ONE returned plan — registered after the
    * eager closure so the closure's internal executions cannot
    * release it early (the d34 discipline).
    *
    * @param train the corpus under release
    * @param bench the benchmark/eval split to decontaminate against
    * @return (stage, doc_id, source, n): one `stage='kept'` row per
    *         released doc (n null), audit rows `stage ∈
    *         input|dedup_dropped|contam_dropped|quality_dropped`
    *         (doc_id/source null, n the count), and one
    *         `stage='kept_source'` row per source (doc_id null)
    */
  def corpusReleaseRun(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, srcCol: String,
      n: Int = 3, tau: Double = 0.3, minHits: Long = 2L,
      minQuality: Double = 0.4,
      maxPostings: Option[Int] = Some(10000)): DataFrame = {
    val spark = train.sparkSession
    // stage 1 flags: the closure is EAGER — it runs to completion here
    val losers = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(train, textCol, idCol, n, tau, maxPostings)
          .select(col("id_a"), col("id_b")))
      .where(col("id") =!= col("component"))
      .select(col("id").as("__did"))
    // stage 2 flags: per-doc shared-shingle counts vs the benchmark
    // (independent of the survivor set, so the filter composes as a
    // plain set operation the oracle can replay)
    val contam = Decontaminate
      .contaminationCounts(train, bench, textCol, idCol, n)
      .where(col("n_hits") >= lit(minHits))
      .select(col("id").as("__cid"))
    // one flag frame feeds every leg of the single result execution
    val flags = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      train.select(col(idCol).cast("long").as("doc_id"),
          col(srcCol).cast("string").as("source"),
          round(TextAnalysis.qualityScore(col(textCol)), 6).as("q"))
        .join(losers, col("doc_id") === col("__did"), "left")
        .join(contam, col("doc_id") === col("__cid"), "left")
        .select(col("doc_id"), col("source"), col("q"),
          col("__did").isNotNull.as("dup"),
          col("__cid").isNotNull.as("contam")))
    val keptFlag = !col("dup") && !col("contam") && col("q") >= lit(minQuality)
    val kept = flags.where(keptFlag)
      .select(lit("kept").as("stage"), col("doc_id"), col("source"),
        lit(null).cast("long").as("n"))
    def c1(stage: String, pred: Column) = flags
      .agg(sum(when(pred, 1L).otherwise(0L)).as("c"))
      .select(lit(stage).as("stage"), lit(null).cast("long").as("doc_id"),
        lit(null).cast("string").as("source"), col("c").cast("long").as("n"))
    val counts = c1("input", lit(true))
      .unionAll(c1("dedup_dropped", col("dup")))
      .unionAll(c1("contam_dropped", !col("dup") && col("contam")))
      .unionAll(c1("quality_dropped",
        !col("dup") && !col("contam") && col("q") < lit(minQuality)))
    val bySource = flags.where(keptFlag)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("c"))
      .select(lit("kept_source").as("stage"),
        lit(null).cast("long").as("doc_id"), col("source"),
        col("c").cast("long").as("n"))
    kept.unionAll(counts).unionAll(bySource)
  }
}
