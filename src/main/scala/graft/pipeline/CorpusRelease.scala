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
  /** The shared per-doc flag frame: (doc_id, source, q round-6,
    * dup, contam). The dedup closure runs EAGERLY inside; the
    * returned frame is scope-cached (first downstream execution
    * releases it), so each public operator built on it owns one
    * single-execution plan.
    */
  private def releaseFlags(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, srcCol: String,
      n: Int, tau: Double, minHits: Long,
      maxPostings: Option[Int]): DataFrame = {
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
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      train.select(col(idCol).cast("long").as("doc_id"),
          col(srcCol).cast("string").as("source"),
          round(TextAnalysis.qualityScore(col(textCol)), 6).as("q"))
        .join(losers, col("doc_id") === col("__did"), "left")
        .join(contam, col("doc_id") === col("__cid"), "left")
        .select(col("doc_id"), col("source"), col("q"),
          col("__did").isNotNull.as("dup"),
          col("__cid").isNotNull.as("contam")))
  }

  def corpusReleaseRun(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, srcCol: String,
      n: Int = 3, tau: Double = 0.3, minHits: Long = 2L,
      minQuality: Double = 0.4,
      maxPostings: Option[Int] = Some(10000)): DataFrame = {
    val spark = train.sparkSession
    // one flag frame feeds every leg of the single result execution
    val flags = releaseFlags(train, bench, textCol, idCol, srcCol,
      n, tau, minHits, maxPostings)
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

  /** The INCREMENTAL release run — [[corpusReleaseRun]]'s daily-ingest
    * sibling (d35's move for the full release pipeline): admit a new
    * batch against a STANDING released corpus without re-running the
    * corpus's own release. Stages in production order, drop counts
    * attributed so they sum exactly to the batch size:
    *
    *  1. `dropped_corpus` — batch docs near-dup (n-gram Jaccard ≥ τ)
    *     of a corpus doc (the corpus always wins: it already shipped);
    *  2. `dropped_batch` — within-batch near-dup losers (keep-min-id
    *     over the closure of the batch-only pair graph);
    *  3. `dropped_contam` — ≥ `minHits` shared shingles with the
    *     benchmark suite;
    *  4. `dropped_quality` — t02 score < `minQuality`;
    *  5. `admitted`.
    *
    * Scale shape: the corpus scans ONCE with the batch's shingles
    * broadcast ([[Dedup.incrementalNearDupPairs]]); the within-batch
    * closure is batch-sized; contamination is the hash-broadcast
    * benchmark join; quality is scan-stage. The per-doc flag frame
    * (batch-sized scalars) is scope-cached and feeds every leg of the
    * one returned plan.
    *
    * @return (stage, doc_id, source, n): `stage='admitted'` rows per
    *         admitted doc (n null), audit rows `stage ∈ input|
    *         dropped_corpus|dropped_batch|dropped_contam|
    *         dropped_quality` (n the count), and one
    *         `stage='admitted_source'` row per source
    */
  def incrementalReleaseRun(newDocs: DataFrame, corpus: DataFrame,
      bench: DataFrame, textCol: String, idCol: String, srcCol: String,
      n: Int = 3, tau: Double = 0.3, minHits: Long = 2L,
      minQuality: Double = 0.4,
      maxPostings: Option[Int] = Some(10000)): DataFrame = {
    // d35's discipline verbatim: the corpus-dup ids cache EAGERLY
    // (materialized before the within-batch closure executes, which
    // would otherwise re-scan the corpus through the anti-join), and
    // the within-batch closure runs on the REMAINDER — the corpus
    // already shipped its representative, so a corpus-dup batch doc
    // must not steal a batch cluster's keep slot
    val corpusDup = Dedup.incrementalNearDupPairs(newDocs, corpus,
        textCol, idCol, n, tau, maxPostings)
      .select(col("new_id").as("__cd")).distinct().cache()
    corpusDup.count(): Unit
    val clean = newDocs.join(
      corpusDup.withColumnRenamed("__cd", idCol), Seq(idCol), "left_anti")
    val batchLosers = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(clean, textCol, idCol, n, tau, maxPostings)
          .select(col("id_a"), col("id_b")))
      .where(col("id") =!= col("component"))
      .select(col("id").as("__bd"))
    org.apache.spark.sql.graftbridge.CacheScope
      .releaseAfterUseExisting(corpusDup)
    val contam = Decontaminate
      .contaminationCounts(newDocs, bench, textCol, idCol, n)
      .where(col("n_hits") >= lit(minHits))
      .select(col("id").as("__ct"))
    val flags = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      newDocs.select(col(idCol).cast("long").as("doc_id"),
          col(srcCol).cast("string").as("source"),
          round(TextAnalysis.qualityScore(col(textCol)), 6).as("q"))
        .join(corpusDup, col("doc_id") === col("__cd"), "left")
        .join(batchLosers, col("doc_id") === col("__bd"), "left")
        .join(contam, col("doc_id") === col("__ct"), "left")
        .select(col("doc_id"), col("source"), col("q"),
          col("__cd").isNotNull.as("cdup"),
          col("__bd").isNotNull.as("bdup"),
          col("__ct").isNotNull.as("contam")))
    val admittedFlag = !col("cdup") && !col("bdup") && !col("contam") &&
      col("q") >= lit(minQuality)
    val admitted = flags.where(admittedFlag)
      .select(lit("admitted").as("stage"), col("doc_id"), col("source"),
        lit(null).cast("long").as("n"))
    def c1(stage: String, pred: Column) = flags
      .agg(sum(when(pred, 1L).otherwise(0L)).as("c"))
      .select(lit(stage).as("stage"), lit(null).cast("long").as("doc_id"),
        lit(null).cast("string").as("source"), col("c").cast("long").as("n"))
    val counts = c1("input", lit(true))
      .unionAll(c1("dropped_corpus", col("cdup")))
      .unionAll(c1("dropped_batch", !col("cdup") && col("bdup")))
      .unionAll(c1("dropped_contam",
        !col("cdup") && !col("bdup") && col("contam")))
      .unionAll(c1("dropped_quality",
        !col("cdup") && !col("bdup") && !col("contam") &&
          col("q") < lit(minQuality)))
    val bySource = flags.where(admittedFlag)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("c"))
      .select(lit("admitted_source").as("stage"),
        lit(null).cast("long").as("doc_id"), col("source"),
        col("c").cast("long").as("n"))
    admitted.unionAll(counts).unionAll(bySource)
  }

  /** The DROP-OVERLAP matrix — the 2×2×2 contingency of the three
    * release filters over the SAME flag frame [[corpusReleaseRun]]
    * attributes in production order: how many docs are (dup, contam,
    * low-quality) in every combination, with each cell's mean
    * quality. Attribution order is a reporting convention — a doc
    * that is both a dup and contaminated counts under whichever
    * filter ran first — and teams argue about the ordering precisely
    * because the attributed counts hide the overlap; this matrix IS
    * the overlap, invariant to ordering. A heavy (1,1,·) diagonal
    * says the filters are redundant on this corpus (spam is both
    * duplicated and low-quality); independent filters say each one
    * pays for itself. All 8 cells report (zero-filled, null mean) so
    * the frame is schema-stable across corpora.
    *
    * Scale shape: the one flag frame (per-doc scalars), an 8-group
    * partial aggregation, and an 8-row literal join.
    *
    * @return (dup, contam, lowq, n_docs, mean_quality) — 8 rows,
    *         flags as 0/1 longs (unsorted — callers order)
    */
  def dropOverlapMatrix(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, srcCol: String,
      n: Int = 3, tau: Double = 0.3, minHits: Long = 2L,
      minQuality: Double = 0.4,
      maxPostings: Option[Int] = Some(10000)): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val flags = releaseFlags(train, bench, textCol, idCol, srcCol,
      n, tau, minHits, maxPostings)
    val agg = flags
      .select(col("dup").cast("long").as("dup"),
        col("contam").cast("long").as("contam"),
        (col("q") < lit(minQuality)).cast("long").as("lowq"),
        col("q"))
      .groupBy(col("dup"), col("contam"), col("lowq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("q").cast("decimal(18,6)")).as("__qs"))
    val cells = broadcast((for {
      d <- 0L to 1L; c <- 0L to 1L; q <- 0L to 1L
    } yield (d, c, q)).toDF("dup", "contam", "lowq"))
    cells.join(agg, Seq("dup", "contam", "lowq"), "left")
      .select(col("dup"), col("contam"), col("lowq"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        (col("__qs").cast("double") / col("n_docs").cast("double"))
          .as("mean_quality"))
  }
}
