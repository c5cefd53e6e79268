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

  /** Contamination ATTRIBUTION — for every flagged training doc
    * (total distinct shared shingles ≥ `minHits`, t13's rule), WHICH
    * benchmark document it shares the most shingles with (ties to the
    * smallest benchmark id) and both counts. The release-forensics
    * step after [[contaminationCounts]] flags: "which eval leaked
    * into the crawl" decides whether to fix the crawler or retire the
    * benchmark.
    *
    * Scale shape: one shingle-keyed join (benchmark side tiny —
    * AQE-broadcast), per-(train, bench) counts bounded by shared
    * shingles, then a train-keyed argmax whose filter sits on the raw
    * row_number so InferWindowGroupLimit caps map-side forwarding at
    * 1 row per doc (the balancedSample pin). The flag leg reuses the
    * scope-cached candidate shingle frame.
    *
    * @return (id, bench_id, n_shared_top, n_hits_total), one row per
    *         flagged doc (unsorted — callers order)
    */
  def contaminationAttribution(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3,
      minHits: Long = 2L): DataFrame = {
    val cand = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      Dedup.hashedShingles(candidates, textCol, idCol, n))
    val bsh = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      Dedup.hashedShingles(benchmark, textCol, idCol, n)
        .select(col("id").as("bench_id"), col("shingle")))
    // hashedShingles emits distinct (id, shingle) rows, so both counts
    // are exact distinct-shingle counts without a countDistinct shuffle
    val hits = cand.join(bsh.select(col("shingle")).distinct(), Seq("shingle"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits_total"))
      .where(col("n_hits_total") >= lit(minHits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("n_shared_top").desc, col("bench_id"))
    val attributed = cand.join(bsh, Seq("shingle"))
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared_top"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    attributed.join(hits, Seq("id"))
      .select(col("id"), col("bench_id"), col("n_shared_top"),
        col("n_hits_total"))
  }

  /** Contamination SENSITIVITY curve — flagged-document counts across
    * shingle sizes n: the calibration run before committing to a
    * decontamination n (small n flags everything that shares common
    * phrases, large n only verbatim spans — e.g. on the fixture
    * corpus n=2 flags 100%, n=8 flags 0.2%). One t09-shaped leg per
    * n (hash-only joins, benchmark side broadcast); the output is
    * |ns| rows.
    *
    * @return (shingle_n, n_flagged, frac_flagged), one row per n
    *         (unsorted — callers order)
    */
  def contaminationCurve(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be positive")
    val nt = candidates.agg(count(lit(1)).cast("double").as("nt"))
    val legs = ns.map { n =>
      contaminationCounts(candidates, benchmark, textCol, idCol, n)
        .agg(count(lit(1)).as("n_flagged"))
        .select(lit(n.toLong).as("shingle_n"), col("n_flagged"))
    }
    legs.reduce(_ unionAll _)
      .crossJoin(broadcast(nt))
      .select(col("shingle_n"), col("n_flagged"),
        (col("n_flagged").cast("double") / col("nt")).as("frac_flagged"))
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

  /** Overlap-FRACTION contamination: (id, n_hits, n_shingles, frac)
    * where frac = n_hits / n_shingles — the share of a document's own
    * distinct shingles that appear in the benchmark. Real pipelines
    * threshold on this rather than the absolute count ([[
    * contaminationCounts]]): 5 shared shingles condemn a tweet but
    * mean nothing for a book.
    *
    * One pass, not a counts⋈sizes self-join: every candidate shingle
    * left-joins the (broadcast) benchmark shingle set with a hit
    * marker, and a single aggregation counts rows (= n_shingles, the
    * kernel emits distinct shingles per doc) and markers (= n_hits)
    * together. The left join keeps the aggregation input at
    * corpus-shingle size, but count() partial-aggregates map-side, so
    * the exchange still carries one row per (partition, doc).
    * Zero-overlap docs are dropped, as in [[contaminationCounts]].
    */
  def contaminationFractions(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val benchShingles = Dedup.hashedShingles(benchmark, textCol, idCol, n)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1))
    Dedup.hashedShingles(candidates, textCol, idCol, n)
      .join(benchShingles, Seq("shingle"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_hits"))
      .where(col("n_hits") > 0)
      .select(col("id"), col("n_hits"), col("n_shingles"),
        (col("n_hits").cast("double") / col("n_shingles").cast("double"))
          .as("frac"))
  }

  /** Per-SUITE contamination report: real pipelines screen against
    * MANY benchmarks at once and triage per suite (an MMLU hit and a
    * GSM8K hit have different blast radii). One pass over the
    * candidate shingles: the benchmark side reduces to DISTINCT
    * (suite, shingle) pairs — still eval-suite-sized, still broadcast
    * under AQE — and the join emits (candidate, suite) hit counts
    * directly; a candidate overlapping three suites yields three
    * rows. Shuffles carry (id, suite, hash), never text.
    *
    * @return (id, suite, n_hits) for every candidate×suite pair with
    *         at least one shared distinct shingle.
    */
  def contaminationBySuite(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, suiteCol: String,
      n: Int = 3): DataFrame = {
    val benchShingles = Dedup.hashedShingles(benchmark, textCol, idCol, n)
      .join(benchmark.select(col(idCol).as("id"), col(suiteCol).as("suite")),
        Seq("id"))
      .select(col("suite"), col("shingle")).distinct()
    Dedup.hashedShingles(candidates, textCol, idCol, n)
      .join(benchShingles, Seq("shingle"))
      .groupBy(col("id"), col("suite"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[removeContaminated]]'s fraction twin: drop candidates whose
    * contaminated-shingle share reaches `minFrac`.
    */
  def removeContaminatedFraction(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3,
      minFrac: Double = 0.5): DataFrame = {
    val flagged = contaminationFractions(candidates, benchmark, textCol, idCol, n)
      .where(col("frac") >= minFrac)
      .select(col("id"))
    candidates.join(flagged, candidates(idCol) === flagged("id"), "left_anti")
  }

  /** Bit position `j` of `shingle` in an `mBits`-bit Bloom filter:
    * the first 4 md5 nibbles of "j:shingle" as an int, mod mBits —
    * the [[TextAnalysis.cmsBucket]] move, deterministic and exactly
    * reproducible in SQL (so the WHOLE filter, false positives
    * included, is oracle-checkable).
    */
  /** FUZZY benchmark-overlap decontamination — the near-match class
    * the exact n-gram filters above can't see: a paraphrased or
    * lightly-edited benchmark copy dilutes its shared-shingle HIT
    * COUNT (the [[contaminationCounts]] measure) across edits, but
    * its set-level Jaccard against the benchmark doc stays high. This
    * flags every candidate whose max Jaccard against ANY benchmark
    * doc reaches τ, and carries the evidence: WHICH benchmark doc
    * (ties to the smallest id) and the similarity — the row a
    * decontamination reviewer actually adjudicates.
    *
    * Scale shape: [[graft.pipeline.Dedup.incrementalNearDupPairs]]'
    * corpus-scans-once shape with the benchmark on the broadcast side
    * (benchmarks are small by construction); the per-doc argmax is
    * one pair-keyed rollup of (id, id, double) triples.
    *
    * @return (id, source, bench_id, max_jaccard round-6) — one row
    *         per CONTAMINATED candidate (unsorted; callers order)
    */
  def fuzzyContamination(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, srcCol: String,
      n: Int = 3, tau: Double = 0.5,
      maxCorpusPostings: Option[Int] = Some(10000)): DataFrame = {
    val pairs = graft.pipeline.Dedup.incrementalNearDupPairs(
      benchmark, candidates, textCol, idCol, n, tau, maxCorpusPostings)
    // argmax via struct max: larger jaccard wins, ties to the SMALLER
    // benchmark id (the same struct-ordering trick as the s07 argmax)
    val flagged = pairs
      .groupBy(col("corpus_id"))
      .agg(max(struct(col("jaccard").as("j"), (-col("new_id")).as("nb")))
        .as("__m"))
      .select(col("corpus_id").as("__did"),
        (-col("__m.nb")).as("bench_id"),
        round(col("__m.j"), 6).as("max_jaccard"))
    candidates.select(col(idCol), col(srcCol))
      .join(flagged, col(idCol) === col("__did"))
      .select(col(idCol), col(srcCol), col("bench_id"), col("max_jaccard"))
  }

  /** FUZZY DECONTAMINATION AT LSH SCALE — [[fuzzyContamination]]'s
    * shape when the benchmark union is itself HUGE: t67 broadcasts
    * the benchmark's shingles (right for eval-suite-sized
    * benchmarks); once the union of every held-out suite stops
    * fitting a broadcast, this variant runs the d03 banding on BOTH
    * sides — shingle → md5 slot-string MinHash (the d12
    * oracle-replayable kernel) → band → (band, key) bucket equi-join
    * — and verifies banded collisions with exact Jaccard over
    * shingle-STRING sets restricted to pair members (the d24 shape).
    * Cost stays pair-bound: the corpus-sized work is the banding
    * exchange, never benchmark × corpus.
    *
    * Recall contract (the standard S-curve): a pair with true
    * Jaccard s collides with probability 1 − (1 − s^r)^bands — at
    * the defaults (8 hashes, 4 bands, r = 2), s = 0.8 collides with
    * p ≈ 0.98 while s = 0.3 only p ≈ 0.31. On benchmarks small
    * enough to broadcast, [[fuzzyContamination]] remains the
    * LOSSLESS reference; the spec pins t70 ⊆ t67 with identical
    * evidence on every flagged row (verification is exact, so a
    * banded collision can never flag what t67 would not).
    *
    * @param maxBucket degenerate-bucket guard on the benchmark side
    *        (a template shared by m suite docs would fan out m rows
    *        per colliding candidate) — the d03 discipline; `None`
    *        for exact-oracle declarations
    * @return (idCol, srcCol, bench_id, max_jaccard) — one row per
    *         FLAGGED candidate, argmax benchmark evidence, ties to
    *         the smaller bench id (t67's exact output shape)
    */
  def fuzzyContaminationLsh(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, srcCol: String,
      n: Int = 3, tau: Double = 0.5, numHashes: Int = 8, bands: Int = 4,
      maxBucket: Option[Int] = Some(10000)): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    // the d12 banding, shared structurally with Dedup.minHashLshMd5
    def banded(df: DataFrame, side: String) =
      graft.pipeline.Dedup.bandedMd5Signature(
        graft.ops.ScaleOps.fanOut(df), textCol, idCol, n, numHashes,
        bands, idAlias = side)
    val cb = banded(candidates, "cand_id")
    val bb0 = banded(benchmark, "bench_id")
    val bb = maxBucket match {
      case Some(m) =>
        val kept = bb0.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("__nb")).where(col("__nb") <= lit(m))
          .select(col("band"), col("key"))
        bb0.join(kept, Seq("band", "key"))
      case None => bb0
    }
    // candidate pairs: bucket-local equi-join, deduped across bands —
    // scope-cached (feeds the member restriction AND the verify join)
    val pairs = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      cb.join(bb, Seq("band", "key"))
        .select(col("cand_id"), col("bench_id")).distinct())
    // exact verification restricted to pair members: shingle-STRING
    // sets (the same normalization the signatures hash — ShingleStrings
    // is distinct by contract, so sizes/intersections are set math)
    def sets(df: DataFrame, side: String) =
      graft.ops.ScaleOps.fanOut(df)
        .select(col(idCol).as(side),
          graft.functions.ShingleStrings(col(textCol), n).as("sh_arr"))
        .join(pairs.select(col(side)).distinct(), Seq(side))
    val cs = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      sets(candidates, "cand_id"))
    val bs = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      sets(benchmark, "bench_id"))
    val inter = pairs
      .join(cs.select(col("cand_id"), explode(col("sh_arr")).as("shingle")),
        Seq("cand_id"))
      .join(bs.select(col("bench_id"), explode(col("sh_arr")).as("shingle")),
        Seq("bench_id", "shingle"))
      .groupBy(col("cand_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_inter"))
    val jac = inter
      .join(cs.select(col("cand_id"),
        size(col("sh_arr")).cast("long").as("n_c")), Seq("cand_id"))
      .join(bs.select(col("bench_id"),
        size(col("sh_arr")).cast("long").as("n_b")), Seq("bench_id"))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_c") + col("n_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= lit(tau))
    // t67's argmax: larger jaccard wins, ties to the SMALLER bench id
    val flagged = jac.groupBy(col("cand_id"))
      .agg(max(struct(col("jaccard").as("j"), (-col("bench_id")).as("nb")))
        .as("__m"))
      .select(col("cand_id").as("__did"), (-col("__m.nb")).as("bench_id"),
        round(col("__m.j"), 6).as("max_jaccard"))
    candidates.select(col(idCol), col(srcCol))
      .join(flagged, col(idCol) === col("__did"))
      .select(col(idCol), col(srcCol), col("bench_id"), col("max_jaccard"))
  }

  def bloomPos(shingle: org.apache.spark.sql.Column, j: Int, mBits: Int)
      : org.apache.spark.sql.Column =
    conv(substring(md5(concat_ws(":", lit(j), shingle)), 1, 4), 16, 10)
      .cast("int") % mBits

  /** Bloom-filter contamination probe — what decontamination actually
    * looks like once the benchmark suite union no longer ships to
    * every executor as raw shingles: the benchmark compresses to an
    * `mBits`-bit Bloom filter (built ONCE, `kHash` deterministic
    * md5-derived positions per shingle), and each candidate shingle
    * probes the broadcast bitset map-side. A shingle "hits" iff ALL
    * its `kHash` positions are set — a superset of true membership
    * (Bloom guarantee: no false negatives), so `bloom_hits >=
    * exact_hits` per doc by construction (spec-pinned); the gap IS
    * the filter's false-positive count, reported side by side with
    * the exact join the way [[TextAnalysis.heavyHittersCms]] reports
    * estimate-beside-truth.
    *
    * Scale shape: the filter is a driver-built `mBits`-length bitset
    * (bounded collect: one boolean per bit from the DISTINCT
    * benchmark positions — 4096 bits here vs the benchmark's shingle
    * set; at 100 TB you'd size m in the millions and it still fits a
    * broadcast variable), inlined as a literal array so every probe
    * is `kHash` codegen'd element_at lookups — NO join, NO exchange
    * for the bloom leg. The exact leg reuses the t09 broadcast
    * discipline (bench shingles are eval-suite-sized). One doc-keyed
    * aggregation total.
    *
    * @return (id, n_shingles, bloom_hits, exact_hits) for every
    *         candidate doc with >= 1 shingle
    */
  def bloomContamination(candidates: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3,
      mBits: Int = 4096, kHash: Int = 3): DataFrame = {
    require(mBits > 0 && kHash > 0, "bad bloom params")
    val benchSh = Dedup.shingles(benchmark, textCol, idCol, n)
      .select(col("shingle")).distinct()
    val setBits = benchSh
      .select(explode(array((0 until kHash).map(j =>
        bloomPos(col("shingle"), j, mBits)): _*)).as("p"))
      .distinct()
      .collect().map(_.getInt(0)).toSet
    val bits = typedLit((0 until mBits).map(setBits.contains))
    val bloomHit = (0 until kHash)
      .map(j => element_at(bits, bloomPos(col("shingle"), j, mBits) + 1))
      .reduce(_ && _)
    // fanOut before the shingle kernel: the corpus parquet arrives in
    // few-file splits and the md5 probe chain runs in the scan stage —
    // without the spread it runs single-partition (measured 3.3 s vs
    // 0.35 s at sf0.1)
    Dedup.shingles(graft.ops.ScaleOps.fanOut(candidates), textCol, idCol, n)
      .join(broadcast(benchSh.withColumn("__ex", lit(1))), Seq("shingle"), "left")
      .select(col("id"),
        bloomHit.cast("long").as("bh"),
        coalesce(col("__ex"), lit(0)).cast("long").as("eh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("bh")).as("bloom_hits"),
        sum(col("eh")).as("exact_hits"))
  }
}
