package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, Spark-first.
  *
  * Scale design (the interesting part at 100 TB):
  *  - exact/fingerprint dedup is a single hash-partitioned groupBy on
  *    a 128/64-bit digest — the digest (not the document) is the
  *    shuffle key, so shuffle volume is O(#docs × 16 bytes), not the
  *    corpus size.
  *  - MinHash-LSH shuffles (band-id, band-hash) pairs: O(#docs ×
  *    #bands × 16 bytes). Candidate pairs are generated per-bucket
  *    with a self-join *inside* each bucket; a bucket-size cap guards
  *    against degenerate buckets (all-identical spam) exploding the
  *    join quadratically.
  *  - SimHash reduces each doc to one 64-bit signature, then blocks
  *    on 16-bit bands (pigeonhole: hamming ≤ 3 ⇒ at least one of 4
  *    bands equal), so the pair join is again bucket-local.
  *  - verification joins are broadcast-free equi-joins on doc ids.
  */
object Dedup {

  /** Exact duplicate groups under whitespace/case normalization.
    * Returns one row per duplicate *group* (fingerprint, size,
    * representative = min id) — the usual "keep one per group" shape.
    */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(
        count(lit(1)).as("group_size"),
        min(col(idCol)).as("keep_id"))

  /** Word n-gram shingle set, one row per distinct (id, shingle).
    * Tokens come from the canonical form (lowercased,
    * whitespace-collapsed) so exact duplicates under normalization
    * always produce identical shingle sets — which in turn guarantees
    * MinHash-LSH recall 1.0 on them.
    */
  def shingles(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val toks = split(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")), " ")
    // shingle i = tokens[i..i+n): build via transform over an index
    // sequence — stays inside codegen, no explode until after distinct
    // guard short docs: sequence(0, -1) would DESCEND and produce
    // negative indices (slice start 0 error)
    val idxs = when(size(toks) >= lit(n), sequence(lit(0), size(toks) - lit(n)))
      .otherwise(array().cast("array<int>"))
    val grams = transform(idxs, i => array_join(slice(toks, i + 1, lit(n)), " "))
    docs
      .select(col(idCol).as("id"), explode(array_distinct(grams)).as("shingle"))
      .where(length(col("shingle")) > 0)
  }

  /** Exact n-gram Jaccard similarity over all candidate pairs sharing
    * at least one shingle. Output: (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard ≥ threshold.
    *
    * This is the exact (quadratic-in-collisions) baseline; use
    * [[minHashLsh]] at scale. The shared-shingle join is the classic
    * inverted-index trick: pairs with zero overlap are never formed.
    */
  /** Hashed shingle rows (id, shingle: long) via the one-pass
    * [[graft.functions.ShingleHashes]] kernel — same shingle set as
    * [[shingles]], no per-shingle string materialization.
    */
  def hashedShingles(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(graft.functions.ShingleHashes(col(textCol), n)).as("shingle"))

  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double): DataFrame = {
    // join/shuffle 64-bit shingle hashes, not strings: ~25% the
    // shuffle bytes, primitive-key join. A hash collision would
    // inflate an intersection count, but even 1e6 distinct shingles
    // in a 2^64 space put P(any collision) ~ 1e-7 — far below other
    // nondeterminism sources.
    val sh = hashedShingles(docs, textCol, idCol, n).cache()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("id").as("id_a"), col("shingle"))
    val b = sh.select(col("id").as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= lit(threshold))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature columns sig_0 … sig_{k-1}: k independent hash
    * functions realized as xxhash64(shingle, seed_i) minima — one
    * groupBy over the shingle frame computes all k at once (single
    * shuffle, map-side partial min).
    */
  def minHashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"sig_$i"))
    sh.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding near-dup candidates, verified with exact
    * Jaccard. numHashes = bands × rowsPerBand.
    *
    * Probability a pair with true Jaccard s becomes a candidate:
    * 1 − (1 − s^rows)^bands — e.g. 16 bands × 4 rows catches
    * s = 0.7 with p ≈ 0.986 while s = 0.3 only p ≈ 0.12.
    */
  def minHashLsh(
      docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sh = hashedShingles(docs, textCol, idCol, shingleN).cache()
    val sig = minHashSignatures(sh, numHashes)
    // band value = hash of its rowsPerBand signature slots
    val bandCols = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(slots: _*).as("bh"))
    }
    val buckets = sig
      .select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    // degenerate-bucket guard: drop buckets larger than maxBucket
    val sized = buckets
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .where(col("bucket_n") <= lit(maxBucket))
    val l = sized.select(col("band"), col("bh"), col("id").as("id_a"))
    val r = sized.select(col("band"), col("bh"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // exact-Jaccard verification of candidates only
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = candidates
      .join(sh.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingle").as("shingle_b")), Seq("id_b"))
      .where(col("shingle") === col("shingle_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= lit(threshold))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash signature per document: for each bit j, sum ±1
    * over token hashes and take the sign. Expressed as a lateral
    * explode of (token-hash × bit) contributions + two aggregations —
    * all shuffle keys are (id) or (id, bit), so it parallelizes to
    * arbitrary cluster width.
    */
  def simHash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(
      col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col("id"), xxhash64(col("tok")).as("h"))
    // bit j of the signature: sign of Σ_tokens (±1) = (2·cnt_j > n)
    // where cnt_j counts tokens with bit j set. One groupBy with 64
    // bit-count aggregates — no 64× row explosion, map-side partials
    // carry (n, cnt_0..cnt_63) per id.
    val bitCounts = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"c$j"))
    val counted = toks.groupBy(col("id"))
      .agg(count(lit(1)).as("n"), bitCounts: _*)
    val sig = (0 until 64).map(j =>
      when(col(s"c$j") * 2 > col("n"), shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_ + _)
    counted.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming
    * (≤ 3 guaranteed-recall with the 4×16-bit band blocking;
    * pigeonhole: ≤3 differing bits cannot hit all 4 bands).
    */
  def simHashPairs(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = simHash(docs, textCol, idCol).cache()
    val banded = sig.select(
      col("id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("bv"))): _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band").as("band"), col("bk.bv").as("bv"))
    val l = banded.select(col("band"), col("bv"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val r = banded.select(col("band"), col("bv"), col("id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("band", "bv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= lit(maxHamming))
  }

  /** Embedding-cosine near-duplicate pairs (brute force within an
    * id-blocked join; see Similarity.cosine for the expression).
    * At scale, swap the cross join for Similarity.lshBuckets.
    */
  def embeddingNearDups(
      emb: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", Similarity.cosine(col("va"), col("vb")))
      .where(col("cos_sim") >= lit(threshold))
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }
}
