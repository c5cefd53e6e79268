package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Oracle REPLAY on generated corpora: the fixed correctness suite
  * runs Spark queries against DuckDB oracles on the driver's test
  * data — this spec re-runs a slice of exactly those pairs on seeded
  * RANDOM documents (planted duplicates, short/empty docs, skewed
  * sources), so a hash-match can't be an artifact of one corpus.
  * Everything is reused verbatim: `SparkEntry.queries(name)` reads
  * the synthetic sf dir, `SparkEntry.oracleSql(name)` runs on a
  * DuckDB view over the same parquet.
  */
@org.scalatest.tags.Slow
class GeneratedCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // text-operator queries whose outputs are integers, strings, or
  // contract-rounded/exact-division doubles — the cross-engine-stable
  // subset (float-accumulation queries keep their fixed-corpus checks)
  private val replayQueries = Seq(
    "d01_dedup_exact", "d02_dedup_ngram_jaccard", "d09_chunk_dedup",
    "d12_minhash_md5_oracle", "d13_simhash_md5_oracle", "t03_token_stats",
    "t14_decontaminate_fraction", "t15_token_entropy", "t16_sequence_pack",
    "t17_hash_split", "t18_quality_gate", "t20_vocab_coverage",
    "t21_decontaminate_by_suite",
    // round-8 additions: t22's ln-sum is contract-rounded like t15;
    // t23 is integers + one exact division; the codec roundtrips are
    // integer sums over ASCII bytes (the generator is pure ASCII)
    "t22_bigram_logprob", "t23_ngram_novelty", "t24_heavy_hitters_cms",
    "t27_interpolated_logprob", "t28_temperature_mix",
    "t25_pii_redaction", "t26_zipf_fit", "m04_wav_decode", "m05_bmp_decode",
    "m06_bmp_resize", "m07_wav_resample",
    // round-9 additions: d16 is integer interval-union counts + one
    // exact division; t31's ln-sum is contract-rounded like t22/t27;
    // t32 is pure integer counts (bloom positions are md5-derived
    // integers on both engines)
    "d16_span_coverage", "t31_kneser_ney_logprob", "t32_bloom_decontaminate",
    "d17_snapshot_diff", "q70_pivot",
    // t33 is a deterministic draw (md5 uniforms); t34 is integer pair
    // counts over a contract-rounded score — both exactly replayable
    "t33_weighted_sample", "t34_classifier_auc",
    // t35 ranks on ln of an exact-integer quotient (the t22 class);
    // t36 is set-cardinality integers + exact divisions; d18 rebuilds
    // text from integer positions — strings and counts only
    "t35_pmi_collocations", "t36_vocab_overlap", "d18_chunk_removal",
    // d19 is integer pair counts + exact divisions; the decile floor
    // runs on the identical double in both engines; d20 rebuilds text
    // from integer positions (strings and counts only)
    "d19_lsh_recall", "d20_span_removal",
    // t37's quantiles are exact type-7 interpolation (the q66
    // percentile==quantile_cont pin) over the contract-rounded t15
    // score; percent_rank is integers divided once
    "t37_source_normalize",
    // d21 is digests + counts + sorted string lists; m09 is the m04
    // byte math through the dispatching generic path (ASCII corpus)
    "d21_dedup_provenance", "m09_media_features_real",
    // t38 is an md5-rank permutation (pure strings/ints); t39 is
    // integer bucket arithmetic + one exact division
    "t38_epoch_shuffle", "t39_length_buckets",
    // d22 is the d06 closure + integer sizes + one exact division;
    // t40 is the same closure feeding the t17 md5 CASE
    "d22_soft_dedup_weights", "t40_leakage_safe_split",
    // round-10: t41 appends decomposed suffixes to every doc, so NFC
    // fires on the (ASCII) generated corpus too — md5-pinned both
    // engines; t42 is integer regex counts + fixed-order IEEE doubles;
    // m10/m11 are integer bit math + one exact division (ASCII pin)
    "t41_nfc_normalize", "t42_readability",
    "m10_perceptual_hash", "m11_phash_dup_pairs", "m12_frame_phash_dedup",
    // t43 is integer bin counts + DECIMAL-exact score sums over the
    // contract-rounded t15 entropy, deterministic NTILE tie order
    "t43_calibration_bins",
    // t44 is pure strings + integer counts with a lexicographic
    // tie-break — the whole k-round trajectory replays exactly
    "t44_bpe_merges",
    // round-11: t45 extends the t44 trajectory with the encode chain
    // (strings + counts + one exact division); t46 is md5 decisions
    // + string md5s + one exact division; t47's ln-sum is the
    // contract-rounded t19/t22 class; d23 is digests + pure count
    // arithmetic; m13 is integer sums over ASCII bytes (the m05
    // class through the real DEFLATE roundtrip)
    "t45_bpe_encode", "t46_mlm_mask", "t47_source_kl",
    "d23_cross_source_dups", "m13_png_roundtrip",
    // d24 is digests + integer intersections + exact divisions (the
    // d02/d12 classes composed); m14's power is pure integer math and
    // its C/S sums are contract-rounded i-ascending folds
    "d24_lsh_verified_pairs", "m14_wav_dft_energy",
    // round-12: d25 is the d24 banding + integer Levenshtein + exact
    // divisions; t48's normal-equation sums are integers and the
    // Cramer solve is a fixed expression tree (bit-identical IEEE on
    // both engines, whatever the corpus); m15 is pure integer frame
    // math + gaps-and-islands over ASCII bytes
    "d25_lsh_edit_verified", "t48_ridge_quality", "m15_vad_segments",
    // round-12 batch 2: d26 is exact integer window hashes + md5
    // digests + one exact division; t49 is integers end to end;
    // m16/m17 are integer byte sums + exact divisions (ASCII pin)
    "d26_cdc_chunk_dedup", "t49_token_budget_select",
    "m16_audio_quality", "m17_image_patches",
    // round-12 batch 3: d27 is the d06 closure + integer rollups;
    // t50's per-class ln-sums are contract-rounded BEFORE the argmax
    // (deterministic tie-break); m18 is integer hash/bit math +
    // islands over ASCII bytes
    "d27_dedup_impact", "t50_langid_confusion", "m18_scene_segments",
    // round-12 batch 4: d28 is digests + slot-equality integers +
    // exact divisions; t51 is integer flag counts + one division —
    // both replay on arbitrary corpora (t46 now runs the MlmMask
    // kernel, so its replay also re-proves the kernel per corpus)
    "d28_minhash_accuracy", "t51_contamination_curve",
    // round-13: d30 is the d28 pair population + fixed multiplication
    // chains (no libm pow) + contract-rounded sums — the planner must
    // agree on arbitrary corpora (incl. empty-pair ones, driven from
    // the config list on both sides); t52 cuts t27's contract-rounded
    // scores with a deterministic NTILE and sums them DECIMAL-exact;
    // m19's features are O(1) ratios of 8 bit-exact bin energies
    // (the m14 class), contract-rounded
    "d30_lsh_band_planner", "t52_perplexity_buckets",
    "m19_spectral_features",
    // d31 is the d28 class with 16 slots + prefix-count integers +
    // contract-rounded error means; t53 is integers end to end
    // (token counts, running sums, floor divisions) + one exact
    // divide per row; d32 is the d07 pair class + threshold-literal
    // comparisons (driven from the threshold list on both sides)
    "d31_minhash_size_sweep", "t53_packing_waste_curve",
    "d32_containment_curve",
    // d33 is the d02 pair class + threshold literals (driven from the
    // list on both sides); m20 bands the m14 bit-exact energies with
    // a literal when-chain + contract-rounded logs
    "d33_jaccard_threshold_curve", "m20_octave_band_energies",
    // round-14/15: t54 extends the t45 chain with decode identity +
    // vocab-membership integers + one exact division; d34/d35 compose
    // the d12/d24 digest classes with the d06 closure (counts and ids
    // only); t55 is the closure + integer token counts + one exact
    // division; m21 grids the m14/m20 contract-rounded energies with
    // exact-binary floors + literal-τ comparisons; m22 adds the
    // recursive closure over m21's integer pairs
    "t54_bpe_roundtrip", "d34_dedup_pipeline_run",
    "d35_incremental_dedup_run", "t55_dedup_token_budget",
    "m21_audio_fingerprint_pairs", "m22_audio_dup_clusters",
    // t56 composes the d22 closure class with t28's α=0.5 weights
    // (IEEE-sqrt-exact, contract-rounded); m23 adds the recursive
    // closure over m11's integer-bit pairs (ASCII pin)
    "t56_dedup_temperature_mix", "m23_phash_dup_clusters",
    // round-18: d40 is the d02 pair class behind a lossless candidate
    // cut — the replay re-proves losslessness per corpus; t66's score
    // is a fixed per-row expression tree (the t02 class) and its
    // percent_rank is the t37 total-order class (integer counts, two
    // exact divisions)
    "d40_prefix_filter_pairs", "t66_percentile_gate",
    // m29 composes the m23 phash-bit class (ASCII pin) with exact
    // caption equality and a pair-keyed classification — counts,
    // ids, and strings only
    "m29_crossmodal_dup_audit",
    // t67 is the d10 cross-pair class + a threshold literal + an
    // argmax over exact-division doubles (ties integer); m30 composes
    // the m23 closure class with an md5-keyed min window — ids and
    // counts only
    "t67_fuzzy_decontamination", "m30_paired_release_run",
    // m31 is m30's class split across a corpus/batch admission — the
    // cross legs and the batch-restricted closure must replay
    "m31_incremental_paired_release",
    // t70 is the d12 md5-banding class composed with t67's exact
    // verify — banding false negatives must be the SAME on both
    // engines for arbitrary corpora, or the md5-twin discipline broke
    "t70_fuzzy_decontamination_lsh",
    // d41 is d40's class for directed containment: integers + exact
    // divisions; the prefix cut must stay lossless on arbitrary text
    "d41_prefix_filter_containment",
    // t68's KS is exact-integer ECDF gaps over the round-6 DECIMAL
    // score (fixed expression per distinct value) + DECIMAL-exact
    // mean sums — the t43 class; t69 is integer token sums + DECIMAL
    // quality means + literal half-powers + exact-integer budget cuts
    "t68_quality_drift", "t69_repeat_epoch_plan")

  private def generate(seed: Int, nDocs: Int): Seq[(Long, String, String, String, Long)] = {
    val rnd = new scala.util.Random(seed)
    val words = Vector("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "line", "sort",
      "window", "filter", "group", "vector", "stream", "the", "a", "and",
      "query", "join", "data", "column", "order", "small", "big")
    val langs = Vector("en", "de", "fr")
    val base = (0 until nDocs).map { i =>
      val len = rnd.nextInt(60) // includes 0..2-token docs
      val text = Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
      (i.toLong, text, langs(rnd.nextInt(langs.size)),
        s"src${rnd.nextInt(5)}", text.length.toLong)
    }
    // plant exact duplicates (10%) so the dedup families have work,
    // plus BENCHMARK LEAKS (copies of %50==0 docs — the t09/t13/t67
    // benchmark slots) so the decontamination families have work too;
    // the two rules never collide (no id is ≡9 mod 10 and ≡3 mod 25)
    base.map { case row @ (id, _, lang, src, _) =>
      if (id % 10 == 9) {
        val orig = base((id / 2).toInt)
        (id, orig._2, lang, src, orig._2.length.toLong)
      } else if (id % 25 == 3) {
        val orig = base(((id / 50) * 50).toInt)
        (id, orig._2, lang, src, orig._2.length.toLong)
      } else row
    }
  }

  // vector-family pairs: raw-double cosine outputs hash-match on the
  // fixtures, i.e. both engines compute bit-identical doubles — replay
  // must hold on random vectors too or the bit-identity was luck
  private val vectorReplay = Seq(
    "s01_knn_bruteforce", "s04_knn_batch",
    "s16_knn_pq_oracle", "s17_knn_lsh_oracle", "s18_knn_ivf_oracle",
    "s19_knn_lsh_batch_oracle", "s20_knn_ivfpq_indexed_oracle",
    "d14_semantic_dedup", "d15_semantic_dedup_incr", "s21_knn_mmr",
    // round-9: s22 is the s04 class + a label predicate; s23's
    // kernel fold must stay bit-identical to DuckDB's list_sum on
    // arbitrary vectors, not just the fixture's
    "s22_hard_negatives", "s23_random_projection",
    // s24 composes two pinned kernels; the overlap counts must agree
    // on arbitrary vectors
    "s24_projection_recall",
    // round-10: threshold search is the s01/s04 cosine class with a
    // predicate instead of a rank window; the seeded-cell variant
    // additionally replays the assignment/probe reconstruction
    "s25_range_search", "s26_range_search_ivf",
    // round-11: both s27 stages replay — the SQ8 shortlist is the s09
    // quantization class, the exact re-rank the s01 cosine class
    "s27_knn_sq8_rerank",
    // round-12: s28 is the s04 fold class with raw dot scores — the
    // UNNORMALIZED doubles must stay bit-identical on random vectors;
    // s29 composes the s27 quantizer with two rank windows and a
    // contract-rounded DCG — the audit must agree on arbitrary vectors
    "s28_mips_topk", "s29_retrieval_ndcg",
    // s30 is the s07 assignment + integer histogram + exact divisions;
    // s31 composes the s18 seeded probe with rank windows — the
    // tuning curve must agree on arbitrary vectors (incl. zero-recall
    // rows, which both sides drive from the nprobe list)
    "s30_ivf_cell_balance", "s31_recall_vs_nprobe",
    // d29 is the d14 assignment + a per-doc max over pair cosines +
    // threshold-literal comparisons — the sweep must agree on
    // arbitrary vectors (incl. zero-drop thresholds, driven from the
    // threshold list on both sides)
    "d29_semdedup_threshold_curve",
    // round-13: s32's per-subspace argmin distances are the s16
    // encoder's fold — the kernel's errors must stay bit-identical to
    // the SQL argmin on arbitrary vectors; s33's per-element affine
    // round-trips are the s06 class swept over a level broadcast
    "s32_pq_distortion", "s33_sq_bits_sweep",
    // round-15: s34 is the d14/s30 assignment class run twice (old
    // corpus seeds, both splits assigned) + integer histograms +
    // exact divisions over the k-cell seed list
    "s34_ivf_cell_drift",
    // round-18: s40 is the s34 assignment class + integer tombstone
    // histograms + exact divisions + a threshold CASE on the exact
    // division — must agree on arbitrary vectors; s41 composes the
    // s34 assignment with three rank windows over the pinned cosine
    // kernel + integer hit counts + one exact division
    "s40_tombstone_compaction", "s41_nn_descent",
    // s42 composes the s16 encode/table class (both modes ride the
    // same kernel) with rank windows over round-6 scores + integer
    // hit counts — must agree on arbitrary vectors; s43 is the s04
    // cosine class + three rank windows + integer hit counts
    "s42_adc_sdc_compare", "s43_overfetch_deletes",
    // s44 composes the s34 assignment + the s31 probe-ranking class
    // with a cumulative-count cut + integer rollups
    "s44_adaptive_nprobe",
    // s45 is integer counters + contract-rounded exact divisions; the
    // ring init and the per-round stop decision must replay on
    // arbitrary vectors (the loop may cut at a different round per
    // corpus — both engines must cut at the SAME one)
    "s45_nn_descent_converge",
    // s46 composes the s35/s39/s40/s43 verdict arithmetic over one
    // shared scan — every manifest cell is an integer, a
    // contract-rounded division, or a CASE verdict
    "s46_index_maintenance_run",
    // s47's whole hop trajectory (build, frontier, beam cuts,
    // per-hop counters) must replay on arbitrary vectors
    "s47_graph_beam_search",
    // s49/s50 serve the PERSISTED index (fingerprint-keyed to this
    // generated corpus, so the replay exercises a fresh build+load):
    // the load boundary and the coarse-entry hop-0 audit must replay
    // on arbitrary vectors
    "s49_graph_index_search",
    "s50_graph_coarse_entry",
    // s51/s52 replay the delete/repair sets and the tombstone-aware
    // strategy cuts on arbitrary vectors (the %9 tombstone draw and
    // the promotion-through-deleted sets are data-dependent)
    "s51_graph_delete_repair",
    "s52_graph_tombstone_search",
    // s53 composes all three maintenance legs off one standing
    // snapshot — the whole manifest must replay on arbitrary vectors
    "s53_graph_maintenance_run",
    // s48 composes the s47 search with the connect cut and the
    // adoption rank — the whole insert trajectory must replay
    "s48_graph_append",
    // round-21: s54/s55 serve from a WRITTEN-BACK index version
    // (fingerprint-keyed to this generated corpus → fresh build +
    // mutation + persist + load per replay) — the mutated adjacency
    // and the lean top-k walk over it must replay on arbitrary
    // vectors; s56 is the lean walk over the standing full index
    "s54_graph_append_writeback", "s55_graph_repair_writeback",
    "s56_graph_search_topk",
    // d42 composes the graph build with a raw-cosine tau cut (the
    // s25 threshold class) and the d06 recursive closure — the pair
    // set and components must replay on arbitrary vectors
    "d42_graph_semdedup")

  /** Canonical cell stringification: array columns print as
    * "[a, b, ...]" on BOTH sides (Spark rows yield Scala Seqs,
    * DuckDB JDBC yields java.sql.Array) — scalar cells keep
    * String.valueOf semantics.
    */
  private def cell(v: Any): String = v match {
    case s: scala.collection.Seq[_] => s.map(cell).mkString("[", ", ", "]")
    case a: java.sql.Array =>
      a.getArray.asInstanceOf[Array[_]].map(cell).mkString("[", ", ", "]")
    case arr: Array[_] => arr.map(cell).mkString("[", ", ", "]")
    case other => String.valueOf(other)
  }

  private def generateVecs(seed: Int, n: Int, dim: Int): Seq[(Long, Seq[Float], Int)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      (i.toLong, v, rnd.nextInt(8))
    }
  }

  test("vector oracle pairs hash-match on a generated embedding corpus") {
    import spark.implicits._
    val seed = 77
    val dir = java.nio.file.Files.createTempDirectory(s"graft_genv_$seed").toString
    val duck = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    try {
      generateVecs(seed, 200, 64)
        .toDF("vec_id", "embedding", "label")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      duck.createStatement().execute(
        s"""CREATE VIEW embeddings AS
            SELECT * FROM read_parquet('$dir/embeddings.parquet/*.parquet')""")
      vectorReplay.foreach { name =>
        val sparkRows = SparkEntry.queries(name)(spark, dir)
          .collect().toSeq
          .map(r => (0 until r.length).map(i => cell(r.get(i))))
          .sortBy(_.mkString(""))
        val rs = duck.createStatement().executeQuery(SparkEntry.oracleSql(name))
        val n = rs.getMetaData.getColumnCount
        val duckRows = Iterator.continually(rs)
          .takeWhile(_.next())
          .map(r => (1 to n).map(i => cell(r.getObject(i))))
          .toSeq
          .sortBy(_.mkString(""))
        assert(sparkRows == duckRows,
          s"$name diverged on generated vectors " +
            s"(${sparkRows.size} vs ${duckRows.size} rows)\n" +
            s"spark: ${sparkRows.take(3)}\nduck:  ${duckRows.take(3)}")
        assert(sparkRows.nonEmpty, s"$name returned no rows")
      }
    } finally {
      duck.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("fixed oracle pairs hash-match on two generated corpora") {
    import spark.implicits._
    Seq(101, 202).foreach { seed =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_gen_$seed").toString
      val duck = java.sql.DriverManager.getConnection("jdbc:duckdb:")
      try {
        generate(seed, 300)
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        duck.createStatement().execute(
          s"""CREATE VIEW documents AS
              SELECT * FROM read_parquet('$dir/documents.parquet/*.parquet')""")
        replayQueries.foreach { name =>
          val sparkRows = SparkEntry.queries(name)(spark, dir)
            .collect().toSeq
            .map(r => (0 until r.length).map(i => cell(r.get(i))))
            .sortBy(_.mkString(""))
          val rs = duck.createStatement().executeQuery(SparkEntry.oracleSql(name))
          val n = rs.getMetaData.getColumnCount
          val duckRows = Iterator.continually(rs)
            .takeWhile(_.next())
            .map(r => (1 to n).map(i => cell(r.getObject(i))))
            .toSeq
            .sortBy(_.mkString(""))
          assert(sparkRows == duckRows,
            s"seed=$seed $name diverged (${sparkRows.size} vs ${duckRows.size} rows)\n" +
              s"spark: ${sparkRows.take(3)}\nduck:  ${duckRows.take(3)}")
          assert(sparkRows.nonEmpty || name.startsWith("d12") || name.startsWith("t18"),
            s"seed=$seed $name returned no rows — generator too weak to exercise it")
        }
      } finally {
        duck.close()
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
  }
}
