package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes PLANS.md: `explain("formatted")` output for headline
  * queries — the plan-quality evidence (pushdown reaching scans,
  * broadcasts, TakeOrderedAndProject, codegen kernels, exchange
  * counts) in reviewable form.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse("PLANS.md")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picks = Seq(
      "q01_pricing_summary" -> "full-table aggregation: map-side partial agg before one exchange",
      "q02_filter_project" -> "pushdown: PushedFilters + pruned ReadSchema at the scan",
      "q03_join_revenue_by_nation" -> "dimension joins broadcast, fact table never shuffled for the join",
      "q08_topk" -> "ORDER BY + LIMIT compiles to TakeOrderedAndProject (no global sort)",
      "d02_dedup_ngram_jaccard" -> "inverted-index dedup: 2 shuffles (postings, pair counts), shingle kernel in scan stage",
      "d04_dedup_simhash" -> "one-pass SimHash kernel: zero hash exchanges",
      "s01_knn_bruteforce" -> "ANN brute force: 1-row query broadcast, fused cosine kernel, TopK",
      "t05_chunking" -> "chunking: generator in the scan stage, no shuffle",
      "q55_groups_frames" -> "GROUPS frames via the SQL-text rewrite: dense_rank subquery + RANGE window share one partition exchange",
      "q24_explode_tokens" -> "post-fanOut-removal: explode + partial agg directly over the scan, no pre-shuffle",
      "t09_decontamination" -> "decontamination: shingle-hash kernels both sides, join moves 16-byte tuples, bench side broadcast under AQE",
      "t10_source_mix" -> "source mix: one rank-window exchange; epoch replication is a generator in the same stage",
      "s07_cluster_report" -> "seed clustering: centroids inlined as literals — assignment is map-only (no join/shuffle), then one partial-agg exchange on cell",
      "d09_chunk_dedup" -> "chunk dedup: chunking + digest in scan stage; two digest-keyed exchanges, chunk text never shuffled",
      "t11_tfidf_keywords" -> "tf-idf: df as a count window over the term counts (no vocabulary self-join); three keyed exchanges total",
      "q58_asof_join" -> "as-of join: tagged union + running last-non-null window — ONE keyed exchange, no nested loop, constant per-row state",
      "q59_range_join" -> "range join without an equi key: bucket-quantized equi-join (interval side exploded over covered buckets) + exact containment filter — no BroadcastNestedLoopJoin",
      "t14_decontaminate_fraction" -> "fraction decontamination: one left-join against the broadcast benchmark shingle set; n_shingles and n_hits from a single partial-aggregated groupBy",
      "t15_token_entropy" -> "token entropy: strings hashed map-side before the (id, hash) count shuffle; two partial-aggregated exchanges",
      "s08_cluster_sample" -> "balanced sample: Partial WindowGroupLimit before the exchange caps per-cluster forwarding at perCluster rows per map partition",
      "t16_sequence_pack" -> "sequence packing: one group-keyed exchange + incremental running-sum window; shuffle carries (group, id, token-count) only",
      "q62_sessionize_batch" -> "batch sessionization: lag flag + running break count share one user-keyed exchange, then a partial-aggregated session rollup",
      "s12_knn_pq" -> "PQ ANN — the exact re-rank stage (the preceding ADC pass is map-only scan + TopK with the encode/ADC kernels in the scan stage, pinned by PlanQualitySpec): the bounded candidate-id set is PUSHED into the parquet scan (PushedFilters: In(vec_id, ...)), cosine re-rank + TopK, no join or exchange anywhere",
      "t17_hash_split" -> "hash split: scan-stage md5-prefix CASE — the only exchange below is the query's presentation ORDER BY; the operator itself is exchange-free (PlanQualitySpec pins it), so the 100 TB split is one pass",
      "q64_cohort_retention" -> "cohort retention: first-event agg and distinct-activity agg both partial-aggregate before their user-keyed exchanges; keyed join, then a tiny (cohort, offset) rollup",
      "q65_time_range_window" -> "time-range rolling window: ONE user-keyed exchange + sort; RANGE frame over the µs epoch with incremental frame state; decimal accumulation; both aggregates share one collapsed Window operator",
      "d10_incremental_neardup" -> "incremental dedup: the corpus side scans once with the new batch's shingles BROADCAST (no corpus text shuffle); count-first spam guard; pair/size joins AQE-broadcast",
      "t18_quality_gate" -> "quality gate FUSED: all four signals (tokens, mean length, repetition, entropy) from ONE tagged token+gram Generate — one documents scan, two keyed hash-only exchanges, no signal-branch joins (round-5 finding closed; PlanQualitySpec pins it)",
      "s15_knn_pq_indexed" -> "indexed IVF-PQ probe: the cell-partitioned codes table is read with a PARTITION filter (directory pruning to the probed cells); no training job, no corpus scan below the rerank's pushed-id point read",
      "s16_knn_pq_oracle" -> "seeded-codebook PQ (oracle twin): same encode/ADC kernels as s12 in the scan stage, deterministic data-defined codebook — the plan is the s12 shape, the point is the DuckDB hash-match",
      "d12_minhash_md5_oracle" -> "md5 MinHash twin: one-pass ShingleStrings kernel in the scan stage, 8 slot minima partial-aggregated in ONE doc-keyed exchange, band pairs via a bucket-local self-join",
      "d13_simhash_md5_oracle" -> "md5 SimHash twin: one conv() parse per distinct token, 32 shift/mask bit sums as aggregate columns over ONE doc-keyed exchange (no 32x bit-row explode)",
      "t21_decontaminate_by_suite" -> "multi-benchmark decontamination: benchmark reduces to DISTINCT (suite, shingle) pairs — eval-suite-sized, AQE-broadcast — one pass over candidate shingles emits per-suite hit counts; shuffles carry (id, suite, hash), never text",
      "t20_vocab_coverage" -> "vocabulary coverage: ONE token-keyed partial-agg exchange (the only corpus-sized step), TakeOrderedAndProject top-k, coverage window over k rows only",
      "t19_unigram_logprob" -> "unigram-LM log-prob: tokens hash map-side, the doc-counts/frequency join shares one hash partitioning, corpus total is a 1-row broadcast",
      "d11_deduped_corpus" -> "dedup applied: pair graph -> closure labels -> ids-only anti-join (flagged side broadcast under AQE); document text never reshuffles",
      "s14_knn_pq_batch" -> "batch PQ: per-query ADC kernel columns exploded in the scan stage over ONE codes pass; Partial WindowGroupLimit caps per-query forwarding at k; no join, vectors never read",
      "s19_knn_lsh_batch_oracle" -> "batch seeded-LSH twin: data-derived planes inlined as literals (bucket = map-side sign bits, no plane join), query buckets broadcast, bucket-local join, Partial WindowGroupLimit under the per-query rank — the s11 batch mechanics, hash-proven",
      "s20_knn_ivfpq_indexed_oracle" -> "indexed seeded IVF-PQ twin: the s15 lifecycle shape (no training job, codes read with a cell PARTITION filter, ADC kernel in the scan stage, TopK) with seeded quantizers — the persisted-index round trip itself is hash-proven against DuckDB",
      "q68_sessionize_skewed" -> "skew-safe sessionization: local break windows per (user, bucket), per-key directory window over active-bucket summaries for boundary breaks + prefix offsets, offsets joined back on (user, bucket) — the hot-key history spreads over |buckets| reducers; q62 is the one-exchange base shape for unskewed corpora",
      "q69_trailing_window_skewed" -> "skew-safe time-range window: home+ghost copies run q65's RANGE frame per (user, bucket) — 2x exchanged rows for |buckets|x hot-key parallelism; decimal accumulation keeps the regrouped sums bit-identical",
      "m04_wav_decode" -> "real WAV codec roundtrip: encode + parse both in ONE mapPartitions stage over the documents scan (no shuffle anywhere — payload bytes never leave the executor); presentation sort is the only exchange",
      "d14_semantic_dedup" -> "SemDeDup: seed-centroid assignment is the s07 map-only projection (no join/shuffle); ONE cell-keyed exchange bounds the near-dup search to within-cluster pairs (raise k at scale to cap cell size); the drop-flag join moves (id, cell, bool) only",
      "t22_bigram_logprob" -> "bigram-LM log-prob: the one-pass BigramHashes kernel feeds a cache-FREE plan — the three consumers (bigram freq, context freq, per-doc join) share the scan->kernel->partial-agg chain through AQE exchange reuse (round-10 profile: the cached variant measured strictly slower); every exchange carries longs, never strings",
      "t23_ngram_novelty" -> "n-gram novelty: NO posting-list shuffle — the shingle-keyed min(id) partial-aggregates map-side (one winner row per distinct shingle crosses the wire, hot shingles pre-collapsed), per-doc totals are a scan-stage size(kernel) projection, final join moves three longs per doc",
      "m05_bmp_decode" -> "real BMP codec roundtrip: bottom-up strided 24bpp encode + parse in ONE mapPartitions stage (m04 contract — no shuffle, payloads stay executor-side); presentation sort is the only exchange",
      "d15_semantic_dedup_incr" -> "incremental SemDeDup: corpus-seeded map-only assignment on BOTH sides; the batch side broadcasts against the corpus scan (the d10 move — corpus never shuffles), batch-internal pairs are batch-sized",
      "t24_heavy_hitters_cms" -> "count-min sketch: exact counts in one token-keyed partial-agg exchange; the 4x1024 cell table aggregates a depth-way explode over DISTINCT tokens (map-side combinable — how CMS merges across executors); TopK + a k*depth-row broadcast lookup",
      "t25_pii_redaction" -> "PII redaction: the whole rule chain is scan-stage regexp_replace expressions — zero exchanges below the presentation sort; redaction-count accounting is length arithmetic in the same stage",
      "t26_zipf_fit" -> "Zipf fit: one token-keyed partial-agg exchange + TakeOrderedAndProject; the rank window and OLS sums touch top-N rows only, so the regression is corpus-size-independent",
      "m06_bmp_resize" -> "real resize roundtrip: encode + pixel decode + nearest-neighbor resample + re-encode + decode ALL in one mapPartitions chain over the scan — no shuffle; presentation sort is the only exchange",
      "m07_wav_resample" -> "real audio resample roundtrip: PCM decode + rate conversion + re-encode + decode in one mapPartitions chain — the m06 contract for the audio container",
      "t27_interpolated_logprob" -> "interpolated LM: the t22 cache-free kernel shape plus the unigram back-off join; the unigram table is a second one-pass kernel tokenization (it needs the final tokens bigrams miss) — two cheap scan passes beat materializing a shared tagged stream through a corpus-wide exchange",
      "t28_temperature_mix" -> "temperature mixing weights: one source-keyed partial-agg groupBy; the weight windows run over source-cardinality rows (a handful), so the operator is one exchange however large the corpus",
      "m08_avi_frame_stats" -> "real video codec roundtrip: text -> RIFF-AVI encode -> container parse -> per-frame stats ALL in one mapPartitions chain over the scan (the m04/m05 contract for the video container) — payload bytes never leave the executor; presentation sort is the only exchange",
      "t29_nb_quality_score" -> "Naive-Bayes quality score: tokens hash map-side, per-doc counts materialize ONCE (cached hash-only frame) feeding the class table and the scoring join; class totals a 1-row broadcast — two partial-aggregated exchanges regardless of corpus size",
      "t30_importance_weights" -> "DSIR importance weights: the BigramHashes kernel (h12 = the joined-bigram slice hash) in a cache-free plan — feature-frequency table and scoring join share the counts chain via AQE exchange reuse; hashes and counts only, totals broadcast",
      "d05_embedding_neardup" -> "cell-BLOCKED near-dup pairs: map-only inlined-centroid assignment (no join), ONE cell-keyed exchange bounds pair work to (|cell|^2)/2 per cell — the SemDeDup blocking as a pair REPORTER; the all-pairs brute force survives only as Round9Spec's differential ground truth",
      "t35_pmi_collocations" -> "PMI collocations: ONE bigram-pair partial-agg exchange is the only corpus-sized step (hot pairs collapse map-side); marginals re-aggregate the cached distinct-bigram InMemoryRelation, total is a 1-row broadcast, top-k is TakeOrderedAndProject on the pre-round double",
      "t36_vocab_overlap" -> "vocab overlap: tokens hash map-side so the DISTINCT shuffle and the intersection self-join move (group, long) only; the self-join is hash-keyed and bucket-local (<= G^2 rows per distinct hash); the G-row size grid is an explicit double broadcast so empty intersections survive",
      "d18_chunk_removal" -> "chunk removal rebuild: chunks hash in the scan stage; df aggregation and the keep-decision join move (id, pos, hash) longs; kept positions collapse to one int-array row per doc, and the ONLY text movement is the single id-keyed rebuild join (AQE broadcasts the positions side here)",
      "s22_hard_negatives" -> "hard negatives: anchors broadcast with labels, corpus scans ONCE, the label exclusion is a scan-stage predicate BEFORE the cosine kernel, Partial WindowGroupLimit caps per-anchor forwarding at k",
      "s23_random_projection" -> "JL random projection: the whole operator is ONE map-only projection — the +-1 sign matrix is a reference object inside the codegen'd MatVecProject kernel (no join, no broadcast variable, no per-row hashing), so a 100 TB corpus projects at scan speed with zero exchanges below the presentation sort",
      "d19_lsh_recall" -> "LSH recall curve: the exact leg's posting-list joins and the LSH leg's band-bucket self-join both move digests only; the evaluation join is pair-keyed and the decile rollup partial-aggregates — at 100 TB the exact leg runs on a sample (the recall-audit protocol), the LSH leg everywhere",
      "d20_span_removal" -> "duplicated-span removal (Lee et al. rebuild): window hashes off the scan-stage kernel, one window-keyed count finds dup starts, covered positions explode k-per-start and DISTINCT down, the (id, p) position stream anti-joins covered — longs end to end; the rebuild is the d18 contract (positions collapse to one array row per doc, text joins once by id and never crosses an exchange)",
      "t37_source_normalize" -> "per-source robust normalization: one group-keyed quantile aggregation (source-cardinality rows; swap approx_percentile at extreme group sizes), a group-keyed join, and ONE shared window exchange for the percent rank — the score frame itself shuffles once",
      "d21_dedup_provenance" -> "provenance dedup: the d01 single digest-keyed partial-agg exchange with the sorted distinct source list riding the same aggregation — attribution survives the collapse for free",
      "s24_projection_recall" -> "projection-recall audit: both top-k legs are the one-corpus-scan broadcast-anchor shape (full space and the map-only projected space); the overlap join is pair-keyed over 2·|anchors|·k rows and the anchor grid left-joins so zero-overlap anchors report",
      "t38_epoch_shuffle" -> "epoch shuffle: the md5 permutation key is a scan-stage digest; the global rank is ONE sort (the oracle-able contract) — per-shard order at 100 TB drops the window for repartition+sortWithinPartitions on the same key",
      "d22_soft_dedup_weights" -> "soft dedup: d06's pair graph + closure end in a weight column — the corpus-side join is ids-only (text never reshuffles) and every doc keeps 1/cluster_size loss mass",
      "m09_media_features_real" -> "dispatching generic decode: encode + magic dispatch + REAL WAV parse + segment features all in one mapPartitions stage over the scan — payload bytes never leave the executor (the m04 contract), presentation sort is the only exchange",
      "t41_nfc_normalize" -> "NFC canonicalization: the codegen'd NfcNormalize expression runs in the scan-stage projection (changed flag, codepoint delta, md5 all off the same normalized value) — zero exchanges below the presentation sort; the isNormalized fast path makes the dominant already-NFC corpus a zero-allocation scan",
      "t42_readability" -> "readability: three regexp_extract_all counts + fixed-order IEEE grade arithmetic, all one codegen'd scan-stage projection — no shuffle below the presentation sort",
      "s25_range_search" -> "threshold search: 8-row query side broadcast, ONE corpus scan, codegen cosine + threshold both scan-side predicates — no rank window; the only exchanges below the presentation sort are the fanOut repartition on the corpus side and the query-side BroadcastExchange, no key shuffle anywhere",
      "m10_perceptual_hash" -> "perceptual hash: BMP encode + decode + 8x8 lattice + threshold pack in ONE mapPartitions chain over the scan (payload bytes never leave the executor); only (id, 2 x 32-bit halves, stats) rows move to the presentation sort",
      "m11_phash_dup_pairs" -> "phash near-dup pairs: hashes cache-scoped tiny (id + 2 longs), threshold-derived band count (maxHamming+1 -> 16-bit keys at hamming<=3) keeps the band-equality buckets selective on structured hashes; the join moves 3-column rows and the only text/image movement is the codec scan itself",
      "m12_frame_phash_dedup" -> "frame phash scene dedup: AVI chunk walk + per-frame lattice hash in ONE mapPartitions chain, then a single sample-keyed lag window over 4-long rows for the dup_prev flags — video bytes never cross an exchange",
      "t43_calibration_bins" -> "calibration bins: the t15 entropy aggregation, one global NTILE sort (the exact-cut oracle contract; swap for approx_percentile boundaries at 100 TB), then a bin-keyed partial aggregation with DECIMAL-exact score sums",
      "t44_bpe_merges" -> "BPE merges: an EAGER driver-loop operator (the MMR/RecursiveCte class) — the result frame below is the assembled merge table; the corpus-scale work already ran as one word-frequency partial-agg exchange, and the k rounds iterated on the vocab (driver-local under the size threshold, cache-swapped vocab-frame passes above it)",
      "q71_qualify" -> "QUALIFY via the SQL-door rewrite: the predicate rides the SAME Window operator as the projected rank (Spark dedups the identical window expression) — one keyed exchange for the window partition, then a plain Filter; no second window, no extra shuffle",
      "t45_bpe_encode" -> "BPE encode: an EAGER induce-then-apply operator (t44's driver loop runs first); the plan below is the APPLY pass — the BpeEncode kernel applies all 8 rules in ONE map-only scan projection (one char scan + k array passes; the regex-chain spelling measured ~4x slower and survives spec-pinned as the reference semantics), no join, no shuffle below the presentation sort",
      "t47_source_kl" -> "source KL: ONE corpus-scale (source, token) partial-agg exchange; the global token distribution re-aggregates that frame and the totals broadcast — every join after the first exchange is vocabulary-sized",
      "d23_cross_source_dups" -> "cross-source dup matrix: chunk hashes in the scan stage, ONE (chunk-hash, source) partial-agg exchange is the only corpus-sized step; the pair matrix self-joins the duplicated-keys count frame (bucket-local, vanishing fraction) with pure count arithmetic — no occurrence pair, no text, ever shuffles",
      "s27_knn_sq8_rerank" -> "two-stage retrieval: stage 1 is the quantized map-only scan + TopK (the only corpus-sized read); stage 2's 50-id shortlist broadcasts back as a left-semi build side so the full-precision cosine touches 50 rows — no corpus re-scan, no keyed exchange",
      "m13_png_roundtrip" -> "real PNG roundtrip: DEFLATE encode + inflate/unfilter decode both inside ONE mapPartitions stage over the documents scan (the m04 contract — compressed payloads never leave the executor); presentation sort is the only exchange",
      "d25_lsh_edit_verified" -> "edit-distance-verified dedup: the d24 banding shape end to end — the O(len²) Levenshtein DP is a scan-side expression on the candidate-join output, so the quadratic verifier touches only the banded sliver; the verify joins move one normalized string per CANDIDATE doc",
      "t48_ridge_quality" -> "closed-form ridge training: the ONLY corpus-sized step is one map-side partial aggregation (9 integer sums); the 3×3 Cramer solve is a constant expression on the 1-row stats frame, and scoring is a broadcast crossJoin projection — train + apply in two scans, no iteration, no driver loop",
      "m15_vad_segments" -> "voice-activity segments: frame energies inside the decode mapPartitions (payloads never cross an exchange, 24-byte quads move); the mean-square threshold windows and the island row_number share ONE sample_id exchange, and the segment rollup reuses that partitioning (no second shuffle)",
      "s28_mips_topk" -> "batch MIPS: queries broadcast, ONE corpus scan with the codegen dot kernel scan-side, Partial WindowGroupLimit caps per-query forwarding at k before the rank exchange — the s04 contract with magnitude-aware ranking",
      "d26_cdc_chunk_dedup" -> "content-defined chunking: window hashes, boundaries, chunk slices and md5 digests ALL inside the scan projection (array HOFs over the char-code array — document text never leaves its scan task); the df aggregation and per-doc rollup exchange (fp, len) pairs only",
      "t49_token_budget_select" -> "token-budget selection: ONE global running-sum window (the oracle-able contract, the t38 move) + a filter — no join, no keyed shuffle; at 100 TB the exact cut swaps for a priority-histogram threshold with this spelling kept for the boundary bucket",
      "m16_audio_quality" -> "audio quality gate: decode + clipping/DC/silence/range stats in ONE mapPartitions stage over the scan (the m04 contract — audio bytes never cross an exchange); presentation sort is the only exchange",
      "m17_image_patches" -> "ViT patch grid: real BMP decode + per-tile channel sums in ONE mapPartitions stage; ~60-byte patch rows are all that moves — the presentation sort is the only exchange",
      "d27_dedup_impact" -> "dedup impact report: one component-keyed rollup over the d06 closure + a 1-row singleton arithmetic branch — the histogram is cluster-count-sized however large the corpus",
      "t50_langid_confusion" -> "NB language-ID confusion: corpus work is the (doc, label, token) count agg and the |classes|-way scoring join (class list, priors, vocab size all broadcast); the argmax window is doc-keyed and the confusion rollup is |classes|² rows",
      "s29_retrieval_ndcg" -> "retrieval nDCG audit: two batch-scan legs (quantized + exact), each queries-broadcast with Partial WindowGroupLimit; the audit join and the per-query rollup are (k x queries)-sized",
      "m18_scene_segments" -> "scene segmentation: frame hashes from the codec scan; the lag window, the running cut count and the scene rollup all share ONE sample_id exchange (plan-pinned) — video bytes never cross the wire",
      "d28_minhash_accuracy" -> "MinHash estimator audit: the d24 candidate shape with a k-string signature join per CANDIDATE doc (slot equality is k CASE comparisons in the join projection) beside the exact shingle-intersection leg — the audit's cost is confined to the banded sliver like every verify stage",
      "t51_contamination_curve" -> "contamination sensitivity curve: one t09-shaped hash-join leg per shingle size, each aggregating to ONE row before the union — the curve costs |ns| corpus scans and exchanges hashes only",
      "s30_ivf_cell_balance" -> "IVF cell balance: the s07 map-only inlined-centroid assignment + one cell-keyed partial agg; totals broadcast back over k rows — no join, no corpus-keyed shuffle",
      "t46_mlm_mask" -> "MLM masking (round-12 kernel): the per-token md5 decisions and BOTH fingerprint digests stream through ONE MlmMaskSummary pass per row (the HOF chain evaluated interpreted per element and profiled 5x slower — A/B in the triage above); still zero exchanges below the presentation sort",
      "s31_recall_vs_nprobe" -> "IVF tuning curve: the whole recall@k-vs-nprobe sweep costs ONE corpus scan — every vector carries its cell's probe rank (inlined when-chain, no join), the per-nprobe top-k windows ride the 4x-exploded broadcast, and the exact leg reuses the same cached scored frame",
      "d29_semdedup_threshold_curve" -> "SemDeDup tuning curve: ONE within-cell pair pass (the d05/d14 cell-blocked shape) computes each member's survival threshold (max cosine to a smaller-id neighbor); the whole sweep is a histogram over that column — no per-threshold re-run",
      "d30_lsh_band_planner" -> "LSH band planner: the d28 audit's one measured pair pass; the (bands,rows) sweep is a when-chain of multiplication-chain probabilities over a 4-row config broadcast — no per-config re-measurement, no libm pow",
      "t52_perplexity_buckets" -> "perplexity buckets: the t27 LM plan (AQE-shared aggregations, 1-row total broadcast) + ONE global NTILE sort over per-doc scalars (the oracle contract; approx_percentile boundaries are the documented 100 TB swap) + a 10-row rollup",
      "s32_pq_distortion" -> "PQ distortion audit: the PqSubErrors kernel computes all m argmin errors inside the scan stage (map-only, codebook a referenced constant); only (j, err) scalars reach the single m-row partial-agg exchange",
      "m19_spectral_features" -> "spectral features: bin energies come out of the decode mapPartitions (payloads never cross an exchange); ONE sample-keyed partial-agg exchange over nBins scalar rows per clip, features are O(1) ratios",
      "d31_minhash_size_sweep" -> "signature-size sweep: ONE 16-slot signature pass (a k-slot estimate is a prefix match count), the d28 candidate/exact legs, |ks| scalar rows exploded per pair — no per-k re-signing",
      "t53_packing_waste_curve" -> "packing-waste curve: the t16 running-sum window computed ONCE; every candidate context length is integer floor-division arithmetic on (cum, n, total) over a 4-row budget broadcast — no per-length corpus pass",
      "s33_sq_bits_sweep" -> "SQ bit-width sweep: ONE corpus scan, each width a different level count in the same affine round-trip over a 4-row broadcast; only (bits, sq_sum, mx, n) scalars reach the 4-row agg",
      "d32_containment_curve" -> "containment curve: ONE inverted-index pair pass at tau_min (the d07 shape); the threshold sweep is a 5-row broadcast over (id_sub, containment) scalars — no per-tau pair re-join",
      "d33_jaccard_threshold_curve" -> "jaccard tau curve: ONE inverted-index pair pass at tau_min (the d02 shape); pair counts and keep-min-id drop counts both sweep over (id_b, jaccard) scalars via a 5-row broadcast",
      "m20_octave_band_energies" -> "octave bands: the m19 decode-stage energy shape over bins 1..15; band mapping is a literal when-chain in the same projection, ONE sample-keyed exchange of (id, band, e) scalars",
      "d26_cdc_chunk_dedup" -> "CDC dedup (round-14 kernel): boundaries, slices and digests in ONE CdcChunkDigests code-point scan inside the scan projection — text never leaves its task; only (fp, len) pairs reach the two digest-keyed exchanges",
      "d34_dedup_pipeline_run" -> "composed dedup run: banding and verify each ran ONCE (cached, counted hot, released synchronously — the eager closure makes a lazy count leg recompute instead); the result plan is just the ids-only anti-join vs the broadcast labelling + literal/labelling count rows",
      "t54_bpe_roundtrip" -> "BPE round-trip audit: decode identity, vocab check and chars/token all in the ONE map-only encode projection (merges + products are literals); a source-keyed partial-agg exchange of scalars is the only shuffle",
      "m21_audio_fingerprint_pairs" -> "audio fingerprint pairs: octave energies from the decode stage, 16 composite grid keys per clip (lossless continuous-feature pigeonhole), bucket-local self-join with in-row verification — the m11 blocking shape for audio",
      "d35_incremental_dedup_run" -> "incremental dedup run: corpus scans ONCE with the batch's shingles broadcast (d10's shape); within-batch pass is batch-sized; dispositions are ids-only joins + literal count rows (the d34 eager-count discipline)",
      "s34_ivf_cell_drift" -> "IVF append drift: both assignments map-only (centroids inlined as literals, no join); two cell-keyed partial aggs broadcast onto the k-row seed list",
      "t55_dedup_token_budget" -> "post-dedup token budget: d11's pair+closure work, then ONE corpus scan of (source, token-count) with the loser-id frame AQE-broadcast onto it; the rollup exchanges |sources| scalar rows",
      "t56_dedup_temperature_mix" -> "post-dedup temperature mix: d11's closure feeds t28's alpha-weights — the per-source rollup and the window sums run over |sources| rows; the corpus contributes one ids-only anti-join",
      "m23_phash_dup_clusters" -> "image dup clusters: m11's codec + banded pair pass (pairs materialized fully before the closure probe), bounded-probe closure over (id, id) pairs, one size window",
      "m24_audio_curation_run" -> "composed audio curation run: m16 gate + m21 pair pass + closure SHARE the per-stage caches (counted hot, released synchronously); the gate filters id+energy scalars via one keyed join — clip payloads never shuffle; the result plan is the ids-only kept/rollup legs + literal count rows over the broadcast labelling",
      "m25_image_curation_run" -> "composed image curation run: ONE decode pass produces the scalar hash frame that feeds BOTH the quality gate (a plain filter — no id join) and the banded pair pass; closure on survivors; the result plan is ids-only kept/rollup legs + literal count rows",
      "s35_ivf_rebuild_decision" -> "IVF rebuild decision: two map-only inlined-centroid assignments + k-row rollups + one k-row aggregation — the corpus contributes exactly two scans, the verdict arithmetic touches k rows",
      "t57_quality_dedup_report" -> "quality-decile dup report: the quality score is a scan-stage projection, the dedup side is d06/d11's pair+closure, ONE global NTILE sort over per-doc (score, id) scalars (the t43 exact-cut contract; approx_percentile boundaries at 100 TB), bins-row rollup",
      "t58_corpus_release_run" -> "corpus release run: d11's eager closure, one hash-broadcast contamination join, scan-stage quality score — the scope-cached per-doc flag frame (5 scalar columns) feeds the kept leg, four count legs, and the source rollup of ONE plan",
      "d36_cluster_fidelity" -> "cluster fidelity audit: the capped pair pass runs ONCE (materialized before the closure's probes, scoped for the result legs); the fidelity rollup joins pairs to the labelling on pair keys and aggregates cluster-count rows",
      "t59_contamination_attribution" -> "contamination attribution: one shingle-keyed join with the benchmark side broadcast; the per-doc argmax filter sits on the raw row_number so Partial WindowGroupLimit forwards 1 row per doc per map partition",
      "t60_split_leakage_audit" -> "split leakage audit: d10's incremental pair shape — train scans once with the val split's shingles broadcast, pair work capped, |sources|-row rollup",
      "m26_video_dup_pairs" -> "cross-video copy detection: decode-stage frame hashes, ONE hash-keyed self-join over sub-cap postings (boilerplate frames dropped from index AND denominators), per-pair counts + a size join — video bytes never shuffle",
      "d37_dedup_keep_best" -> "keep-best dedup: d11's pair+closure, a scan-stage quality projection, a per-cluster argmax window (partitions cluster-sized), ids-only anti-join for singletons — text never reshuffles",
      "t61_budget_allocation" -> "water-filling allocation: ONE partial-aggregated corpus scan to a |tiers|-row frame; every window below runs on those rows (the global windows are k-row state, not a corpus sort)",
      "t62_tokenizer_fertility" -> "tokenizer fertility by language: langid scores AND the BPE encode kernel in ONE map-only projection (merges are plan literals); a |languages|-row partial-agg exchange of scalars is the only shuffle",
      "s36_centroid_refresh" -> "one-step Lloyd refresh: map-only inlined-centroid assignment, a (cell, dim)-keyed partial agg (n x dim scalar rows in, k x dim groups out), k x dim old-centroid broadcast join — vectors never shuffle",
      "m27_video_curation_run" -> "composed video curation run: m26's capped pair pass + participation gate + closure share the eagerly-counted caches; the result plan is ids-only kept/rollup legs + literal count rows — frame hashes in, payloads never enter",
      "t63_split_leakage_repair" -> "split leakage repair: t60's cross-split pair shape (train scans once, val shingles broadcast) feeding an ids-only flag join — document text never reshuffles; moved is a CASE on the join",
      "s37_pq_cell_distortion" -> "PQ cell distortion: assignment and the PQ sub-error kernel in ONE map-only projection (centroids and codebooks are plan literals); only (cell, total-error) scalars reach the k-row aggregation",
      "m28_video_copy_spans" -> "video copy spans: the qualifying-pair frame AQE-broadcasts onto the frame table (a-side keeps indexes, b-side is a distinct hash set), then one gaps-and-islands window partitioned by pair",
      "d38_weighted_jaccard" -> "idf-weighted Jaccard: d02's inverted index + ONE shingle-keyed weight join (df rollup reused as the weight table); DECIMAL weight sums, one double division — boilerplate shingles carry ~0 weight",
      "s38_residual_pq_distortion" -> "residual PQ distortion: assignment, residual subtraction (k-row centroid broadcast) and BOTH pq-error kernels in one projection; only (j, raw, res) scalar triples reach the m-row agg",
      "t64_drop_overlap_matrix" -> "drop-overlap matrix: the scope-cached t58 flag frame grouped by its three booleans (8 groups) + an 8-row literal join — ordering-invariant where t58's attribution is not",
      "d39_pair_evidence" -> "pair evidence: d02's pair pass; shingle strings cross exactly one exchange (the df rollup) and otherwise appear only on the pair-restricted sliver; the per-pair top-k filter sits on the raw row_number (WindowGroupLimit)",
      "s39_sq_bits_decision" -> "bit-width decision: the s33 sweep's one corpus scan; the verdict is a |bits|-row sort-limit carrying the chosen row into the build manifest",
      "t65_incremental_release_run" -> "incremental release run: the corpus scans ONCE with the batch's shingles broadcast (d35's shape), the within-batch closure is batch-sized, contamination is the hash-broadcast bench join, quality is scan-stage; one batch-sized flag frame feeds every leg",
      "d40_prefix_filter_pairs" -> "prefix-filtered exact join: df via a count window on the shingle partitioning, the id-keyed rank window keeps only each doc's rare prefix, candidates verify via array-intersect joins — lossless (hash-matched vs the plain exact oracle), boilerplate never indexed",
      "s40_tombstone_compaction" -> "tombstone/compaction audit: one map-only inlined-centroid assignment + ids-only tombstone join (AQE-broadcast at small delete sets) + k-row rollup left-joined onto the seed list so drained cells report",
      "s41_nn_descent" -> "NN-descent round: cell-blocked init pairs, 2-hop frontier via two edge self-joins, candidate rescoring moves one vector per candidate row, every top-k is a WindowGroupLimit; the exact audit leg is a broadcast query sample (auditMod contract)",
      "s42_adc_sdc_compare" -> "ADC vs SDC: ONE scope-cached encode scan feeds every per-query leg; both modes ride the same pqAdcScore kernel with different driver tables, so the plans differ only in literals — the recall gap isolates the error, not the plan",
      "t66_percentile_gate" -> "percentile gate: scan-stage quality score, ONE source-keyed window exchange of (source, score, id) scalar triples (total order — id tie-break), |sources|-row rollup",
      "t67_fuzzy_decontamination" -> "fuzzy decontamination: d10's corpus-scans-once shape with benchmark shingles broadcast; the per-doc argmax is a pair-keyed struct-max rollup — text never reshuffles",
      "m29_crossmodal_dup_audit" -> "cross-modal dup audit: one phash decode pass + banded image pairs; caption pairs emit list-local from md5 posting lists (never a corpus self-join); classification is one full-outer join of (id, id) pair frames",
      "m30_paired_release_run" -> "paired release run: pairs materialized fully before the eager closure (m22 discipline), caption dedup is one md5-keyed min window over the remainder, result plan is ids-only admitted/rollup legs + literal count rows",
      "s43_overfetch_deletes" -> "over-fetch under tombstones: ONE scoped-cached scored scan (query batch broadcast, dead flag an ids-only join) feeds the fetch-k, over-fetch and exact-live rank windows — the three strategies differ only in filters over the same frame",
      "t68_quality_drift" -> "quality drift: round-6 DECIMAL scores roll up per (source, score); the KS statistic is ONE source-keyed cumulative window over DISTINCT score rows (not docs) — the corpus contributes two scans and scalars",
      "s44_adaptive_nprobe" -> "adaptive nprobe: one scope-cached assignment scan feeds the k-row cell histogram AND the candidate join; the probe cut is a cumulative window over |queries|x k ranked-cell rows; candidate scoring is confined to probed cells",
      "s45_nn_descent_converge" -> "NN-descent to convergence: geometry-blind ring init (map-only explode over dense ids), per-round undirected 2-hop expansion rescored via one vector join (<=4Nk^2 candidate rows), hand-over-hand round caches fed through flat LogicalRDD views so the analyzed plan stays one round deep; sampled exact audit leg (auditMod)",
      "s46_index_maintenance_run" -> "index-maintenance run: ONE scope-cached assignment scan of old UNION new (origin + dead flags via ids-only join) feeds the rebuild histogram, the compaction rollup, the live-corpus bits sweep, AND the over-fetch scoring legs (s43's factored windows); every rollup is k-row / |bits|-row / 2-row — PlanQualitySpec pins >=3 InMemoryTableScans of the shared cache",
      "m31_incremental_paired_release" -> "incremental paired release: the corpus is NEVER self-joined or cached — its phash bands and caption digests each stream once against the BROADCAST batch sides (pigeonhole-lossless banding); the only closure is batch-sized; payloads never cross an exchange",
      "t70_fuzzy_decontamination_lsh" -> "LSH-scale fuzzy decontamination: NO benchmark broadcast — md5 slot-string MinHash signatures computed scan-side on BOTH frames, one (band, key) bucket exchange, exact-Jaccard verify restricted to collided pair members (shingle arrays move per CANDIDATE doc, the d24 shape)",
      "s47_graph_beam_search" -> "graph beam search vs the PERSISTED GraphIndex (round 20): no build job below the query — the adjacency is a parquet scan off the standing index (first invocation per corpus fingerprint builds it, the s15 lifecycle); each hop is one edge join + one rescoring join over O(|queries|*beam*degree) rows, queries broadcast, per-hop counters are 3-row collects",
      "s49_graph_index_search" -> "persisted-index search (the second read of the standing s47 index — registry hit, zero build): the serving profile at a tighter budget (beam 16, 4 hops); the plan below is hop joins + the sampled exact audit only",
      "s50_graph_coarse_entry" -> "hierarchical coarse-entry search: entry = argmax over the first-16 coarse set (|queries|*16 scores, flat in N — the one-layer HNSW upper-level descent), audited as hop 0; the hop loop is s47's against the same standing index. What the coarse layer buys is the MEASUREMENT, and round 20's __gentry_ab A/B found: nil on this near-orthogonal corpus (parity by hop 5 on unbiased queries), while exposing that s47's low-id queries are ring-adjacent to its min-id entry — the fixed-entry trajectory is flattered by construction",
      "s51_graph_delete_repair" -> "graph delete+repair (the s40 compaction move for the graph index): every step bounded by the DELETION, never the corpus — dropped/lost edges join the tombstone ids, promotion-through-deleted is |lost|*graphK pairs, the rescoring join moves vectors only for affected-node candidates, the exact leg samples affected %4 over the live corpus",
      "s52_graph_tombstone_search" -> "tombstone-aware serving (the s43 over-fetch move on the graph index): tombstones ROUTE but never RETURN; plain top-k and the 2k over-fetch cut are graded from ONE |queries|-bound walk, the deleted set joins as broadcast ids, the exact leg runs over the live corpus",
      "s53_graph_maintenance_run" -> "composed graph maintenance (the s46 move for the graph family): append + delete/repair + the tombstone-serve audit in ONE manifest against ONE standing snapshot — the corpus (id, v) cache, edge scan, undirected closure, and tombstone set are shared across legs; only the three exact audit legs are leg-private",
      "d41_prefix_filter_containment" -> "prefix-filtered containment: SUB side prefix-indexed under the df-ascending rarity order (pigeonhole-lossless for containment >= tau), SUPER side full postings — boilerplate never enters a sub prefix, so the candidate join's quadratic side dies; verify joins move one hash array per candidate doc",
      "s48_graph_append" -> "graph index append vs the PERSISTED GraphIndex (round 20): the standing 80%-corpus graph is a parquet scan off its own fingerprint-keyed index, so the declared append pays only |batch| beam searches (batch-bound) + connect window cut + reverse adoption over the touched nodes (<= |batch|*graphK)",
      "t69_repeat_epoch_plan" -> "repeat-epoch plan: ONE partial-aggregated corpus scan to |sources| rows (token sums + DECIMAL quality means); the greedy is a global sort of |sources|x maxEpochs candidate-epoch rows + one cumulative-cost window — k-row state, not corpus sorts",
      "s54_graph_append_writeback" -> "graph append WRITE-BACK (round 21): the mutation s48 audits is persisted as a NEW immutable index version (new dir, meta last), then the declared read is the lean top-k walk over the mutated adjacency OFF PARQUET — write-once reuse means verify/bench reps pay the |batch|-bound mutation once; untouched corpus rows stream through the rewrite without rescoring",
      "s55_graph_repair_writeback" -> "graph repair WRITE-BACK (round 21): s51's deletion-bound repair (drop + promotion-through-deleted lists) persisted over the LIVE corpus, tombstones actually dropped — the serve walks the compacted (non-dense) id space with no over-fetch mitigation and no tombstone joins at read time",
      "s56_graph_search_topk" -> "lean graph serve (round 21, the REST door's read): fixed-hop beam walk against the standing persisted index + top-k cut — NO exact audit leg anywhere in the plan (that O(|queries|*N) cost belongs to the diagnostic reads); per hop one bounded rescoring join, result is |queries|*k driver-local rows",
      "d42_graph_semdedup" -> "index-accelerated semantic dedup (round 21): the standing kNN graph IS the candidate generator — N*graphK edge rescorings (LINEAR; replaces semDedup's per-cell quadratic pair stage) + tau cut + hash-min closure; top-graphK coverage bounds recall, the stated trade (complete-graph equality and the miss case both spec-pinned)",
    )
    val sb = new StringBuilder
    sb.append("# PLANS — `explain(\"formatted\")` of headline queries\n\n")
    sb.append(s"Generated against `$sfDir` by `graft.tools.ExplainDump`.\n")
    sb.append(driftTriage)
    picks.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n_${why}_\n\n```\n$plan```\n")
      spark.catalog.clearCache()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[explain] wrote $out")
    spark.stop()
  }

  /** Round-6 bench-drift triage — kept in the generator so PLANS.md
    * regeneration preserves the record.
    */
  private val driftTriage: String = """
## Round-21 sf0.1 oracle check of the graph family (now 11 queries)

Beyond the driver's sf0.01 gate, the FULL graph family — including
the three round-21 additions — was hash-checked against the DuckDB
oracle at sf0.1 (2000 vectors, 4x the driver's verify scale; the
oracle replays the complete builds AND the write-back mutations over
2000 vectors): **all 11 PASS, 0 FAIL** (s45, s47–s56). The
cross-engine bit-identity of the build, the persist boundary, the
append/repair MUTATIONS as persisted by `GraphIndex.writeBack`, and
the lean top-k walk all hold at the larger draw.

## Round-21 adjudications

**d07_dedup_containment 1.32 → 1.81 s driver-to-driver (the r14
verdict's watch row)** — isolated 5-rep protocol (DriftProfile, q01
throwaway lead 1.25/1.30, sf0.1, fresh cache per rep): d07
min 1.668 / median 1.690 (band 1.67-1.74 across 4 clean reps; one
3.46 outlier from a concurrent background task). The isolated number
REPRODUCES the driver level on the current corpus: same adjudication
as d39/t27/t36/t40 — d07 is pair-bound (containment evidence rows
track the planted-overlap draw) and the driver regenerates the corpus
every round; `Dedup.scala` untouched since the r13 plan audit except
scaladoc. Real steady-state data cost, not a code regression. Off the
watch list; steady-state comparator of record = 1.668/1.690.

**Round-21 entry-strategy A/B, medoid arm** (`__gentry_ab` now runs
THREE arms: min-id, coarse-16-by-id, and 16 Lloyd-medoids — trained
centroids each mapped to their nearest corpus vector, entered via the
new `coarseEntryIds` door). Same standing gk10/r3 index, beam 20,
k 5, 5 hops, sf0.01; per-hop recall SUMS over 3 queries:

| query set | entry | h0 | h1 | h2 | h3 | h4 | h5 |
|---|---|---|---|---|---|---|---|
| low-id (1,2,3) | min-id | — | 0.0 | 0.2 | 1.0 | 1.4 | 1.6 |
| low-id (1,2,3) | coarse-16 | 0.0 | 0.0 | 0.4 | 0.6 | 1.0 | 1.2 |
| low-id (1,2,3) | medoid-16 | 0.0 | 0.0 | 0.0 | 0.6 | 0.8 | 1.0 |
| mid (201,301,401) | min-id | — | 0.2 | 0.8 | 1.0 | 1.4 | 1.8 |
| mid (201,301,401) | coarse-16 | 0.0 | 0.2 | 0.6 | 0.8 | 1.4 | 1.8 |
| mid (201,301,401) | medoid-16 | 0.2 | 0.2 | 0.8 | 0.8 | 1.4 | 1.8 |

Verdict: on unbiased mid-corpus queries the medoid layer is the best
EARLY entry (h0 already lands a hit; hop-for-hop ≥ coarse-16) and all
three arms converge to parity by the 5-hop budget — confirming the
round-20 finding that on a near-orthogonal random corpus entry choice
is not the frontier bottleneck. NOT adopted for the declared s50
(coarse-16 stays: deterministic, oracle-replayable, and equal at
budget); the medoid door (`coarseEntryIds`) ships as API for corpora
with real neighborhood structure, where the r20 analysis predicts the
gap widens. The low-id rows remain the known evaluation artifact
(ring-adjacency flatters min-id by construction).

## Round-20 signal-of-record adjudication (d39 + the r13 sub-second movers)

The r13 verdict's watch rows: d39_pair_evidence 3.93 s (driver r12) ->
6.52 s (driver r13) — the round's one `weak` — plus three sub-second
movers (s19 0.36->0.70, q61 0.32->0.57, s34 0.63->1.11). Code
byte-unchanged for all four since their r12 plan audits. Isolated
5-rep protocol (DriftProfile, q01 throwaway lead, sf0.1, fresh cache
per rep), run before any round-20 change:

| query | driver r12 | driver r13 | builder r13 artifact | isolated min/median (r20) | adjudication |
|---|---|---|---|---|---|
| d39_pair_evidence | 3.93 | **6.52** | 4.92 | 5.38 / 5.52 | the isolated band (5.38-6.14 across 5 clean reps) REPRODUCES most of the driver number: ~5.5 s is real steady-state plan cost on the CURRENT corpus, not billing. What moved vs r12 is the data, not the code: d39 is pair-bound by design (wall tracks emitted evidence rows — its own IMPLEMENTATION row), and the driver regenerates the corpus every round, so the planted-pair draw shifts the wall. Plan re-audited this round: unchanged (df rollup is the one shingle exchange, doc-sum broadcast forced via cache stats). Off `weak`; steady-state comparator of record = 5.38/5.52. |
| s19_knn_lsh_batch_oracle | 0.36 | 0.70 | 0.45 | 0.52 / 0.54 | isolated sits on the builder artifact (+-0.1 s machine band for sub-second queries); the driver number is suite contention. Off the watch list. |
| q61_interval_join | 0.32 | 0.57 | 0.37 | 0.40 / 0.41 | same class: isolated == builder artifact within the band. Off the watch list. |
| s34_ivf_cell_drift | 0.63 | 1.11 | 0.83 | 0.73 / 0.79 | isolated BELOW the builder artifact; driver contention on a sub-second query. Off the watch list. |

## Round-20 addendum: the r14 builder-bench movers (t27 / t40 / t36)

The round's final builder bench (266 queries, 284.1 s, zero errors)
reads 1.05x on the 261 common queries vs the r13 artifact, with three
>1.5x movers — t27_interpolated_logprob 0.84 -> 1.78, t40_leakage_
safe_split 0.93 -> 1.76, t36_vocab_overlap 0.95 -> 1.52 — all
code-byte-unchanged this round (no text-family source touched).
Adjudication evidence, all same-day, same corpus:

| query | r13 artifact | r14 bench #1 | r14 bench #2 (artifact) | isolated min/median | reading |
|---|---|---|---|---|---|
| t27 | 0.84 | 1.48 | 1.78 | 1.47 / 2.09 | isolated REPRODUCES the bench level on THIS round's corpus |
| t40 | 0.93 | 1.14 | 1.76 | 1.44 / 1.54 | same |
| t36 | 0.95 | 1.57 | 1.52 | 1.59 / 2.04 | same |
| q01 control | — | 0.99 | 1.09 | 1.09 / 1.45 | the machine band is normal |

The r13 comparison is CROSS-CORPUS (the driver regenerates testdata
every round), and these three are exactly the vocabulary/token-
distribution-bound operators (LM interpolation table, shingle-split
audit, distinct-token intersection) whose wall tracks the drawn
token distribution — the d39 class adjudicated at the top of this
file: real steady-state cost on the current data, not a code
regression. Steady-state comparators of record: t27 1.47/2.09,
t40 1.44/1.54, t36 1.59/2.04.

## Round-20 sf0.1 oracle check of the graph family

Beyond the driver's sf0.01 gate, the full graph family was
hash-checked against the DuckDB oracle at sf0.1 (2000 vectors — 4x
the driver's verify scale, with the oracle replaying the complete
gk10/3-round build over 2000 vectors): **all 8 PASS, 0 FAIL**
(s45, s47, s48, s49, s50, s51, s52, s53). The cross-engine
bit-identity of the build, the persist boundary, every serve/append/
repair leg, and the round-6 recalls holds at the larger draw.

## Round-20 entry-strategy A/B (`__gentry_ab`: min-id vs coarse-16)

Same standing gk10/r3 index, beam 20, k 5, 5 hops, sf0.01; per-hop
recall SUMS over 3 queries:

| query set | entry | h1 | h2 | h3 | h4 | h5 |
|---|---|---|---|---|---|---|
| low-id (1,2,3) | min-id | 0.0 | 0.2 | 1.0 | 1.4 | 1.6 |
| low-id (1,2,3) | coarse-16 | 0.0 | 0.4 | 0.6 | 1.0 | 1.2 |
| mid (201,301,401) | min-id | 0.2 | 0.8 | 1.0 | 1.4 | 1.8 |
| mid (201,301,401) | coarse-16 | 0.2 | 0.6 | 0.8 | 1.4 | 1.8 |

Two findings. (1) On this near-orthogonal random corpus, coarse
entry selection buys NOTHING at the 5-hop budget (parity on unbiased
mid-corpus queries) — the walk's progress is frontier-expansion-
bound, not entry-proximity-bound, when neighborhoods are weak; the
hierarchy is worth paying for only on structured corpora or short
budgets (Round20Spec's low-dim 2-hop fixture, where the >= pin
genuinely holds). (2) The s47-vs-s50 gap on the DECLARED low-id
queries is an evaluation artifact the hop-0 audit exposed: the ring
init links sequential ids and refinement keeps some of those edges,
so queries 1-3 are ring-adjacent to the min-id entry — the fixed
entry is flattered by construction. s50's contract is exactly this
measurement; the declared trajectories stay as the oracle-matched
record of both effects.

## Round-19 signal-of-record adjudication (q59_range_join)

The r12 verdict's one >1.5x cross-artifact mover: 0.45 s (builder r11
artifact) -> 1.06 s (driver r12), code byte-unchanged since round 9.
Isolated 5-rep protocol (DriftProfile, q01 throwaway lead, sf0.1,
fresh cache per rep), run before any round-19 change:

| query | builder r11 | driver r12 | isolated min/median (r19) | adjudication |
|---|---|---|---|---|
| q59_range_join | 0.45 | **1.06** | 0.433 / 0.455 | isolated == the builder artifact and squarely inside the round-9 steady-state band for this query (0.396-0.513 across 5 clean reps, +-15% recorded in the r9 triage below). The driver number does not reproduce in isolation; driver-run contention on a sub-second query, the class every prior round's adjudication covers. Off the watch list. |

Steady-state comparator of record for q59: **0.43-0.51 s isolated at
sf0.1** (unchanged since round 9). Plan re-checked this round: still
the bucket-quantized equi-join + containment filter, no
BroadcastNestedLoopJoin.

## Round-19 operator notes (s45 + the s41 closure adjudication)

**s41's refinement round is a provable FIXED POINT** — found while
building s45: with cell-confined seeding, every neighbor is a
cell-mate, so every 2-hop candidate is too, and the init graph is
already the exact in-cell top-k — the refined graph is bit-identical
(verified: init and round1 rows are EQUAL on every corpus, 661/661
hits at sf0.01). The two stages therefore measure the IVF
cell-boundary recall ceiling and confirm it is closed under same-cell
refinement; they never measured graph improvement. Scaladoc now states
this; Round19Spec pins the bit-equality so a semantics change to the
expansion would scream.

**s45 design notes.** Descent needs initial edges that CROSS the
geometry (Dong et al. use random init): the deterministic stand-in is
a ring over dense ids (offsets +1..+k mod N, map-only), and the
expansion is the published UNDIRECTED local join (forward ∪ reverse
neighbors — reverse edges are what make descent converge). Two
scale lessons, both spec-pinned:
- The refine step references its input ~5×, so a naive loop's analyzed
  plan grows 5^rounds — the PLAN STRING alone OOMed the driver at 6
  rounds. Fix: the closure loop's flat-LogicalRDD pattern
  (hand-over-hand round caches, plan stays one round deep). The same
  explosion hit the DuckDB oracle (CTEs inline by default):
  every s45 oracle CTE is AS MATERIALIZED.
- ε-termination compares ROUND-6 recalls computed identically on both
  engines (java BigDecimal.valueOf HALF_UP == Spark round == DuckDB
  ROUND on these ratios), so the stop round is oracle-replayable —
  GeneratedCorpusSpec replays the whole loop incl. the cut on random
  vectors.

Declared operating point (k=5, auditMod=4, ε=0.02, maxRounds=8): at
sf0.01 the run ε-terminates at round 4 (converged=1, recall 0.0112 →
0.1152, monotone) — the termination rule fires in the DECLARED run,
not just in specs. Isolated 5-rep at sf0.1: 3.2/3.6 min/median s
(ε-stops at round 1 there — gains on the near-uniform corpus start
below 2 points at N=2000); 10× smoke (2-round cap): 4.8 → 9.7 s on
10× vectors. The synthetic embeddings are near-uniform (the
known hard case for NN-descent: neighbor-of-neighbor correlation is
weak), so absolute recall converges low; on clustered real data the
same loop plateaus high — the operator's contract is the loop + audit,
and the numbers honestly report the corpus.

**s46 (index-maintenance run)** composes the s35/s40/s39/s43 verdicts
from ONE scope-cached assignment of old ∪ new under the OLD seeds (a
maintenance run never re-seeds — that is what its rebuild verdict
decides); the over-fetch legs are s43's windows factored into
`overfetchLegsFromScored`, so agreement is structural. Round19Spec
reconciles the manifest four ways against the standalone operators;
PlanQualitySpec pins ≥3 InMemoryTableScans of the shared cache.
Isolated 5-rep at sf0.1: 3.1/3.4 min/median s; 10× smoke 4.3 → 7.3 s
(scan-bound). At sf0.01 the manifest reads: rebuild=keep (imbalance
1.168), 4 of 8 cells compact, sq_bits=6 met, overfetch chosen at
recall 1.0 vs fetch-k's 0.867 — a manifest a nightly would actually
act on.

**m31 (incremental paired release)** is the d35/t65 admission move for
m30: corpus phash bands and caption digests each stream once against
the broadcast batch; the first declared split dropped EVERYTHING at
the corpus legs (zero within-batch work — the s41 lesson re-applied to
a composition), so the declared corpus is the even-doc half and the
batch carries three legs; all five drop stages now fire at sf0.01
(input 501 = 82 image + 168 caption + 1 batch-image + 82
batch-caption + 168 admitted, hash-matched). Fixture lesson pinned in
Round19Spec: reverse/case/prefix transforms do NOT make images
distinct under phash — distinctness needs different energy quadrants.
Isolated 5-rep at sf0.1: 3.9/4.2 min/median s; 10× smoke 4.6 → 11.5 s
(the batch itself grows 10× in the replica construction — batch-bound
like d35).

**t70 (LSH-scale fuzzy decontamination)** applies the d03 banding to
t67's shape for benchmark unions too large to broadcast: md5
slot-string signatures (d12 kernel) band BOTH sides, one bucket
exchange, exact verify on collisions. The oracle replays the banding
itself, so LSH false negatives must agree engine-to-engine — the
recall S-curve is part of the declared contract, and the spec pins
t70 ⊆ t67 with identical evidence plus the exact-copy-never-missed
guarantee. Isolated 5-rep at sf0.1: 2.0/2.1 min/median s (vs t67's
3.8 smoke single — the banded path is already cheaper at sf);
10× smoke 2.9 → 5.2 s with flags 10 → 100 (pair-bound).

**s47 (graph beam search)** is the family's serving read and the
round's most expensive declared query — BY CONTENT, not defect: it
runs a full 3-round degree-10 NN-descent index BUILD plus a 5-hop
3-query serving audit in one definition (the build is ~2/3 of the
wall; the hops are latency-bound driver steps). First cut was both
dead AND slow: degree-5/2-round/3-hop found NOTHING (recall 0 at every
hop — the s41 lesson applied to serving; parameters re-tuned by
simulation until the declared trajectory climbs 0 → 0.8/0.6/0.2), and
the uncached per-hop rescoring ran twice (16 s isolated → 10.2/10.9
min/median after the hop cache + single-collect counters). 10× smoke
9.7 → 16 s — build-round-bound, the corpus is never scanned per
query. If the bench total needs trimming next round, the candidate is
a declared buildRounds cut, not the hop audit.

**s48 (graph index append)** completes the family lifecycle
(build s45 / serve s47 / append s48): the HNSW insert as
search-then-connect plus reverse adoption restricted to touched nodes.
At sf0.01 the manifest reads: 100 batch vectors, 500 connect edges,
insert recall 0.134 (the honest number for a 2-round degree-5 graph —
the same weak-graph signal s45/s47 report on this near-uniform
corpus), 59 touched corpus nodes, ALL of which adopt ≥1 reverse edge
(218 adopted) — adoption is what keeps the graph navigable TOWARD new
mass. Isolated 5-rep at sf0.1: 8.0/9.6 min/median s (build + eager
search steps, the s47 cost profile); 10× smoke 11.0 → 21.6 s — the
batch itself grows 10× (batch-bound by design; the corpus graph is
never rebuilt).

**d41 (prefix-filtered containment)** closes the prefix-filter family
over the directed operator: the asymmetric scheme (SUB-side rarity
prefix × FULL super postings — no super-side bound exists without the
minimum sub size) is pigeonhole-lossless, proven two ways: the d41
hash match against the plain exact oracle at τ=0.8 and a three-τ
identity pin vs containmentPairs. Boilerplate still generates ZERO
candidates (spec-pinned on the shared-header corpus where the full
intersection pairs all 380 directed combinations). Isolated 5-rep at
sf0.1: 2.0/2.0 min/median s; 10× smoke 2.3 → 11.5 s with output 512 →
501k directed pairs (pair-bound, the d02 replica-clique artifact).

## Round-19 bench artifact (261 queries)

Final committed builder artifact: **246.5 s total over 261 queries,
zero errors** (session pass 265.4 s). On the 254 common queries vs the
r12-final builder artifact: 215.4 s vs 213.0 s = **1.01×** —
flat, and for the first time in several rounds with **zero >1.5×
common-query movers**. The seven new queries add ~30 s, concentrated
exactly where the new work is: s47 8.3 s and s48 7.9 s (each runs a
full graph BUILD plus its serving/append audit in one query — see
their notes above), s45 3.6 s, m31 3.2 s, s46 2.3 s, d41 2.3 s,
t70 1.9 s. Two earlier mid-round refreshes (259 and 260 queries) read
1.07× and 1.02× on common — every run inside the ambient band.

## Round-19 suite wall-time: concurrency, not cuts

The r12 verdict asked for the full gate back under 14 min at the
round-13 query count. Profiling confirmed round 11's adjudication
still holds — the cost is uniformly spread (the single slowest of 695
tests measures 927 ms), so folding "superseded differentials" would
have bought seconds, and the real growth is the @Slow replay block
(GeneratedCorpusSpec alone 3:11 — every new operator joins its replay
lists, which is load-bearing coverage). Fix: `Test / testGrouping`
runs the @Slow block in a SECOND forked JVM concurrently with the
per-operator block (ForkedTestGroup limit 2) — full gate **16:24 →
8:28**, 695/695 green, zero tests dropped, within-group co-residency
unchanged. Safety audit recorded in build.sbt and the verify skill:
all slow-block shared resources are unique-per-instance; the
port-binding / warehouse-writing suites stay together in the fast
group.

## Round-18 operator notes (d40 / s40-s44 / t66-t69 / m29 / m30)

**d40 prefix-filter cost adjudication.** The first cut declared
tau=0.4 and measured 4.7 s isolated at sf0.1 vs d02's 1.5 s on the
same exact pair set — the stage profile showed 522,615 candidates,
i.e. the prefix cut was barely cutting. Cause: at tau=0.4 the safe
prefix is |d|-ceil(0.4|d|)+1 ~ 61% of each doc, and this corpus's
30-word synthetic vocabulary has no df tail for the rarity order to
exploit (the operator's win condition is boilerplate-vs-rare CONTRAST,
which Round18Spec pins: 190 -> 0 candidates on a shared-header
corpus). Two fixes landed: df now comes from a count window on the
shingle partitioning (one explode pass + one exchange instead of a
rollup+join's two explodes + three), and the DECLARED operating point
moved to tau=0.8 — the near-dup threshold a production dedup actually
runs, where the prefix is ~20%+1 of each doc (candidates 118k,
isolated 3.1 s; the residual gap vs d02 on THIS corpus is the missing
df tail, documented so nobody "fixes" it into a regression on real
data). Same 256-pair result set, hash-matched at both tau.

**s41 exact-leg contract.** The NN-descent audit's brute-force leg is
O(N * |sample|): `auditMod` restricts audited queries to ids = 0 (mod
m) and every reported counter restricts to the same sample
(spec-pinned consistency). The declared query audits everything
(auditMod=1, oracle-clean); the 10x smoke audits ~500 sampled queries
and the wall stays flat (9.6 -> 10.4 s) while the graph side grows
10x.

**m29/m30 three-leg corpus.** +100000 re-captions a near-dup image
(caption differs, phash within 3 bits), +200000 re-renders the same
caption (image differs) — all three disagreement classes exist by
construction and the release run's two dedup stages both have work.
Attribution order in m30 is contract: both-modality dups count against
the image stage; `dropped_caption` is caption-ONLY mass.

Isolated 5-rep timings (sf0.1, DriftProfile protocol, throwaway lead):
d40 4.6/4.7 (pre-fix; 3.1 post-tau-fix) · s40 0.44/0.54 · s41 3.4/3.8
(full audit) · t66 0.49/0.55 · m29 0.87/0.97 · s43 0.90/1.33 · t68
0.98/1.08 · s44 1.01/1.07 · t69 0.30/0.32 min/median s; smoke
singles: t67 3.8 · s42 2.9 · m30 6.5. s43/t68 smoke walls are FLAT at
10x (query-batch-bound / distinct-score-bound respectively).

## Round-18 bench-mover adjudication (builder artifact refresh)

The refreshed builder bench (252 queries, 229.4 s) reads 1.099x on
the 236 common queries vs the prior committed artifact — the
documented ambient band. Six >=1.5x movers, ALL on byte-unchanged
code, adjudicated by the isolated 5-rep protocol same-day:

| query | old | new | isolated min/median | verdict |
|---|---|---|---|---|
| t40_leakage_safe_split | 0.83 | 1.47 | 1.22 / 1.35 | isolated sits between; the OLD number was the favorable outlier. Steady state ~1.35. Noise. |
| m11_phash_dup_pairs | 0.53 | 0.91 | 0.46 / 0.47 | isolated BELOW both artifacts. Noise. |
| t48_ridge_quality | 0.46 | 0.78 | 0.70 / 0.78 | isolated == new; old was the favorable outlier. Steady ~0.78. |
| q45_set_ops_all | 0.51 | 0.82 | 0.34 / 0.35 | isolated far below both. Noise. |
| t51_contamination_curve | 1.40 | 2.13 | 1.56 / 1.76 | isolated between; sub-2 s steady state. Noise. |
| t52_perplexity_buckets | 1.16 | 1.74 | 0.85 / 1.01 | isolated below both. Noise. |

No mover reproduces its artifact regression in isolation; the uplift
is uniform suite-contention drift, consistent with every prior
round's adjudication of this class. The FINAL committed artifact
(254 queries incl. s44/t69, post-review-hardening) reads 213.0 s
total — 7% below the 252-query run above on the same code, the same
ambient band in the other direction.

## Round-16 signal-of-record adjudication (d27 / q44 / t36 / t13)

The r11 driver artifact showed three >=1.5x movers the builder's
same-code, same-day run contradicted, plus t13 as the one >1.5x mover
inside the builder's own artifact (vs the r10 DRIVER number).
Isolated 5-rep protocol (`DriftProfile`, throwaway lead query, sf0.1,
fresh cache per rep), run before any round-12 code touched these
queries:

| query | driver r10 | builder r10 | builder r11 | driver r11 | isolated min/median (r12) | adjudication |
|---|---|---|---|---|---|---|
| d27_dedup_impact | (truncated) | 1.638 | 1.516 | **4.506** | 1.340 / 1.467 | isolated sits AT/BELOW both builder runs and 3.1x below the driver number; the shared closure's other consumers (d06/d11/d22) did not move in either artifact. Driver-run contention, not plan cost. Off `weak`. |
| q44_correlated_subquery | (truncated) | 0.302 | 0.275 | **0.563** | 0.309 / 0.312 | isolated == builder both rounds; the driver number is a 1.8x outlier on a 0.3 s query — the class PLANS.md's noise-band note covers. Noise. |
| t36_vocab_overlap | 1.181 | 1.371 | 1.149 | **2.089** | 1.014 / 1.068 | isolated BELOW every prior artifact value. Noise. |
| t13_decontaminate_filter | 0.602 | 0.887 | 0.962 | 0.777 | 0.797 / 0.886 | the "0.60 -> 0.96" scare compared the r10 DRIVER number to the r11 BUILDER number — cross-artifact. Within each artifact the movement is 1.08x (builder) / 1.29x (driver); isolated agrees with the builder numbers from BOTH rounds. Steady state is ~0.85 +-0.1 s and the r10 driver 0.602 was the favorable outlier. Stable; recorded as the comparator. |

Pattern across all four: the isolated protocol reproduces the
BUILDER artifact and never the driver outliers — consistent with the
round-15 environment note (driver runs sample one execution per query
under full-suite contention). d27 leaves the `weak` set.

## Round-16 centroid-assignment dispatch A/B (literal vs broadcast join)

`assignToCentroidArrays` now dispatches on k: <= 64 centroids keep the
literal-inline map-only projection (byte-identical plan to before),
larger k routes through the `Ivf.assign` broadcast-join shape (k-row
broadcast, struct-ordering argmax, id-keyed join back) so SemDeDup's
k ~ sqrt(N) — tens of thousands of cells at 100 TB — can't inline a
multi-MB plan through the analyzer. Round16Spec pins the two shapes
bit-identical (sim included; greatest() and max() share Spark's
struct comparator) and runs k=5000 through the public dispatch.
Declared-k consumers after the change (isolated 5-rep, sf0.1; builder
r11 artifact as comparator — all literal-path, plan unchanged):

| query | builder r11 | isolated min/median (post-dispatch) |
|---|---|---|
| d14_semantic_dedup | 0.937 | 0.747 / 0.761 |
| d29_semdedup_threshold_curve | 1.131 | 0.714 / 0.744 |
| s34_ivf_cell_drift | 0.755 | 0.607 / 0.663 |

## Round-16 closure upgrade: pointer jumping (O(log diameter) rounds)

`distributedComponents` adds a pointer-jump step to each hash-min
round (c(v) := min(c(v), c(c(v))), a flat self-join of the cached
labelling): labels remain min-ids of same-component members and only
decrease, so the fixpoint — and every closure-fed oracle hash — is
bit-identical, but convergence collapses from O(diameter) to
O(log diameter) rounds. The r11 verdict's scale cliff (a >50-diameter
incremental-edit chain burned the full closure cost THEN threw) is
gone: a 500-long chain converges in 9 rounds (Round16Spec pins <= 12),
and maxIter=50 now covers diameters ~2^49 — a pure invariant guard.
The round-15 lineage discipline is unchanged (flat LogicalRDD views,
8-round reliable checkpoint cuts, deterministic unpersist); checkpoint
files are now deleted on supersession and with the result, and
SessionManager bootstraps a checkpoint dir so the server path takes
the fault-tolerant cut by construction. All closure-fed oracles
(d06/d11/d22/d27/d34/d35/t40/t55/t56/m22/m23 + the new m24)
re-verified hash-matched after the change.

## Round-15 closure lineage fix (driver OOM caught by the m22 10× smoke)

`distributedComponents`' hash-min loop referenced its per-round
labelling TWICE per round (neighbourhood-min join + label merge).
Cache substitution happens only at execution time, so the LOGICAL
plan doubled every round — 2^k copies of the caller's pair plan by
round k — and the listener bus's plan-description string OOMed the
driver heap on m22's large DFT pair plan over a multi-round graph
(10× smoke, 271k pairs / 47k clips). Fix: each round caches its
labelling and feeds the NEXT round through a flat LogicalRDD view
over the cached Dataset's RDD — logical plans stay one round deep
while a lost cache block still recomputes through the physical
lineage (an InMemoryTableScan falls back to its child). A first-draft
`localCheckpoint` fix was rejected in review: checkpoint blocks are
unrecoverable on executor loss — routine with dynamic allocation at
exactly the corpus scales that take the distributed path — and their
release depended on driver GC; the flat-view form keeps the old
code's deterministic per-round unpersist and the CacheScope'd final
labelling. The flat view alone was not enough: the serialized RDD
object graph still deepens per round, and the 10× m22 graph's dozens
of rounds overflowed task DEserialization (StackOverflowError) —
every 8 rounds the loop also cuts the PHYSICAL lineage, reliably
(`checkpoint()`) when the session has a checkpoint dir configured —
the production setting, surviving executor loss — and via
localCheckpoint otherwise, which is exactly safe in local mode where
no separate executor can be lost (the GraphX Pregel discipline).
Side effect measured at 10×: d34's closure fell 56.8 → 13.8 s (it
was paying the same exponential plan tax below the OOM threshold);
d22 unchanged within noise (35.9 → 37.2 isolated). All closure-fed
oracles (d06/d11/d22/d27/d34/d35/t40/t55/t56) re-verified
hash-matched — the fix changes lineage, never data.

The same review pass hardened the new operators' cache discipline:
`audioDupClusters` now materializes its pair frame FULLY before the
closure (the closure's bounded probe is a partial execution and would
release m21's scoped energy cache with most pair partitions unbuilt),
and ScaleSmoke/ExternalTable picked up arg-order and double-scan
cleanups.

## Round-15 bench environment note

The round-11 builder bench refreshes (bench_out.json, final run: 218
queries, value 151.6, zero errors) ran ~1.14× above the r10 driver
artifact UNIFORMLY — median per-query ratio 1.14× including untouched
trivial queries (q42_map_funcs, q02, q10 — all in the sub-0.6 s noise
class), with zero movers isolated-confirmed: DriftProfile on the
largest (d12 1.51×, t44 1.56×, s16 1.62×) lands between the two
rounds' numbers on unchanged code — ambient machine noise across this
session's runs, not regressions. The queries this round actually
touched moved the RIGHT way: d26 2.52→0.91 (CDC kernel), d31
7.80→3.29 (was the suite-slowest), d22 1.50→0.97 (closure lineage
fix), t46/d32/d33 flat. The eight new operators land at 0.6–2.3 s
each at sf0.1.

## Round-14 r8→r10 drift backfill (the r9 gap round)

The r10 verdict asked for a full d/m/q family comparison r8→r10 now
that `bench_out.json` is committed per round. Adjudication of what the
artifacts actually hold: `BENCH_r08.json` / `BENCH_r09.json` carry
only a TRUNCATED stdout tail (r8 starts at q50; r9 at s05 — the d and
m families are in neither), and `bench_out.json` exists only from r10
— so r8/r9 numbers for the d/m families survive in NO artifact and
the hole cannot be backfilled; it is closed going forward by the
committed full map. Over the 69 recoverable common queries
(q50–q69, s, t families):

| | r8 | r10 | ratio |
|---|---|---|---|
| q-family (n=20) | 9.70 s | 8.72 s | 0.90× |
| s-family (n=21) | 7.52 s | 6.86 s | 0.91× |
| t-family (n=28) | 20.32 s | 16.87 s | 0.83× |
| total | 37.5 s | 32.5 s | 0.86× |

**Zero ≥1.5× regressions r8→r10.** Three ≥1.5× improvements:
t27_interpolated_logprob 2.257→1.166 (the round-10 TokenHash kernel),
t13_decontaminate_filter 1.002→0.602, s15_knn_pq_indexed 0.274→0.179.
Nothing to triage.

## Round-14 watch-list adjudication (t40 / m03 / d12)

The r10 verdict flagged t40_leakage_safe_split 1.155→1.419 s in the
driver artifact on unchanged code (its own interim runs had shown the
opposite direction) and kept m03/d12 on watch. Isolated 5-rep
protocol (`DriftProfile`, throwaway lead query, sf0.1, fresh cache
per rep):

| query | isolated min | isolated median | driver r10 | adjudication |
|---|---|---|---|---|
| t40_leakage_safe_split | 1.210 | 1.309 | 1.419 | REAL plan cost ~1.2-1.3 s, stable across reps; 1.13x of the r9 driver number — inside the ~1.2x noise band. The cost is the shared ngramJaccardPairs + connectedComponents pass every cluster-keyed operator pays (d06/d11 shape); no regression, no fix task. |
| m03_frame_sample | 0.404 | 0.490 | ~0.7 (r10 triage) | improved vs the prior isolated ~0.7; code unchanged — run-to-run. Off watch. |
| d12_minhash_md5_oracle | 1.244 | 1.276 | 1.26 | isolated == driver; inside band. Off watch. |

The t40 instability across driver runs (0.94 ↔ 1.42) brackets the
same ~1.2-1.3 s isolated cost — the driver artifact samples one run
of a query whose pair-pass timing breathes ±20% with task placement.
Steady state recorded here as the comparator for future rounds.

## Round-14 d26 kernel A/B (CdcChunkDigests vs the HOF chain)

d26's boundary window-hashes were spelled as array HOFs over the
char-code array — the exact per-element interpreted-dispatch shape the
t46 triage measured 5.1x slow — and its 10x ScaleSmoke growth constant
(1.68→7.66 s, ~4.5x) said the same tax was being paid. The one-pass
kernel (`functions/CdcExpressions.CdcChunkDigests`) makes one
code-point scan per document: each window hash is a 16-term long loop
(identical exact-integer arithmetic, term-for-term — single mod 2^31 at
the end of the sum, so bit-portable to the DuckDB oracle), and every
chunk streams through one reused MessageDigest. A/B (`DriftProfile
__cdc_ab`, sf0.1, interleaved, 5 reps):

| spelling | min | median |
|---|---|---|
| CdcChunkDigests kernel | 0.535 | 0.649 |
| composable HOF chain | 1.069 | 1.260 |

1.9x isolated at sf0.1 (the dispatch tax scales with document length,
so the 10x smoke constant was larger); d26 still hash-matches (the
oracle replays the HOF spelling in SQL) and Round14Spec pins the two
spellings bit-identical through a repartition, multibyte and
length==window edges included. The chain survives as
`cdcChunkDedupComposable` — the mlmMaskComposable pattern, third
instance (Bpe/Mlm/Cdc).

## Round-12 d25 verifier kernel A/B (full DP vs banded Levenshtein)

The 10× ScaleSmoke replica run exposed d25's verify cost: 241k
candidate pairs (the replica construction's 10-copy cliques) × a full
O(len²) Levenshtein DP on ~500-char docs = 36.7 s, where d24's
Jaccard verify on the same candidates runs 3.8 s. A/B of the kernel in
isolation (`DriftProfile __lev_ab`, 200k synthetic 500-char near-dup
pairs, 3 reps each):

| verifier spelling | reps (s) |
|---|---|
| full DP `levenshtein(na, nb)` | 15.6, 16.1, 14.2 |
| banded, per-row threshold column | 8.7, 8.1, 8.2 |
| banded, literal threshold 32 | 7.7, 7.6, 8.6 |

Spark's banded path DOES engage for a non-foldable per-row threshold
(the shipped spelling: bound = ⌊(1−τ)·maxlen⌋+1) — 1.9×, not the
20× the band-width ratio suggests, because per-call code-point array
conversion and stripe bookkeeping dominate at these lengths. Shipped:
banded verification + a free |len_a−len_b| ≤ bound pre-filter (dist ≥
length difference always, so those pairs skip the DP entirely).
Banded output == full-DP output by construction (−1 rows are exactly
the rows the similarity filter would drop); d25 still hash-matches and
the Round12Spec in-memory differential pins it. The residual per-pair
DP is the verifier's inherent cost — why Jaccard verification stays
the default when order-insensitivity is acceptable, and why d25's
growth row tracks EMITTED CANDIDATE PAIRS × len, not corpus size.

## Round-12 drift triage (the r10 bench movers)

The fresh r10 local bench (vs the committed r10 numbers) moved three
queries ≥1.25×: m03 0.47→0.66, q26 0.27→0.35, s01 0.16→0.21.
DriftProfile (fresh JVM, t05 leading as the throwaway, 5 reps each):

| query | r10 bench | isolated min/median | adjudication |
|---|---|---|---|
| q26_pivot | 0.354 | 0.252 / 0.269 | recovered to its steady state — suite billing noise |
| s01_knn_bruteforce | 0.209 | 0.201 / 0.216 | a 50 ms move on a 0.2 s query — sub-noise |
| m03_frame_sample | 0.658 | 0.716 / 0.728 | isolated REPRODUCES the bench number: the ~0.7 s cost is real plan cost, not billing. Code and plan byte-unchanged since r9 (the session touched codecs m03 does not use), so the r9 0.47 was either the favorable end of the machine band or this window runs hot (t05 control also reads high). WATCH: if m03 drifts again next round it gets the full profile-vs-r9-plan treatment |

## Round-13 bench health + the two smoke-caught bugs

Driver-bench comparison (bench_out.json, 204→208 queries): total
126.7 s vs the prior run's 140.0 s on a broadly FASTER board (ten
queries improved ≥1.6×, e.g. t40 1.87→0.94, t35 1.41→0.81); the only
≥1.25× movers were q21 (0.28→0.35) and d12 (1.54→1.95), both inside
the machine band a board-wide speedup implies — adjudicated as
variance, WATCH d12 if it moves again. New-query costs sit in their
families' class: d30 1.88 (the d28 audit pass + arithmetic), t52 1.53
(the t27 plan + NTILE), d29 1.29, m19 0.84, s32 0.27.

The 10× ScaleSmoke caught two real defects this round:

1. **dedupImpactReport's uncapped default** — maxPostings=None let a
   hot shingle fan out m²/2 pre-threshold pairs; inside the closure's
   `.cache()`d pair plan the join is STATICALLY planned (AQE does not
   re-plan cached subtrees), so the misestimated broadcast of the
   exploded side hard-failed at Spark's 8 GiB ceiling. Fixed: capped
   default like dedupedCorpus; the sf-scale oracle passes None
   explicitly. Lesson: inside caches, static size estimates decide
   broadcasts — never leave an unbounded fan-out upstream of one.
2. **count()-eliminated smoke rows** — the curve/planner operators end
   in a LEFT join onto their unique-keyed config list; under a bare
   `count()` Catalyst PROVES the row count equals the config list's
   and eliminates the entire expensive branch, so d29/d30/d31/d32/s31
   timed flat at both scales while measuring nothing. Fixed: those
   rows time `collect()` (output ≤5 rows); honest growth numbers are
   in IMPLEMENTATION.md (d30 1.18→3.20 s tracking audit pairs, etc.).
   Bench was never affected (noop-format write).

## Round-12 t50 join-shape A/B (exploded likelihood join vs map-join)

t50 is the slowest round-12 query (2.89 s driver bench). Hypothesis:
the |classes|×5 row explosion BEFORE the (tok, cand) likelihood join
pays 5× through both shuffle sides; restructure as join-once-by-token
(per-token class-count map) + map-side explosion after. Measured
(DriftProfile, t05 leading, 5 reps, same windows):

| shape | min | median |
|---|---|---|
| exploded join (shipped) | 2.464 | 2.750 |
| map-join variant | 3.005 | 3.382 |

Hypothesis REFUTED: the likelihood table is VOCABULARY-sized, so AQE
broadcasts it and the 5× explosion never crosses a shuffle — while
the map build (collect_list + map_from_entries) and the per-row
element_at added real work. The exploded spelling stays; t50's
residual cost is the (doc, label, token) count aggregation plus the
5-per-doc score rollup, both inherent. (Same evidence-based-revert
discipline as the round-10 t22 cache finding.)

## Round-12 t46 kernel A/B (MlmMaskSummary vs the HOF chain)

t46 sat near the top of the r10 driver bench (2.29 s) despite being a
pure scan projection: the zip_with/md5-per-element/two-array_join
chain evaluates INTERPRETED per token. The one-pass kernel
(`functions/MlmExpressions.MlmMaskSummary`) reuses one MessageDigest
for the per-position decisions and streams the masked sequence and
target stream through two more digests — no per-token expression
dispatch, no joined-string materialization. A/B (`DriftProfile
__mlm_ab`, sf0.1, interleaved, 5 reps):

| spelling | min | median |
|---|---|---|
| MlmMaskSummary kernel | 0.182 | 0.188 |
| composable HOF chain | 0.840 | 0.965 |

5.1× isolated; t46 still hash-matches (the oracle replays every
decision in SQL) and Round12Spec pins the two spellings bit-identical
on fixture + adversarial corpora through a repartition. The HOF chain
survives as `mlmMaskComposable` — the reference semantics, the
bpeEncodeComposable pattern.

## Round-10 LM-family profile (t19 / t22 / t27 / t29 / t30 / t31)

The bigram/token LM scores topped the bench (t27 2.26 s, t31 2.52 s,
t29 2.08 s, t30 2.05 s driver-measured). Two changes, each validated
with `graft.tools.DriftProfile` (fresh JVM, 5 reps, sf0.1):

1. **One-pass hash kernels** (`functions/TokenHashExpressions`):
   the split/transform/xxhash64 HOF chain evaluates interpreted per
   ELEMENT; `TokenHashes`/`BigramHashes` hash byte slices of the raw
   UTF8String in one imperative scan per document — hash-identical by
   construction (the bigram "w1 w2" string IS the contiguous input
   slice when tokens split on single spaces, so it is hashed in place
   and never materialized).
2. **Dropped the family's scoped caches**: with tokenization cheap,
   AQE exchange reuse covers the shared sub-aggregations and the
   corpus-sized cache write+read measured strictly SLOWER than the
   final-aggregate re-runs it saved (t22 1.80 s cached-kernel vs
   0.89-1.04 s cache-free-kernel; the kernel alone changed nothing
   while the cache stayed).

| query | r8/r9 bench | round-10 isolated min/median |
|---|---|---|
| t22_bigram_logprob | 1.20 → 2.05 | 1.04 / 1.23 |
| t27_interpolated_logprob | 2.26 → 2.63 | 1.15 / 1.37 |
| t31_kneser_ney_logprob | 2.52 | 1.30 / 1.38 |
| t29_nb_quality_score | 2.08 | 0.82 / 0.99 |
| t30_importance_weights | 2.05 | 0.99 / 1.13 |
| t19_unigram_logprob | 0.99 | 1.05 / 1.17 |
| t15_token_entropy | 0.81 | 0.81 / 0.84 |

The r9 t22 regression (1.20 → 2.05) was the cache itself — added in
round 9 on the "materialize once" intuition, reverted here with the
measurements that disprove it at this scale. At 100 TB the trade may
flip back (shuffle-file re-reads vs memory cache); the operators are
cache-free because that is what MEASURES faster, and the lifecycle
spec now pins no-pinned-blocks either way.

## Round-10 drift triage (r9 verdict items #2/#3: s21 fold cadence + the r8→r9 ≥1.25x cluster)

**s21 MMR fold-cadence A/B** (the r9 verdict's missing experiment —
`DriftProfile __mmr_ab`, exact s21 shape k=10/λ=0.7, variants
interleaved round-robin, 5 timed reps each after per-variant warmup,
sf0.1, idle JVM):

| foldEvery | min | median | note |
|---|---|---|---|
| 4 | 1.157 | 1.240 | two folds (picks 4, 8) |
| 8 | 0.909 | 0.980 | shipped r9 default — one fold at pick 8 |
| 16 (= no fold for k=10) | 0.763 | 0.923 | pure inline-penalty loop |

Verdict confirmed: each fold is a `count()` + cache swap whose fixed
cost EXCEEDS the inline expression growth it removes until the pending
chain is ~16 deep. `MmrFoldEvery` is now 16 (k ≤ 16 never folds; the
fold still bounds plan size for large k, and IEEE-max associativity
keeps the trajectory bit-identical — s21 still hash-matches). Full
declared s21 after the change: isolated min 0.898 / median 0.944 —
below BOTH the r8 (1.26) and r9 (1.67) driver numbers.

**The r8→r9 drift cluster** (s08 1.52x / t06 1.46x / s11 1.39x /
t09 1.32x / t17 1.27x-cumulative / s13 1.26x), DriftProfile'd twice in
different JVM orders, with r9-stable queries as same-window controls:

| query | r8 bench | r9 bench | r10 isolated min/median | adjudication |
|---|---|---|---|---|
| t17_hash_split | 0.119 | 0.150 | 0.138 / 0.150 | matches its OWN r9 isolated floor (0.122/0.135) within 13% — the r9 bench 0.15 did not reproduce as plan cost; the "third drift" is bench-billing noise on a 0.1 s scan-stage CASE |
| t06_stratified_sample | 0.20 | 0.30 | 0.233 / 0.235 | recovered to r8 + machine band |
| t09_decontamination | 0.93 | 1.22 | 0.992 / 1.101 | recovered |
| s13_knn_ivfpq | 0.49 | 0.62 | 0.428 / 0.460 | recovered BELOW r8 |
| s08_cluster_sample | 0.37 | 0.56 | 0.478 / 0.580 | within machine band (see controls) |
| s11_knn_lsh_batch | 0.28 | 0.38 | 0.322 / 0.340 | within machine band |
| q55_groups_frames (control, r9-stable) | — | — | 0.355 / 0.449 vs r9 isolated 0.278/0.314 | today's window runs ~1.2-1.3x hot |
| t16_sequence_pack (control, r9-stable) | — | — | 0.267 / 0.280 vs r9 isolated 0.217/0.226 | 1.23x same shift |
| q68_sessionize_skewed (control) | — | — | 1.082 / 1.175 vs r9 isolated 1.237/1.313 | 0.87x — variance cuts both ways |

The controls bound today's machine window at roughly ±25% of the r9
triage window, which covers every residual in the cluster. One
position effect worth recording: the FIRST query profiled in a fresh
DriftProfile JVM reads 1.5-2x hot (t17 read 0.252 when first, 0.138
when third) — the single warmup pass does not fully absorb first-use
JIT/allocator costs, so cluster profiles here always lead with a
throwaway query.

## Round-9 drift triage (the r8 1.3x cluster: q55 / q59 / q68 / s15 / t10 / t16 / t17)

Round-8 verdict confirmed a seven-query ~1.3x cluster vs r7 that
reproduced in isolation on unchanged plans. Re-profiled with
`graft.tools.DriftProfile` (fresh JVM, noop-sink warmup, clearCache
between 5 reps, sf0.1, idle machine):

| query | r7 bench | r8 bench | r9 isolated min/median | r9min / r7 |
|---|---|---|---|---|
| q55_groups_frames | 0.282 | 0.369 | 0.278 / 0.314 | 0.99x |
| q59_range_join | 0.334 | 0.442 | 0.396 / 0.466 | 1.19x |
| q68_sessionize_skewed | 1.269 | 1.665 | 1.237 / 1.313 | 0.97x |
| s15_knn_pq_indexed | 0.207 | 0.274 | 0.276 / 0.285 | 1.33x |
| t10_source_mix | 0.275 | 0.356 | 0.319 / 0.341 | 1.16x |
| t16_sequence_pack | 0.223 | 0.300 | 0.217 / 0.226 | 0.97x |
| t17_hash_split | 0.090 | 0.119 | 0.122 / 0.135 | 1.36x |

Findings:
- **q55, q68, t16 recovered** to within 3% of their r7 steady state —
  the r8 readings for these were the same transient contention r6's
  triage documented (q68, the priority per the r8 verdict, profiles at
  1.24-1.31 s vs r7's 1.27 s).
- **q59, s15, t10, t17 persist at 1.2-1.4x** of r7. For q59, t10 and
  t17 both code and plan are byte-unchanged since the r7 bench
  (`git log 12b0901..18b2e40` touches TemporalJoins not at all and
  Sampling only with the additive t28 function; plans in this file).
  s15 is the one with a real r7->r8 code delta — searches now run
  under the deferred-deletion reader guard — but the guard is
  in-memory counter arithmetic (microsecond transitions; file IO
  unchanged), not a 70 ms mechanism. The absolute deltas are
  35-130 ms on sub-second queries, UNCORRELATED with table family
  (t16, also a documents scan-plus-window, recovered fully) or
  operator shape, and the same magnitude as the within-profile rep
  spread (q59 spans 0.396-0.513 across 5 clean reps — +-15% on one
  idle JVM). Named cost: machine-level timing variance between round
  windows (shared-host CPU contention), not plan cost. Watch, don't
  redesign: if any of the four drifts ANOTHER 1.3x next round it
  stops looking like noise.

## Round-7 drift triage (q35 / q45 / q46 / q47 / t19 vs r5)

Round-6 verdict watch-listed five queries at 1.3-1.45x their r5 bench
times on unchanged plans (clean-r6 vs r5-driver readings). Profiled
with `graft.tools.DriftProfile` (fresh JVM, noop-sink warmup,
clearCache between 5 reps, sf0.1); r5 column is the r5 driver bench:

| query | r5 bench | r6 clean | r7 isolated min | r7 / r5 |
|---|---|---|---|---|
| q35_list_aggs | 0.215 | 0.312 | 0.253 | 1.18x |
| q45_set_ops_all | 0.516 | 0.677 | 0.546 | 1.06x |
| q46_lateral_join | 0.250 | 0.351 | 0.297 | 1.19x |
| q47_cube_grouping | 0.359 | 0.519 | 0.320 | 0.89x |
| t19_unigram_logprob | 0.902 | 1.198 | 0.945 | 1.05x |

All five recover to within 1.2x of their r5 steady-state in isolation
— the r6 "drift" was suite-level contention residue, consistent with
that round's 13.5x driver-bench contamination finding. q35 needed a
second profiled pass to settle (first-pass min 0.384, settled 0.253):
its first reps pay one-time codegen/JIT for the list-agg kernels, which
the 5-rep window under-amortizes — a measurement artifact, not a plan
cost (plan unchanged per this file). No action beyond the bench-order
randomization shipped this round (Bench.scala reps=3, per-rep seeded
shuffle).

## Round-6 drift triage (q43 / t05 / t13 vs BENCH_r04)

Round-5 verdict flagged three queries 1.3-1.7x over their r4 times on
unchanged plans. Profiled with `graft.tools.DriftProfile` (fresh JVM,
noop-sink warmup, clearCache between 5 reps, sf0.1):

| query | r4 bench | r5 bench | r6 isolated (min/median/max) |
|---|---|---|---|
| q43_window_frames_ranks | 0.446 | 0.774 | 0.323 / 0.344 / 0.516 |
| t05_chunking | 0.441 | 0.569 | 0.547 / 0.568 / 0.583 |
| t13_decontaminate_filter | 0.720 | 1.054 | 1.044 / 1.101 / 1.200 |
| t09_decontamination (control) | 1.102 | 1.081 | 0.828 / 0.852 / 0.897 |

Findings:
- **q43 resolved**: 0.34 s median, 0.77x of r4 — the r5 reading was the
  same transient contention r4's six-query cluster turned out to be.
- **t13: the r4 BASELINE is the anomaly, not today's number.** t13 is a
  strict superset of t09's work (same shingle join + counts, plus the
  id anti-join and presentation sort), yet r4 recorded t13 at 0.72 s
  against t09's 1.10 s — impossible as a steady-state pair. Today the
  pair is internally consistent: t13 = t09 + 0.25 s across every rep,
  and t09 itself is FASTER than r4 (0.85 vs 1.10). r4's t13 figure was
  taken in the same contaminated measurement window its own verdict
  documented (t08 3.52 s -> 0.90 s). Code path and query text are
  byte-identical r4->r6 (`git diff 76cb6a3..` on Decontaminate/
  SparkEntry t13 block is empty).
- **t05: stable at 0.55-0.58 s** (five reps within 7%), plan unchanged
  per this file. The 0.13 s absolute delta vs r4 tracks the
  driver-regenerated corpus (documents.parquet is rebuilt every round;
  chunk count scales with text volume) and sits within the same band
  as its r5/r6 bench readings — no plan-level regression to fix.
"""
}
