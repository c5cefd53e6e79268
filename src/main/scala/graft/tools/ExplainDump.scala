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
    val spark = SparkSession.builder()
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
      "t18_quality_gate" -> "quality gate: three id-keyed partial-agg signal branches (base/repetition/entropy) joined co-partitioned on doc_id",
      "t19_unigram_logprob" -> "unigram-LM log-prob: tokens hash map-side, the doc-counts/frequency join shares one hash partitioning, corpus total is a 1-row broadcast",
      "d11_deduped_corpus" -> "dedup applied: pair graph -> closure labels -> ids-only anti-join (flagged side broadcast under AQE); document text never reshuffles",
      "s14_knn_pq_batch" -> "batch PQ: per-query ADC kernel columns exploded in the scan stage over ONE codes pass; Partial WindowGroupLimit caps per-query forwarding at k; no join, vectors never read",
    )
    val sb = new StringBuilder
    sb.append("# PLANS — `explain(\"formatted\")` of headline queries\n\n")
    sb.append(s"Generated against `$sfDir` by `graft.tools.ExplainDump`.\n")
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
}
