package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.classic.{Dataset => CDS}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the 100 TB story depends on these staying
  * true (pushdown reaching the scan, small dims broadcast, TopK not
  * global sort, codegen covering the hot expressions). A regression
  * here won't fail correctness tests — only these.
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sfDir

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[CDS[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: ["), "filters must reach the scan")
    assert(plan.contains("GreaterThanOrEqual(o_totalprice") ||
      plan.contains("In(o_orderstatus"), s"expected pushed filters in:\n$plan")
    // projection pruning: unused columns (o_orderdate, o_clerk, ...)
    // must not be read
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("o_orderdate"), "column pruning lost")
  }

  test("small dimension joins are broadcast, not shuffled") {
    val df = SparkEntry.queries("q03_join_revenue_by_nation")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"nation/region should broadcast:\n$plan")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("q08_topk")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"), s"expected TopK:\n$plan")
  }

  test("anti join stays a join (no subquery materialization)") {
    val plan = planOf(SparkEntry.queries("q05_anti_join")(spark, sf))
    assert(plan.contains("LeftAnti"), s"expected left-anti join:\n$plan")
  }

  test("cosine kernel is in the plan and survives CODEGEN_ONLY mode") {
    val plan = planOf(SparkEntry.queries("d05_embedding_neardup")(spark, sf))
    assert(plan.contains("cosinesimilarity") || plan.contains("CosineSimilarity"),
      s"kernel missing from plan:\n$plan")
    // force expression codegen (no interpreter fallback): a broken
    // doGenCode would make this throw instead of silently degrading
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val top = SparkEntry.queries("s01_knn_bruteforce")(spark, sf).collect()
      assert(top.length == 10)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("exact dedup shuffles digests, not documents") {
    val df = graft.pipeline.Dedup.exactGroups(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id")
    val plan = planOf(df)
    // the pre-shuffle projection must already be (fp, doc_id): text
    // is dropped before the exchange (shuffle volume = digests)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(fp")
    assert(exchangeIdx >= 0, s"expected hash exchange on fp:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_min"),
      "map-side partial aggregation expected")
  }

  test("lineitem agg uses partial (map-side) aggregation") {
    val plan = planOf(SparkEntry.queries("q01_pricing_summary")(spark, sf))
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"partial agg expected:\n$plan")
  }

  test("simhash kernel plan has no hash exchange (scan-stage sketch)") {
    val df = graft.pipeline.Dedup.simHash(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id")
    val plan = planOf(df)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"sketching must not shuffle:\n$plan")
    assert(plan.contains("simhash64") || plan.contains("SimHash64"),
      s"kernel missing:\n$plan")
  }

  test("chunking stays map-side: no hash exchange, generator in-stage") {
    val df = graft.pipeline.TextChunker.chunk(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id", 50, 40)
    val plan = planOf(df)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle by key:\n$plan")
    assert(plan.contains("Generate posexplode"), s"expected generator:\n$plan")
  }

  test("GROUPS-frame emulation reuses one partition exchange") {
    val df = graft.ops.WindowOps.groupsBetween(
      spark.read.parquet(s"$sf/lineitem.parquet"),
      Seq(org.apache.spark.sql.functions.col("l_returnflag")),
      Seq(org.apache.spark.sql.functions.col("l_quantity")),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)), 1, 1, "n")
    val plan = planOf(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"dense_rank + frame windows must share one exchange, got $exchanges:\n$plan")
  }

  test("stratified sample ranks inside one exchange per stratum key") {
    val df = graft.pipeline.Sampling.stratifiedSample(
      spark.read.parquet(s"$sf/documents.parquet"), "source", "doc_id", 5)
    val plan = planOf(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single stratum exchange, got $exchanges:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"hot strata must be capped map-side (WindowGroupLimit):\n$plan")
  }

  test("source mix ranks and replicates inside one exchange") {
    val df = graft.pipeline.Sampling.sourceMix(
      spark.read.parquet(s"$sf/documents.parquet"), "source", "doc_id",
      Map("src0" -> (3, 2), "src1" -> (2, 3)))
    val plan = planOf(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single stratum exchange, got $exchanges:\n$plan")
    assert(plan.contains("Generate explode"),
      s"epoch replication must be a generator, not a join:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"the max-quota literal conjunct must become a WindowGroupLimit:\n$plan")
  }

  test("balanced sample caps per-cluster rows map-side (WindowGroupLimit)") {
    val df = graft.pipeline.Clustering.balancedSample(
      spark.read.parquet(s"$sf/embeddings.parquet"), "embedding", "vec_id",
      k = 8, perCluster = 3)
    val plan = planOf(df)
    assert(plan.contains("WindowGroupLimit"),
      s"per-cluster top-k must be a WindowGroupLimit, not a full window:\n$plan")
  }

  test("decontamination joins shingle hashes with the benchmark side broadcast") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.pipeline.Decontaminate.contaminationCounts(
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0),
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 === 0),
      "text", "doc_id", n = 3)
    df.collect() // AQE decides broadcast at runtime: inspect the final plan
    val plan = planOf(df)
    assert(plan.contains("shinglehashes") || plan.contains("ShingleHashes"),
      s"shingle kernel missing from plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"small benchmark shingle set should broadcast under AQE:\n$plan")
  }

  test("cluster seed assignment is map-only: no exchange, kernel inline") {
    val df = graft.pipeline.Clustering.assignToSeeds(
      spark.read.parquet(s"$sf/embeddings.parquet"), "embedding", "vec_id", k = 8)
    val plan = planOf(df)
    // the single allowed exchange is fanOut's round-robin spread of a
    // one-file scan; assignment itself must not shuffle by key or join
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("BroadcastExchange"),
      s"seed assignment must not shuffle or broadcast-join:\n$plan")
    assert(plan.contains("cosinesimilarity") || plan.contains("CosineSimilarity"),
      s"cosine kernel missing:\n$plan")
  }

  test("chunk dedup shuffles chunk digests, not chunk text") {
    val df = graft.pipeline.Dedup.duplicatedChunks(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id", 20, 20)
    val plan = planOf(df)
    val ex = plan.indexOf("Exchange hashpartitioning(chunk_md5")
    assert(ex >= 0, s"expected hash exchange on chunk_md5:\n$plan")
    assert(!plan.substring(ex).contains("chunk_text"),
      s"chunk text must be dropped before the exchange:\n$plan")
  }

  test("decontamination filter anti-joins on ids with the flagged side broadcast") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.pipeline.Decontaminate.removeContaminated(
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0),
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 === 0),
      "text", "doc_id", n = 3, minHits = 2)
    df.collect() // AQE picks the broadcast at runtime
    val plan = planOf(df)
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
    assert(plan.contains("BroadcastHashJoin LeftAnti") ||
      plan.contains("BroadcastExchange"),
      s"flagged-id side (ids only) should broadcast:\n$plan")
  }

  test("asof join is one exchange + window, not a nested-loop join") {
    val df = SparkEntry.queries("q58_asof_join")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"asof must not nested-loop:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"expected the running-last window:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"asof is one keyed exchange, got $exchanges:\n$plan")
  }

  test("range join is a bucket equi-join, not a nested loop") {
    val df = SparkEntry.queries("q59_range_join")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not nested-loop:\n$plan")
    assert(plan.contains("__bucket"), s"bucket key missing from the join:\n$plan")
  }

  test("IVF probe path is join-free: inlined centroids, isin pruning, TopK") {
    val df = graft.pipeline.Ivf.searchTopK(
      spark.read.parquet(s"$sf/embeddings.parquet"),
      "embedding", "vec_id", queryId = 0L, k = 5, numCells = 4, nprobe = 2, iters = 1)
    val plan = planOf(df)
    // driver-trained quantizer ⇒ no join and no key shuffle anywhere:
    // assignment is a literal-centroid projection, probing is an isin
    // filter, the query vector is a literal
    assert(!plan.contains("Join") && !plan.contains("Exchange hashpartitioning"),
      s"probe path must be join-free:\n$plan")
    assert(plan.contains("cell IN") || plan.contains("cell#"),
      s"cell isin pruning missing:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }

  test("PQ ADC search is map-only scan + TopK (kernels inline, no join)") {
    val df = graft.pipeline.Pq.searchTopK(
      spark.read.parquet(s"$sf/embeddings.parquet"),
      "embedding", "vec_id", queryId = 0L, k = 5, m = 16, ksub = 16,
      iters = 1, rerank = 0)
    val plan = planOf(df)
    assert(!plan.contains("Join") && !plan.contains("Exchange hashpartitioning"),
      s"ADC scoring must be join-free:\n$plan")
    assert(plan.contains("pqencode") || plan.contains("PqEncode"),
      s"encode kernel missing:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }

  test("batch PQ: one codes scan, no join, WindowGroupLimit caps per-query rows") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = graft.pipeline.Pq.searchTopKBatch(emb,
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 2),
      "embedding", "vec_id", "vec_id", k = 5, m = 8, ksub = 8, iters = 1)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"batch ADC must not join:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k must cap map-side:\n$plan")
    assert(plan.contains("pqencode") || plan.contains("pqadcscore") ||
      plan.contains("PqEncode") || plan.contains("PqAdcScore"),
      s"PQ kernels missing from the scan stage:\n$plan")
  }

  test("hash split is a scan-stage projection: no exchange at all") {
    val df = graft.pipeline.Sampling.hashSplit(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
  }

  test("cohort retention reuses the user-keyed exchange for both aggs") {
    val df = SparkEntry.queries("q64_cohort_retention")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      s"expected partial aggregation:\n$plan")
    // user-keyed shuffles: cohort min + activity distinct; AQE may plan
    // them independently but both must partial-aggregate map-side, and
    // nothing may nested-loop
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"retention join must stay keyed:\n$plan")
  }

  test("t18 quality gate derives all signals from ONE tokenization pass") {
    val df = SparkEntry.queries("t18_quality_gate")(spark, sf)
    val plan = planOf(df)
    val generates = "\\bGenerate\\b".r.findAllIn(plan).size
    assert(generates == 1,
      s"expected ONE Generate (fused token+gram stream), got $generates:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected ONE documents scan, got $scans:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"fused gate must not join signal branches:\n$plan")
  }

  test("t20 vocab coverage: vocabulary TopK, window only over k rows") {
    val df = graft.pipeline.TextAnalysis.vocabCoverage(
      spark.read.parquet(s"$sf/documents.parquet"), "text", k = 100)
    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k vocabulary must not globally sort:\n$plan")
    // the coverage window's single-partition exchange is fed by the
    // TopK (k rows), never by the vocabulary-sized aggregate
    assert(plan.indexOf("TakeOrderedAndProject") >
      plan.indexOf("Window"),
      s"window must sit above the TopK, not the full vocabulary:\n$plan")
  }

  test("s15 indexed knn: repeat invocations hit the registry, never rebuild") {
    val q = SparkEntry.queries("s15_knn_pq_indexed")
    assert(q(spark, sf).collect().nonEmpty) // first call may build
    val (_, key) = SparkEntry.idxKeys(sf, "ivf")
    assert(graft.pipeline.AnnIndex.get(s"emb-$key").nonEmpty,
      "first s15 call must register the index handle")
    val metaDir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-ann-$key/meta")
    val mtime = metaDir.listFiles().map(_.lastModified()).max
    val rows = q(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(metaDir.listFiles().map(_.lastModified()).max == mtime,
      "second s15 call must serve from the registry, not rebuild the index")
  }

  test("s20 seeded indexed oracle twin: repeat invocations never rebuild") {
    val q = SparkEntry.queries("s20_knn_ivfpq_indexed_oracle")
    assert(q(spark, sf).collect().nonEmpty) // first call may build
    val (_, key) = SparkEntry.idxKeys(sf, "seeded")
    assert(graft.pipeline.AnnIndex.get(s"emb-seeded-$key").nonEmpty,
      "first s20 call must register the seeded index handle")
    val metaDir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-ann-seeded-$key/meta")
    val mtime = metaDir.listFiles().map(_.lastModified()).max
    val rows = q(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(metaDir.listFiles().map(_.lastModified()).max == mtime,
      "second s20 call must serve from the registry, not rebuild")
  }

  test("time-range rolling window is one keyed exchange + ONE window") {
    // operator-level plan (no presentation ORDER BY): both aggregates
    // must share a single Window operator — a shared order-key column
    // and a single projection keep CollapseWindow applicable
    val df = graft.ops.EventAnalytics.trailingWindowStats(
      Tables.events(spark, sf), "user_id", "ts", "value",
      7L * 24 * 3600 * 1000000L)
    val plan = planOf(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one user-keyed exchange, got $exchanges:\n$plan")
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows == 1, s"expected ONE collapsed Window operator, got $windows:\n$plan")
    assert(plan.contains("RANGE BETWEEN") || plan.contains("specifiedwindowframe(RangeFrame"),
      s"expected a range frame:\n$plan")
  }

  test("t23 novelty: first-seen min partial-aggregates before its exchange") {
    // the posting list must NOT shuffle: the only shingle-keyed
    // exchange is fed by a map-side partial_min, so a hot boilerplate
    // shingle arrives at its reducer already collapsed
    val df = graft.pipeline.TextAnalysis.ngramNovelty(
      Tables.load(spark, sf, "documents"), "text", "doc_id", 3)
    val plan = planOf(df)
    val pmIdx = plan.indexOf("partial_min")
    assert(pmIdx >= 0, s"expected a map-side partial min:\n$plan")
    // the plan prints top-down, so the exchange FED BY the partial
    // min is the nearest hash exchange printed above it
    val exIdx = plan.lastIndexOf("Exchange hashpartitioning", pmIdx)
    assert(exIdx >= 0, s"partial min must feed a hash exchange:\n$plan")
    // one Generate only: per-doc totals are a scan-stage size(), not
    // a second explode
    val gens = "\\bGenerate\\b".r.findAllIn(plan).size
    assert(gens == 1, s"expected ONE Generate (totals are size()), got $gens:\n$plan")
  }

  test("t24 cms: cell table partial-aggregates, top-k is TakeOrdered") {
    val df = graft.pipeline.TextAnalysis.heavyHittersCms(
      Tables.load(spark, sf, "documents"), "text", 20, 4, 1024)
    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject, not a global sort:\n$plan")
    assert(plan.contains("partial_sum"),
      s"cms cells must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the k*depth estimate lookup must broadcast, not sort-merge:\n$plan")
  }

  test("d14 semDedup: assignment is map-only, pair join is keyed on cell") {
    val df = graft.pipeline.Clustering.semDedup(
      Tables.load(spark, sf, "embeddings"), "embedding", "vec_id", 8, 0.4)
    val plan = planOf(df)
    // inlined centroids: no join below the pair join itself — the
    // assignment contributes zero exchanges (the s07 pin, composed)
    val joins = "Join".r.findAllIn(plan).size
    assert(joins <= 2, s"expected only the pair join + drop-flag join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"within-cell pairs must be an equi-join on cell:\n$plan")
  }

  test("t45 bpeEncode apply pass is a pure projection: no exchange, no join") {
    // fixed merges — the pin is about the APPLY pass, not induction
    val df = graft.pipeline.TextAnalysis.bpeEncode(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id",
      Seq(("e", "r"), ("i", "n"), ("s", "t")))
    val plan = planOf(df)
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"the corpus-sized encode must stay a scan-stage projection:\n$plan")
  }

  test("t46 mlmMask is a scan-stage projection: no exchange at all") {
    val df = graft.pipeline.TextAnalysis.mlmMask(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id")
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"masking must not shuffle:\n$plan")
  }

  test("s27 rerank: shortlist broadcasts as a left-semi build side, no keyed corpus shuffle") {
    val df = graft.pipeline.Quantize.rerankedTopK(
      Tables.load(spark, sf, "embeddings"), "embedding", "vec_id",
      queryId = 0L, k = 10, shortlist = 50, lo = -2.0, hi = 2.0)
    val plan = planOf(df)
    assert(plan.contains("LeftSemi"),
      s"exact leg must semi-join the shortlist:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"shortlist must broadcast, not shuffle the corpus:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"both stages end in TopK, never a global sort:\n$plan")
    // no corpus-keyed repartition anywhere: the only Exchanges allowed
    // are broadcasts and the fanOut round-robin on the quantized scan
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"no vec_id-keyed shuffle expected:\n$plan")
  }

  test("d23 crossSourceDups: digest-count matrix joins stay keyed, no text columns shuffle") {
    val df = graft.pipeline.Dedup.crossSourceDups(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "source",
      chunkTokens = Some(20))
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair matrix must be an equi-join on fp:\n$plan")
    // the only corpus-sized exchange carries (fp, source) counts: the
    // raw text column must not appear in any Exchange input
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"expected the digest partial-agg exchange:\n$plan")
    assert(!exchanges.exists(_.contains("text#")),
      s"document text must never shuffle:\n${exchanges.mkString("\n")}")
  }

  test("d25 edit-verified dedup: Levenshtein runs post-join on the candidate sliver, no cartesian") {
    val df = graft.pipeline.Dedup.lshEditVerifiedPairs(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id",
      threshold = 0.95)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation and verification must stay equi-joins:\n$plan")
    assert(plan.contains("levenshtein"),
      s"the verifier must be a plan expression, not a collect:\n$plan")
    // raw doc text must never shuffle — only the trimmed norm strings
    // of candidate docs move through the verify joins
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"raw document text must never shuffle:\n${exchanges.mkString("\n")}")
  }

  test("t48 ridge training: one single-partition stats agg + broadcast scoring, no keyed shuffle") {
    val df = graft.pipeline.TextAnalysis.ridgeQualityScore(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id",
      org.apache.spark.sql.functions.col("lang") === "en")
    val plan = planOf(df)
    assert(plan.contains("Exchange SinglePartition"),
      s"normal-equation sums must partial-aggregate into one row:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"the 1-row solve must broadcast back for scoring:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"no keyed shuffle anywhere in train+score:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"scoring must not sort-merge:\n$plan")
  }

  test("m15 vadSegments: threshold windows, island window and rollup share ONE keyed exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(org.apache.spark.sql.functions.octet_length(
        org.apache.spark.sql.functions.col("text")) > 0)
    val df = graft.pipeline.Multimodal.vadSegments(
      graft.pipeline.Multimodal.textAsWav(docs, "doc_id", "text"),
      frameLen = 64, minFrames = 2)
    val plan = planOf(df)
    val keyed = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(keyed.size == 1,
      s"expected exactly one sample_id exchange, got ${keyed.size}:\n$plan")
    assert(!plan.contains("Join"),
      s"totals come from windows over the same partitioning, not a join:\n$plan")
  }

  test("d26 CDC chunking: digests computed scan-side, text never shuffles") {
    val df = graft.pipeline.Dedup.cdcChunkDedup(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id")
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"df join must stay keyed:\n$plan")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(e => e.contains("text#") || e.contains(" t#")),
      s"chunk text must never shuffle — digests only:\n${exchanges.mkString("\n")}")
  }

  test("t49 budget select: one global running-sum window, nothing else shuffles") {
    val df = graft.pipeline.Sampling.tokenBudgetSelect(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id", 5000L)
    val plan = planOf(df)
    assert(plan.contains("Window"), s"running sum must be a window:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"no keyed shuffle — the global sort is the documented contract:\n$plan")
    assert(!plan.contains("Join"), s"no join anywhere:\n$plan")
  }

  test("m16/m17 codec reports: mapPartitions only, zero exchanges") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(org.apache.spark.sql.functions.octet_length(
        org.apache.spark.sql.functions.col("text")) > 0)
    val m16 = planOf(graft.pipeline.Multimodal.audioQualityReport(
      graft.pipeline.Multimodal.textAsWav(docs, "doc_id", "text")))
    assert(!m16.contains("Exchange"), s"audio quality must not shuffle:\n$m16")
    val m17 = planOf(graft.pipeline.Multimodal.imagePatches(
      graft.pipeline.Multimodal.textAsBmp(docs, "doc_id", "text", width = 10)))
    assert(!m17.contains("Exchange"), s"patch stats must not shuffle:\n$m17")
  }

  test("m18 sceneSegments: lag, running cut count and rollup share ONE keyed exchange") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 3).flatMap(s => (0 until 10).map(f =>
      (s.toLong, f.toLong, f.toLong * 7, f.toLong * 13)))
      .toDF("sample_id", "frame_idx", "ahash_hi", "ahash_lo")
    val plan = planOf(graft.pipeline.Multimodal.sceneSegments(rows.repartition(4)))
    val keyed = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(keyed.size == 1,
      s"expected exactly one sample_id exchange, got ${keyed.size}:\n$plan")
  }

  test("t50 NB confusion: class list/likelihood totals broadcast, no text in exchanges") {
    val df = graft.pipeline.TextAnalysis.nbLangConfusion(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id", "lang")
    val plan = planOf(df)
    assert(plan.contains("BroadcastExchange"),
      s"langs/priors/vocab-size must broadcast:\n$plan")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"document text must never shuffle:\n${exchanges.mkString("\n")}")
  }

  test("s29 retrieval nDCG: both legs broadcast queries + WindowGroupLimit, audit join is k-sized") {
    val emb = Tables.load(spark, sf, "embeddings")
    val df = graft.pipeline.Quantize.retrievalNdcg(emb, "embedding", "vec_id",
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5), "vec_id",
      k = 10, lo = -2.0, hi = 2.0)
    val plan = planOf(df)
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k must cap forwarding map-side:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"queries must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian anywhere:\n$plan")
  }

  test("t46 mlmMask runs the one-pass kernel, still zero exchanges") {
    val df = graft.pipeline.TextAnalysis.mlmMask(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id")
    val plan = planOf(df)
    assert(plan.toLowerCase.contains("mlmmasksummary"),
      s"the kernel must be in the plan, not the HOF chain:\n$plan")
    assert(!plan.contains("Exchange"), s"masking must not shuffle:\n$plan")
  }

  test("d28 accuracy audit: both verify legs equi-join, no text shuffles") {
    val plan = planOf(graft.pipeline.Dedup.minHashAccuracyAudit(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"keyed joins only:\n$plan")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"document text must never shuffle:\n${exchanges.mkString("\n")}")
  }

  test("s30 cell balance: map-only assignment (no join), one cell-keyed agg + broadcast totals") {
    val plan = planOf(graft.pipeline.Clustering.cellBalanceReport(
      Tables.load(spark, sf, "embeddings"), "embedding", "vec_id", k = 8))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"assignment must be inlined, totals broadcast:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"totals must broadcast:\n$plan")
  }

  test("s28 MIPS: Partial WindowGroupLimit before the rank exchange, queries broadcast") {
    val emb = Tables.load(spark, sf, "embeddings")
    val df = graft.pipeline.Similarity.mipsTopKBatch(emb,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
      "embedding", "vec_id", "vec_id", k = 5)
    val plan = planOf(df)
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k must cap forwarding map-side:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
    assert(plan.contains("dotproduct") || plan.contains("DotProduct"),
      s"the codegen dot kernel must be in the plan:\n$plan")
  }

  test("d30 band planner: config sweep is a broadcast join, no per-config corpus pass") {
    val plan = planOf(graft.pipeline.Dedup.lshBandPlanner(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id"))
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"document text must never shuffle:\n${exchanges.mkString("\n")}")
    // one measured pass: the shingle scan appears once, not per config
    assert(plan.linesIterator.count(_.contains("documents.parquet")) <= 6,
      s"the corpus must not be re-scanned per config:\n$plan")
  }

  test("s32 distortion: PqSubErrors kernel in the scan stage, no join") {
    val plan = planOf(graft.pipeline.Pq.distortionReport(
      Tables.load(spark, sf, "embeddings"), "embedding", "vec_id",
      m = 8, ksub = 16))
    assert(plan.contains("pqsuberrors") || plan.contains("PqSubErrors"),
      s"the codegen error kernel must be in the plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin")
      && !plan.contains("BroadcastHashJoin"),
      s"map-only — the codebook is a referenced constant, not a join:\n$plan")
  }

  test("m19 spectral features: one sample-keyed exchange of scalars") {
    val media = graft.pipeline.Multimodal.textAsWav(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    val plan = planOf(graft.pipeline.Multimodal.spectralFeatures(media, nBins = 8))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 1,
      s"exactly one keyed exchange expected:\n${exchanges.mkString("\n")}")
    assert(!exchanges.exists(_.contains("payload#")),
      s"payload bytes must never shuffle:\n${exchanges.mkString("\n")}")
  }

  test("m21 audio pairs: bucket-local equi-join, never a nested loop; payload stays in decode") {
    val media = graft.pipeline.Multimodal.textAsWav(
      spark.read.parquet(s"$sf/documents.parquet")
        .where(org.apache.spark.sql.functions.octet_length(
          org.apache.spark.sql.functions.col("text")) > 0), "doc_id", "text")
    val plan = planOf(graft.pipeline.Multimodal.audioFingerprintDupPairs(media))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the grid blocking must make this an equi-join:\n$plan")
    assert(plan.linesIterator.filter(_.contains("Exchange"))
      .forall(!_.contains("payload#")),
      "audio payload bytes must never cross an exchange")
  }

  test("d34 composed run result plan: ids-only anti-join + count rows, no corpus re-pass") {
    val plan = planOf(SparkEntry.queries("d34_dedup_pipeline_run")(spark, sf))
    // the banding/verify work ran eagerly inside the operator — the
    // RESULT plan must not contain the shingle explode (Generate) or
    // any text-carrying exchange
    assert(!plan.contains("Generate explode"),
      s"corpus-scale pair work leaked into the result plan:\n$plan")
    assert(plan.contains("LeftAnti"), s"expected the keep-min-id anti-join:\n$plan")
    assert(plan.linesIterator.filter(_.contains("Exchange"))
      .forall(!_.contains("text#")),
      "document text must never cross an exchange in the result plan")
  }

  test("t55 token budget: loser join is ids-only, text never shuffles") {
    val plan = planOf(SparkEntry.queries("t55_dedup_token_budget")(spark, sf))
    assert(plan.linesIterator.filter(_.contains("Exchange"))
      .forall(!_.contains("text#")),
      s"document text must never cross an exchange:\n$plan")
  }

  test("s34 cell drift: both assignments map-only (no join below the k-row rollup)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    import org.apache.spark.sql.functions.col
    val plan = planOf(graft.pipeline.Clustering.cellDriftReport(
      emb.where(col("vec_id") % 10 =!= 0), emb.where(col("vec_id") % 10 === 0),
      "embedding", "vec_id", k = 8))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"assignment must be a projection; only broadcast joins onto the seed list:\n$plan")
    assert(plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .forall(!_.contains("embedding#")),
      "vectors must never cross a keyed exchange")
  }

  test("t59 attribution: argmax capped map-side; text never crosses an exchange") {
    val plan = planOf(SparkEntry.queries("t59_contamination_attribution")(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"the per-doc argmax must cap map-side forwarding:\n$plan")
    assert(plan.linesIterator.filter(_.contains("Exchange"))
      .forall(!_.contains("text#")),
      "document text must never cross an exchange")
  }

  test("t60 split leakage: corpus scans once with val shingles broadcast; text never shuffles") {
    val plan = planOf(SparkEntry.queries("t60_split_leakage_audit")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the val-split shingle side must broadcast (the d10 shape):\n$plan")
    assert(plan.linesIterator.filter(_.contains("Exchange"))
      .forall(!_.contains("text#")),
      "document text must never cross an exchange")
  }

  test("m26 video dup pairs: hash-keyed equi-join, payload stays in decode") {
    import org.apache.spark.sql.functions.{col, octet_length, length}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
    val plan = planOf(graft.pipeline.Multimodal.videoDupPairs(
      graft.pipeline.Multimodal.framePerceptualHash(
        graft.pipeline.Multimodal.textAsAvi(docs, "doc_id", "text")).toDF()))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"frame-hash containment must be an equi-join:\n$plan")
    assert(plan.linesIterator.filter(_.contains("Exchange"))
      .forall(!_.contains("payload#")),
      "video payload bytes must never cross an exchange")
  }

  test("m24 curation run result plan: payloads never cross an exchange") {
    val plan = planOf(SparkEntry.queries("m24_audio_curation_run")(spark, sf))
    assert(plan.linesIterator.filter(_.contains("Exchange"))
      .forall(l => !l.contains("payload#") && !l.contains("text#")),
      s"clip payloads/text must never shuffle in the result plan:\n$plan")
  }

  test("s41 nn-descent: the scalar totals cross join builds on the broadcast 1-row side") {
    import org.apache.spark.sql.functions.{col, octet_length}
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("vec_id") < 64)
    val plan = planOf(graft.pipeline.GraphAnn.nnDescentRecallAudit(
      emb, "embedding", "vec_id", kCells = 4, k = 5))
    assert(!plan.contains("CartesianProduct"),
      s"the totals cross join must broadcast, never cartesian:\n$plan")
    // every BNLJ in this plan is a 1-row scalar frame — the broadcast
    // hint forces the tiny side as build even on cold stats-less plans
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => assert(l.contains("BuildRight") || l.contains("BuildLeft"),
        s"scalar cross joins must have a broadcast build side:\n$l"))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"expected the broadcast scalar join shape:\n$plan")
  }

  test("s46 maintenance run: all four verdict legs read the ONE shared assignment cache") {
    val df = SparkEntry.queries("s46_index_maintenance_run")(spark, sf)
    val plan = planOf(df)
    val inMem = plan.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(inMem >= 3,
      s"expected the rebuild/compaction/bits/overfetch legs to consume the " +
        s"shared scan's cache (>=3 InMemoryTableScans), got $inMem:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the scoring/scalar joins must broadcast, never cartesian:\n$plan")
  }

  test("t57 quality-decile report: score is scan-stage; text never shuffles") {
    val plan = planOf(SparkEntry.queries("t57_quality_dedup_report")(spark, sf))
    assert(plan.linesIterator.filter(_.contains("Exchange"))
      .forall(!_.contains("text#")),
      s"document text must never cross an exchange:\n$plan")
  }
}
