package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic clustering of an embedding corpus around deterministic
  * seed centroids — the curation shapes built on top of it are
  * cluster summaries (topic discovery) and cluster-balanced sampling
  * (the SemDeDup/SSL-prototype recipe: keep the most-central members
  * of every cluster so a downsampled corpus preserves semantic
  * coverage instead of oversampling the dominant mode).
  *
  * Scale design: the seeds are k tiny vectors collected once
  * (k × dim doubles, like IVF's driver-trained quantizer in
  * [[Ivf.buildCentroids]]); assignment inlines them as literal
  * arrays, so the nearest-seed argmax is a map-only projection in
  * the scan stage — zero shuffles, no join, no k-fold row expansion.
  * Only the per-cluster aggregation/window that follows shuffles,
  * and it carries (id, cell, sim) triples, never the vectors.
  *
  * Seeds are the k vectors with the smallest ids — deterministic
  * across runs and engines, which keeps the operator
  * oracle-comparable end to end (unlike trained k-means cells, whose
  * iteration order is engine-specific; see s03's rows-only check).
  */
object Clustering {

  /** The k seed centroids: (cell = id, vector as doubles), collected
    * driver-side. One tiny job — a sort-limit (TakeOrdered) on the id
    * keeps at most k rows per scan partition in flight, so the driver
    * transfer is bounded by k × dim regardless of corpus size. Ids
    * need NOT be contiguous: the seeds are the k smallest ids present,
    * whatever their values.
    */
  private def seedVectors(
      emb: DataFrame, vecCol: String, idCol: String,
      k: Int): Array[(Long, Array[Double])] = {
    require(k > 0, "k must be positive")
    emb
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
      .orderBy(col(idCol))
      .limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
  }

  /** Above this centroid count the inlined-literal projection stops
    * being a win: k × dim literal doubles make a multi-MB plan
    * (analyzer/codegen blowup — and the SemDeDup recipe's k ≈ √N
    * means tens of thousands of cells at 100 TB), so the dispatch
    * below routes large k through the [[graft.pipeline.Ivf.assign]]
    * broadcast-join shape instead. At the declared queries' k ≤ 8 the
    * literal path is byte-identical to before the dispatch existed.
    */
  private[graft] val literalInlineMaxK = 64

  /** Nearest-centroid assignment: for each row the cosine against
    * each centroid, argmax with ties to the smallest cell (mirroring
    * `ORDER BY sim DESC, cell` in SQL). Output: the input columns
    * plus (cell, sim).
    *
    * Two plan shapes behind one contract, dispatched on k:
    *  - k ≤ [[literalInlineMaxK]]: centroids inlined as literal
    *    arrays, argmax via `greatest` over (sim, -cell) structs —
    *    map-only, no join, no shuffle, no k-fold row expansion.
    *  - larger k: centroids become a broadcast k-row frame; the
    *    crossJoin + max(struct(sim, -cell)) argmax groups by id and
    *    joins back — one id-keyed exchange, but the plan size is
    *    O(1) in k and the argmax struct ordering is the same
    *    expression-for-expression (greatest and max share Spark's
    *    struct comparator), so the two shapes are value-identical
    *    (Round16Spec pins them equal, sim bit-included).
    */
  def assignToCentroidArrays(
      emb: DataFrame, vecCol: String, idCol: String,
      cents: Seq[(Long, Array[Double])]): DataFrame = {
    require(cents.nonEmpty, "no centroids to assign to")
    if (cents.size <= literalInlineMaxK)
      assignViaLiterals(emb, vecCol, idCol, cents)
    else assignViaBroadcastJoin(emb, vecCol, idCol, cents)
  }

  private[graft] def assignViaLiterals(
      emb: DataFrame, vecCol: String, idCol: String,
      cents: Seq[(Long, Array[Double])]): DataFrame = {
    val candidates: Seq[Column] = cents.map { case (cell, vec) =>
      val cvec = array(vec.toSeq.map(lit): _*)
      struct(
        Similarity.cosine(col(vecCol), cvec).as("sim"),
        lit(-cell).as("neg_cell"))
    }
    // greatest() needs >= 2 args; a single centroid is its own argmax
    val best =
      if (candidates.size == 1) candidates.head else greatest(candidates: _*)
    // input columns ride along (the IVF probe path needs the vector
    // for exact re-rank); `cell`/`sim` must not already exist
    graft.ops.ScaleOps.fanOut(emb)
      .select(col("*"), best.as("__best"))
      .withColumn("cell", -col("__best.neg_cell"))
      .withColumn("sim", col("__best.sim"))
      .drop("__best")
  }

  private[graft] def assignViaBroadcastJoin(
      emb: DataFrame, vecCol: String, idCol: String,
      cents: Seq[(Long, Array[Double])]): DataFrame = {
    val spark = emb.sparkSession
    import scala.jdk.CollectionConverters._
    val rows = cents.map { case (cell, v) =>
      org.apache.spark.sql.Row(cell, v.toSeq)
    }.asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__cell",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__cent",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false))))
    val centDf = spark.createDataFrame(rows, schema)
    // the Ivf.assign shape: k-row broadcast, per-(row, cell) cosine,
    // argmax via the same struct ordering greatest() uses; only
    // (id, sim, cell) triples reach the exchange — vectors stay in
    // the scan stage
    val best = emb.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(centDf))
      .select(col(idCol), struct(
        Similarity.cosine(col(vecCol), col("__cent")).as("sim"),
        (-col("__cell")).as("neg_cell")).as("__c"))
      .groupBy(col(idCol))
      .agg(max(col("__c")).as("__best"))
    graft.ops.ScaleOps.fanOut(emb)
      .join(best, Seq(idCol))
      .select(emb.columns.map(col) ++ Seq(
        (-col("__best.neg_cell")).as("cell"),
        col("__best.sim").as("sim")): _*)
  }

  /** [[assignToCentroidArrays]] seeded by the k smallest-id vectors. */
  def assignToSeeds(
      emb: DataFrame, vecCol: String, idCol: String, k: Int): DataFrame = {
    val seeds = seedVectors(emb, vecCol, idCol, k)
    require(seeds.nonEmpty, "cannot seed clusters from an empty corpus")
    assignToCentroidArrays(emb, vecCol, idCol, seeds.toSeq)
  }

  /** Per-cluster summary: member count, the least-central similarity
    * (cluster tightness), and the most-central member (ties to the
    * smallest id). One partial-aggregated shuffle of (cell, sim, id).
    */
  def clusterReport(
      emb: DataFrame, vecCol: String, idCol: String, k: Int): DataFrame =
    assignToSeeds(emb, vecCol, idCol, k)
      // drop the vector before the shuffle: the aggregation carries
      // (cell, sim, id) triples only
      .select(col(idCol), col("cell"), col("sim"))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_members"),
        min(col("sim")).as("min_sim"),
        max(struct(col("sim").as("s"), (-col(idCol)).as("nid"))).as("__m"))
      .select(col("cell"), col("n_members"), col("min_sim"),
        (-col("__m.nid")).as("top_id"), col("__m.s").as("top_sim"))

  /** IVF cell-BALANCE audit — the index-health check run before
    * trusting nprobe cost estimates: per-cell member counts, corpus
    * fraction, and the imbalance factor max·k/N (1.0 = perfectly
    * uniform; a monster cell means probes that hit it scan far more
    * than N·nprobe/k — the assumption every IVF cost model makes).
    * Assignment is the s07 map-only projection; the histogram is one
    * cell-keyed partial agg and the totals broadcast back over k rows.
    *
    * @return (cell, n_members, frac, imbalance), one row per cell
    *         (unsorted — callers order)
    */
  def cellBalanceReport(
      emb: DataFrame, vecCol: String, idCol: String, k: Int): DataFrame = {
    val hist = assignToSeeds(emb, vecCol, idCol, k)
      .select(col("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"))
    val tot = hist.agg(sum(col("n_members")).as("nt"),
      max(col("n_members")).as("mx"))
    hist.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_members"),
        (col("n_members").cast("double") / col("nt").cast("double")).as("frac"),
        (col("mx").cast("double") * lit(k.toDouble) /
          col("nt").cast("double")).as("imbalance"))
  }

  /** IVF APPEND cell-drift report — the index-maintenance audit run
    * before deciding whether an append forces a re-train: the
    * EXISTING index's centroids (seeded from the old corpus, the
    * s18/s30 convention) assign the new batch, and each cell reports
    * its old/new member counts, growth, and the post-append imbalance
    * factor. A cell whose growth is far above the mean means the new
    * data's distribution drifted away from the trained centroids —
    * probes hitting it scan ever more than N·nprobe/k, the number
    * [[cellBalanceReport]] (s30) watches at build time; this watches
    * it across appends. Empty cells still report (driven from the
    * k-cell seed list).
    *
    * Scale shape: both assignments are the s07 map-only projection
    * (centroids inlined as literals — no join, no shuffle); the
    * histograms are one cell-keyed partial agg each and the totals
    * broadcast back over k rows.
    *
    * @return (cell, n_old, n_new, growth, frac_old, frac_new,
    *         imbalance_after) — growth = n_new/n_old, null for
    *         previously-empty cells; imbalance_after =
    *         max(n_old+n_new)·k / total
    */
  def cellDriftReport(oldEmb: DataFrame, newEmb: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val spark = oldEmb.sparkSession
    val seeds = seedVectors(oldEmb, vecCol, idCol, k)
    require(seeds.nonEmpty, "cannot seed cells from an empty corpus")
    def hist(df: DataFrame, name: String) =
      assignToCentroidArrays(df, vecCol, idCol, seeds.toSeq)
        .select(col("cell"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as(name))
    val cells = spark.createDataFrame(seeds.map(s => Tuple1(s._1)).toSeq)
      .toDF("cell")
    val joined = cells
      .join(broadcast(hist(oldEmb, "n_old_raw")), Seq("cell"), "left")
      .join(broadcast(hist(newEmb, "n_new_raw")), Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_old_raw"), lit(0L)).as("n_old"),
        coalesce(col("n_new_raw"), lit(0L)).as("n_new"))
    val tot = joined.agg(
      sum(col("n_old") + col("n_new")).as("nt"),
      max(col("n_old") + col("n_new")).as("mx"))
    joined.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_old"), col("n_new"),
        when(col("n_old") === 0L, lit(null).cast("double"))
          .otherwise(col("n_new").cast("double") / col("n_old").cast("double"))
          .as("growth"),
        (col("n_old").cast("double") / col("nt").cast("double")).as("frac_old"),
        (col("n_new").cast("double") / col("nt").cast("double")).as("frac_new"),
        ((col("mx").cast("double") * lit(k.toDouble)) /
          col("nt").cast("double")).as("imbalance_after"))
  }

  /** TOMBSTONE / COMPACTION audit — the deletion-side index-health
    * check beside [[cellDriftReport]]'s append side: a served ANN
    * index deletes by tombstoning (the vector stays in its cell,
    * marked dead, still scanned by every probe), so per-cell dead
    * mass is pure wasted probe work until a compaction rewrites the
    * cell. This reports, per cell, live/dead counts, the live
    * fraction, and the action a compaction job takes: `compact` when
    * live_frac < `minLiveFrac`, `keep` otherwise, `empty` for a cell
    * holding nothing (possible when a seed duplicates a smaller-id
    * seed and the tie-break drains it).
    *
    * Scale shape: one map-only assignment scan + one id-keyed join
    * against the deletion set (ids only — AQE broadcasts a small
    * tombstone set, degrades to a shuffle join when deletions are
    * corpus-scale) + a k-row rollup; the k-row seed list left-joins
    * the histogram so silent cells still report.
    *
    * @param deletedIds frame of tombstoned ids, `delIdCol` typed like
    *        `idCol`
    * @return (cell, n_total, n_live, n_dead, live_frac round-6 —
    *         null for empty cells, action) one row per cell
    *         (unsorted — callers order)
    */
  def tombstoneCompactionReport(emb: DataFrame, vecCol: String,
      idCol: String, k: Int, deletedIds: DataFrame, delIdCol: String,
      minLiveFrac: Double): DataFrame = {
    val spark = emb.sparkSession
    val seeds = seedVectors(emb, vecCol, idCol, k)
    require(seeds.nonEmpty, "cannot seed cells from an empty corpus")
    val dead = deletedIds.select(col(delIdCol).as("__did"),
      lit(1L).as("__dead")).distinct()
    // fanOut like every sibling vector scan (s41/s43/s44): a
    // few-file parquet corpus otherwise runs the map-only assignment
    // kernel on reader-determined parallelism (r12 advice)
    val hist = assignToCentroidArrays(graft.ops.ScaleOps.fanOut(emb),
      vecCol, idCol, seeds.toSeq)
      .select(col(idCol), col("cell"))
      .join(dead, col(idCol) === col("__did"), "left")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_total_raw"),
        sum(coalesce(col("__dead"), lit(0L))).as("n_dead_raw"))
    val cells = spark.createDataFrame(seeds.map(s => Tuple1(s._1)).toSeq)
      .toDF("cell")
    val (liveFracExpr, actionExpr) = compactionVerdictExprs(minLiveFrac)
    cells
      .join(broadcast(hist), Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_total_raw"), lit(0L)).as("n_total"),
        coalesce(col("n_dead_raw"), lit(0L)).as("n_dead"))
      .select(col("cell"), col("n_total"),
        (col("n_total") - col("n_dead")).as("n_live"), col("n_dead"),
        liveFracExpr.as("live_frac"), actionExpr.as("action"))
  }

  /** The s40 compaction verdict over (n_total, n_dead) columns —
    * (round-6 live fraction or null, empty/compact/keep action) —
    * shared by [[tombstoneCompactionReport]] and
    * [[indexMaintenanceRun]] so the arithmetic is structurally
    * identical in both, not parallel-maintained (the
    * overfetchLegsFromScored discipline).
    */
  private def compactionVerdictExprs(minLiveFrac: Double): (Column, Column) = {
    val liveFrac = (col("n_total") - col("n_dead")).cast("double") /
      col("n_total").cast("double")
    (when(col("n_total") === 0L, lit(null).cast("double"))
        .otherwise(round(liveFrac, 6)),
      when(col("n_total") === 0L, lit("empty"))
        .when(liveFrac < lit(minLiveFrac), lit("compact"))
        .otherwise(lit("keep")))
  }

  /** The s35 rebuild predicate — shared by [[rebuildDecision]] and
    * [[indexMaintenanceRun]].
    */
  private def rebuildPredicate(imbalance: Column, newFrac: Column,
      maxImbalance: Double, maxNewFrac: Double): Column =
    imbalance > lit(maxImbalance) || newFrac > lit(maxNewFrac)

  /** OVER-FETCH under tombstones — the serving-side companion to
    * [[tombstoneCompactionReport]]: a tombstoning index still SCORES
    * deleted vectors and filters them after retrieval, so a plain
    * fetch-k returns fewer than k live results (silent recall loss —
    * the classic production incident after a large delete). The
    * standard mitigation is over-fetching (retrieve f·k, filter,
    * truncate to k); this measures both strategies' recall against
    * the exact-over-LIVE leg, so the over-fetch factor is chosen from
    * data instead of folklore.
    *
    * Scale shape: ONE scored scan (queries broadcast — the audit
    * protocol; corpus scans once, deleted flags ride an ids-only
    * join) feeds all three rank windows (fetch-k, fetch-f·k, exact
    * live); every window is a WindowGroupLimit over (src, cs, id)
    * scalars.
    *
    * @return (strategy ∈ fetch_k|overfetch, n_queries, n_returned,
    *         n_hits, n_possible, recall round-6) — unsorted, callers
    *         order
    */
  def overfetchUnderDeletes(emb: DataFrame, vecCol: String, idCol: String,
      queryIds: Seq[Long], deletedIds: DataFrame, delIdCol: String,
      k: Int, fetchFactor: Int = 2): DataFrame = {
    require(k > 0 && fetchFactor >= 1, s"bad k=$k / fetchFactor=$fetchFactor")
    val dead = deletedIds.select(col(delIdCol).as("dst"),
      lit(1L).as("__dead")).distinct()
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cs").desc, col("dst"))
    // one scored scan: every vector (live or dead) scored, the dead
    // flag joined on ids — feeds all three windows via a scoped cache
    val scored = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      graft.ops.ScaleOps.fanOut(emb)
        .select(col(idCol).as("dst"), col(vecCol).as("vb"))
        .crossJoin(broadcast(emb.where(col(idCol).isin(queryIds: _*))
          .select(col(idCol).as("src"), col(vecCol).as("qv"))))
        .where(col("dst") =!= col("src"))
        .withColumn("cs", Similarity.cosine(col("vb"), col("qv")))
        .join(dead, Seq("dst"), "left")
        .withColumn("is_dead", coalesce(col("__dead"), lit(0L)))
        .select(col("src"), col("dst"), col("cs"), col("is_dead")))
    overfetchLegsFromScored(scored, k, fetchFactor)
  }

  /** The three rank windows + recall rollup behind
    * [[overfetchUnderDeletes]], factored so the composed maintenance
    * run ([[indexMaintenanceRun]]) can feed the SAME legs from its
    * shared scan — value-identity with s43 by construction, not by
    * parallel maintenance. `scored` carries (src, dst, cs, is_dead).
    */
  private def overfetchLegsFromScored(scored: DataFrame, k: Int,
      fetchFactor: Int): DataFrame = {
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cs").desc, col("dst"))
    // the index's view: dead vectors still rank; filter AFTER
    val fetched = scored.withColumn("rn", row_number().over(wSrc))
    val fetchK = fetched.where(col("rn") <= k && col("is_dead") === 0L)
      .select(col("src"), col("dst"))
    val wSrc2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("rn"))
    val overfetch = fetched.where(col("rn") <= k * fetchFactor &&
        col("is_dead") === 0L)
      .withColumn("rn2", row_number().over(wSrc2))
      .where(col("rn2") <= k)
      .select(col("src"), col("dst"))
    // ground truth: exact top-k over the LIVE corpus only
    val exact = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      scored.where(col("is_dead") === 0L)
        .withColumn("rn", row_number().over(wSrc))
        .where(col("rn") <= k)
        .select(col("src"), col("dst")))
    val totals = exact.agg(
      countDistinct(col("src")).as("n_queries"),
      count(lit(1)).as("n_possible"))
    def leg(strategy: String, nbrs: DataFrame) = nbrs
      .join(exact.withColumn("__hit", lit(1L)), Seq("src", "dst"), "left")
      // outer coalesce: a fully-tombstoned fetch set must report
      // n_hits = 0 / recall = 0.0, not NULL
      .agg(count(lit(1)).as("n_returned"),
        coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L)).as("n_hits"))
      .crossJoin(broadcast(totals))
      .select(lit(strategy).as("strategy"), col("n_queries"),
        col("n_returned"), col("n_hits"), col("n_possible"),
        round(col("n_hits").cast("double") /
          col("n_possible").cast("double"), 6).as("recall"))
    leg("fetch_k", fetchK).unionByName(leg("overfetch", overfetch))
  }

  /** ADAPTIVE-nprobe IVF search with a per-query recall audit — the
    * serving refinement over s18/s31's FIXED nprobe: cell populations
    * are skewed (s30's imbalance read), so a fixed cell count probes
    * too much near monster cells and too little near sparse ones.
    * Adaptive termination probes cells in query-similarity order
    * UNTIL the cumulative member count reaches `targetCandidates` —
    * the cost budget is per-query work, not cell count — and this
    * reports, per query, how many cells that took, how many
    * candidates were scanned, and the recall against the exact leg.
    *
    * Scale shape: one map-only assignment scan (scope-cached — feeds
    * the k-row cell histogram and the candidate join), a |queries|×k
    * ranked-cells frame with ONE cumulative window over k-row
    * partitions, candidate scoring confined to probed cells, and the
    * broadcast exact audit leg (the d19/s41 protocol: sample queries
    * at corpus scale).
    *
    * @return (query_id, n_cells_probed, n_candidates, n_returned,
    *         n_hits, n_possible, recall round-6) one row per query
    *         (unsorted — callers order)
    */
  def adaptiveProbeRecall(emb: DataFrame, vecCol: String, idCol: String,
      queryIds: Seq[Long], k: Int, numCells: Int,
      targetCandidates: Long): DataFrame = {
    require(k > 0 && targetCandidates > 0, "k and targetCandidates must be positive")
    val spark = emb.sparkSession
    val seeds = seedVectors(emb, vecCol, idCol, numCells)
    require(seeds.nonEmpty, "cannot seed cells from an empty corpus")
    val assigned = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      assignToCentroidArrays(graft.ops.ScaleOps.fanOut(emb)
        .select(col(idCol).as("did"), col(vecCol).as("v")), "v", "did",
        seeds.toSeq)
        .select(col("did"), col("v"), col("cell")))
    val cellStats = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"))
    import scala.jdk.CollectionConverters._
    val centDf = spark.createDataFrame(
      seeds.map { case (c, v) =>
        org.apache.spark.sql.Row(c, v.toSeq)
      }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cvec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)))))
    val q = emb.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("src"), col(vecCol).as("qv"))
    // cells ranked by query-centroid cosine; probe until the
    // cumulative member count reaches the candidate budget (the
    // crossing cell is included)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("csim").desc, col("cell"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("rk"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val probed = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      q.crossJoin(broadcast(centDf))
        .withColumn("csim", Similarity.cosine(col("qv"), col("cvec")))
        .join(broadcast(cellStats), Seq("cell"), "left")
        .withColumn("nm", coalesce(col("n_members"), lit(0L)))
        .withColumn("rk", row_number().over(wRank))
        .withColumn("cum", sum(col("nm")).over(wCum))
        .where(col("cum") - col("nm") < lit(targetCandidates))
        .select(col("src"), col("cell")))
    val cand = probed
      .join(assigned, Seq("cell"))
      .where(col("did") =!= col("src"))
      .select(col("src"), col("did"), col("v"))
    val wTopC = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cs").desc, col("did"))
    val approx = cand
      .join(broadcast(q), Seq("src"))
      .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
      .withColumn("rn", row_number().over(wTopC))
      .where(col("rn") <= k)
      .select(col("src"), col("did").as("dst"))
    // the shared exact audit leg (Similarity.exactTopKSelf)
    val exact = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      Similarity.exactTopKSelf(emb, vecCol, idCol, q, k))
    val nCells = probed.groupBy(col("src"))
      .agg(count(lit(1)).as("n_cells_probed"))
    val nCand = cand.groupBy(col("src"))
      .agg(count(lit(1)).as("n_candidates"))
    val legs = approx
      .join(exact.withColumn("__hit", lit(1L)), Seq("src", "dst"), "left")
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
    val possible = exact.groupBy(col("src"))
      .agg(count(lit(1)).as("n_possible"))
    // every probed query reports, even with ZERO candidates (a tight
    // budget stopping in a cell holding only the query itself): the
    // candidate/returned/hit legs LEFT-join onto the always-present
    // probed-cells rollup and coalesce to 0 — a recall-0 query must
    // report recall 0.0, not vanish from its own audit
    nCells
      .join(nCand, Seq("src"), "left").join(legs, Seq("src"), "left")
      // the exact leg joins LEFT too: a probed query whose exact leg
      // is EMPTY (single-vector corpus — self is excluded, so there
      // is nothing to find) must still report, with n_possible = 0
      // and recall 0.0, not vanish from its own audit
      .join(possible, Seq("src"), "left")
      .select(col("src").as("query_id"), col("n_cells_probed"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_returned"), lit(0L)).as("n_returned"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_possible"), lit(0L)).as("n_possible"),
        when(coalesce(col("n_possible"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_possible").cast("double"), 6)).as("recall"))
  }

  /** IVF REBUILD decision — the one-row maintenance verdict composed
    * from [[cellDriftReport]]'s audit (s30 watches balance at build
    * time, s34 watches it across appends; this turns the watch into
    * the decision an index-maintenance job acts on): re-train when the
    * post-append imbalance factor exceeds `maxImbalance` (a monster
    * cell breaks every IVF cost model) or the appended mass exceeds
    * `maxNewFrac` of the index (the trained centroids no longer
    * represent the corpus). Also reports the max per-cell growth and
    * the count of previously-empty cells that received batch mass —
    * the drift shape diagnostics beside the verdict.
    *
    * Scale shape: the drift report's two map-only assignments +
    * k-row rollups, then one k-row aggregation — nothing here scales
    * with the corpus beyond the two scans.
    *
    * @return one row: (n_total, new_frac, imbalance_after,
    *         max_growth, n_unseeded_cells, rebuild) — rebuild as
    *         0/1 BIGINT for oracle portability
    */
  def rebuildDecision(oldEmb: DataFrame, newEmb: DataFrame,
      vecCol: String, idCol: String, k: Int,
      maxImbalance: Double = 1.5, maxNewFrac: Double = 0.3): DataFrame = {
    val drift = cellDriftReport(oldEmb, newEmb, vecCol, idCol, k)
    drift.agg(
        sum(col("n_old") + col("n_new")).as("n_total"),
        sum(col("n_new")).as("__nn"),
        max(col("imbalance_after")).as("imbalance_after"),
        max(col("growth")).as("max_growth"),
        sum(when(col("n_old") === 0L && col("n_new") > 0L, 1L)
          .otherwise(0L)).as("n_unseeded_cells"))
      .select(col("n_total"),
        (col("__nn").cast("double") / col("n_total").cast("double"))
          .as("new_frac"),
        col("imbalance_after"), col("max_growth"), col("n_unseeded_cells"),
        rebuildPredicate(col("imbalance_after"),
          col("__nn").cast("double") / col("n_total").cast("double"),
          maxImbalance, maxNewFrac).cast("long").as("rebuild"))
  }

  /** One LLOYD REFINEMENT step — the re-train [[rebuildDecision]]
    * triggers, executed as a single exact iteration: assign every
    * vector to its nearest current centroid (the seeded-assignment
    * contract), recompute each non-empty cell's centroid as the
    * per-dimension mean of its members, and report how far each
    * centroid MOVED — the convergence signal an index-maintenance
    * job watches across refresh cycles (movement ≈ 0 means the
    * partitioning has stabilized and further re-trains are wasted
    * work).
    *
    * Determinism (what makes one k-means step oracle-comparable when
    * trained k-means is not): the iteration count is fixed at ONE,
    * the seeds are the deterministic smallest-id vectors, and every
    * mean runs through round-6 values summed as DECIMAL — the
    * summation-order hazard of a float mean across partitions is
    * gone, so the new centroids are bit-identical on any engine. The
    * movement's 64-term sum is DECIMAL too (each squared diff rounded
    * 12 dp), so the distance is order-independent as well.
    *
    * Scale shape: one map-only assignment (literal or broadcast
    * dispatch by k), one posexplode to (cell, dim) keyed partial
    * aggregation — n×dim tiny rows in, k×dim groups out — and a
    * broadcast join of the k×dim old-centroid frame. Vectors never
    * shuffle; the explode carries (cell, one double) pairs.
    *
    * @return (cell, n_members, movement) for non-empty cells,
    *         movement = round-6 L2 distance old→new (unsorted —
    *         callers order)
    */
  def centroidRefresh(emb: DataFrame, vecCol: String, idCol: String,
      k: Int): DataFrame = {
    val spark = emb.sparkSession
    val cents = seedVectors(emb, vecCol, idCol, k)
    val dims = assignToCentroidArrays(emb, vecCol, idCol, cents)
      .select(col("cell"),
        posexplode(transform(col(vecCol), v => round(v.cast("double"), 6))))
      .toDF("cell", "dim", "v")
    val mu = dims.groupBy(col("cell"), col("dim"))
      .agg(sum(col("v").cast("decimal(18,6)")).as("__s"),
        count(lit(1)).as("__n"))
      .withColumn("m", col("__s").cast("double") / col("__n").cast("double"))
    import spark.implicits._
    // rounded through Spark's round(), not driver BigDecimal, so the
    // old side carries the same rounding semantics as the members
    val old = cents.toSeq.flatMap { case (cell, vec) =>
      vec.zipWithIndex.map { case (v, i) => (cell, i, v) }
    }.toDF("cell", "dim", "__raw")
      .select(col("cell"), col("dim"), round(col("__raw"), 6).as("o"))
    mu.join(broadcast(old), Seq("cell", "dim"))
      .withColumn("__t",
        round((col("m") - col("o")) * (col("m") - col("o")), 12)
          .cast("decimal(28,12)"))
      .groupBy(col("cell"))
      .agg(max(col("__n")).as("n_members"),
        round(sqrt(sum(col("__t")).cast("double")), 6).as("movement"))
  }

  /** SemDeDup threshold-sweep curve — how much of the corpus each
    * candidate cosine threshold would drop, from ONE within-cell pair
    * pass: each member's MAX cosine to a smaller-id same-cell
    * neighbor is the highest threshold at which it survives, so the
    * whole sweep is a histogram over that per-doc max (no per-τ
    * re-run). The calibration run before committing a [[semDedup]]
    * threshold — the third of the round-12 tuning curves beside the
    * contamination-n and recall-vs-nprobe sweeps. Zero-drop
    * thresholds still report (driven from the threshold list).
    *
    * Scale shape: d05/d14's — map-only seeded assignment, ONE
    * cell-keyed exchange bounding pair work to (|cell|²)/2 per cell,
    * then a doc-keyed max and a |thresholds|-row rollup.
    *
    * @return (threshold, n_dropped, drop_frac), one row per threshold
    *         (unsorted — callers order)
    */
  def semDedupThresholdCurve(
      emb: DataFrame, vecCol: String, idCol: String, k: Int,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val assigned = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      assignToSeeds(emb, vecCol, idCol, k)
        .select(col(idCol).as("id"), col("cell"), col(vecCol).as("v")))
    val mx = assigned.select(col("cell"), col("id").as("id_a"), col("v").as("va"))
      .join(assigned.select(col("cell"), col("id").as("id_b"), col("v").as("vb")),
        Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_b"),
        graft.functions.VectorExpressions.cosine(col("va"), col("vb")).as("cos"))
      .groupBy(col("id_b")).agg(max(col("cos")).as("m"))
    val tDf = emb.sparkSession.createDataFrame(
      thresholds.map(Tuple1(_))).toDF("threshold")
    val tot = emb.agg(count(lit(1)).cast("double").as("nd"))
    val counts = mx.crossJoin(broadcast(tDf))
      .where(col("m") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("nc"))
    tDf.join(broadcast(counts), Seq("threshold"), "left")
      .crossJoin(broadcast(tot))
      .select(col("threshold"),
        coalesce(col("nc"), lit(0L)).as("n_dropped"),
        (coalesce(col("nc"), lit(0L)).cast("double") / col("nd")).as("drop_frac"))
  }

  /** Semantic deduplication, the SemDeDup recipe (Abbas et al. 2023,
    * arXiv:2303.09540): embeddings are clustered, and near-duplicate
    * pairs are searched ONLY within a cluster — the clustering turns
    * the corpus-wide O(N²) cosine search into k independent
    * O((N/k)²) searches. A member is dropped when some smaller-id
    * member of its cluster sits within `threshold` cosine — a GREEDY
    * smaller-id-neighbor rule, deterministic but deliberately not
    * [[Dedup.dedupedCorpus]]'s transitive-closure labeling: with
    * edges 5–1 and 5–3 (no 1–3 edge) closure keeps only 1, while
    * this rule keeps 1 AND 3 (a superset-keep — only members with a
    * direct smaller-id near neighbor drop).
    *
    * Scale shape: assignment is the map-only inlined-centroid
    * projection ([[assignToCentroidArrays]] — no join, no shuffle);
    * the within-cluster pair join is ONE exchange keyed on `cell`,
    * and both sides of it carry (id, cell, vector) only. Per-cell
    * pair work is (|cell|²)/2 — at 100 TB you raise k (SemDeDup uses
    * k ≈ √N) so cells stay bounded and the quadratic term never
    * dominates; the final drop-flag join is keyed on id and carries
    * two longs and a boolean. Cross-cluster near-dups are invisible
    * by construction — that recall loss is the algorithm's documented
    * trade, not an implementation shortcut.
    *
    * `maxCell` is the spam-cluster guard, the [[Dedup.ngramJaccardPairs]]
    * `maxPostings` move for cells: when a cell exceeds it, only its
    * `maxCell` most-central members (sim desc, id asc — deterministic)
    * act as drop ANCHORS, bounding per-cell pair work at
    * maxCell×|cell| instead of |cell|² when a degenerate corpus dumps
    * everything into one cell. Every member is still CHECKED against
    * the anchors, so the common near-centroid duplicates are still
    * caught; drops under a cap are a subset of the exact drops
    * (spec-pinned). `None` (the default, and d14's oracle contract)
    * is exact.
    *
    * @return (idCol, cell, keep) — every input row, keep=false for
    *         dropped near-duplicates.
    */
  def semDedup(
      emb: DataFrame, vecCol: String, idCol: String,
      k: Int, threshold: Double, maxCell: Option[Int] = None): DataFrame = {
    maxCell.foreach(c => require(c > 0, "maxCell must be positive"))
    val asg = assignToSeeds(emb, vecCol, idCol, k)
      .select(col(idCol).as("id"), col("cell"), col("sim"), col(vecCol).as("v"))
    val anchors = maxCell match {
      case Some(cap) =>
        // filter sits on the raw row_number so InferWindowGroupLimit
        // caps map-side forwarding (the balancedSample pin); anchor
        // rows carry their vector into the pair join
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cell")).orderBy(col("sim").desc, col("id"))
        asg.withColumn("__r", row_number().over(w))
          .where(col("__r") <= cap).drop("__r")
      case None => asg
    }
    val a = anchors.select(col("id").as("id_a"), col("cell"), col("v").as("va"))
    val b = asg.select(col("id").as("id_b"), col("cell"), col("v").as("vb"))
    // one cell-keyed exchange; the cosine filter runs inside the
    // join's output before anything else materializes
    val drops = a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b") &&
        Similarity.cosine(col("va"), col("vb")) >= lit(threshold))
      .select(col("id_b").as("id"))
      .distinct()
    asg.select(col("id"), col("cell"))
      .join(drops.withColumn("__dropped", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        not(coalesce(col("__dropped"), lit(false))).as("keep"))
  }

  /** Incremental [[semDedup]]: deduplicate a NEW batch against an
    * existing corpus (plus itself) — the nightly-crawl path, the
    * semantic sibling of [[Dedup.incrementalNearDupPairs]]. Seeds
    * come from the CORPUS only, so cell assignment is stable as
    * batches arrive; a batch member is dropped when some same-cell
    * corpus member, or some smaller-id same-cell batch member, sits
    * within `threshold` cosine.
    *
    * Scale shape: both assignments are map-only inlined-centroid
    * projections; the batch side is BROADCAST against the corpus for
    * the cross check, so the corpus scans once and never shuffles —
    * the d10 move — and the batch-internal pair join is batch-sized.
    * The explicit broadcast() hint bypasses Spark's auto-broadcast
    * threshold, so the BATCH (ids + embeddings) must fit comfortably
    * in executor memory and under the 8 GB broadcast hard cap —
    * ~1M rows of 768-dim float32 ≈ 3 GB is the practical ceiling;
    * split larger ingests into multiple calls (cells are
    * corpus-seeded, so per-chunk results compose exactly).
    *
    * @return one row per batch member: (idCol, cell, keep)
    */
  def semDedupIncremental(
      corpus: DataFrame, batch: DataFrame, vecCol: String, idCol: String,
      k: Int, threshold: Double): DataFrame = {
    val seeds = seedVectors(corpus, vecCol, idCol, k)
    require(seeds.nonEmpty, "cannot seed clusters from an empty corpus")
    val corpusAsg = assignToCentroidArrays(corpus, vecCol, idCol, seeds.toSeq)
      .select(col("cell"), col(vecCol).as("cv"))
    val batchAsg = assignToCentroidArrays(batch, vecCol, idCol, seeds.toSeq)
      .select(col(idCol).as("id"), col("cell"), col(vecCol).as("bv"))
    val vsCorpus = corpusAsg.join(broadcast(batchAsg), Seq("cell"))
      .where(Similarity.cosine(col("cv"), col("bv")) >= lit(threshold))
      .select(col("id"))
    val a = batchAsg.select(col("id").as("id_a"), col("cell"), col("bv").as("va"))
    val b = batchAsg.select(col("id").as("id_b"), col("cell"), col("bv").as("vb"))
    val vsBatch = a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b") &&
        Similarity.cosine(col("va"), col("vb")) >= lit(threshold))
      .select(col("id_b").as("id"))
    val drops = vsCorpus.union(vsBatch).distinct()
    batchAsg.select(col("id"), col("cell"))
      .join(drops.withColumn("__dropped", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        not(coalesce(col("__dropped"), lit(false))).as("keep"))
  }

  /** Cluster-balanced sample: the `perCluster` most-central members
    * of every cluster (rank by sim desc, id asc).
    *
    * Scale shape: the filter sits directly on the raw `row_number`
    * (the long cast happens only after it) so Catalyst's
    * InferWindowGroupLimit fires — the plan gets a Partial
    * WindowGroupLimit before the exchange and a Final one after,
    * meaning every scan partition forwards at most `perCluster` rows
    * per cell instead of funnelling whole clusters through one
    * reducer. With k cells the post-shuffle state is ≤ k × perCluster
    * rows of (id, cell, sim) — never text or vectors.
    * PlanQualitySpec pins the WindowGroupLimit.
    */
  def balancedSample(
      emb: DataFrame, vecCol: String, idCol: String,
      k: Int, perCluster: Int): DataFrame = {
    require(perCluster > 0, "perCluster must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"))
      .orderBy(col("sim").desc, col(idCol))
    assignToSeeds(emb, vecCol, idCol, k)
      .select(col(idCol), col("cell"), col("sim")) // window shuffles no vectors
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= perCluster)
      .select(col("cell"), col(idCol), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** INDEX-MAINTENANCE RUN — the s-family's composed nightly (the
    * t58 move): the four maintenance verdicts an ANN index job acts
    * on, emitted as ONE manifest frame from ONE shared scan. An
    * append batch and a tombstone set arrive against a served index
    * (seeded on the OLD corpus — a maintenance run never re-seeds;
    * that is exactly what the rebuild verdict decides):
    *
    *  - `rebuild` (the s35 verdict): re-train when post-append
    *    imbalance breaks the IVF cost model or appended mass outgrows
    *    the trained centroids; diagnostics rows carry new_frac and
    *    max cell growth / unseeded-cell count.
    *  - `compaction` (the s40 actions): per cell live/dead and the
    *    compact/keep/empty action at `minLiveFrac`, over the
    *    POST-append corpus.
    *  - `sq_bits` (the s39 verdict): smallest bit width whose MSE
    *    meets `targetMse`, measured over the LIVE post-append corpus
    *    (what the rewrite would actually store).
    *  - `overfetch` (the s43 audit): fetch-k vs over-fetch recall
    *    against exact-over-live, the better strategy flagged chosen
    *    (ties to fetch_k — never over-fetch for nothing).
    *
    * Scale shape — the composition IS the deliverable: one
    * scope-cached assignment scan of old ∪ new (origin + dead flags
    * attached via an ids-only join) feeds the rebuild histogram, the
    * compaction rollup, the bits sweep, AND the over-fetch scoring
    * legs (which ride [[overfetchUnderDeletes]]'s exact factored
    * windows — value-identity with s43 by construction). Nothing
    * beyond that scan touches the corpus; every rollup is k-row /
    * |bits|-row / 2-row.
    *
    * @return manifest rows (section, item, n, x, verdict) — see the
    *         section list above; unsorted, callers order
    */
  def indexMaintenanceRun(oldEmb: DataFrame, newEmb: DataFrame,
      vecCol: String, idCol: String, k: Int,
      deletedIds: DataFrame, delIdCol: String, minLiveFrac: Double,
      maxImbalance: Double, maxNewFrac: Double,
      queryIds: Seq[Long], kq: Int, fetchFactor: Int,
      lo: Double, hi: Double, targetMse: Double,
      bitsList: Seq[Int] = Seq(2, 4, 6, 8)): DataFrame = {
    require(kq > 0 && fetchFactor >= 1, s"bad kq=$kq / fetchFactor=$fetchFactor")
    val spark = oldEmb.sparkSession
    val seeds = seedVectors(oldEmb, vecCol, idCol, k)
    require(seeds.nonEmpty, "cannot seed cells from an empty OLD corpus")
    val full = oldEmb.select(col(idCol), col(vecCol), lit(0L).as("__new"))
      .unionByName(newEmb.select(col(idCol), col(vecCol), lit(1L).as("__new")))
    val dead = deletedIds.select(col(delIdCol).as("__did"),
      lit(1L).as("__dead")).distinct()
    // THE shared scan: one assignment of old ∪ new under the OLD
    // seeds, origin + dead flags riding along (ids-only join)
    val assigned = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      assignToCentroidArrays(full, vecCol, idCol, seeds.toSeq)
        .join(dead, col(idCol) === col("__did"), "left")
        .select(col(idCol).as("id"), col(vecCol).as("v"), col("cell"),
          col("__new"), coalesce(col("__dead"), lit(0L)).as("__dead")))
    val cells = spark.createDataFrame(seeds.map(s => Tuple1(s._1)).toSeq)
      .toDF("cell")
    val percell = cells
      .join(broadcast(assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("nt_raw"), sum(col("__new")).as("nn_raw"),
          sum(col("__dead")).as("nd_raw"))), Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("nt_raw"), lit(0L)).as("n_total"),
        coalesce(col("nn_raw"), lit(0L)).as("n_new"),
        coalesce(col("nd_raw"), lit(0L)).as("n_dead"))
      .withColumn("n_old", col("n_total") - col("n_new"))
    // rebuild section — the s35 arithmetic over the shared histogram
    val imb = col("mx").cast("double") * lit(k.toDouble) /
      col("nt").cast("double")
    val nf = col("nn").cast("double") / col("nt").cast("double")
    val reb = percell.agg(
      sum(col("n_total")).as("nt"), sum(col("n_new")).as("nn"),
      max(col("n_total")).as("mx"),
      max(when(col("n_old") > 0L,
        col("n_new").cast("double") / col("n_old").cast("double")))
        .as("max_growth"),
      sum(when(col("n_old") === 0L && col("n_new") > 0L, 1L).otherwise(0L))
        .as("nu"))
    val rebuildRows = reb.select(lit("rebuild").as("section"),
        lit("decision").as("item"), col("nt").as("n"),
        round(imb, 6).as("x"),
        when(rebuildPredicate(imb, nf, maxImbalance, maxNewFrac),
          lit("rebuild")).otherwise(lit("keep")).as("verdict"))
      .unionByName(reb.select(lit("rebuild").as("section"),
        lit("new_frac").as("item"), col("nn").as("n"),
        round(nf, 6).as("x"), lit("").as("verdict")))
      .unionByName(reb.select(lit("rebuild").as("section"),
        lit("max_growth").as("item"), col("nu").as("n"),
        round(col("max_growth"), 6).as("x"), lit("").as("verdict")))
    // compaction section — s40's shared verdict expressions
    val (liveFracExpr, actionExpr) = compactionVerdictExprs(minLiveFrac)
    val compactionRows = percell.select(lit("compaction").as("section"),
      col("cell").cast("string").as("item"),
      (col("n_total") - col("n_dead")).as("n"),
      liveFracExpr.as("x"), actionExpr.as("verdict"))
    // sq_bits section — the s39 decision over the LIVE corpus, riding
    // the shared scan's cache
    val bitsRow = graft.pipeline.Quantize.bitsDecision(
        assigned.where(col("__dead") === 0L), "v", lo, hi, targetMse,
        bitsList)
      .select(lit("sq_bits").as("section"), lit("decision").as("item"),
        col("bits").as("n"), col("mse").as("x"),
        when(col("met") === 1L, lit("met")).otherwise(lit("unmet"))
          .as("verdict"))
    // overfetch section — s43's factored legs fed from the shared scan
    val scored = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      assigned.select(col("id").as("dst"), col("v").as("vb"),
          col("__dead").as("is_dead"))
        .crossJoin(broadcast(full.where(col(idCol).isin(queryIds: _*))
          .select(col(idCol).as("src"), col(vecCol).as("qv"))))
        .where(col("dst") =!= col("src"))
        .withColumn("cs", Similarity.cosine(col("vb"), col("qv")))
        .select(col("src"), col("dst"), col("cs"), col("is_dead")))
    val legs = overfetchLegsFromScored(scored, kq, fetchFactor)
    val overfetchRows = legs
      .crossJoin(broadcast(legs.agg(max(col("recall")).as("best"),
        max(when(col("strategy") === "fetch_k", col("recall")))
          .as("fetch_recall"))))
      .select(lit("overfetch").as("section"), col("strategy").as("item"),
        col("n_hits").as("n"), col("recall").as("x"),
        // chosen = better recall, ties to fetch_k (cheaper)
        when(col("recall") === col("best") &&
            (col("strategy") === "fetch_k" ||
              col("fetch_recall") < col("best")), lit("chosen"))
          .otherwise(lit("")).as("verdict"))
    rebuildRows.unionByName(compactionRows).unionByName(bitsRow)
      .unionByName(overfetchRows)
  }
}
