package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based ANN — the third index family beside the hash buckets
  * (LSH, s02/s17) and the coarse quantizers (IVF/PQ/SQ, s03/s12/s09):
  * a kNN GRAPH refined by neighbor-of-neighbor exploration
  * (NN-descent, Dong et al. WWW'11, public literature — the
  * construction step under HNSW-class serving indexes). The premise
  * is the triangle inequality's soft form: my neighbor's neighbor is
  * likely my neighbor, so each refinement round rescores the 2-hop
  * frontier instead of the corpus.
  *
  * Spark shape: the graph is an edge DataFrame (src, dst); a round is
  * two self-joins (forward 2-hop expansion), one vector join per
  * side, one windowed top-k — no driver-side graph object, no
  * per-vertex state. Everything shuffles by vector id; the only
  * vector movement is the candidate rescoring join (|cand| ≈ N·k²
  * rows, k small).
  */
object GraphAnn {

  /** Seed kNN graph: top-k among IVF cell-mates (vectors in the same
    * cell rank their own cell's members). The per-cell self-join is
    * the semDedup pair shape — O(N²/kCells) rows, never corpus².
    * `assigned` carries (id, v, cell).
    */
  private def initGraph(assigned: DataFrame, k: Int): DataFrame = {
    val wSrc = Window.partitionBy(col("src"))
      .orderBy(col("cs").desc, col("dst"))
    assigned.select(col("cell"), col("id").as("src"), col("v").as("va"))
      .join(assigned.select(col("cell"), col("id").as("dst"),
        col("v").as("vb")), Seq("cell"))
      .where(col("src") =!= col("dst"))
      .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
      .withColumn("rn", row_number().over(wSrc))
      .where(col("rn") <= k)
      .select(col("src"), col("dst"))
  }

  /** One NN-descent refinement round: forward 2-hop frontier ∪
    * current edges, rescored exactly against `vecs` (id, v),
    * re-ranked to top-k. |cand| ≈ N·k² rows, k small — the only
    * vector movement is the rescoring join.
    */
  private def refineRound(n: DataFrame, vecs: DataFrame, k: Int): DataFrame = {
    val wSrc = Window.partitionBy(col("src"))
      .orderBy(col("cs").desc, col("dst"))
    val hop2 = n.as("x")
      .join(n.as("y"), col("x.dst") === col("y.src"))
      .where(col("y.dst") =!= col("x.src"))
      .select(col("x.src").as("src"), col("y.dst").as("dst"))
    n.unionByName(hop2).distinct()
      .join(vecs.select(col("id").as("src"), col("v").as("va")), Seq("src"))
      .join(vecs.select(col("id").as("dst"), col("v").as("vb")), Seq("dst"))
      .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
      .withColumn("rn", row_number().over(wSrc))
      .where(col("rn") <= k)
      .select(col("src"), col("dst"))
  }

  /** One NN-descent refinement round over the UNDIRECTED graph — the
    * published algorithm's expansion (Dong et al. §2: the local join
    * runs over N(v) ∪ R(v), forward and reverse neighbors): reverse
    * every edge, expand 2-hop on the union, rescore exactly, keep
    * top-k. Reverse edges are what make descent converge — a vector
    * that APPEARS in many lists propagates its own list back to them.
    * |cand| ≤ 4·N·k² rows; vectors move only through the rescoring
    * join.
    */
  private def refineRoundUndirected(n: DataFrame, vecs: DataFrame,
      k: Int): DataFrame = {
    val wSrc = Window.partitionBy(col("src"))
      .orderBy(col("cs").desc, col("dst"))
    val und = n.unionByName(
      n.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val hop2 = und.as("x")
      .join(und.as("y"), col("x.dst") === col("y.src"))
      .where(col("y.dst") =!= col("x.src"))
      .select(col("x.src").as("src"), col("y.dst").as("dst"))
    n.unionByName(hop2).distinct()
      .join(vecs.select(col("id").as("src"), col("v").as("va")), Seq("src"))
      .join(vecs.select(col("id").as("dst"), col("v").as("vb")), Seq("dst"))
      .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
      .withColumn("rn", row_number().over(wSrc))
      .where(col("rn") <= k)
      .select(col("src"), col("dst"))
  }

  /** FLAT LogicalRDD view over a cached Dataset — the iterative-loop
    * plan-depth guard shared by every graph loop here (see
    * [[nnDescentConverge]]'s note): the refine/hop steps reference
    * their input several times, so a naive loop's ANALYZED plan grows
    * exponentially in rounds (the plan string alone OOMs the driver —
    * the m22 class); the flat view keeps the logical plan one step
    * deep while a lost cache block still recomputes through the
    * physical lineage.
    */
  private[pipeline] def flat(ds: DataFrame): DataFrame =
    ds.sparkSession.createDataFrame(ds.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]].rdd,
      ds.schema)

  /** Undirected closure of a directed adjacency. */
  private[pipeline] def undirected(g: DataFrame): DataFrame =
    g.unionByName(g.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()

  /** One NN-DESCENT refinement round with a recall audit: seed a kNN
    * graph from IVF cell-mates (vectors in the same cell rank their
    * own cell's members — the cheap-but-myopic initialization: recall
    * is capped by whatever the cell boundary cut off), expand each
    * vector's candidates with its neighbors' neighbors, rescore
    * exactly, keep top-k. Reports recall@k against the exact
    * brute-force leg for BOTH stages.
    *
    * CLOSURE PROPERTY (adjudicated round 19): with cell-confined
    * seeding the forward 2-hop frontier is CLOSED — every neighbor is
    * a cell-mate, so every neighbor's neighbor is too, and since the
    * init graph is already the exact top-k within the cell, the
    * refined graph is bit-identical to it (round1 ≡ init, verified on
    * every corpus). The two stages therefore measure the IVF
    * cell-boundary recall ceiling and CONFIRM it is a fixed point
    * under same-cell refinement; they do not measure graph
    * improvement. The operator that actually descends is
    * [[nnDescentConverge]], whose ring init crosses cells by
    * construction.
    *
    * Exact-leg contract (the d19 recall-audit protocol): the
    * brute-force leg is O(N·|sample|) and exists to GRADE the graph,
    * not to serve it — `auditMod` restricts the audited queries to
    * ids ≡ 0 (mod auditMod) (deterministic, engine-portable), so at
    * corpus scale the graph builds on everything while the exact leg
    * stays linear. Every reported counter (edges, hits, possible) is
    * restricted to the same sample, so the recalls stay comparable.
    *
    * Determinism: every top-k window orders (cosine desc, id asc) —
    * total order; recall is one exact-integer division rounded 6 dp.
    *
    * @return two rows (stage ∈ init|round1): (stage, n_queries,
    *         n_edges, n_hits, n_possible, recall) — unsorted, callers
    *         order
    */
  def nnDescentRecallAudit(emb: DataFrame, vecCol: String, idCol: String,
      kCells: Int, k: Int, auditMod: Long = 1L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(auditMod >= 1L, s"auditMod must be >= 1, got $auditMod")
    // vectors by id: feeds the candidate rescoring joins and the
    // exact leg's broadcast query frame — scope-cached (released
    // after the one result plan executes)
    val vecs = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      graft.ops.ScaleOps.fanOut(emb)
        .select(col(idCol).as("id"), col(vecCol).as("v")))
    val assigned = Clustering.assignToSeeds(emb, vecCol, idCol, kCells)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("cell"))
    // init graph + one refinement round (the shared kernels)
    val n0 = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      initGraph(assigned, k))
    val n1 = refineRound(n0, vecs, k)
    // exact audit leg (the shared [[Similarity.exactTopKSelf]] shape):
    // self excluded, queries restricted to the audit sample
    val exact = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      Similarity.exactTopKSelf(emb, vecCol, idCol,
        vecs.where(col("id") % lit(auditMod) === 0L)
          .select(col("id").as("src"), col("v").as("qv")), k))
    val totals = exact.agg(
      countDistinct(col("src")).as("n_queries"),
      count(lit(1)).as("n_possible"))
    def leg(stage: String, nbrs: DataFrame) = nbrs
      .where(col("src") % lit(auditMod) === 0L)
      .join(exact.withColumn("__hit", lit(1L)), Seq("src", "dst"), "left")
      // outer coalesce: an EMPTY edge set (e.g. kCells ≥ N → singleton
      // cells) must report n_hits = 0 / recall = 0.0, not NULL
      .agg(count(lit(1)).as("n_edges"),
        coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L)).as("n_hits"))
      // broadcast: totals is a 1-row agg — without the hint a cold
      // stats-less plan can pick BNLJ with the big side as build (the
      // codebase invariant every sibling scalar cross join applies,
      // e.g. Pq/Dedup)
      .crossJoin(broadcast(totals))
      .select(lit(stage).as("stage"), col("n_queries"), col("n_edges"),
        col("n_hits"), col("n_possible"),
        round(col("n_hits").cast("double") /
          col("n_possible").cast("double"), 6).as("recall"))
    leg("init", n0).unionByName(leg("round1", n1))
  }

  /** NN-DESCENT TO CONVERGENCE — the actual HNSW-class build loop
    * (Dong et al. WWW'11, terminate on no improvement): from a
    * geometry-BLIND ring init, iterate [[refineRoundUndirected]]
    * until the audited recall@k gain drops below `epsilon` or
    * `maxRounds` is hit, reporting one row per EXECUTED stage — the
    * emitted row count IS the rounds-to-converge measurement. The
    * round exhibiting the sub-ε gain is itself reported (it ran —
    * that observation is the termination evidence).
    *
    * Why not the IVF-cellmate seed of [[nnDescentRecallAudit]]: that
    * init is a FIXED POINT under 2-hop refinement (see the closure
    * note there) — descent needs initial edges that cross the
    * geometry, which is what Dong's random init provides. The
    * deterministic stand-in: each vector's k initial neighbors are
    * the vectors at id offsets +1..+k (mod N) — arbitrary w.r.t.
    * geometry, engine-portable, and every refinement round then
    * genuinely climbs. Requires a DENSE id column (checked loudly);
    * the embeddings tables carry one by construction.
    *
    * Sampled-audit contract (the d19 protocol, here as the DECLARED
    * shape — the serving contract a copy-paste user should run):
    * `auditMod` restricts the recall audit to ids ≡ 0 (mod auditMod);
    * the graph builds on EVERYTHING while the exact leg stays
    * O(N·|sample|). Every counter restricts to the same sample.
    *
    * Spark shape: the per-round edge frames are cached hand-over-hand
    * (round r materializes via its own audit action, then round r−1
    * is released); the loop's driver-side state is five scalars per
    * round — never data. The convergence decision compares the
    * ROUND-6 recalls both engines compute identically, so the stop
    * round is oracle-replayable.
    *
    * @return one row per executed stage: (round_no 0=init, n_queries,
    *         n_edges, n_hits, n_possible, recall, gain, converged) —
    *         gain at round 0 is the recall itself (gain over the
    *         empty graph); converged=1 only on a sub-ε round.
    */
  def nnDescentConverge(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, auditMod: Long = 1L, epsilon: Double = 0.001,
      maxRounds: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(auditMod >= 1L, s"auditMod must be >= 1, got $auditMod")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    require(epsilon >= 0.0, s"epsilon must be >= 0, got $epsilon")
    val spark = emb.sparkSession
    val vecs = graft.ops.ScaleOps.fanOut(emb)
      .select(col(idCol).as("id"), col(vecCol).as("v")).cache()
    val exact = Similarity.exactTopKSelf(emb, vecCol, idCol,
      vecs.where(col("id") % lit(auditMod) === 0L)
        .select(col("id").as("src"), col("v").as("qv")), k).cache()
    val tot = exact.agg(countDistinct(col("src")).as("q"),
      count(lit(1)).as("p")).collect()(0)
    val (nQueries, nPossible) = (tot.getLong(0), tot.getLong(1))
    // per-stage audit counters — the ONLY actions in the loop, each a
    // 1-row collect (materializes the round's cached edge frame too)
    def counters(nbrs: DataFrame): (Long, Long) = {
      val r = nbrs.where(col("src") % lit(auditMod) === 0L)
        .join(exact.withColumn("__hit", lit(1L)), Seq("src", "dst"), "left")
        .agg(count(lit(1)).as("e"),
          coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L)).as("h"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // Spark's round(x, 6): BigDecimal.valueOf + HALF_UP — use the
    // same call so the stop decision replays on any engine
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def rec6(h: Long): Double =
      if (nPossible == 0L) 0.0
      else round6(h.toDouble / nPossible.toDouble)
    // ring init over dense ids: offsets +1..+k (mod N) — one 1-row
    // meta collect + a map-only explode, no shuffle
    val meta = vecs.agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
      max(col("id")).as("mx")).collect()(0)
    val (n, mn, mx) = (meta.getLong(0), meta.getLong(1), meta.getLong(2))
    require(n > 0, "cannot build a graph over an empty corpus")
    require(mx - mn + 1L == n,
      s"ring init needs a dense id column: ids span [$mn,$mx] but count is $n")
    val ring = vecs.select(col("id").as("src"))
      .select(col("src"),
        explode(sequence(lit(1), lit(math.min(k.toLong, n - 1L)))).as("j"))
      .select(col("src"),
        (((col("src") - lit(mn)) + col("j")) % lit(n) + lit(mn)).as("dst"))
      .where(col("dst") =!= col("src"))
      .distinct()
    // each round feeds the next through the shared FLAT LogicalRDD
    // view (the closure loop's pattern, Dedup.scala): the refine step
    // references its input ~5×, so a naive loop's ANALYZED plan grows
    // 5^rounds and the plan string alone OOMs the driver. The flat
    // view keeps the logical plan one step deep; a lost cache block
    // still recomputes through the physical lineage.
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Double, Double, Long)]
    var cur = ring.cache()
    val (e0, h0) = counters(cur) // materializes cur before flat reads it
    var prevRecall = rec6(h0)
    buf += ((0L, nQueries, e0, h0, nPossible, prevRecall, prevRecall, 0L))
    var r = 1
    var stopped = false
    while (r <= maxRounds && !stopped) {
      val next = refineRoundUndirected(flat(cur), vecs, k).cache()
      val (er, hr) = counters(next)
      val rec = rec6(hr)
      val gain = round6(rec - prevRecall)
      val conv = if (gain < epsilon) 1L else 0L
      buf += ((r.toLong, nQueries, er, hr, nPossible, rec, gain, conv))
      cur.unpersist()
      cur = next
      prevRecall = rec
      stopped = conv == 1L
      r += 1
    }
    cur.unpersist(); vecs.unpersist(); exact.unpersist()
    spark.createDataFrame(buf.toSeq).toDF("round_no", "n_queries",
      "n_edges", "n_hits", "n_possible", "recall", "gain", "converged")
  }

  /** Ring init + `buildRounds` undirected NN-descent refinements,
    * audit-free — the graph BUILD shared by [[graphBeamSearch]],
    * [[graphAppendAudit]] and the persisted [[GraphIndex]]. Returns
    * the cached directed edge frame (caller owns the unpersist);
    * rounds feed through the flat view to keep the analyzed plan one
    * round deep.
    */
  private[pipeline] def buildRingGraph(vecs: DataFrame, n: Long, mn: Long,
      graphK: Int, buildRounds: Int): DataFrame = {
    var g = vecs.select(col("id").as("src"))
      .select(col("src"),
        explode(sequence(lit(1), lit(math.min(graphK.toLong, n - 1L))))
          .as("j"))
      .select(col("src"),
        (((col("src") - lit(mn)) + col("j")) % lit(n) + lit(mn)).as("dst"))
      .where(col("dst") =!= col("src"))
      .distinct().cache()
    g.count(): Unit
    var r = 0
    while (r < buildRounds) {
      val nx = refineRoundUndirected(flat(g), vecs, graphK).cache()
      nx.count(): Unit
      g.unpersist(); g = nx; r += 1
    }
    g
  }

  /** GRAPH BEAM SEARCH with a per-hop recall audit — the SERVING read
    * of the graph-ANN family (the best-first search HNSW-class
    * indexes answer queries with, Malkov & Yashunin's layer-0 loop):
    * build the kNN graph ([[nnDescentConverge]]'s ring init +
    * `buildRounds` undirected refinements, no audit), then for each
    * query walk it — start the beam at a fixed entry vector (the
    * min-id vector; the next one when the query IS the entry), each
    * hop expand the beam's undirected neighbors, rescore exactly
    * against the query, keep the best `beamWidth` — and report, per
    * (query, hop), the candidates scored THAT hop and the recall@k of
    * the beam's current top-k against the exact leg. The hop count is
    * FIXED (serving systems bound latency, and a fixed hop count is
    * what makes the trajectory oracle-replayable); the per-hop rows
    * ARE the measurement of how many hops the budget needs.
    *
    * This entry point BUILDS the graph in-query — the one-shot /
    * diagnostic shape. Production serving loads a persisted
    * [[GraphIndex]] instead ([[graphBeamSearchLoaded]]): the two
    * produce bit-identical trajectories on the same build parameters
    * (the edge set is deterministic; spec-pinned), the only
    * difference is who pays for the build.
    *
    * Monotonicity: each hop's beam is the top-`beamWidth` of a
    * candidate SUPERSET of the previous beam under the same total
    * order (cos desc, id asc), so beam quality — and therefore
    * recall@k of its top-k — never decreases hop over hop
    * (spec-pinned).
    *
    * Scale shape: the graph build is s45's (per-round flat-view
    * caches); the search touches O(|queries| · beamWidth · degree)
    * vectors per hop — the whole point of graph serving: the corpus
    * is scanned once to build, never per query. Queries broadcast;
    * the per-hop rescoring join is the only vector movement.
    *
    * @return one row per (query, hop 1..hops): (query_id, hop,
    *         n_scored, n_hits, n_possible, recall round-6) —
    *         unsorted, callers order
    */
  def graphBeamSearch(emb: DataFrame, vecCol: String, idCol: String,
      queryIds: Seq[Long], k: Int, beamWidth: Int, graphK: Int,
      buildRounds: Int, hops: Int): DataFrame = {
    require(graphK > 0 && buildRounds >= 0,
      s"bad graphK=$graphK / buildRounds=$buildRounds")
    val (vecs, n, mn, mx) = servingVecs(emb, vecCol, idCol)
    // the IN-QUERY build needs the ring init's dense id space; the
    // loaded serve paths do not (a written-back repaired index serves
    // a tombstone-compacted — non-dense — corpus)
    require(mx - mn + 1L == n,
      s"ring init needs a dense id column: ids span [$mn,$mx] but count is $n")
    try {
      // build: ring + R undirected rounds (the s45 loop, audit-free)
      val g = buildRingGraph(vecs, n, mn, graphK, buildRounds)
      // the serve loop is eager (one collect per hop), so the caches
      // can drop in finally — the returned frame is driver-local rows
      try beamServe(emb, vecCol, idCol, vecs, undirected(g), mn,
        queryIds, k, beamWidth, hops, coarseSet = None)
      finally g.unpersist()
    } finally vecs.unpersist()
  }

  /** [[graphBeamSearch]] against a PERSISTED [[GraphIndex]] — the
    * production serving read: no build job anywhere below this call,
    * the adjacency comes off the index's parquet edge table. With the
    * same (graphK, buildRounds) the trajectory is bit-identical to an
    * in-query build (the edge set is deterministic — spec-pinned), so
    * the only difference is WHO pays for the build: here it already
    * ran as the index's nightly job.
    *
    * `coarseEntryK = Some(c)` switches the fixed min-id entry to
    * HIERARCHICAL entry selection — the one-layer version of HNSW's
    * upper-layer descent (Malkov & Yashunin §4, public literature):
    * each query's walk starts at its best match among the first `c`
    * vectors by id (the [[Clustering]] seed discipline — a
    * deterministic, engine-portable coarse set), found by scoring
    * just c candidates — O(|queries|·c), flat in N. The entry
    * selection is AUDITED as hop 0 (n_scored = coarse candidates
    * scored, the entry's own hit count against the exact leg), so
    * the output rows cover hops 0..hops instead of 1..hops, and the
    * hop-for-hop trajectory vs the fixed entry MEASURES what the
    * coarse layer buys on the corpus at hand. What it buys is
    * data-dependent (greedy walks carry no dominance theorem):
    * largest at short hop budgets and on corpora with real
    * neighborhood structure; on a near-orthogonal random corpus the
    * strategies reach parity by a 5-hop budget (the round-20
    * `__gentry_ab` A/B — which also exposed that LOW-ID queries are
    * ring-adjacent to the min-id entry, flattering the fixed entry
    * by construction). That measurement, not a guaranteed win, is
    * the operator's contract.
    *
    * Staleness guard: the handle's recorded corpus stats (n, min id)
    * and column names must match the frame being served — a corpus
    * regenerated in place under an old index fails loudly here
    * (complementing the caller's fingerprint keying of `dir`).
    */
  def graphBeamSearchLoaded(emb: DataFrame, vecCol: String, idCol: String,
      handle: GraphIndex.Handle, queryIds: Seq[Long], k: Int,
      beamWidth: Int, hops: Int,
      coarseEntryK: Option[Int] = None,
      coarseEntryIds: Option[Seq[Long]] = None): DataFrame = {
    require(coarseEntryK.isEmpty || coarseEntryIds.isEmpty,
      "pass coarseEntryK or coarseEntryIds, not both")
    val (vecs, n, mn, _) = servingVecs(emb, vecCol, idCol)
    try {
      requireHandleMatches(handle, n, mn, idCol, vecCol)
      beamServe(emb, vecCol, idCol, vecs,
        undirected(GraphIndex.edges(emb.sparkSession, handle)), mn,
        queryIds, k, beamWidth, hops,
        coarseFrame(vecs, mn, coarseEntryK, coarseEntryIds))
    } finally vecs.unpersist()
  }

  /** The hierarchical-entry coarse candidate set: the first `ck`
    * vectors by id (the seed discipline — s50's declared shape), or
    * an EXPLICIT id set (`coarseEntryIds`) for callers whose coarse
    * layer is computed offline — e.g. k-means medoids (the round-21
    * `__gentry_ab` medoid arm). Returns (dst, v) rows.
    */
  private def coarseFrame(vecs: DataFrame, mn: Long,
      coarseEntryK: Option[Int],
      coarseEntryIds: Option[Seq[Long]]): Option[DataFrame] =
    coarseEntryK.map { ck =>
      require(ck >= 1, s"coarseEntryK must be >= 1, got $ck")
      vecs.where(col("id") < lit(mn + ck.toLong))
        .select(col("id").as("dst"), col("v"))
    }.orElse(coarseEntryIds.map { ids =>
      require(ids.nonEmpty, "coarseEntryIds must be non-empty")
      vecs.where(col("id").isin(ids: _*))
        .select(col("id").as("dst"), col("v"))
    })

  /** Shared serving prep: fanned-out (id, v) cache + corpus stats.
    * No density requirement here (round 21): serving a LOADED index
    * works over any id space — a written-back repaired index's
    * corpus is tombstone-compacted, hence non-dense. The build entry
    * points re-assert density themselves (ring init needs it).
    */
  private def servingVecs(emb: DataFrame, vecCol: String,
      idCol: String): (DataFrame, Long, Long, Long) = {
    val vecs = graft.ops.ScaleOps.fanOut(emb)
      .select(col(idCol).as("id"), col(vecCol).as("v")).cache()
    val meta = vecs.agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
      max(col("id")).as("mx")).collect()(0)
    val (n, mn, mx) = (meta.getLong(0), meta.getLong(1), meta.getLong(2))
    require(n >= 2, "cannot search a graph over fewer than 2 vectors")
    (vecs, n, mn, mx)
  }

  /** Per-query fixed entry: the min-id vector, or — when the query
    * IS that vector — the second-smallest id. Dense corpora resolve
    * the alternate as mn+1 by construction; a non-dense (repaired)
    * corpus resolves it with one tiny agg, run ONLY when some query
    * actually equals mn (zero extra jobs otherwise, and the same
    * value as the historical mn+1 on dense ids).
    */
  private def fixedEntries(vecs: DataFrame, mn: Long,
      queryIds: Seq[Long]): Seq[(Long, Long)] = {
    lazy val alt: Long = vecs.where(col("id") > lit(mn))
      .agg(min(col("id"))).head().getLong(0)
    queryIds.distinct.map(q => (q, if (q == mn) alt else mn))
  }

  private def requireHandleMatches(handle: GraphIndex.Handle, n: Long,
      mn: Long, idCol: String, vecCol: String): Unit = {
    require(handle.idCol == idCol && handle.vecCol == vecCol,
      s"graph index at ${handle.dir} was built over " +
        s"(${handle.idCol}, ${handle.vecCol}), serving (${idCol}, ${vecCol})")
    require(handle.n == n && handle.mn == mn,
      s"graph index at ${handle.dir} was built over a different corpus: " +
        s"index has n=${handle.n} min_id=${handle.mn}, the served frame " +
        s"has n=$n min_id=$mn — re-key the index dir by corpus fingerprint")
  }

  /** The audited beam walk over an ALREADY-BUILT adjacency — the
    * serving kernel shared by [[graphBeamSearch]] (in-query build)
    * and [[graphBeamSearchLoaded]] (persisted index). Caches `undSrc`
    * for the duration of the hop loop and releases every cache it
    * pins before returning (the loop runs eagerly — one beam
    * materialization per hop — so the returned frame is driver-local
    * rows). `vecs` stays the caller's.
    *
    * Round-15 shape (guide §2.4/§3.1 — deliberate join sides, fewer
    * passes):
    *   - join sides are PINNED by broadcast hints so the two
    *     corpus-bounded frames never move: the beam (|q|·beamWidth
    *     rows) broadcasts onto the edge scan, the candidate id set
    *     (|q|·beam·degree rows — exactly what the audit reports as
    *     n_scored) broadcasts onto the vector scan. Without the
    *     hints the planner — seeing unknown stats on the loop's flat
    *     views — broadcasts the CACHED side instead, i.e. the edge
    *     table and the corpus vectors: a per-hop corpus broadcast,
    *     which dies outright at 100 TB.
    *   - the per-hop audit counters are DEFERRED: each hop's scored
    *     frame stays cached and ONE action after the loop computes
    *     every (query, hop) counter — n_scored, beam-cut hits vs the
    *     exact leg, n_possible — instead of a groupBy+join+collect
    *     round-trip per hop. The deferred cut reads the scored
    *     frames directly: top-k of the beam ≡ top-k of its scored
    *     superset (k ≤ beamWidth under the same total order), and
    *     the hop-0 entry is the rank-1 row of its coarse scores.
    */
  private def beamServe(emb: DataFrame, vecCol: String, idCol: String,
      vecs: DataFrame, undSrc: DataFrame, mn: Long, queryIds: Seq[Long],
      k: Int, beamWidth: Int, hops: Int,
      coarseSet: Option[DataFrame]): DataFrame = {
    require(k > 0 && beamWidth >= k, s"need beamWidth >= k > 0, " +
      s"got k=$k beamWidth=$beamWidth")
    require(hops >= 1, s"bad hops=$hops")
    require(queryIds.nonEmpty, "no queries")
    val spark = emb.sparkSession
    val und = undSrc.cache()
    und.count(): Unit
    val qframe = vecs.where(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv")).cache()
    // every requested query must exist in the corpus — without this
    // the audit loop would fabricate (n_scored=0, recall=0) rows for
    // absent ids while the SQL oracle's inner join omits them: a bad
    // caller input must fail loudly, not diverge silently (r13
    // advice) — and without pinning the walk caches (r21 advice)
    val nQ = qframe.count()
    try require(nQ == queryIds.distinct.size.toLong,
      s"${queryIds.distinct.size - nQ} of ${queryIds.distinct.size} " +
        s"query ids are absent from the corpus id column '$idCol'")
    catch {
      case t: Throwable => und.unpersist(); qframe.unpersist(); throw t
    }
    // exact leg over the queries (the shared audit kernel) — consumed
    // only by the deferred counter action after the loop
    val exact = Similarity.exactTopKSelf(emb, vecCol, idCol,
      qframe.select(col("qid").as("src"), col("qv")), k).cache()
    val wQ = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("dst"))
    // per-hop scored frames, retained cached until the counter action
    val scoredByHop = scala.collection.mutable.ArrayBuffer
      .empty[(Long, DataFrame)]
    var beam = coarseSet match {
      case None =>
        // entry per query: the min-id vector; the next-smallest id
        // when the query is itself the entry (n >= 2 makes it exist)
        val entries = fixedEntries(vecs, mn, queryIds)
        val b0 = broadcast(spark.createDataFrame(entries).toDF("qid", "dst"))
          .join(vecs.select(col("id").as("dst"), col("v")), Seq("dst"))
          .join(broadcast(qframe), Seq("qid"))
          .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
          .select(col("qid"), col("dst"), col("cs")).cache()
        b0.count(): Unit
        b0
      case Some(coarse) =>
        // hierarchical entry: score each query against the COARSE SET
        // ((dst, v) rows — first-ck by id or a caller-supplied medoid
        // set) and enter at the argmax (ties to the smaller id, the
        // global total order). |queries|·|coarse| scores — flat in
        // corpus size. Audited as hop 0 by the deferred counter
        // action (the hop-0 "beam" is the rank-1 entry alone).
        val scored0 = qframe.crossJoin(broadcast(coarse))
          .where(col("dst") =!= col("qid"))
          .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
          .select(col("qid"), col("dst"), col("cs")).cache()
        val b0 = scored0
          .withColumn("rn", row_number().over(wQ))
          .where(col("rn") === 1)
          .select(col("qid"), col("dst"), col("cs")).cache()
        b0.count(): Unit
        scoredByHop += ((0L, scored0))
        b0
    }
    var h = 1
    while (h <= hops) {
      val frontier = broadcast(flat(beam)
          .select(col("qid"), col("dst").as("src")))
        .join(und, Seq("src"))
        .select(col("qid"), col("dst"))
      val cand = flat(beam).select(col("qid"), col("dst"))
        .unionByName(frontier).distinct()
        .where(col("dst") =!= col("qid"))
      // scored feeds the beam cut now and the deferred counters later
      // — cache it, or each consumer re-runs the rescoring join
      // (measured: the uncached spelling doubled the hop cost)
      val scored = broadcast(cand)
        .join(vecs.select(col("id").as("dst"), col("v")), Seq("dst"))
        .join(broadcast(qframe), Seq("qid"))
        .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
        .select(col("qid"), col("dst"), col("cs")).cache()
      val next = scored
        .withColumn("rn", row_number().over(wQ))
        .where(col("rn") <= beamWidth)
        .select(col("qid"), col("dst"), col("cs")).cache()
      // the hop's only in-loop action: materialize the next beam
      // (and, through it, the scored cache the counter action reads)
      next.count(): Unit
      scoredByHop += ((h.toLong, scored))
      beam.unpersist(); beam = next; h += 1
    }
    // deferred audit: ONE action over the tagged union of every hop's
    // cached scored frame — n_scored = rows per (query, hop); n_hits
    // = the hop's beam cut (rank 1 at hop 0, top-k otherwise) joined
    // against the exact leg; n_possible folded in from the same
    // exact frame.
    val tagged = scoredByHop.map { case (hh, sc) =>
      sc.withColumn("hop", lit(hh))
    }.reduce(_.unionByName(_))
    val wQH = Window.partitionBy(col("qid"), col("hop"))
      .orderBy(col("cs").desc, col("dst"))
    val cutoff = when(col("hop") === 0L, lit(1)).otherwise(lit(k))
    val hitLeg = tagged
      .withColumn("rn", row_number().over(wQH))
      .where(col("rn") <= cutoff)
      .join(broadcast(exact.select(col("src"), col("dst").as("edst"))),
        col("qid") === col("src") && col("dst") === col("edst"))
      .groupBy(col("qid"), col("hop")).agg(count(lit(1)).as("h"))
    val possLeg = exact.groupBy(col("src").as("qid"))
      .agg(count(lit(1)).as("p"))
    val counters = tagged.groupBy(col("qid"), col("hop"))
      .agg(count(lit(1)).as("c"))
      .join(hitLeg, Seq("qid", "hop"), "left")
      .join(broadcast(possLeg), Seq("qid"), "left")
      .collect()
      .map(rw => (rw.getLong(0), rw.getLong(1)) ->
        (rw.getLong(2),
          if (rw.isNullAt(3)) 0L else rw.getLong(3),
          if (rw.isNullAt(4)) 0L else rw.getLong(4))).toMap
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Double)]
    val firstHop = if (coarseSet.isDefined) 0L else 1L
    (firstHop to hops.toLong).foreach { hh =>
      queryIds.distinct.sorted.foreach { q =>
        val (sc, hits, p) = counters.getOrElse((q, hh), (0L, 0L, 0L))
        buf += ((q, hh, sc, hits, p,
          if (p == 0L) 0.0 else round6(hits.toDouble / p.toDouble)))
      }
    }
    scoredByHop.foreach { case (_, sc) => sc.unpersist() }
    beam.unpersist(); und.unpersist(); qframe.unpersist()
    exact.unpersist()
    spark.createDataFrame(buf.toSeq).toDF("query_id", "hop", "n_scored",
      "n_hits", "n_possible", "recall")
  }

  /** GRAPH INDEX APPEND — the daily-ingest move for the graph family
    * (the d35/t65/s46 pattern applied to the serving index): insert a
    * BATCH of new vectors into a standing kNN graph the HNSW way —
    * SEARCH the existing graph for each new vector (the s47 beam
    * kernel: fixed `hops` from the min-id entry), CONNECT it to its
    * beam's best `graphK`, then run the REVERSE-adoption step
    * restricted to the touched nodes: each node a new vector
    * connected to re-ranks its own list against the reverse edges
    * (cosine is symmetric, so the scores are already in hand) and
    * adopts the new vector when it beats the current kth neighbor.
    * The corpus graph is never rebuilt; only |batch|·beam·degree
    * search work plus an adoption re-rank over ≤ |batch|·graphK
    * affected nodes.
    *
    * Audited by: (a) recall@graphK of the new vectors' inserted
    * adjacency against the exact-over-corpus leg (|batch|·N — the
    * batch-bound audit), and (b) how many affected existing nodes
    * actually adopted a new vector — the signal that reverse edges
    * keep the graph navigable as it grows (without adoption, new
    * vectors are findable only FROM the batch, never TOWARD it).
    *
    * @return manifest rows (metric, n, x): batch / new_edges /
    *         new_edge_recall (n = hits, x = recall) / affected_nodes
    *         / adopted_nodes (x = adopted fraction) / adopted_edges —
    *         unsorted, callers order
    */
  def graphAppendAudit(corpus: DataFrame, batch: DataFrame,
      vecCol: String, idCol: String, graphK: Int, buildRounds: Int,
      beamWidth: Int, hops: Int): DataFrame = {
    require(buildRounds >= 0, s"bad buildRounds=$buildRounds")
    val (vecs, n, mn, mx) = appendVecs(corpus, vecCol, idCol)
    // in-query build: the ring init needs a dense CORPUS id space
    // (the loaded append does not — round 21)
    require(mx - mn + 1L == n,
      s"ring init needs a dense CORPUS id column: ids span [$mn,$mx], count $n")
    // catch-and-release, not finally: on success appendCore owns the
    // deferred release of vecs/g (they must outlive the caller's one
    // execution of the returned plan), but a failed require anywhere
    // below must not leave them pinned for the session (r21 advice —
    // the leak class the r13 fix closed on the serve path)
    var g: DataFrame = null
    try {
      // the standing graph, built in-query (the one-shot shape; the
      // production append runs against a persisted index — see
      // [[graphAppendAuditLoaded]])
      g = buildRingGraph(vecs, n, mn, graphK, buildRounds)
      appendCore(corpus, batch, vecCol, idCol, vecs, g, mn, graphK,
        beamWidth, hops)
    } catch {
      case t: Throwable =>
        if (g != null) g.unpersist()
        vecs.unpersist()
        throw t
    }
  }

  /** [[graphAppendAudit]] against a PERSISTED [[GraphIndex]] — the
    * production daily-ingest shape: the standing graph comes off the
    * index's parquet edge table (graphK is the index's), no build job
    * anywhere below this call. Same manifest, bit-identical to an
    * in-query build with the handle's parameters (spec-pinned). The
    * staleness guard matches [[graphBeamSearchLoaded]]'s.
    */
  def graphAppendAuditLoaded(corpus: DataFrame, batch: DataFrame,
      vecCol: String, idCol: String, handle: GraphIndex.Handle,
      beamWidth: Int, hops: Int): DataFrame = {
    val (vecs, n, mn, _) = appendVecs(corpus, vecCol, idCol)
    // catch-and-release (not finally — on success appendCore defers
    // the release of vecs past the caller's execution): a staleness
    // -guard or require failure must not leave the corpus cache
    // pinned for the session (r21 advice)
    try {
      requireHandleMatches(handle, n, mn, idCol, vecCol)
      appendCore(corpus, batch, vecCol, idCol, vecs,
        GraphIndex.edges(corpus.sparkSession, handle), mn, handle.graphK,
        beamWidth, hops)
    } catch {
      case t: Throwable => vecs.unpersist(); throw t
    }
  }

  private def appendVecs(corpus: DataFrame, vecCol: String,
      idCol: String): (DataFrame, Long, Long, Long) = {
    val vecs = graft.ops.ScaleOps.fanOut(corpus)
      .select(col(idCol).as("id"), col(vecCol).as("v")).cache()
    val meta = vecs.agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
      max(col("id")).as("mx")).collect()(0)
    val (n, mn, mx) = (meta.getLong(0), meta.getLong(1), meta.getLong(2))
    require(n >= 2, "cannot append to a graph over fewer than 2 vectors")
    (vecs, n, mn, mx)
  }

  /** The search/connect/adopt/audit body shared by
    * [[graphAppendAudit]] (in-query build, `g` cached) and
    * [[graphAppendAuditLoaded]] (`g` a parquet scan). Owns the
    * release of every cache it pins plus `vecs` and `g` (scoped to
    * the caller's single execution where the plan can see them,
    * dropped eagerly where it can't — see the CONNECT note).
    */
  private def appendCore(corpus: DataFrame, batch: DataFrame,
      vecCol: String, idCol: String, vecs: DataFrame, g: DataFrame,
      mn: Long, graphK: Int, beamWidth: Int, hops: Int): DataFrame = {
    require(graphK > 0 && beamWidth >= graphK,
      s"need beamWidth >= graphK > 0, got $graphK/$beamWidth")
    require(hops >= 1, s"bad hops=$hops")
    val spark = corpus.sparkSession
    val bvecs = batch.select(col(idCol).as("id"), col(vecCol).as("v")).cache()
    // the early requires release bvecs on failure (the caller's catch
    // releases vecs/g) — a bad batch must not pin the batch cache
    val nBatch = try {
      val nb = bvecs.count()
      require(nb > 0, "empty batch")
      // id spaces must be disjoint — ids-only probe, loud failure
      require(bvecs.select(col("id"))
        .join(vecs.select(col("id")), Seq("id")).limit(1).count() == 0L,
        "batch ids collide with corpus ids")
      nb
    } catch {
      case t: Throwable => bvecs.unpersist(); throw t
    }
    val und = undirected(g).cache()
    und.count(): Unit
    val qframe = bvecs.select(col("id").as("qid"), col("v").as("qv")).cache()
    qframe.count(): Unit
    val wQ = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("dst"))
    // search the STANDING graph for every new vector (the s47 loop;
    // batch ids are disjoint from corpus ids, so no self-exclusion)
    val beam0 = qframe.select(col("qid"), lit(mn).as("dst"))
      .join(vecs.select(col("id").as("dst"), col("v")), Seq("dst"))
      .join(broadcast(qframe), Seq("qid"))
      .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
      .select(col("qid"), col("dst"), col("cs")).cache()
    beam0.count(): Unit
    val beam = walkBeam(vecs, und, qframe, beam0, beamWidth, hops,
      excludeSelf = false)
    // CONNECT: each new vector's adjacency = its beam's best graphK.
    // Materialized EAGERLY (cache + count) so the two loop caches
    // the flat views hide from CacheScope can be dropped RIGHT HERE:
    // beam reaches every downstream plan only as an RDD scan and und
    // only through beam's lineage, so relationUses never sees their
    // builders and a deferred release listener would never fire —
    // they'd stay pinned for the whole server session (r13 advice).
    val newEdges = flat(beam).withColumn("rn", row_number().over(wQ))
      .where(col("rn") <= graphK)
      .select(col("qid").as("src"), col("dst"), col("cs")).cache()
    newEdges.count(): Unit
    beam.unpersist()
    und.unpersist()
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(newEdges)
    // audit (a): exact leg over the corpus, batch queries broadcast
    val exact = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      Similarity.exactTopKSelf(corpus, vecCol, idCol,
        qframe.select(col("qid").as("src"), col("qv")), graphK))
    val recallRow = newEdges
      .join(exact.withColumn("__hit", lit(1L)), Seq("src", "dst"), "left")
      .agg(coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L)).as("h"))
      .crossJoin(broadcast(exact.agg(count(lit(1)).as("p"))))
      .select(lit("new_edge_recall").as("metric"), col("h").as("n"),
        when(col("p") === 0L, lit(0.0))
          .otherwise(round(col("h").cast("double") / col("p").cast("double"),
            6)).as("x"))
    // REVERSE adoption, restricted to the touched nodes: each
    // affected node re-ranks (its current out-edges ∪ the reverse
    // edges) — cosine symmetry means no new vector movement beyond
    // rescoring the node's own existing list
    val rev = newEdges.select(col("dst").as("src"), col("src").as("dst"),
      col("cs"), lit(1L).as("__new"))
    val affected = rev.select(col("src")).distinct()
    val fEdges = g.join(affected, Seq("src"))
      .join(vecs.select(col("id").as("src"), col("v").as("va")), Seq("src"))
      .join(vecs.select(col("id").as("dst"), col("v").as("vb")), Seq("dst"))
      .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
      .select(col("src"), col("dst"), col("cs"), lit(0L).as("__new"))
    val wF = Window.partitionBy(col("src"))
      .orderBy(col("cs").desc, col("dst"))
    val adopted = fEdges.unionByName(rev)
      .withColumn("rn", row_number().over(wF))
      .where(col("rn") <= graphK && col("__new") === 1L)
    val adoptionRows = adopted
      .agg(countDistinct(col("src")).as("an"), count(lit(1)).as("ae"))
      .crossJoin(broadcast(affected.agg(count(lit(1)).as("af"))))
      .select(explode(array(
        struct(lit("affected_nodes").as("metric"), col("af").as("n"),
          lit(null).cast("double").as("x")),
        struct(lit("adopted_nodes").as("metric"), col("an").as("n"),
          when(col("af") === 0L, lit(0.0))
            .otherwise(round(col("an").cast("double") /
              col("af").cast("double"), 6)).as("x")),
        struct(lit("adopted_edges").as("metric"), col("ae").as("n"),
          lit(null).cast("double").as("x")))).as("r"))
      .select(col("r.metric").as("metric"), col("r.n").as("n"),
        col("r.x").as("x"))
    val countRows = spark.createDataFrame(Seq(Tuple1(nBatch))).toDF("nb")
      .select(lit("batch").as("metric"), col("nb").as("n"),
        lit(null).cast("double").as("x"))
      .unionByName(newEdges.agg(count(lit(1)).as("ne"))
        .select(lit("new_edges").as("metric"), col("ne").as("n"),
          lit(null).cast("double").as("x")))
    val out = countRows.unionByName(recallRow).unionByName(adoptionRows)
    // release the remaining caches after the caller's single
    // execution (each appears in out's plan directly or through a
    // cached frame's cachedPlan, so the listeners do fire; beam/und
    // were unpersisted eagerly above — see the CONNECT note)
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(qframe)
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(vecs)
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(bvecs)
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(g)
    out
  }

  /** Fixed-hop beam walk WITHOUT the per-hop audit — the lean serving
    * loop shared by the append search and the tombstone-aware read.
    * `beam0` must be CACHED and materialized (qid, dst, cs); rounds
    * feed through the flat view; returns the final beam CACHED (the
    * caller owns its release). `excludeSelf` removes the query's own
    * id from every hop's candidates (corpus-member queries); append
    * batches have disjoint ids and skip the filter.
    */
  private def walkBeam(vecs: DataFrame, und: DataFrame, qframe: DataFrame,
      beam0: DataFrame, beamWidth: Int, hops: Int,
      excludeSelf: Boolean): DataFrame = {
    val wQ = Window.partitionBy(col("qid"))
      .orderBy(col("cs").desc, col("dst"))
    var beam = beam0
    var h = 1
    while (h <= hops) {
      // join sides pinned (guide §3.1, the beamServe note): the beam
      // broadcasts onto the edge scan and the candidate id set onto
      // the vector scan — the unknown-stats flat views would
      // otherwise put the CACHED corpus frames on the build side
      val frontier = broadcast(flat(beam)
          .select(col("qid"), col("dst").as("src")))
        .join(und, Seq("src"))
        .select(col("qid"), col("dst"))
      val cand0 = flat(beam).select(col("qid"), col("dst"))
        .unionByName(frontier).distinct()
      val cand = if (excludeSelf) cand0.where(col("dst") =!= col("qid"))
        else cand0
      val next = broadcast(cand)
        .join(vecs.select(col("id").as("dst"), col("v")), Seq("dst"))
        .join(broadcast(qframe), Seq("qid"))
        .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
        .withColumn("rn", row_number().over(wQ))
        .where(col("rn") <= beamWidth)
        .select(col("qid"), col("dst"), col("cs")).cache()
      next.count(): Unit
      beam.unpersist(); beam = next; h += 1
    }
    beam
  }

  /** TOMBSTONE-AWARE GRAPH SERVING — the s43 over-fetch discipline
    * applied to the graph index: tombstoned nodes still ROUTE (the
    * HNSW practice — a deleted node keeps its edges until the repair
    * job runs, so the graph stays navigable) but must never be
    * RETURNED. Two strategies are graded from ONE beam walk against
    * the exact-over-LIVE-corpus leg:
    *   - `plain`: top-k of the final beam, deleted filtered AFTER the
    *     cut — silently returns fewer than k and loses recall;
    *   - `overfetch`: top-2k of the same beam, deleted filtered, then
    *     truncated to k — the mitigation serving systems apply.
    *
    * Scale shape: one |queries|-bound walk (O(beam·degree) per hop),
    * the deleted set joins as ids only (AQE broadcasts a small
    * tombstone set), and the exact leg is |queries|·|live| — the
    * audit, not the serve. Queries must be live (no ground truth for
    * a deleted query — rejected loudly). Eager like the audited walk:
    * the returned frame is driver-local rows and every internal cache
    * is released before returning.
    *
    * @return (query_id, strategy ∈ overfetch|plain, n_returned,
    *         n_hits, n_possible, recall round-6) — unsorted
    */
  def graphSearchWithTombstones(corpus: DataFrame, vecCol: String,
      idCol: String, handle: GraphIndex.Handle, deletedIds: DataFrame,
      delIdCol: String, queryIds: Seq[Long], k: Int, beamWidth: Int,
      hops: Int): DataFrame = {
    require(k > 0 && beamWidth >= 2 * k,
      s"the over-fetch cut needs beamWidth >= 2k, got k=$k beamWidth=$beamWidth")
    require(hops >= 1, s"bad hops=$hops")
    require(queryIds.nonEmpty, "no queries")
    val spark = corpus.sparkSession
    val (vecs, n, mn, _) = servingVecs(corpus, vecCol, idCol)
    try {
      requireHandleMatches(handle, n, mn, idCol, vecCol)
      val del = deletedIds.select(col(delIdCol).as("id")).distinct().cache()
      del.count(): Unit
      val und = undirected(GraphIndex.edges(spark, handle)).cache()
      und.count(): Unit
      val qframe = vecs.where(col("id").isin(queryIds: _*))
        .select(col("id").as("qid"), col("v").as("qv")).cache()
      // the loud query guards release the walk caches on failure
      // (r21 advice class — a bad caller input must not pin them)
      try {
        val nQ = qframe.count()
        require(nQ == queryIds.distinct.size.toLong,
          s"${queryIds.distinct.size - nQ} of ${queryIds.distinct.size} " +
            s"query ids are absent from the corpus id column '$idCol'")
        require(qframe.join(del, col("qid") === col("id")).limit(1)
          .count() == 0L,
          "query ids include tombstoned ids — a deleted query has no " +
            "live ground truth")
      } catch {
        case t: Throwable =>
          del.unpersist(); und.unpersist(); qframe.unpersist(); throw t
      }
      // min-id entry, deleted or not: routing through tombstones is
      // exactly the semantics under test
      val entries = fixedEntries(vecs, mn, queryIds)
      val beam0 = spark.createDataFrame(entries).toDF("qid", "dst")
        .join(vecs.select(col("id").as("dst"), col("v")), Seq("dst"))
        .join(broadcast(qframe), Seq("qid"))
        .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
        .select(col("qid"), col("dst"), col("cs")).cache()
      beam0.count(): Unit
      val beam = walkBeam(vecs, und, qframe, beam0, beamWidth, hops,
        excludeSelf = true)
      val fb = flat(beam)
      // ground truth: exact top-k over the LIVE corpus only
      val liveEmb = corpus.join(del.select(col("id").as(idCol)),
        Seq(idCol), "left_anti")
      val exact = Similarity.exactTopKSelf(liveEmb, vecCol, idCol,
        qframe.select(col("qid").as("src"), col("qv")), k).cache()
      val possible = exact.groupBy(col("src"))
        .agg(count(lit(1)).as("p")).collect()
        .map(rw => rw.getLong(0) -> rw.getLong(1)).toMap
      val ex2 = exact.select(col("src"), col("dst").as("edst"),
        lit(1L).as("__hit"))
      val wQ = Window.partitionBy(col("qid"))
        .orderBy(col("cs").desc, col("dst"))
      val ranked = fb.withColumn("rn", row_number().over(wQ))
      def legCounters(fetch: Int, truncate: Boolean): Map[Long, (Long, Long)] = {
        val live = ranked.where(col("rn") <= fetch)
          .join(del.select(col("id").as("dst")), Seq("dst"), "left_anti")
        val cut = if (truncate)
          live.withColumn("lr", row_number().over(wQ)).where(col("lr") <= k)
        else live
        cut.select(col("qid"), col("dst"))
          .join(ex2, col("qid") === col("src") && col("dst") === col("edst"),
            "left")
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("r"),
            coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L)).as("h"))
          .collect()
          .map(rw => rw.getLong(0) -> (rw.getLong(1), rw.getLong(2))).toMap
      }
      val plain = legCounters(fetch = k, truncate = false)
      val over = legCounters(fetch = 2 * k, truncate = true)
      def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Long, Long, Long, Double)]
      queryIds.distinct.sorted.foreach { q =>
        val p = possible.getOrElse(q, 0L)
        Seq(("plain", plain), ("overfetch", over)).foreach { case (nm, m) =>
          val (r, hh) = m.getOrElse(q, (0L, 0L))
          buf += ((q, nm, r, hh, p,
            if (p == 0L) 0.0 else round6(hh.toDouble / p.toDouble)))
        }
      }
      beam.unpersist(); und.unpersist(); qframe.unpersist()
      exact.unpersist(); del.unpersist()
      spark.createDataFrame(buf.toSeq).toDF("query_id", "strategy",
        "n_returned", "n_hits", "n_possible", "recall")
    } finally vecs.unpersist()
  }

  /** GRAPH DELETE + REPAIR — the s40 tombstone-compaction analogue
    * for the graph family (the maintenance job behind
    * [[graphSearchWithTombstones]]'s serve-time mitigation): remove a
    * tombstoned node set from the standing index and REPAIR the nodes
    * that lost edges by promoting candidates THROUGH each deleted
    * neighbor (u -> d -> w for live w — the published HNSW-repair
    * move: a deleted node's neighborhood is exactly where its
    * in-neighbors' replacement edges live), rescoring each affected
    * node's (surviving ∪ promoted) candidates exactly and keeping the
    * top graphK.
    *
    * Audited by recall@graphK of the REPAIRED adjacency against the
    * exact leg over the LIVE corpus, restricted to the (sampled —
    * `auditMod`, the d19 protocol) affected nodes: the number that
    * tells an operator whether mark-and-route can stop and the
    * tombstones can actually be dropped.
    *
    * Scale shape: every step is bounded by the deletion, never the
    * corpus — dropped/lost edges join the tombstone set as ids,
    * promotion is |lost|·graphK pairs, the rescoring join moves
    * vectors only for affected-node candidates, and the exact leg is
    * |sampled affected|·|live| (the audit, not the repair). EAGER
    * (counters are scalar collects); every internal cache released.
    *
    * @return manifest rows (metric, n, x): deleted_nodes /
    *         edges_dropped / affected_nodes / promoted_candidates /
    *         repaired_edges / repair_recall (n = hits, x = recall) —
    *         unsorted, callers order
    */
  def graphDeleteRepairLoaded(corpus: DataFrame, vecCol: String,
      idCol: String, handle: GraphIndex.Handle, deletedIds: DataFrame,
      delIdCol: String, auditMod: Long = 1L): DataFrame = {
    require(auditMod >= 1L, s"auditMod must be >= 1, got $auditMod")
    val spark = corpus.sparkSession
    val (vecs, n, mn, _) = servingVecs(corpus, vecCol, idCol)
    try {
      requireHandleMatches(handle, n, mn, idCol, vecCol)
      val graphK = handle.graphK
      // tombstones restricted to corpus members (ids only)
      val del = deletedIds.select(col(delIdCol).as("id")).distinct()
        .join(vecs.select(col("id")), Seq("id")).cache()
      val nDel = del.count()
      val g = GraphIndex.edges(spark, handle)
      val nEdges = g.count()
      val gLive = g
        .join(del.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(del.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst")).cache()
      val nLiveEdges = gLive.count()
      // live nodes that lost an out-edge into a deleted node
      val lost = g.join(del.select(col("id").as("dst")), Seq("dst"))
        .join(del.select(col("id").as("src")), Seq("src"), "left_anti")
        .select(col("src"), col("dst").as("d"))
      val affected = lost.select(col("src")).distinct().cache()
      val nAffected = affected.count()
      // promotion through the deleted neighbor's own out-edges
      val promoted = lost
        .join(g.select(col("src").as("d"), col("dst")), Seq("d"))
        .join(del.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .where(col("dst") =!= col("src"))
        .select(col("src"), col("dst")).distinct().cache()
      val nPromoted = promoted.count()
      val cand = gLive.join(affected, Seq("src"))
        .select(col("src"), col("dst"))
        .unionByName(promoted).distinct()
      val wSrc = Window.partitionBy(col("src"))
        .orderBy(col("cs").desc, col("dst"))
      val repaired = cand
        .join(vecs.select(col("id").as("src"), col("v").as("va")), Seq("src"))
        .join(vecs.select(col("id").as("dst"), col("v").as("vb")), Seq("dst"))
        .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
        .withColumn("rn", row_number().over(wSrc))
        .where(col("rn") <= graphK)
        .select(col("src"), col("dst")).cache()
      val nRepaired = repaired.count()
      // recall audit: repaired lists vs exact-over-live, sampled
      val sampled = affected.where(col("src") % lit(auditMod) === 0L)
      val liveEmb = corpus.join(del.select(col("id").as(idCol)),
        Seq(idCol), "left_anti")
      val qset = vecs.join(sampled, col("id") === col("src"))
        .select(col("src"), col("v").as("qv"))
      val exact = Similarity.exactTopKSelf(liveEmb, vecCol, idCol,
        qset, graphK).cache()
      val nPossible = exact.count()
      val nHits = repaired.join(sampled, Seq("src"))
        .join(exact, Seq("src", "dst")).count()
      exact.unpersist(); repaired.unpersist(); promoted.unpersist()
      affected.unpersist(); gLive.unpersist(); del.unpersist()
      def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val rows: Seq[(String, Long, Option[Double])] = Seq(
        ("deleted_nodes", nDel, None),
        // every edge with a deleted endpoint on either side
        ("edges_dropped", nEdges - nLiveEdges, None),
        ("affected_nodes", nAffected, None),
        ("promoted_candidates", nPromoted, None),
        ("repaired_edges", nRepaired, None),
        ("repair_recall", nHits, Some(
          if (nPossible == 0L) 0.0
          else round6(nHits.toDouble / nPossible.toDouble))))
      spark.createDataFrame(rows).toDF("metric", "n", "x")
    } finally vecs.unpersist()
  }

  /** COMPOSED GRAPH-INDEX MAINTENANCE RUN — the s46 move for the
    * graph family: the three maintenance legs a production graph
    * index runs in a day, audited in ONE manifest against ONE
    * standing persisted graph and one shared corpus scan —
    *
    *   - APPEND (the s48 audit): search/connect/adopt a batch of new
    *     vectors against the standing graph;
    *   - DELETE+REPAIR (the s51 audit): drop a tombstoned node set
    *     and repair the nodes that lost edges by
    *     promotion-through-deleted;
    *   - SERVE (the s52 audit, summarized per strategy): the
    *     tombstone-aware read — plain top-k vs the 2k over-fetch cut,
    *     graded against exact-over-live.
    *
    * Every leg audits the SAME standing snapshot (the day's jobs
    * graded against the index as it stood, not sequential mutations —
    * s46's discipline), sharing the corpus (id, v) cache, the edge
    * scan, its undirected closure, and the tombstone id set; only the
    * three exact audit legs are leg-private (their query sets
    * differ). EAGER end to end: every counter is a scalar collect and
    * every cache is released before returning.
    *
    * Scale shape = the legs' own: append is batch-bound, repair is
    * deletion-bound, serve is hop-bound; the one corpus-sized cost is
    * the shared (id, v) cache each leg would otherwise pay alone.
    *
    * @return manifest rows (stage ∈ append|repair|serve, metric, n,
    *         x) — append: batch/new_edges/new_edge_recall(n=hits,
    *         x=recall)/affected_nodes/adopted_nodes(x=fraction)/
    *         adopted_edges; repair: the [[graphDeleteRepairLoaded]]
    *         six; serve: plain/overfetch (n=total hits,
    *         x=micro-recall over the query batch),
    *         plain_returned/overfetch_returned (n=total returned),
    *         possible (n=total live ground-truth rows) — unsorted
    */
  def graphMaintenanceRun(corpus: DataFrame, batch: DataFrame,
      vecCol: String, idCol: String, handle: GraphIndex.Handle,
      deletedIds: DataFrame, delIdCol: String, queryIds: Seq[Long],
      k: Int, beamWidth: Int, hops: Int, appendBeamWidth: Int,
      appendHops: Int, auditMod: Long = 1L): DataFrame = {
    require(k > 0 && beamWidth >= 2 * k,
      s"the over-fetch cut needs beamWidth >= 2k, got k=$k beamWidth=$beamWidth")
    require(appendBeamWidth >= handle.graphK,
      s"need appendBeamWidth >= graphK, got $appendBeamWidth/${handle.graphK}")
    require(hops >= 1 && appendHops >= 1,
      s"bad hops=$hops / appendHops=$appendHops")
    require(queryIds.nonEmpty, "no queries")
    require(auditMod >= 1L, s"auditMod must be >= 1, got $auditMod")
    val spark = corpus.sparkSession
    val graphK = handle.graphK
    val (vecs, n, mn, _) = servingVecs(corpus, vecCol, idCol)
    try {
      requireHandleMatches(handle, n, mn, idCol, vecCol)
      val g = GraphIndex.edges(spark, handle)
      val und = undirected(g).cache()
      und.count(): Unit
      val del = deletedIds.select(col(delIdCol).as("id")).distinct()
        .join(vecs.select(col("id")), Seq("id")).cache()
      val nDel = del.count()
      def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long, Option[Double])]

      // ---- leg 1: APPEND (the s48 audit, inlined eager) ----
      val bvecs = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
        .cache()
      // loud batch guards release the pinned caches on failure (r21)
      val nBatch = try {
        val nb = bvecs.count()
        require(nb > 0, "empty batch")
        require(bvecs.select(col("id"))
          .join(vecs.select(col("id")), Seq("id")).limit(1).count() == 0L,
          "batch ids collide with corpus ids")
        nb
      } catch {
        case t: Throwable =>
          bvecs.unpersist(); und.unpersist(); del.unpersist(); throw t
      }
      val qb = bvecs.select(col("id").as("qid"), col("v").as("qv")).cache()
      qb.count(): Unit
      val wQ = Window.partitionBy(col("qid"))
        .orderBy(col("cs").desc, col("dst"))
      val beamB0 = qb.select(col("qid"), lit(mn).as("dst"))
        .join(vecs.select(col("id").as("dst"), col("v")), Seq("dst"))
        .join(broadcast(qb), Seq("qid"))
        .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
        .select(col("qid"), col("dst"), col("cs")).cache()
      beamB0.count(): Unit
      val beamB = walkBeam(vecs, und, qb, beamB0, appendBeamWidth,
        appendHops, excludeSelf = false)
      val newEdges = flat(beamB).withColumn("rn", row_number().over(wQ))
        .where(col("rn") <= graphK)
        .select(col("qid").as("src"), col("dst"), col("cs")).cache()
      val nNewEdges = newEdges.count()
      beamB.unpersist()
      val exactB = Similarity.exactTopKSelf(corpus, vecCol, idCol,
        qb.select(col("qid").as("src"), col("qv")), graphK).cache()
      val pB = exactB.count()
      val hB = newEdges.join(exactB, Seq("src", "dst")).count()
      val rev = newEdges.select(col("dst").as("src"), col("src").as("dst"),
        col("cs"), lit(1L).as("__new"))
      val affectedB = rev.select(col("src")).distinct().cache()
      val nAffB = affectedB.count()
      val fEdges = g.join(affectedB, Seq("src"))
        .join(vecs.select(col("id").as("src"), col("v").as("va")), Seq("src"))
        .join(vecs.select(col("id").as("dst"), col("v").as("vb")), Seq("dst"))
        .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
        .select(col("src"), col("dst"), col("cs"), lit(0L).as("__new"))
      val wF = Window.partitionBy(col("src"))
        .orderBy(col("cs").desc, col("dst"))
      val adoptedRow = fEdges.unionByName(rev)
        .withColumn("rn", row_number().over(wF))
        .where(col("rn") <= graphK && col("__new") === 1L)
        .agg(countDistinct(col("src")).as("an"), count(lit(1)).as("ae"))
        .collect()(0)
      val (an, ae) = (adoptedRow.getLong(0), adoptedRow.getLong(1))
      exactB.unpersist(); newEdges.unpersist(); affectedB.unpersist()
      qb.unpersist(); bvecs.unpersist(); beamB0.unpersist()
      rows += (("append", "batch", nBatch, None))
      rows += (("append", "new_edges", nNewEdges, None))
      rows += (("append", "new_edge_recall", hB, Some(
        if (pB == 0L) 0.0 else round6(hB.toDouble / pB.toDouble))))
      rows += (("append", "affected_nodes", nAffB, None))
      rows += (("append", "adopted_nodes", an, Some(
        if (nAffB == 0L) 0.0 else round6(an.toDouble / nAffB.toDouble))))
      rows += (("append", "adopted_edges", ae, None))

      // ---- leg 2: DELETE+REPAIR (the s51 audit, shared scans) ----
      val nEdges = g.count()
      val gLive = g
        .join(del.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(del.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst")).cache()
      val nLiveEdges = gLive.count()
      val lost = g.join(del.select(col("id").as("dst")), Seq("dst"))
        .join(del.select(col("id").as("src")), Seq("src"), "left_anti")
        .select(col("src"), col("dst").as("d"))
      val affected = lost.select(col("src")).distinct().cache()
      val nAffected = affected.count()
      val promoted = lost
        .join(g.select(col("src").as("d"), col("dst")), Seq("d"))
        .join(del.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .where(col("dst") =!= col("src"))
        .select(col("src"), col("dst")).distinct().cache()
      val nPromoted = promoted.count()
      val cand = gLive.join(affected, Seq("src"))
        .select(col("src"), col("dst"))
        .unionByName(promoted).distinct()
      val wSrc = Window.partitionBy(col("src"))
        .orderBy(col("cs").desc, col("dst"))
      val repaired = cand
        .join(vecs.select(col("id").as("src"), col("v").as("va")), Seq("src"))
        .join(vecs.select(col("id").as("dst"), col("v").as("vb")), Seq("dst"))
        .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
        .withColumn("rn", row_number().over(wSrc))
        .where(col("rn") <= graphK)
        .select(col("src"), col("dst")).cache()
      val nRepaired = repaired.count()
      val sampled = affected.where(col("src") % lit(auditMod) === 0L)
      val liveEmb = corpus.join(del.select(col("id").as(idCol)),
        Seq(idCol), "left_anti")
      val exactR = Similarity.exactTopKSelf(liveEmb, vecCol, idCol,
        vecs.join(sampled, col("id") === col("src"))
          .select(col("src"), col("v").as("qv")), graphK).cache()
      val pR = exactR.count()
      val hR = repaired.join(sampled, Seq("src"))
        .join(exactR, Seq("src", "dst")).count()
      exactR.unpersist(); repaired.unpersist(); promoted.unpersist()
      affected.unpersist(); gLive.unpersist()
      rows += (("repair", "deleted_nodes", nDel, None))
      rows += (("repair", "edges_dropped", nEdges - nLiveEdges, None))
      rows += (("repair", "affected_nodes", nAffected, None))
      rows += (("repair", "promoted_candidates", nPromoted, None))
      rows += (("repair", "repaired_edges", nRepaired, None))
      rows += (("repair", "repair_recall", hR, Some(
        if (pR == 0L) 0.0 else round6(hR.toDouble / pR.toDouble))))

      // ---- leg 3: SERVE (the s52 audit, strategy totals) ----
      val qframe = vecs.where(col("id").isin(queryIds: _*))
        .select(col("id").as("qid"), col("v").as("qv")).cache()
      try {
        val nQ = qframe.count()
        require(nQ == queryIds.distinct.size.toLong,
          s"${queryIds.distinct.size - nQ} of ${queryIds.distinct.size} " +
            s"query ids are absent from the corpus id column '$idCol'")
        require(qframe.join(del, col("qid") === col("id")).limit(1)
          .count() == 0L,
          "query ids include tombstoned ids — a deleted query has no " +
            "live ground truth")
      } catch {
        case t: Throwable =>
          qframe.unpersist(); und.unpersist(); del.unpersist(); throw t
      }
      val entries = fixedEntries(vecs, mn, queryIds)
      val beamQ0 = spark.createDataFrame(entries).toDF("qid", "dst")
        .join(vecs.select(col("id").as("dst"), col("v")), Seq("dst"))
        .join(broadcast(qframe), Seq("qid"))
        .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
        .select(col("qid"), col("dst"), col("cs")).cache()
      beamQ0.count(): Unit
      val beamQ = walkBeam(vecs, und, qframe, beamQ0, beamWidth, hops,
        excludeSelf = true)
      val exactS = Similarity.exactTopKSelf(liveEmb, vecCol, idCol,
        qframe.select(col("qid").as("src"), col("qv")), k).cache()
      val pS = exactS.count()
      val ranked = flat(beamQ).withColumn("rn", row_number().over(wQ))
      def legTotals(fetch: Int, truncate: Boolean): (Long, Long) = {
        val live = ranked.where(col("rn") <= fetch)
          .join(del.select(col("id").as("dst")), Seq("dst"), "left_anti")
        val cut = if (truncate)
          live.withColumn("lr", row_number().over(wQ)).where(col("lr") <= k)
        else live
        val r = cut.select(col("qid"), col("dst"))
          .join(exactS.select(col("src"), col("dst").as("edst"),
            lit(1L).as("__hit")),
            col("qid") === col("src") && col("dst") === col("edst"), "left")
          .agg(count(lit(1)).as("r"),
            coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L)).as("h"))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val (plR, plH) = legTotals(fetch = k, truncate = false)
      val (ovR, ovH) = legTotals(fetch = 2 * k, truncate = true)
      beamQ.unpersist(); exactS.unpersist(); qframe.unpersist()
      beamQ0.unpersist()
      rows += (("serve", "plain", plH, Some(
        if (pS == 0L) 0.0 else round6(plH.toDouble / pS.toDouble))))
      rows += (("serve", "plain_returned", plR, None))
      rows += (("serve", "overfetch", ovH, Some(
        if (pS == 0L) 0.0 else round6(ovH.toDouble / pS.toDouble))))
      rows += (("serve", "overfetch_returned", ovR, None))
      rows += (("serve", "possible", pS, None))
      und.unpersist(); del.unpersist()
      spark.createDataFrame(rows.toSeq).toDF("stage", "metric", "n", "x")
    } finally vecs.unpersist()
  }

  /** GRAPH SEARCH TOP-K — the LEAN serving read (no audit legs): the
    * fixed-hop beam walk against a persisted [[GraphIndex]], cut to
    * each query's top-k by (cosine desc, id asc). This is what the
    * REST index door answers with ([[graphBeamSearchLoaded]] is the
    * recall-audited DIAGNOSTIC — its exact leg is O(|queries|·N),
    * the audit's cost, which a production read must not pay).
    *
    * Scale shape: the walk touches O(|queries|·beam·degree) vectors
    * per hop; the final cut is |queries|·k rows collected driver-side
    * (|queries| capped loudly — the Pq batch discipline), so the
    * result is driver-local and every cache is released before
    * returning. Cosine is rounded to 6 dp, the engine-portable
    * contract every scored read here follows.
    *
    * @return one row per (query, rank 1..k): (query_id, neighbor_id,
    *         cosine, rank) — unsorted, callers order
    */
  def graphSearchTopK(corpus: DataFrame, vecCol: String, idCol: String,
      handle: GraphIndex.Handle, queryIds: Seq[Long], k: Int,
      beamWidth: Int, hops: Int,
      coarseEntryK: Option[Int] = None,
      coarseEntryIds: Option[Seq[Long]] = None): DataFrame = {
    require(coarseEntryK.isEmpty || coarseEntryIds.isEmpty,
      "pass coarseEntryK or coarseEntryIds, not both")
    require(k > 0 && beamWidth >= k,
      s"need beamWidth >= k > 0, got k=$k beamWidth=$beamWidth")
    require(hops >= 1, s"bad hops=$hops")
    require(queryIds.nonEmpty && queryIds.distinct.size <= 256,
      s"query batch must be 1..256 ids per call, got ${queryIds.distinct.size}")
    val spark = corpus.sparkSession
    val (vecs, n, mn, _) = servingVecs(corpus, vecCol, idCol)
    try {
      requireHandleMatches(handle, n, mn, idCol, vecCol)
      val und = undirected(GraphIndex.edges(spark, handle)).cache()
      und.count(): Unit
      val qframe = vecs.where(col("id").isin(queryIds: _*))
        .select(col("id").as("qid"), col("v").as("qv")).cache()
      try {
        val nQ = qframe.count()
        require(nQ == queryIds.distinct.size.toLong,
          s"${queryIds.distinct.size - nQ} of ${queryIds.distinct.size} " +
            s"query ids are absent from the corpus id column '$idCol'")
      } catch {
        case t: Throwable => und.unpersist(); qframe.unpersist(); throw t
      }
      val wQ = Window.partitionBy(col("qid"))
        .orderBy(col("cs").desc, col("dst"))
      val beam0 = coarseFrame(vecs, mn, coarseEntryK, coarseEntryIds) match {
        case None =>
          val entries = fixedEntries(vecs, mn, queryIds)
          val b0 = spark.createDataFrame(entries).toDF("qid", "dst")
            .join(vecs.select(col("id").as("dst"), col("v")), Seq("dst"))
            .join(broadcast(qframe), Seq("qid"))
            .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
            .select(col("qid"), col("dst"), col("cs")).cache()
          b0.count(): Unit
          b0
        case Some(coarse) =>
          // hierarchical entry, the s50 selection without the hop-0
          // audit: argmax over the coarse set
          val b0 = qframe.crossJoin(broadcast(coarse))
            .where(col("dst") =!= col("qid"))
            .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
            .withColumn("rn", row_number().over(wQ))
            .where(col("rn") === 1)
            .select(col("qid"), col("dst"), col("cs")).cache()
          b0.count(): Unit
          b0
      }
      val beam = walkBeam(vecs, und, qframe, beam0, beamWidth, hops,
        excludeSelf = true)
      val cut = flat(beam)
        .withColumn("rn", row_number().over(wQ))
        .where(col("rn") <= k)
        .select(col("qid"), col("dst"), round(col("cs"), 6).as("cs"),
          col("rn"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3).toLong))
      beam.unpersist(); und.unpersist(); qframe.unpersist()
      spark.createDataFrame(cut.toSeq)
        .toDF("query_id", "neighbor_id", "cosine", "rank")
    } finally vecs.unpersist()
  }

  /** GRAPH APPEND WRITE-BACK — the mutation [[graphAppendAudit]]
    * grades, PERSISTED (the r14 verdict's "a real nightly ends by
    * WRITING the new edge table"): search the standing index for
    * each batch vector (the s48 walk), CONNECT it to its beam's best
    * graphK, re-rank every touched node's list against the reverse
    * edges (adoption — this time keeping the full re-ranked list,
    * not just counting adopters), and write
    *
    *   untouched rows ∪ re-ranked affected lists ∪ new-vector lists
    *
    * as a NEW index version via [[GraphIndex.writeBack]] (new dir,
    * meta last — a crash mid-write-back leaves the source version
    * serving and the dest opening as absent). The post-append corpus
    * stats (n + |batch|, min id over both) go to the new meta, so
    * the staleness guard binds the new version to corpus ∪ batch.
    *
    * Write-once reuse: a COMPLETE dest whose params and post-append
    * stats already match is this write-back's own earlier run — the
    * edge set is deterministic — and is opened, not rewritten (the
    * declared-query idempotence the whole index family keeps).
    *
    * Scale shape: |batch|·beam·degree search + ≤|batch|·graphK
    * adoption + ONE full edge-table rewrite at cluster width — the
    * rewrite is the honest cost of a versioned index (same as any
    * LSM compaction); the corpus vectors move only through the
    * rescoring joins. Fully eager (the write is the action); every
    * cache released before returning.
    */
  def graphAppendWriteBack(corpus: DataFrame, batch: DataFrame,
      vecCol: String, idCol: String, handle: GraphIndex.Handle,
      beamWidth: Int, hops: Int, destDir: String): GraphIndex.Handle = {
    val graphK = handle.graphK
    require(beamWidth >= graphK,
      s"need beamWidth >= graphK, got $beamWidth/$graphK")
    require(hops >= 1, s"bad hops=$hops")
    val spark = corpus.sparkSession
    val (vecs, n, mn, _) = servingVecs(corpus, vecCol, idCol)
    try {
      requireHandleMatches(handle, n, mn, idCol, vecCol)
      val bvecs = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
        .cache()
      try {
        val bs = bvecs.agg(count(lit(1)).as("nb"), min(col("id")).as("bmn"))
          .collect()(0)
        val nBatch = bs.getLong(0)
        require(nBatch > 0, "empty batch")
        require(bvecs.select(col("id"))
          .join(vecs.select(col("id")), Seq("id")).limit(1).count() == 0L,
          "batch ids collide with corpus ids")
        val newN = n + nBatch
        val newMn = math.min(mn, bs.getLong(1))
        GraphIndex.openIfPresent(spark, destDir).filter { d =>
          d.graphK == graphK && d.buildRounds == handle.buildRounds &&
            d.n == newN && d.mn == newMn && d.idCol == idCol &&
            d.vecCol == vecCol
        }.getOrElse {
          val g = GraphIndex.edges(spark, handle)
          val und = undirected(g).cache()
          und.count(): Unit
          val qframe = bvecs.select(col("id").as("qid"), col("v").as("qv"))
            .cache()
          qframe.count(): Unit
          val wQ = Window.partitionBy(col("qid"))
            .orderBy(col("cs").desc, col("dst"))
          val beam0 = qframe.select(col("qid"), lit(mn).as("dst"))
            .join(vecs.select(col("id").as("dst"), col("v")), Seq("dst"))
            .join(broadcast(qframe), Seq("qid"))
            .withColumn("cs", Similarity.cosine(col("v"), col("qv")))
            .select(col("qid"), col("dst"), col("cs")).cache()
          beam0.count(): Unit
          val beam = walkBeam(vecs, und, qframe, beam0, beamWidth, hops,
            excludeSelf = false)
          val newEdges = flat(beam).withColumn("rn", row_number().over(wQ))
            .where(col("rn") <= graphK)
            .select(col("qid").as("src"), col("dst"), col("cs")).cache()
          newEdges.count(): Unit
          beam.unpersist(); und.unpersist(); qframe.unpersist()
          // adoption, KEEPING the re-ranked lists (cosine symmetry:
          // the reverse edges reuse the forward scores)
          val rev = newEdges.select(col("dst").as("src"),
            col("src").as("dst"), col("cs"))
          val affected = rev.select(col("src")).distinct()
          val fEdges = g.join(affected, Seq("src"))
            .join(vecs.select(col("id").as("src"), col("v").as("va")),
              Seq("src"))
            .join(vecs.select(col("id").as("dst"), col("v").as("vb")),
              Seq("dst"))
            .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
            .select(col("src"), col("dst"), col("cs"))
          val wF = Window.partitionBy(col("src"))
            .orderBy(col("cs").desc, col("dst"))
          val affectedKept = fEdges.unionByName(rev)
            .withColumn("rn", row_number().over(wF))
            .where(col("rn") <= graphK)
            .select(col("src"), col("dst"))
          val untouched = g.join(affected, Seq("src"), "left_anti")
            .select(col("src"), col("dst"))
          val newAdj = untouched.unionByName(affectedKept)
            .unionByName(newEdges.select(col("src"), col("dst")))
          val out = GraphIndex.writeBack(handle, newAdj, newN, newMn,
            destDir)
          newEdges.unpersist()
          out
        }
      } finally bvecs.unpersist()
    } finally vecs.unpersist()
  }

  /** INDEX-ACCELERATED SEMANTIC DEDUP — the kNN graph as the
    * near-dup CANDIDATE GENERATOR: rescore the standing index's
    * edges (N·graphK pairs — LINEAR in the corpus; the pair stage
    * that replaces [[Clustering.semDedup]]'s per-cell quadratic at
    * 100 TB, because the index already paid for neighbor discovery
    * in its nightly build), keep pairs with cosine >= `tau`, close
    * over the undirected tau-graph ([[Dedup.connectedComponents]] —
    * hash-min with pointer jumping), and emit one row per corpus
    * vector: (id, rep = component min id, keep = is-rep).
    *
    * The trade, stated honestly: the graph holds top-graphK lists,
    * so a tau-pair present in NEITHER endpoint's list is invisible —
    * dedup recall is bounded by the index's pair coverage. On
    * near-dup corpora this is the favorable case (true duplicates
    * are each other's top-1 at cosine ≈ 1, so they are always graph
    * edges); when exhaustiveness matters more than reuse, the
    * cell-confined exact pair stage remains the tool. On a
    * complete-graph index the two coincide exactly (spec-pinned).
    *
    * @return (idCol, rep, keep) for every corpus vector — unsorted
    */
  def graphSemDedup(corpus: DataFrame, vecCol: String, idCol: String,
      handle: GraphIndex.Handle, tau: Double): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, s"bad tau=$tau")
    val (vecs, n, mn, _) = servingVecs(corpus, vecCol, idCol)
    try requireHandleMatches(handle, n, mn, idCol, vecCol)
    catch { case t: Throwable => vecs.unpersist(); throw t }
    val g = GraphIndex.edges(corpus.sparkSession, handle)
    val pairs = g
      .join(vecs.select(col("id").as("src"), col("v").as("va")), Seq("src"))
      .join(vecs.select(col("id").as("dst"), col("v").as("vb")), Seq("dst"))
      .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
      .where(col("cs") >= lit(tau))
      // canonical undirected pair: both directions of a graph edge
      // collapse to one closure edge
      .select(least(col("src"), col("dst")).as("id_a"),
        greatest(col("src"), col("dst")).as("id_b"))
      .where(col("id_a") =!= col("id_b")).distinct()
    // eager closure (probe collect / label propagation) runs while
    // vecs is still cached; the returned labelling is LocalRelation
    // or CacheScope-self-releasing
    val labels = Dedup.connectedComponents(pairs)
    val out = vecs.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("rep"))
      .withColumn("keep", col("rep") === col(idCol))
    org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUseExisting(vecs)
    out
  }

  /** GRAPH REPAIR WRITE-BACK — [[graphDeleteRepairLoaded]]'s
    * mutation persisted as a NEW index version over the LIVE corpus:
    * drop every edge touching a tombstoned node, repair each node
    * that lost an out-edge by promotion-through-deleted (keeping the
    * repaired lists, not just their recall), and write
    *
    *   untouched live rows ∪ repaired lists
    *
    * via [[GraphIndex.writeBack]] with the live corpus stats
    * (n − |deleted ∩ corpus|, min live id) in the new meta. After
    * the swap the tombstones are actually DROPPABLE: the new version
    * serves the live corpus directly — [[graphBeamSearchLoaded]] /
    * [[graphSearchTopK]] over the tombstone-compacted (non-dense)
    * frame, no over-fetch mitigation needed — and the staleness
    * guard rejects the pre-delete corpus.
    *
    * Scale shape: every step deletion-bound (the s51 discipline) plus
    * the one full edge rewrite a versioned index pays; write-once
    * reuse and crash behavior as [[graphAppendWriteBack]].
    */
  def graphRepairWriteBack(corpus: DataFrame, vecCol: String,
      idCol: String, handle: GraphIndex.Handle, deletedIds: DataFrame,
      delIdCol: String, destDir: String): GraphIndex.Handle = {
    val spark = corpus.sparkSession
    val graphK = handle.graphK
    val (vecs, n, mn, _) = servingVecs(corpus, vecCol, idCol)
    try {
      requireHandleMatches(handle, n, mn, idCol, vecCol)
      val del = deletedIds.select(col(delIdCol).as("id")).distinct()
        .join(vecs.select(col("id")), Seq("id")).cache()
      try {
        val nDel = del.count()
        val live = vecs.join(del, Seq("id"), "left_anti")
          .agg(count(lit(1)).as("n"), min(col("id")).as("mn")).collect()(0)
        val newN = live.getLong(0)
        require(newN >= 2,
          s"repair write-back would leave ${newN} live vectors (deleted $nDel)")
        val newMn = live.getLong(1)
        GraphIndex.openIfPresent(spark, destDir).filter { d =>
          d.graphK == graphK && d.buildRounds == handle.buildRounds &&
            d.n == newN && d.mn == newMn && d.idCol == idCol &&
            d.vecCol == vecCol
        }.getOrElse {
          val g = GraphIndex.edges(spark, handle)
          val gLive = g
            .join(del.select(col("id").as("src")), Seq("src"), "left_anti")
            .join(del.select(col("id").as("dst")), Seq("dst"), "left_anti")
            .select(col("src"), col("dst"))
          val lost = g.join(del.select(col("id").as("dst")), Seq("dst"))
            .join(del.select(col("id").as("src")), Seq("src"), "left_anti")
            .select(col("src"), col("dst").as("d"))
          val affected = lost.select(col("src")).distinct()
          val promoted = lost
            .join(g.select(col("src").as("d"), col("dst")), Seq("d"))
            .join(del.select(col("id").as("dst")), Seq("dst"), "left_anti")
            .where(col("dst") =!= col("src"))
            .select(col("src"), col("dst")).distinct()
          val cand = gLive.join(affected, Seq("src"))
            .select(col("src"), col("dst"))
            .unionByName(promoted).distinct()
          val wSrc = Window.partitionBy(col("src"))
            .orderBy(col("cs").desc, col("dst"))
          val repaired = cand
            .join(vecs.select(col("id").as("src"), col("v").as("va")),
              Seq("src"))
            .join(vecs.select(col("id").as("dst"), col("v").as("vb")),
              Seq("dst"))
            .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
            .withColumn("rn", row_number().over(wSrc))
            .where(col("rn") <= graphK)
            .select(col("src"), col("dst"))
          val untouched = gLive.join(affected, Seq("src"), "left_anti")
            .select(col("src"), col("dst"))
          GraphIndex.writeBack(handle, untouched.unionByName(repaired),
            newN, newMn, destDir)
        }
      } finally del.unpersist()
    } finally vecs.unpersist()
  }
}
