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

  /** One NN-DESCENT refinement round with a recall audit: seed a kNN
    * graph from IVF cell-mates (vectors in the same cell rank their
    * own cell's members — the cheap-but-myopic initialization: recall
    * is capped by whatever the cell boundary cut off), expand each
    * vector's candidates with its neighbors' neighbors, rescore
    * exactly, keep top-k. Reports recall@k against the exact
    * brute-force leg for BOTH stages, so the result quantifies what
    * one round of graph refinement buys over the raw IVF
    * neighborhood — the measurement behind "how many rounds until the
    * graph converges".
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
    val wSrc = Window.partitionBy(col("src"))
      .orderBy(col("cs").desc, col("dst"))
    // init graph: top-k among cell-mates — the per-cell self-join is
    // the semDedup pair shape (O(N²/kCells) rows, never corpus²)
    val n0 = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      assigned.select(col("cell"), col("id").as("src"), col("v").as("va"))
        .join(assigned.select(col("cell"), col("id").as("dst"),
          col("v").as("vb")), Seq("cell"))
        .where(col("src") =!= col("dst"))
        .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
        .withColumn("rn", row_number().over(wSrc))
        .where(col("rn") <= k)
        .select(col("src"), col("dst")))
    // one refinement round: forward 2-hop frontier ∪ current edges,
    // rescored exactly, re-ranked
    val hop2 = n0.as("x")
      .join(n0.as("y"), col("x.dst") === col("y.src"))
      .where(col("y.dst") =!= col("x.src"))
      .select(col("x.src").as("src"), col("y.dst").as("dst"))
    val cand = n0.unionByName(hop2).distinct()
    val n1 = cand
      .join(vecs.select(col("id").as("src"), col("v").as("va")), Seq("src"))
      .join(vecs.select(col("id").as("dst"), col("v").as("vb")), Seq("dst"))
      .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
      .withColumn("rn", row_number().over(wSrc))
      .where(col("rn") <= k)
      .select(col("src"), col("dst"))
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
}
