package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** PERSISTED kNN-GRAPH index — the graph-ANN family's
  * build-once/serve-many lifecycle, completing index-lifecycle
  * symmetry with the coarse-quantizer family ([[AnnIndex]]): the s45
  * NN-descent build (ring init + undirected refinement rounds, Dong
  * et al. WWW'11) runs ONCE as a nightly job and its directed top-k
  * adjacency goes to parquet; every serving read (the
  * [[GraphAnn.graphBeamSearchLoaded]] beam walk) and every batch
  * insert ([[GraphAnn.graphAppendAuditLoaded]]) then runs against the
  * LOADED edge table. At 100 TB this is the only shape that works:
  * the build's per-round ≤4·N·k² rescoring join is a batch job, while
  * a query touches O(beam·degree·hops) vectors — rebuilding the graph
  * inside every read (what the r13 declared queries did) bills ~2/3
  * of each serving call to work a real system does nightly.
  *
  * On-disk layout (the [[AnnIndex]] discipline):
  *   dir/edges — (src, dst) directed adjacency, N·graphK rows,
  *               written at cluster-width parallelism (NOT coalesced:
  *               the edge table scales with the corpus)
  *   dir/meta  — 1 row, written LAST so its presence marks a complete
  *               index; a killed build can never be opened
  *               half-written
  *
  * CORPUS identity is the caller's contract, as for [[AnnIndex]]:
  * meta records build parameters and corpus stats (n, min id), not
  * which data produced them, so `dir` must be keyed by a corpus
  * fingerprint. [[open]] cross-checks (n, mn, columns) loudly at
  * serve time, which catches same-size in-place regeneration only via
  * the caller's fingerprint — the declared queries key by file
  * mtime+size exactly like the s15 IVF-PQ index.
  *
  * Reference behavior modeled: the HNSW-class serve path
  * (Malkov & Yashunin, public literature) — build once, persist,
  * search many, insert incrementally.
  */
object GraphIndex {
  val FormatVersion = 1

  /** An opened index: parameters + corpus stats from meta; the edge
    * table stays on disk until a search reads it.
    */
  final case class Handle(dir: String, graphK: Int, buildRounds: Int,
      n: Long, mn: Long, idCol: String, vecCol: String) {
    def edgesPath: String = s"$dir/edges"
  }

  /** The directed adjacency as a lazy parquet scan — callers cache it
    * (or its undirected closure) for the duration of one serving
    * loop, never longer.
    */
  def edges(spark: SparkSession, h: Handle): DataFrame =
    spark.read.parquet(h.edgesPath)

  /** Build the NN-descent graph over `emb` and persist it under
    * `dir`. The edge SET is deterministic (every top-k window orders
    * cosine desc, id asc — a total order), so a search against the
    * loaded index is bit-identical to one against an in-query build
    * with the same parameters (spec-pinned) — file order on disk is
    * not part of the contract.
    */
  def build(emb: DataFrame, vecCol: String, idCol: String, dir: String,
      graphK: Int, buildRounds: Int): Handle = {
    require(graphK > 0, s"graphK must be positive, got $graphK")
    require(buildRounds >= 0, s"buildRounds must be >= 0, got $buildRounds")
    val spark = emb.sparkSession
    // REBUILD crash-safety (round-21 advice): a param-change rebuild
    // lands here with the PREVIOUS build's meta still on disk. Delete
    // it FIRST — restoring the designed absent-index marker — so a
    // crash between the edges overwrite and the meta write leaves a
    // visibly-incomplete dir, never an old meta describing new or
    // partial edge files that open() would serve silently.
    locally {
      val metaPath = new org.apache.hadoop.fs.Path(s"$dir/meta")
      val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(metaPath)) fs.delete(metaPath, true): Unit
    }
    val vecs = graft.ops.ScaleOps.fanOut(emb)
      .select(col(idCol).as("id"), col(vecCol).as("v")).cache()
    val meta = vecs.agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
      max(col("id")).as("mx")).collect()(0)
    val (n, mn, mx) = (meta.getLong(0), meta.getLong(1), meta.getLong(2))
    require(n >= 2, "cannot index a graph over fewer than 2 vectors")
    require(mx - mn + 1L == n,
      s"ring init needs a dense id column: ids span [$mn,$mx] but count is $n")
    val g = GraphAnn.buildRingGraph(vecs, n, mn, graphK, buildRounds)
    g.select(col("src"), col("dst"))
      .write.mode("overwrite").parquet(s"$dir/edges")
    g.unpersist()
    vecs.unpersist()
    // meta written LAST — the crash-safety marker (AnnIndex:131 note)
    val metaSchema = StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("graph_k", IntegerType, nullable = false),
      StructField("build_rounds", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("mn", LongType, nullable = false),
      StructField("id_col", StringType, nullable = false),
      StructField("vec_col", StringType, nullable = false)))
    spark.createDataFrame(
      Seq(Row(FormatVersion, graphK, buildRounds, n, mn, idCol,
        vecCol)).asJava, metaSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    Handle(dir, graphK, buildRounds, n, mn, idCol, vecCol)
  }

  /** Open a persisted index: one tiny meta read. */
  def open(spark: SparkSession, dir: String): Handle = {
    val meta = spark.read.parquet(s"$dir/meta").collect() match {
      case Array(r) => r
      case other => throw new IllegalStateException(
        s"graph index meta at $dir/meta has ${other.length} rows")
    }
    val version = meta.getInt(0)
    require(version == FormatVersion,
      s"graph index format $version unsupported (expected $FormatVersion)")
    Handle(dir, meta.getInt(1), meta.getInt(2), meta.getLong(3),
      meta.getLong(4), meta.getString(5), meta.getString(6))
  }

  /** [[open]] returning None ONLY for the absent-index case (no meta
    * at `dir` — the designed crash-safety marker, checked through the
    * path's own filesystem scheme). Anything open() then throws
    * propagates: silently rebuilding over corruption would hide the
    * diagnostic behind an expensive overwrite build (AnnIndex:244).
    */
  private def openIfPresent(spark: SparkSession,
      dir: String): Option[Handle] = {
    val meta = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(meta)) Some(open(spark, dir)) else None
  }

  /** Open if a complete index with MATCHING parameters exists at
    * `dir`, else build — a parameter change rebuilds instead of
    * silently serving a stale graph.
    *
    * Concurrency contract: unlike [[AnnIndex]] there is no
    * condemn/last-reader-reclaim machinery here, because the serving
    * layer exposes no graph-index CRUD — nothing redefines a dir
    * under readers in the declared lifecycle. A LIBRARY caller who
    * rebuilds into a dir with different parameters while another
    * thread is mid-search on the old edges races that reader
    * (overwrite-in-place); callers needing redefinition-under-load
    * must key the new definition to a NEW dir (the fingerprint
    * discipline extends naturally: include the params in the key, as
    * the declared queries do).
    */
  def buildIfAbsent(emb: DataFrame, vecCol: String, idCol: String,
      dir: String, graphK: Int, buildRounds: Int): Handle = {
    val existing = openIfPresent(emb.sparkSession, dir).filter { h =>
      h.graphK == graphK && h.buildRounds == buildRounds &&
        h.idCol == idCol && h.vecCol == vecCol
    }
    existing.getOrElse(build(emb, vecCol, idCol, dir, graphK, buildRounds))
  }

  /** Registry-cached open-or-build (the s15 lifecycle entry): the
    * first call per `name` builds (or opens the persisted) index;
    * later calls are a map lookup. Concurrent first calls serialize
    * on the key — one builds, the rest share the handle. No
    * condemn/cap machinery here: unlike [[AnnIndex]], the serving
    * layer exposes no graph-index CRUD, so names never get redefined
    * under readers.
    */
  def openOrBuildCached(name: String, emb: DataFrame, vecCol: String,
      idCol: String, dir: String, graphK: Int,
      buildRounds: Int): Handle =
    registry.computeIfAbsent(name, _ =>
      buildIfAbsent(emb, vecCol, idCol, dir, graphK, buildRounds))

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Handle]()
}
