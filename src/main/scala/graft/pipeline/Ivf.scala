package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor index: a k-means
  * coarse quantizer partitions the corpus into `k` cells; a query
  * probes only the `nprobe` nearest cells and re-ranks exactly inside
  * them — the classic trade of recall for a 1/k … nprobe/k scan
  * fraction.
  *
  * Scale design:
  *  - centroids are tiny (k × dim floats) → broadcast; assignment is
  *    a map-side crossJoin + `max_by` argmax, no shuffle of vectors
  *    beyond the k-fold row expansion;
  *  - Lloyd iterations shuffle (cell, dim-position) partial sums —
  *    O(k × dim) aggregate state, corpus-size-independent reduce;
  *  - the built index is just an extra `cell` column on the corpus —
  *    at scale you'd write it back partitioned/bucketed BY cell so a
  *    probe prunes file groups (partition pruning does the work).
  *
  * With `nprobe = k` the search is exhaustive and must equal the
  * brute-force result exactly (tested invariant).
  */
object Ivf {

  /** The `nprobe` cells whose centroids are cosine-nearest to the
    * query, ties to the lower cell id — the probe-selection rule
    * every IVF-shaped search (trained, seeded, indexed, IVF-PQ)
    * shares, kept in one place so they cannot drift.
    */
  private[pipeline] def probeCells(
      q: Array[Double], centroids: Seq[(Long, Array[Double])],
      nprobe: Int): Seq[Long] =
    centroids
      .map { case (cell, cv) => (cell, cosineLocal(q, cv)) }
      .sortBy { case (cell, s) => (-s, cell) }
      .take(nprobe)
      .map(_._1)

  private[pipeline] def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val dim = a.length
    while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The shared bounded training sample: the `maxRows` vectors with
    * smallest xxhash64(id) — a seedless uniform sample, ONE cluster
    * job + driver collect. Trainers that need the same sample
    * (IVF-PQ's coarse quantizer + codebooks) pull it once and share.
    */
  private[pipeline] def hashSample(
      emb: DataFrame, vecCol: String, idCol: String,
      maxRows: Int): Array[Array[Double]] =
    emb.select(col(idCol), col(vecCol))
      .withColumn("h", xxhash64(col(idCol)))
      .orderBy(col("h"))
      .limit(maxRows)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Deterministic k-means (Lloyd) centroids, trained driver-side on
    * a bounded sample, returned as the raw arrays the literal-inlined
    * assignment and probe planning consume.
    *
    * Quantizer training is the one part of IVF that does NOT scale
    * with the corpus and should not be distributed: the standard
    * practice (FAISS trains its coarse quantizer on ≤ a few hundred
    * thousand sampled vectors regardless of index size) is to pull a
    * deterministic sample to the driver — here the `maxTrainRows`
    * vectors with smallest xxhash64(id), a seedless uniform sample —
    * and run Lloyd locally. One cluster job to sample, zero shuffles
    * per iteration (the distributed formulation re-scans and
    * re-shuffles the entire corpus every iteration for a k×dim
    * result). Init = the k sample vectors with smallest hash.
    */
  private[pipeline] def trainCentroidArrays(
      emb: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, maxTrainRows: Int): Array[Array[Double]] =
    trainOnSample(hashSample(emb, vecCol, idCol, maxTrainRows), k, iters)

  private[pipeline] def trainOnSample(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "cannot build centroids from an empty corpus")
    val dim = sample.head.length
    var centroids: Array[Array[Double]] = sample.take(k).map(_.clone())
    def cosine(a: Array[Double], b: Array[Double]): Double = cosineLocal(a, b)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < centroids.length) {
          val s = cosine(v, centroids(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.toArray.collect {
        // empty cells drop (same as the distributed mean, where an
        // unassigned cell simply produces no row)
        case c if counts(c) > 0 =>
          val m = new Array[Double](dim)
          var i = 0
          while (i < dim) { m(i) = sums(c)(i) / counts(c); i += 1 }
          m
      }
      it += 1
    }
    centroids
  }

  def buildCentroids(
      emb: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 3, maxTrainRows: Int = 100000): DataFrame = {
    val spark = emb.sparkSession
    val centroids = trainCentroidArrays(emb, vecCol, idCol, k, iters, maxTrainRows)
    import scala.jdk.CollectionConverters._
    val rows = centroids.zipWithIndex.map { case (cv, i) =>
      org.apache.spark.sql.Row(i, cv.toSeq)
    }.toSeq.asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false))))
    spark.createDataFrame(rows, schema)
  }

  /** Nearest-cell assignment: the input frame with a `cell` column
    * appended (all other columns preserved — the index is "the corpus
    * plus a cell column", ready for a write-back partitioned by cell).
    */
  def assign(emb: DataFrame, centroids: DataFrame,
      vecCol: String, idCol: String): DataFrame = {
    val cells = emb.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", Similarity.cosine(col(vecCol), col("centroid")))
      .groupBy(col(idCol))
      .agg(max_by(col("cell"), col("__sim")).as("cell"))
    emb.join(cells, Seq(idCol))
  }

  /** Top-k by cosine against the query vector (the corpus row with
    * id == queryId), probing the `nprobe` nearest cells only.
    *
    * The quantizer is driver-trained ([[trainCentroidArrays]]), so
    * the whole probe plan is join-free: cell assignment inlines the
    * centroids as literals (map-only projection, see
    * [[Clustering.assignToCentroidArrays]]), the probe cells are
    * chosen driver-side against the same centroids and become an
    * `isin` filter, and the query vector (one bounded collect, like
    * the training sample) inlines into the final cosine — scan →
    * filter → TopK, no exchange but the TakeOrderedAndProject merge.
    * With a cell-partitioned write-back (see ScaleOpsSpec) the isin
    * filter is directory pruning.
    */
  def searchTopK(
      emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, numCells: Int, nprobe: Int,
      iters: Int = 3): DataFrame = {
    val cents = trainCentroidArrays(emb, vecCol, idCol, numCells, iters,
      maxTrainRows = 100000)
    val centPairs = cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    val indexed = Clustering.assignToCentroidArrays(
      emb.select(col(idCol), col(vecCol)), vecCol, idCol, centPairs)
    val q: Array[Double] = emb.where(col(idCol) === lit(queryId))
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect() match {
        case Array(row) => row.getSeq[Double](0).toArray
        case other => throw new IllegalArgumentException(
          s"queryId $queryId matched ${other.length} rows")
      }
    // cells to probe: nprobe nearest centroids to the query, ranked
    // driver-side (ties to the lower cell id, matching assignment)
    val probes: Seq[Long] = probeCells(q, centPairs, nprobe)
    val qlit = array(q.toSeq.map(lit): _*)
    indexed
      .where(col("cell").isin(probes: _*)) // cell pruning
      .where(col(idCol) =!= lit(queryId))
      .withColumn("cos_sim", Similarity.cosine(col(vecCol), qlit))
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF with SEEDED centroids — the first `numCells` corpus vectors
    * by id, no Lloyd — so the whole probe path is reconstructable in
    * SQL by an external engine: centroids are data, cell assignment
    * is argmax cosine with ties to the lower cell (the
    * `assignToCentroidArrays` rule), probe selection ranks the same
    * cosines, and the in-cell re-rank is the exact kernel cosine.
    * Retrieval quality is below trained centroids; the point is the
    * full-oracle twin (s18) for the rows-only s03 — the
    * [[Pq.searchTopKSeeded]] move for the IVF family.
    */
  def searchTopKSeeded(
      emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, numCells: Int, nprobe: Int): DataFrame = {
    val cents: Seq[Array[Double]] = emb.orderBy(col(idCol)).limit(numCells)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect().toSeq.map(_.getSeq[Double](0).toArray)
    require(cents.size == numCells, s"corpus has fewer than $numCells rows")
    val centPairs = cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val q: Array[Double] = emb.where(col(idCol) === lit(queryId))
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect() match {
        case Array(row) => row.getSeq[Double](0).toArray
        case other => throw new IllegalArgumentException(
          s"queryId $queryId matched ${other.length} rows")
      }
    val probes: Seq[Long] = probeCells(q, centPairs, nprobe)
    val indexed = Clustering.assignToCentroidArrays(
      emb.select(col(idCol), col(vecCol)), vecCol, idCol, centPairs)
    val qlit = array(q.toSeq.map(lit): _*)
    indexed
      .where(col("cell").isin(probes: _*))
      .where(col(idCol) =!= lit(queryId))
      .withColumn("cos_sim", Similarity.cosine(col(vecCol), qlit))
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Recall@k vs nprobe — the IVF TUNING curve run before fixing the
    * probe budget: for each candidate nprobe, the fraction of the
    * exact top-k the pruned search recovers. The whole curve costs
    * ONE corpus scan: every vector carries its cell's PROBE RANK
    * (cells ordered by query similarity — "visible at nprobe n" ⟺
    * rank ≤ n), the per-nprobe top-k is a rank window over the
    * 4×-exploded (nprobe, candidate) frame, and the exact leg is the
    * same scan's unpruned window. Zero-recall rows still report
    * (driven from the nprobe list).
    *
    * @return (nprobe, n_hits, recall) ordered by nprobe
    */
  def recallVsNprobe(
      emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, numCells: Int, nprobes: Seq[Int]): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(n => n >= 1 && n <= numCells),
      "nprobes must be in [1, numCells]")
    val cents: Seq[Array[Double]] = emb.orderBy(col(idCol)).limit(numCells)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect().toSeq.map(_.getSeq[Double](0).toArray)
    require(cents.size == numCells, s"corpus has fewer than $numCells rows")
    val centPairs = cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val q: Array[Double] = emb.where(col(idCol) === lit(queryId))
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect() match {
        case Array(row) => row.getSeq[Double](0).toArray
        case other => throw new IllegalArgumentException(
          s"queryId $queryId matched ${other.length} rows")
      }
    // all cells in probe order: rank r (1-based) = r-th nearest cell
    val probeOrder: Seq[Long] = probeCells(q, centPairs, numCells)
    val rankExpr = probeOrder.zipWithIndex
      .map { case (cell, r) => when(col("cell") === lit(cell), lit(r + 1L)) }
      .reduceRight((w, acc) => w.otherwise(acc))
    val qlit = array(q.toSeq.map(lit): _*)
    val scored = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      Clustering.assignToCentroidArrays(
          emb.select(col(idCol), col(vecCol)), vecCol, idCol, centPairs)
        .where(col(idCol) =!= lit(queryId))
        .select(col(idCol), rankExpr.as("cell_rank"),
          Similarity.cosine(col(vecCol), qlit).as("cos_sim")))
    val nsDf = broadcast(
      emb.sparkSession.createDataFrame(
        nprobes.map(n => Tuple1(n.toLong))).toDF("nprobe"))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nprobe")).orderBy(col("cos_sim").desc, col(idCol))
    val approx = scored.crossJoin(nsDf)
      .where(col("cell_rank") <= col("nprobe"))
      .withColumn("rank", row_number().over(wN))
      .where(col("rank") <= k)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos_sim").desc, col(idCol))
    val exact = scored
      .withColumn("rank", row_number().over(wAll))
      .where(col("rank") <= k)
      .select(col(idCol), lit(1L).as("hit"))
    val counts = approx.join(exact, Seq(idCol), "left")
      .groupBy(col("nprobe"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("nh"))
    nsDf.join(counts, Seq("nprobe"), "left")
      .select(col("nprobe"),
        coalesce(col("nh"), lit(0L)).as("n_hits"),
        (coalesce(col("nh"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"))
  }

  /** Cell-pruned threshold (radius) search — the scale path for
    * [[Similarity.rangeSearch]]: only the `nprobe` cells nearest the
    * query are scanned, then the exact cosine threshold filters
    * within them. Same deterministic seeded-centroid construction as
    * [[searchTopKSeeded]] (first `numCells` rows by id, no Lloyd), so
    * the whole path — assignment, probe choice, in-cell filter — is
    * reconstructable in SQL and the s26 oracle hash-matches it. The
    * approximation contract is explicit: a qualifying vector in an
    * unprobed cell is missed (that is the pruning trade); within
    * probed cells the result is exact. On a cell-partitioned persisted
    * index this prunes at the directory level — the 100 TB shape
    * where (numCells − nprobe)/numCells of the corpus is never read.
    */
  def rangeSearchSeeded(
      emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, minCos: Double, numCells: Int, nprobe: Int): DataFrame = {
    val cents: Seq[Array[Double]] = emb.orderBy(col(idCol)).limit(numCells)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect().toSeq.map(_.getSeq[Double](0).toArray)
    require(cents.size == numCells, s"corpus has fewer than $numCells rows")
    val centPairs = cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val q: Array[Double] = emb.where(col(idCol) === lit(queryId))
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect() match {
        case Array(row) => row.getSeq[Double](0).toArray
        case other => throw new IllegalArgumentException(
          s"queryId $queryId matched ${other.length} rows")
      }
    val probes: Seq[Long] = probeCells(q, centPairs, nprobe)
    val indexed = Clustering.assignToCentroidArrays(
      emb.select(col(idCol), col(vecCol)), vecCol, idCol, centPairs)
    val qlit = array(q.toSeq.map(lit): _*)
    indexed
      .where(col("cell").isin(probes: _*))
      .where(col(idCol) =!= lit(queryId))
      .withColumn("cos_sim", Similarity.cosine(col(vecCol), qlit))
      .where(col("cos_sim") >= lit(minCos))
      .select(col(idCol), col("cos_sim"))
  }
}
