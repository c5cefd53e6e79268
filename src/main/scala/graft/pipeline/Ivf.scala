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

  /** Deterministic k-means (Lloyd) centroids: init = the k vectors
    * with smallest xxhash64(id) (a seedless deterministic sample).
    */
  def buildCentroids(
      emb: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    var centroids = emb
      .select(col(idCol), col(vecCol))
      .withColumn("h", xxhash64(col(idCol)))
      .orderBy(col("h"))
      .limit(k)
      .select(col(vecCol).as("centroid"))
      .withColumn("cell", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("centroid"))) - 1)
      .select(col("cell"), transform(col("centroid"), _.cast("double")).as("centroid"))
    var i = 0
    while (i < iters) {
      val assigned = assign(emb, centroids, vecCol, idCol)
      // element-wise mean per cell: (cell, pos) partial sums — the
      // reduce state is k × dim, independent of corpus size
      val means = assigned
        .select(col("cell"), posexplode(col(vecCol)))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), expr("transform(pm, x -> x.m)").as("centroid"))
      centroids = means
      i += 1
    }
    centroids
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
    */
  def searchTopK(
      emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, numCells: Int, nprobe: Int,
      iters: Int = 3): DataFrame = {
    // centroids are k x dim — materialize once (the Lloyd lineage is
    // a deep crossJoin/groupBy chain referenced twice below)
    val centroids = buildCentroids(emb, vecCol, idCol, numCells, iters).cache()
    centroids.count()
    val indexed = assign(emb, centroids, vecCol, idCol)
    val q = indexed.where(col(idCol) === lit(queryId))
      .select(col(vecCol).as("q_vec"))
    // cells to probe: nprobe nearest centroids to the query
    val probed = centroids.crossJoin(broadcast(q))
      .withColumn("__sim", Similarity.cosine(col("centroid"), col("q_vec")))
      .orderBy(col("__sim").desc)
      .limit(nprobe)
      .select(col("cell"))
    indexed
      .join(broadcast(probed), Seq("cell")) // cell pruning
      .where(col(idCol) =!= lit(queryId))
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", Similarity.cosine(col(vecCol), col("q_vec")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
