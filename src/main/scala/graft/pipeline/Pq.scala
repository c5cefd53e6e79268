package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest neighbor: the
  * vector is split into `m` subvectors, each quantized independently
  * against its own `ksub`-centroid codebook, so a dim-float vector
  * compresses to `m` small codes (m bytes for ksub ≤ 256). Search
  * scores candidates from the codes alone via per-subspace lookup
  * tables built from the query (asymmetric distance computation) —
  * the memory/IO trade that makes billion-vector indexes practical.
  *
  * Scale design mirrors [[Ivf]]:
  *  - codebooks are trained driver-side on a bounded hash-sample
  *    (quantizer training must not scale with the corpus — the FAISS
  *    discipline) and inline into expressions as literals;
  *  - encoding is a map-only projection (argmin per subspace over
  *    literal centroids, all codegen — no join, no shuffle); at scale
  *    you'd write (id, codes) back once and amortize it;
  *  - search scans CODES, not vectors: 2m `element_at` lookups per
  *    row against m×ksub literal tables — the scan is ~dim·4/m times
  *    less IO than brute force — then TopK
  *    (TakeOrderedAndProject, no global sort);
  *  - optional exact re-rank: the ADC top-`rerank` candidate ids
  *    (a bounded driver list, like IVF's probe cells) become an
  *    `isin` pushdown filter over the original vectors — join-free.
  *
  * All determinism is structural: hash-ordered sample, fixed Lloyd
  * iterations, ties to the lower code/id.
  */
object Pq {

  /** [m][ksub][subDim] codebooks: per-subspace L2 Lloyd on a
    * driver-side bounded sample (smallest-xxhash64 rows — the same
    * seedless uniform sample as [[Ivf.trainCentroidArrays]]). Init =
    * first ksub sample subvectors in hash order. Empty cells drop.
    */
  def trainCodebooks(
      emb: DataFrame, vecCol: String, idCol: String,
      m: Int, ksub: Int, iters: Int,
      maxTrainRows: Int): Array[Array[Array[Double]]] =
    trainCodebooksOnSample(
      Ivf.hashSample(emb, vecCol, idCol, maxTrainRows), m, ksub, iters)

  /** Codebooks from an already-pulled sample — [[Ivf.hashSample]] is
    * shared with the coarse quantizer so IVF-PQ scans the corpus for
    * its training sample ONCE, not once per trainer.
    */
  private[pipeline] def trainCodebooksOnSample(
      sample: Array[Array[Double]],
      m: Int, ksub: Int, iters: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "cannot train codebooks on an empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    Array.tabulate(m) { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      var cents: Array[Array[Double]] = subs.take(ksub).map(_.clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Long](cents.length)
        subs.foreach { v =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cents.length) {
            val d = l2sq(v, cents(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < sub) { sums(best)(i) += v(i); i += 1 }
        }
        cents = cents.indices.toArray.collect {
          case c if counts(c) > 0 =>
            val mean = new Array[Double](sub)
            var i = 0
            while (i < sub) { mean(i) = sums(c)(i) / counts(c); i += 1 }
            mean
        }
        it += 1
      }
      cents
    }
  }

  /** Codebooks SEEDED from the `ksub` smallest-id vectors' subvectors,
    * no Lloyd iterations. Retrieval quality is below the trained
    * codebooks — the point is that this codebook is DETERMINISTIC
    * DATA (the first ksub rows by id, sliced), so an external engine
    * can reconstruct it exactly in SQL and the whole PQ pipeline
    * (encode → ADC → top-k) becomes full-oracle checkable instead of
    * rows-only trusted (s16's hash-matched twin of s12).
    */
  def seedCodebooks(emb: DataFrame, vecCol: String, idCol: String,
      m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    val rows = emb.orderBy(col(idCol)).limit(ksub)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "cannot seed codebooks from an empty corpus")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    Array.tabulate(m) { j =>
      rows.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
    }
  }

  /** ADC top-k with the SEEDED (oracle-reconstructable) codebook:
    * identical kernels to [[searchTopK]] with rerank = 0, but every
    * arithmetic step — seed slicing, L2 argmin (ties to the lower
    * code), dot/nrm2 table sums, the j-ascending score accumulation —
    * has a bit-identical SQL spelling, so the result hash-matches
    * DuckDB. `adc_sim` is rounded to 6 dp only to absorb the final
    * aggregation's engine-specific accumulation order (the t15
    * discipline); ordering uses the rounded value for the same
    * reason.
    */
  def searchTopKSeeded(
      emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, m: Int, ksub: Int): DataFrame = {
    val books = seedCodebooks(emb, vecCol, idCol, m, ksub)
    val q = collectQuery(emb, vecCol, idCol, queryId)
    val (dotTab, nrm2Tab, qNorm) = adcTables(q, books)
    encode(emb.select(col(idCol), col(vecCol)), vecCol, books)
      .where(col(idCol) =!= lit(queryId))
      .withColumn("adc_sim", round(graft.functions.PqExpressions.pqAdcScore(
        col("codes"), dotTab, nrm2Tab, qNorm), 6))
      .where(col("adc_sim").isNotNull)
      .select(col(idCol), col("adc_sim"))
      .orderBy(col("adc_sim").desc, col(idCol))
      .limit(k)
  }

  /** PQ distortion audit with the SEEDED codebook — per subspace, the
    * mean and worst quantization error the encoder commits to: the
    * number that tells you whether m subspaces × ksub codes is enough
    * resolution BEFORE trusting ADC scores built on it (the PQ leg's
    * tuning audit, beside s30's cell balance and s31's nprobe curve).
    * A lopsided subspace (mse far above its peers) means the dim
    * slicing misaligns with the data's variance — the signal to
    * permute dims or train codebooks (OPQ's motivation, Ge et al.
    * 2013).
    *
    * Scale shape: map-only — the
    * [[graft.functions.PqExpressions.PqSubErrors]] kernel computes
    * all m errors in one codegen scan, and only (j, err) scalars
    * reach the m-row aggregation. `mse` is ROUND(6) (engine sum
    * order); `max_err` is exact (each error is bit-identical to the
    * oracle's argmin distance).
    *
    * @return (j, n_vecs, mse, max_err) ordered by subspace j
    */
  def distortionReport(emb: DataFrame, vecCol: String, idCol: String,
      m: Int, ksub: Int): DataFrame = {
    val books = seedCodebooks(emb, vecCol, idCol, m, ksub)
    // posexplode_outer + a post-explode scalar filter: a plain
    // isNotNull guard on the array makes InferFiltersFromGenerate
    // re-evaluate the kernel inside the Filter (2x per row); the
    // outer generate skips the inferred filter, so the kernel runs
    // exactly once, and malformed vectors surface as one null row
    emb
      .select(graft.functions.PqExpressions.pqSubErrors(col(vecCol), books)
        .as("errs"))
      .select(posexplode_outer(col("errs")).as(Seq("j", "err")))
      .where(col("err").isNotNull)
      .groupBy(col("j").cast("long").as("j"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("err")), 6).as("mse"),
        max(col("err")).as("max_err"))
      .orderBy(col("j"))
  }

  /** PQ distortion per IVF CELL — [[distortionReport]]'s global MSE
    * localized to the cell partitioning: per cell, the count and the
    * mean/max total reconstruction error of its members under the
    * seeded codebooks. The read that turns s32's "is the codebook
    * good" into "WHERE is it bad": a cell whose residuals the shared
    * codebook fits worst is where a localized re-train
    * ([[graft.pipeline.Clustering.centroidRefresh]]'s PQ analogue)
    * pays, and a drifting append (s34) shows up here as distortion
    * concentrating in the unseeded cells.
    *
    * Determinism: the per-vector total folds the m sub-errors in
    * subspace order (left fold — mirrored by the oracle's ordered
    * list_sum), is rounded 6 dp, and the per-cell mean sums those
    * round-6 totals as DECIMAL — order-independent on any engine.
    *
    * Scale shape: ONE map-only projection computes assignment (the
    * k-dispatch literal/broadcast shape) AND the PQ sub-errors; only
    * (cell, total-error) scalar pairs reach the k-row aggregation.
    *
    * @return (cell, n_vecs, mse, max_err), one row per non-empty
    *         cell (unsorted — callers order)
    */
  def cellDistortionReport(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, m: Int, ksub: Int): DataFrame = {
    val books = seedCodebooks(emb, vecCol, idCol, m, ksub)
    // null guard on the INPUT column, not the kernel output — a
    // filter on errs would make Catalyst re-evaluate the kernel
    // inside the Filter (the distortionReport lesson)
    graft.pipeline.Clustering.assignToSeeds(
        emb.where(col(vecCol).isNotNull), vecCol, idCol, k)
      .select(col("cell"),
        graft.functions.PqExpressions.pqSubErrors(col(vecCol), books)
          .as("errs"))
      .select(col("cell"),
        round(aggregate(col("errs"), lit(0.0),
          (acc, e) => acc + e), 6).as("terr"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("terr").cast("decimal(18,6)")).as("__ts"),
        max(col("terr")).as("max_err"))
      .select(col("cell"), col("n_vecs"),
        (col("__ts").cast("double") / col("n_vecs").cast("double"))
          .as("mse"),
        col("max_err"))
  }

  /** Residual-vs-raw PQ distortion — the measurement behind WHY
    * IVF-PQ encodes residuals: after IVF assignment, the residual
    * r = v − centroid(cell) has most of the coarse structure removed,
    * so the same codebook budget (m × ksub) fits what remains with
    * lower error. This report quantifies that per subspace: encode
    * every vector twice — raw v against raw seed codebooks, residual
    * r against RESIDUAL seed codebooks (the residuals of the same
    * ksub smallest-id seeds, under the same assignment) — and compare
    * the per-subspace MSEs. res_mse ≪ raw_mse is the justification
    * for the IVF-PQ index layout; res_mse at or ABOVE raw_mse means
    * the centroids don't model the data (cosine cells on
    * structureless embeddings can even ADD magnitude error) and the
    * residual layout won't pay — run this BEFORE committing the
    * index format, beside the s35 rebuild verdict.
    *
    * Determinism: residuals are double subtractions (exact IEEE both
    * engines), per-subspace errors are rounded 6 dp, means sum as
    * DECIMAL — order-independent.
    *
    * Scale shape: ONE map-only projection computes the assignment,
    * the residual (k-row centroid frame broadcast), and both PQ
    * error kernels; only (j, raw-err, res-err) scalar triples reach
    * the m-row aggregation.
    *
    * @return (j, n_vecs, raw_mse, res_mse) ordered by subspace j
    */
  def residualDistortionReport(emb: DataFrame, vecCol: String,
      idCol: String, k: Int, m: Int, ksub: Int): DataFrame = {
    val spark = emb.sparkSession
    val rawBooks = seedCodebooks(emb, vecCol, idCol, m, ksub)
    // driver-side: the k centroids and the ksub seed residuals under
    // the SAME assignment math the engine runs (index-ordered folds —
    // bit-identical to the kernels)
    val cents = emb
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
      .orderBy(col(idCol)).limit(k)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val seeds = emb
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
      .orderBy(col(idCol)).limit(ksub)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val resSeeds = seeds.map { case (_, v) =>
      val bestCell = cents.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }._1
      val cv = cents.find(_._1 == bestCell).get._2
      v.indices.map(i => v(i) - cv(i)).toArray
    }
    val dim = seeds.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val resBooks = Array.tabulate(m) { j =>
      resSeeds.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
    }
    import scala.jdk.CollectionConverters._
    val centRows = cents.map { case (c, v) =>
      org.apache.spark.sql.Row(c, v.toSeq)
    }.toSeq.asJava
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__cent",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false))))
    val centDf = spark.createDataFrame(centRows, centSchema)
    val assigned = graft.pipeline.Clustering.assignToCentroidArrays(
        emb.where(col(vecCol).isNotNull), vecCol, idCol, cents.toSeq)
      .select(col(vecCol), col("cell"))
      .join(broadcast(centDf), Seq("cell"))
      .select(col(vecCol),
        zip_with(col(vecCol), col("__cent"),
          (a, b) => a.cast("double") - b).as("__res"))
    assigned
      .select(
        graft.functions.PqExpressions.pqSubErrors(col(vecCol), rawBooks)
          .as("re"),
        graft.functions.PqExpressions.pqSubErrors(col("__res"), resBooks)
          .as("se"))
      .select(posexplode(zip_with(col("re"), col("se"),
        (a, b) => struct(a.as("r"), b.as("s")))).as(Seq("j", "p")))
      .select(col("j").cast("long").as("j"),
        round(col("p.r"), 6).as("rawe"), round(col("p.s"), 6).as("rese"))
      .groupBy(col("j"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("rawe").cast("decimal(18,6)")).as("__rs"),
        sum(col("rese").cast("decimal(18,6)")).as("__ss"))
      .select(col("j"), col("n_vecs"),
        (col("__rs").cast("double") / col("n_vecs").cast("double"))
          .as("raw_mse"),
        (col("__ss").cast("double") / col("n_vecs").cast("double"))
          .as("res_mse"))
  }

  /** Adds a `codes` column (array<int>, length m): per subspace, the
    * L2-nearest codebook entry, ties to the lower code. Map-only via
    * the [[graft.functions.PqExpressions.PqEncode]] codegen kernel —
    * an unrolled literal-centroid formulation was tried first and
    * crosses Janino's 64 KB method limit at m=16, ksub=32 (silent
    * interpreted fallback); the kernel's loop bytecode is constant in
    * m/ksub.
    */
  def encode(emb: DataFrame, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    require(!emb.columns.contains("codes"),
      "Pq.encode: input must not already have a 'codes' column")
    emb.withColumn("codes",
      graft.functions.PqExpressions.pqEncode(col(vecCol), codebooks))
  }

  /** The collected query vector (one bounded driver row, like the
    * training sample).
    */
  private[graft] def collectQuery(
      emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long): Array[Double] =
    emb.where(col(idCol) === lit(queryId))
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect() match {
        case Array(row) => row.getSeq[Double](0).toArray
        case other => throw new IllegalArgumentException(
          s"queryId $queryId matched ${other.length} rows")
      }

  /** Per-subspace ADC tables for a query: (dot(q_j, c), |c|², |q|). */
  private[graft] def adcTables(q: Array[Double],
      books: Array[Array[Array[Double]]])
      : (Array[Array[Double]], Array[Array[Double]], Double) = {
    val sub = books.head.head.length
    val dotTab: Array[Array[Double]] = books.zipWithIndex.map { case (cb, j) =>
      cb.map { cent =>
        var s = 0.0; var i = 0
        while (i < sub) { s += q(j * sub + i) * cent(i); i += 1 }
        s
      }
    }
    val nrm2Tab: Array[Array[Double]] = books.map(_.map(_.map(x => x * x).sum))
    (dotTab, nrm2Tab, math.sqrt(q.map(x => x * x).sum))
  }

  /** ADC vs SDC retrieval comparison — the PQ scoring-mode decision
    * (Jégou et al. TPAMI'11, public literature): ADC keeps the query
    * EXACT and scores it against reconstructed docs (one quantization
    * error per pair); SDC quantizes BOTH sides so scores reduce to a
    * ksub×ksub table lookup per subspace (two errors per pair, but
    * the query-side tables are precomputable and the scan never
    * touches a float vector). The standing advice is "ADC unless the
    * lookup-table locality pays for the extra error" — this measures
    * the actual recall gap on the corpus at hand, against the exact
    * leg, for a fixed query batch.
    *
    * Both modes ride the SAME codegen scan kernel
    * ([[graft.functions.PqExpressions.pqAdcScore]]) with different
    * driver-built tables: ADC gets dot(q_j, c) and ‖q‖; SDC gets
    * dot(c_{q_j}, c) and the reconstructed ‖q̂‖ — the scan cost is
    * identical by construction, isolating the ERROR comparison.
    *
    * Scale shape: one encode scan (scope-cached codes reused by every
    * per-query leg), per-query TakeOrderedAndProject top-ks, one
    * broadcast exact leg over the query batch (the audit protocol),
    * and a 2-row method rollup.
    *
    * @return (method ∈ adc|sdc, n_queries, n_returned, n_hits,
    *         n_possible, recall round-6) — unsorted, callers order
    */
  def adcSdcRecallCompare(emb: DataFrame, vecCol: String, idCol: String,
      queryIds: Seq[Long], k: Int, m: Int, ksub: Int): DataFrame = {
    require(queryIds.nonEmpty, "need at least one query id")
    // SMALL-BATCH contract (r12 advice): each query contributes TWO
    // unioned plan legs (adc + sdc), each with its own driver-built
    // table collect — a large batch would build a 2·|queries|-leg
    // plan with a driver round-trip per leg. This is a diagnostic
    // comparator, not a serving path; batch serving is
    // [[searchTopKBatch]] (one pass, per-query kernel columns).
    require(queryIds.size <= 64,
      s"adcSdcRecallCompare is a small-batch diagnostic (2 plan legs " +
        s"+ 1 driver round-trip per query): got ${queryIds.size} " +
        "queries, cap is 64 — use searchTopKBatch for batch serving")
    val books = seedCodebooks(emb, vecCol, idCol, m, ksub)
    val sub = books.head.head.length
    val encoded = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      encode(graft.ops.ScaleOps.fanOut(emb)
        .select(col(idCol).as("id"), col(vecCol).as("v")), "v", books)
        .select(col("id"), col("codes")))
    def legsFor(qid: Long): Seq[DataFrame] = {
      val q = collectQuery(emb, vecCol, idCol, qid)
      val (dotTab, nrm2Tab, qNorm) = adcTables(q, books)
      // query-side encode on the driver: per-subspace L2 argmin,
      // ties to the smaller code — the same rule as the scan kernel
      val qCodes = Array.tabulate(m) { j =>
        var best = 0; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < books(j).length) {
          var d = 0.0; var i = 0
          while (i < sub) {
            val t = q(j * sub + i) - books(j)(c)(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
      val sdcDotTab: Array[Array[Double]] = Array.tabulate(m) { j =>
        val qc = books(j)(qCodes(j))
        books(j).map { cent =>
          var s = 0.0; var i = 0
          while (i < sub) { s += qc(i) * cent(i); i += 1 }
          s
        }
      }
      val nqHat = math.sqrt(
        Array.tabulate(m)(j => nrm2Tab(j)(qCodes(j))).sum)
      def top(method: String, dt: Array[Array[Double]], qn: Double) =
        encoded
          .where(col("id") =!= lit(qid))
          .withColumn("sim", round(graft.functions.PqExpressions.pqAdcScore(
            col("codes"), dt, nrm2Tab, qn), 6))
          .where(col("sim").isNotNull)
          .orderBy(col("sim").desc, col("id"))
          .limit(k)
          .select(lit(qid).as("src"), col("id").as("dst"),
            lit(method).as("method"))
      Seq(top("adc", dotTab, qNorm), top("sdc", sdcDotTab, nqHat))
    }
    val approx = queryIds.flatMap(legsFor).reduce(_ unionByName _)
    // the shared exact audit leg (Similarity.exactTopKSelf)
    val exact = org.apache.spark.sql.graftbridge.CacheScope.releaseAfterUse(
      Similarity.exactTopKSelf(emb, vecCol, idCol,
        emb.where(col(idCol).isin(queryIds: _*))
          .select(col(idCol).as("src"), col(vecCol).as("qv")), k))
    val totals = exact.agg(
      countDistinct(col("src")).as("n_queries"),
      count(lit(1)).as("n_possible"))
    approx
      .join(exact.withColumn("__hit", lit(1L)), Seq("src", "dst"), "left")
      .groupBy(col("method"))
      // outer coalesce: zero-hit methods report 0, not NULL
      .agg(count(lit(1)).as("n_returned"),
        coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L)).as("n_hits"))
      .crossJoin(broadcast(totals))
      .select(col("method"), col("n_queries"), col("n_returned"),
        col("n_hits"), col("n_possible"),
        round(col("n_hits").cast("double") /
          col("n_possible").cast("double"), 6).as("recall"))
  }

  /** ADC top-candidates → exact-cosine re-rank: the candidate ids are
    * a bounded driver list (≤ max(k, rerank)) that becomes an `isin`
    * PUSHDOWN filter over the original vectors — join-free, the IVF
    * probe-cell discipline.
    */
  private[pipeline] def rerankStage(emb: DataFrame, vecCol: String,
      idCol: String, topAdc: DataFrame, q: Array[Double], k: Int,
      rerank: Int): DataFrame =
    if (rerank <= 0) topAdc.limit(k)
    else {
      val candIds = topAdc.select(col(idCol)).collect().map(_.getLong(0)).toSeq
      val qlit = array(q.toSeq.map(lit): _*)
      emb.where(col(idCol).isin(candIds: _*))
        .withColumn("cos_sim", Similarity.cosine(col(vecCol), qlit))
        .select(col(idCol), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col(idCol))
        .limit(k)
    }

  /** Top-k by ADC-approximated cosine against the corpus row with
    * id == queryId, with optional exact re-rank of the top `rerank`
    * ADC candidates. rerank = 0 returns pure ADC scores (`adc_sim`);
    * rerank ≥ k re-scores candidates with exact cosine (`cos_sim`).
    */
  def searchTopK(
      emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, m: Int, ksub: Int,
      iters: Int = 3, rerank: Int = 0,
      maxTrainRows: Int = 100000): DataFrame = {
    val books = trainCodebooks(emb, vecCol, idCol, m, ksub, iters, maxTrainRows)
    val q = collectQuery(emb, vecCol, idCol, queryId)
    val (dotTab, nrm2Tab, qNorm) = adcTables(q, books)
    val encoded = encode(emb.select(col(idCol), col(vecCol)), vecCol, books)
      .where(col(idCol) =!= lit(queryId))
    // cos(q, x̂) = Σ dot(q_j, c_code) / (|q| · sqrt(Σ |c_code|²)) — the
    // table-lookup codegen kernel (two array derefs per subspace)
    val topAdc = encoded
      .withColumn("adc_sim", graft.functions.PqExpressions.pqAdcScore(
        col("codes"), dotTab, nrm2Tab, qNorm))
      // vectors whose length doesn't divide into the codebooks encode
      // to null codes → null adc_sim; nulls sort last under desc but
      // would still fill the limit when fewer than k rows score
      .where(col("adc_sim").isNotNull)
      .select(col(idCol), col("adc_sim"))
      .orderBy(col("adc_sim").desc, col(idCol))
      .limit(math.max(k, rerank))
    rerankStage(emb, vecCol, idCol, topAdc, q, k, rerank)
  }

  /** Batch ADC search: top-k for EVERY query row in one corpus scan.
    * The query set is collected to the driver (bounded by
    * `maxQueryRows`, like the training sample — a batch of query
    * vectors is index metadata, not data) and each query contributes
    * one ADC kernel column over the shared codes; the per-query
    * (query_id, adc) pairs explode in the scan stage and a rank
    * filter on the literal k keeps InferWindowGroupLimit applicable —
    * per-map-partition forwarding is capped at k per query, the
    * [[Similarity.lshTopKBatch]] discipline.
    *
    * Scale shape: ONE pass over codes (m·|queries| array lookups per
    * row), one rank exchange keyed by query — corpus vectors are
    * never read at all, and nothing joins.
    */
  def searchTopKBatch(
      emb: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
      queryIdCol: String, k: Int, m: Int, ksub: Int,
      iters: Int = 3, maxTrainRows: Int = 100000,
      maxQueryRows: Int = 1000): DataFrame = {
    val books = trainCodebooks(emb, vecCol, idCol, m, ksub, iters, maxTrainRows)
    val qRows = queries.select(col(queryIdCol),
        transform(col(vecCol), _.cast("double")).as("v"))
      .limit(maxQueryRows + 1)
      .collect()
    require(qRows.length <= maxQueryRows,
      s"query batch exceeds maxQueryRows=$maxQueryRows — broadcast-join " +
        "shapes (lshTopKBatch) fit unbounded query sets")
    require(qRows.nonEmpty, "empty query batch")
    val encoded = encode(emb.select(col(idCol), col(vecCol)), vecCol, books)
    val scoreCols: Seq[Column] = qRows.toSeq.map { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Double](1).toArray
      val (dotTab, nrm2Tab, qNorm) = adcTables(q, books)
      struct(lit(qid).as("query_id"),
        graft.functions.PqExpressions.pqAdcScore(col("codes"), dotTab,
          nrm2Tab, qNorm).as("adc_sim"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_sim").desc, col(idCol))
    // no self-match filter — the lshTopKBatch contract: the caller
    // controls the corpus (exclude the query rows to mirror
    // single-query semantics)
    encoded
      .select(col(idCol), explode(array(scoreCols: _*)).as("qs"))
      .select(col("qs.query_id").as("query_id"), col(idCol),
        col("qs.adc_sim").as("adc_sim"))
      // malformed vectors score null — drop before ranking so they
      // can never surface as neighbors (row_number still assigns
      // ranks to nulls sorted last)
      .where(col("adc_sim").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("adc_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** IVF-PQ: the canonical billion-scale composition — the coarse
    * quantizer's cells prune the scan to `nprobe/numCells` of the
    * corpus (an `isin` filter; directory pruning on a cell-partitioned
    * write-back), PQ codes stand in for vectors inside the probed
    * cells (ADC scoring, no vector IO), and the exact re-rank
    * shortlist touches original vectors only through a bounded
    * pushdown filter. Everything driver-trained and literal-inlined:
    * the whole probe is join-free and exchange-free below the TopK.
    *
    * With nprobe = numCells and rerank ≥ corpus the result provably
    * equals brute force (spec-pinned).
    */
  def searchTopKIvf(
      emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, numCells: Int, nprobe: Int,
      m: Int, ksub: Int, iters: Int = 3, rerank: Int = 0,
      maxTrainRows: Int = 100000): DataFrame = {
    val sample = Ivf.hashSample(emb, vecCol, idCol, maxTrainRows)
    val coarse = Ivf.trainOnSample(sample, numCells, iters)
    val centPairs = coarse.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    val books = trainCodebooksOnSample(sample, m, ksub, iters)
    val q = collectQuery(emb, vecCol, idCol, queryId)
    val (dotTab, nrm2Tab, qNorm) = adcTables(q, books)
    val probeCells: Seq[Long] = Ivf.probeCells(q, centPairs, nprobe)
    val indexed = Clustering.assignToCentroidArrays(
      emb.select(col(idCol), col(vecCol)), vecCol, idCol, centPairs)
    val topAdc = encode(indexed, vecCol, books)
      .where(col("cell").isin(probeCells: _*))
      .where(col(idCol) =!= lit(queryId))
      .withColumn("adc_sim", graft.functions.PqExpressions.pqAdcScore(
        col("codes"), dotTab, nrm2Tab, qNorm))
      .where(col("adc_sim").isNotNull)
      .select(col(idCol), col("adc_sim"))
      .orderBy(col("adc_sim").desc, col(idCol))
      .limit(math.max(k, rerank))
    rerankStage(emb, vecCol, idCol, topAdc, q, k, rerank)
  }
}
