package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Round-16 closure work: pointer-jump connected components
  * (O(log diameter) rounds — the round-11 verdict's high-diameter
  * scale cliff), checkpoint-file hygiene, and the server-bootstrap
  * checkpoint dir.
  */
class Round16Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def ckptRddDirs(): Set[String] =
    spark.sparkContext.getCheckpointDir.toSet.flatMap { (d: String) =>
      val path = new org.apache.hadoop.fs.Path(d)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path))
        fs.listStatus(path).map(_.getPath.getName)
          .filter(_.startsWith("rdd-")).toSet
      else Set.empty[String]
    }

  test("500-long chain converges in O(log diameter) rounds with exact min-id labels") {
    import spark.implicits._
    // the real shape of incremental-edit dup graphs: doc_i ~ doc_{i+1}
    // with no shortcut edges — diameter 499. Plain hash-min needed
    // O(diameter) rounds and hard-failed its 50-round cap AFTER
    // burning the closure cost; pointer jumping converges in
    // ~log2(500) rounds.
    val edges = (0L until 499L).map(i => (i, i + 1)).toDF("id_a", "id_b").cache()
    try {
      val (labels, rounds) = Dedup.distributedComponentsWithRounds(
        edges, maxIter = 50, localRowLimit = 10)
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rounds <= 12, s"expected O(log n) convergence, took $rounds rounds")
      assert(got.size == 500)
      assert(got.values.forall(_ == 0L),
        s"all chain members must label to the min id 0: ${got.filter(_._2 != 0L).take(5)}")
    } finally edges.unpersist()
  }

  test("pointer-jump labelling == driver union-find on a random multi-component graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(16)
    // several components of mixed shapes: chains, triangles, stars
    val raw = (1 to 400).map { _ =>
      val comp = rnd.nextInt(8) * 1000L
      (comp + rnd.nextInt(60), comp + rnd.nextInt(60))
    }.filter { case (a, b) => a != b }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    raw.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(v => v -> find(v)).toMap
    val edges = raw.toDF("id_a", "id_b").cache()
    try {
      val (labels, _) = Dedup.distributedComponentsWithRounds(
        edges, maxIter = 50, localRowLimit = 100000)
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally edges.unpersist()
  }

  test("closure checkpoint files are deleted when the labelling localizes") {
    import spark.implicits._
    // a checkpoint dir exists in the server path by construction
    // (SessionManager bootstrap — verdict r11 item #4)
    val mgr = new graft.engine.SessionManager(spark)
    try {
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val before = ckptRddDirs()
      // 5000-long chain: ~13 rounds, so the iter%8 lineage cut takes
      // the RELIABLE checkpoint path at least once (rounds >= 9
      // asserted below so this can't go vacuous)
      val edges = (0L until 4999L).map(i => (i, i + 1)).toDF("id_a", "id_b").cache()
      try {
        val (labels, rounds) = Dedup.distributedComponentsWithRounds(
          edges, maxIter = 50, localRowLimit = 100000)
        assert(labels.collect().length == 5000)
        assert(rounds >= 9 && rounds <= 16, s"rounds=$rounds")
      } finally edges.unpersist()
      val after = ckptRddDirs()
      assert((after -- before).isEmpty,
        s"closure leaked checkpoint files: ${after -- before}")
    } finally mgr.shutdown()
  }

  test("SessionManager bootstrap defaults a checkpoint dir (reliable-cut path by construction)") {
    val mgr = new graft.engine.SessionManager(spark)
    try assert(spark.sparkContext.getCheckpointDir.isDefined,
      "server bootstrap must leave the context with a checkpoint dir")
    finally mgr.shutdown()
  }

  test("audioCurationRun reconciles with its published stages (m16 gate + m21/m22 clusters)") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    val rnd = new scala.util.Random(24)
    def txt(n: Int) = (1 to n).map(_ => ('!' + rnd.nextInt(90)).toChar).mkString
    val base = txt(100)
    val docs = (
      (1L to 15L).map(i => (i, txt(60 + rnd.nextInt(80)), s"s${i % 3}")) :+
        (21L, base, "s0") :+ (22L, base, "s1") :+ // exact dup pair
        (31L, (" " * 50) + "abc", "s2") // silence-gated (sr ~0.94)
    ).toDF("doc_id", "text", "source").repartition(3)
    val media = Multimodal.textAsWav(docs, "doc_id", "text")
    val meta = docs.select(col("doc_id").as("sample_id"), col("source"))
    val out = Multimodal.audioCurationRun(media, meta, tau = 0.125,
      maxSilenceRatio = 0.19, minDynRange = 3000L).collect()

    // the published stages, composed independently
    val q = Multimodal.audioQualityReport(media)
    val passIds = q.where(col("silence_ratio") <= 0.19 &&
        col("dyn_range") >= 3000L)
      .collect().map(_.getLong(0)).toSet
    assert(!passIds.contains(31L) && passIds.size == 17)
    val survivors = docs.where(col("doc_id").isInCollection(passIds))
    val survMedia = Multimodal.textAsWav(survivors, "doc_id", "text")
    val pairs = Multimodal.audioFingerprintDupPairs(survMedia).collect()
    val clusters = Multimodal.audioDupClusters(survMedia)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupDropped = clusters.filter { case (id, rep) => id != rep }.keySet
    val srcOf = docs.collect().map(r => r.getLong(0) -> r.getString(2)).toMap

    val kept = out.filter(_.getString(0) == "kept")
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(kept.keySet == passIds -- dupDropped)
    assert(kept.forall { case (id, src) => srcOf(id) == src })
    assert(dupDropped.contains(22L) && kept.contains(21L),
      "exact dup must keep the min id")
    val counts = out.filter(r => !r.getString(0).startsWith("kept"))
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(counts("input") == 18L)
    assert(counts("quality_fail") == 1L)
    assert(counts("pairs") == pairs.length.toLong)
    assert(counts("clusters") == clusters.values.toSet.size.toLong)
    assert(counts("dup_dropped") == dupDropped.size.toLong)
    val bySrc = out.filter(_.getString(0) == "kept_source")
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(bySrc == kept.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
  }

  test("centroid assignment dispatches on k: broadcast shape == literal shape; k=5000 runs without plan blowup") {
    import spark.implicits._
    import graft.pipeline.Clustering
    val rnd = new scala.util.Random(12)
    val emb = (1L to 200L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding").repartition(4)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      java.lang.Double.doubleToLongBits(r.getDouble(2)))
    // the two shapes must agree bit-for-bit (sim included) — same
    // cosine expression, same struct-ordering argmax
    val cents = (0L until 8L).map(c =>
      (c, Array.fill(8)(rnd.nextDouble() * 2 - 1))).toSeq
    val viaLit = Clustering.assignViaLiterals(emb, "embedding", "vec_id", cents)
    val viaBc = Clustering.assignViaBroadcastJoin(emb, "embedding", "vec_id", cents)
    assert(viaBc.columns.toSeq == viaLit.columns.toSeq)
    assert(viaBc.select(col("vec_id"), col("cell"), col("sim")).collect().map(key).sortBy(_._1).toSeq ==
      viaLit.select(col("vec_id"), col("cell"), col("sim")).collect().map(key).sortBy(_._1).toSeq)
    // k=5000 through the PUBLIC dispatch: the literal spelling would
    // inline 40k doubles into one projection; the broadcast shape must
    // run with an O(1)-in-k plan and pick the true nearest cell
    val big = (0L until 5000L).map(c =>
      (c, Array.fill(8)(rnd.nextDouble() * 2 - 1))).toSeq
    val got = Clustering.assignToCentroidArrays(emb, "embedding", "vec_id", big)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200)
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = vecs.map { case (id, v) =>
      id -> big.map { case (c, cv) => (cos(v, cv), c) }
        .maxBy { case (s, c) => (s, -c) }._2
    }
    assert(got == want)
  }

  test("imageCurationRun reconciles with its published stages (phash gate + m23 clusters)") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    val rnd = new scala.util.Random(25)
    def txt(n: Int) = (1 to n).map(_ => ('!' + rnd.nextInt(90)).toChar).mkString
    val base = txt(120)
    val docs = (
      (1L to 12L).map(i => (i, txt(80 + rnd.nextInt(60)), s"s${i % 3}")) :+
        (21L, base, "s0") :+ (22L, base, "s1") // exact dup pair
    ).toDF("doc_id", "text", "source").repartition(3)
    val media = Multimodal.textAsBmp(docs, "doc_id", "text", width = 10)
    val meta = docs.select(col("doc_id").as("sample_id"), col("source"))
    // pick a mean gate from the data so both branches populate
    val hashes = Multimodal.perceptualHash(media).toDF()
    val means = hashes.select(col("sample_id"), col("sample_mean")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cut = means.values.toSeq.sorted.apply(2) // 3rd smallest: gate fails 1-2 (mean ties collapse)
    val out = Multimodal.imageCurationRun(media, meta,
      maxHamming = 3, minSetBits = 1L, minMean = cut).collect()
    val passIds = means.filter { case (id, m) => m >= cut }.keySet
    val gatedHashes = hashes.where(col("sample_mean") >= cut)
    val pairs = Multimodal.phashDupPairs(gatedHashes, maxHamming = 3).collect()
    val clusters = Multimodal.phashDupClusters(gatedHashes, maxHamming = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupDropped = clusters.filter { case (id, rep) => id != rep }.keySet
    val kept = out.filter(_.getString(0) == "kept")
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(kept.keySet == passIds -- dupDropped)
    val counts = out.filter(r => !r.getString(0).startsWith("kept"))
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(counts("input") == 14L)
    assert(counts("quality_fail") == (14L - passIds.size))
    assert(counts("quality_fail") >= 1L)
    assert(counts("pairs") == pairs.length.toLong)
    assert(counts("clusters") == clusters.values.toSet.size.toLong)
    assert(counts("dup_dropped") == dupDropped.size.toLong)
    val bySrc = out.filter(_.getString(0) == "kept_source")
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(bySrc == kept.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
  }

  test("rebuildDecision reconciles with the drift report and flips on both thresholds") {
    import spark.implicits._
    import graft.pipeline.Clustering
    val rnd = new scala.util.Random(35)
    val emb = (1L to 90L).map(i => (i, Array.fill(6)(rnd.nextFloat())))
      .toDF("vec_id", "embedding").repartition(3)
    val old = emb.where(col("vec_id") % 3 =!= 0)
    val nw = emb.where(col("vec_id") % 3 === 0)
    val drift = Clustering.cellDriftReport(old, nw, "embedding", "vec_id", 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(6))).toSeq
    val nTotal = drift.map(t => t._1 + t._2).sum
    val nNew = drift.map(_._2).sum
    val imb = drift.head._3
    val r1 = Clustering.rebuildDecision(old, nw, "embedding", "vec_id", 4,
      maxImbalance = 100.0, maxNewFrac = 0.9).collect().head
    assert(r1.getAs[Long]("n_total") == nTotal)
    assert(r1.getAs[Double]("new_frac") == nNew.toDouble / nTotal)
    assert(r1.getAs[Double]("imbalance_after") == imb)
    assert(r1.getAs[Long]("rebuild") == 0L, s"$r1")
    // new mass is a third of the corpus -> the new-frac threshold fires
    val r2 = Clustering.rebuildDecision(old, nw, "embedding", "vec_id", 4,
      maxImbalance = 100.0, maxNewFrac = 0.3).collect().head
    assert(r2.getAs[Long]("rebuild") == 1L)
    // any real cell histogram has imbalance > 1.0 -> the imbalance
    // threshold fires on its own
    val r3 = Clustering.rebuildDecision(old, nw, "embedding", "vec_id", 4,
      maxImbalance = 1.0, maxNewFrac = 0.9).collect().head
    assert(if (imb > 1.0) r3.getAs[Long]("rebuild") == 1L
           else r3.getAs[Long]("rebuild") == 0L)
  }

  test("qualityDedupReport reconciles with quality scores + union-find drops") {
    import spark.implicits._
    import graft.pipeline.{Dedup, TextAnalysis}
    val rnd = new scala.util.Random(57)
    val words = Seq("the", "and", "of", "data", "spark", "pipeline", "quality",
      "tokens", "cluster", "sample", "metric", "report")
    def txt() = (1 to 20 + rnd.nextInt(60)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    val base = txt()
    val docs = ((1L to 37L).map(i => (i, txt())) :+ (41L, base) :+ (42L, base) :+ (43L, base))
      .toDF("doc_id", "text").repartition(3)
    val out = Dedup.qualityDedupReport(docs, "text", "doc_id", bins = 4,
      n = 3, threshold = 0.3, maxPostings = None)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // independent composition: scores + closure drops + manual buckets
    val q = docs.select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.3, None)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val px = parent.getOrElseUpdate(x, x)
      if (px == x) x else { val r = find(px); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val losers = parent.keys.filter(v => find(v) != v).toSet
    assert(losers.nonEmpty, "planted dups must drop")
    val ordered = q.sortBy { case (id, sc) => (sc, id) }
    val n = ordered.length
    // NTILE semantics: first (n % bins) buckets get one extra row
    val bins = 4
    val sizes = (1 to bins).map(b => n / bins + (if (b <= n % bins) 1 else 0))
    var idx = 0
    sizes.zipWithIndex.foreach { case (sz, bi) =>
      val slice = ordered.slice(idx, idx + sz); idx += sz
      val (nd, nq) = (slice.count(t => losers(t._1)).toLong, slice.length.toLong)
      val (gotN, gotD, gotF) = out(bi + 1L)
      assert(gotN == nq && gotD == nd, s"bin ${bi + 1}: got ($gotN,$gotD) want ($nq,$nd)")
      assert(gotF == nd.toDouble / nq)
    }
  }

  test("corpusReleaseRun reconciles with its published stages and counts sum to input") {
    import spark.implicits._
    import graft.pipeline.{CorpusRelease, Decontaminate, Dedup, TextAnalysis}
    val rnd = new scala.util.Random(58)
    val words = Seq("the", "and", "of", "data", "spark", "query", "token",
      "batch", "join", "scan", "merge", "row")
    def txt() = (1 to 15 + rnd.nextInt(40)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    val dupBase = txt()
    val benchText = txt()
    val docs = (
      (1L to 30L).map(i => (i, txt(), s"s${i % 3}")) :+
        (41L, dupBase, "s0") :+ (42L, dupBase, "s1") :+ // near-dup pair
        (51L, benchText, "s2") :+ // contaminated: verbatim benchmark copy
        (61L, "x", "s0") // low quality (1 token, no stopwords)
    ).toDF("doc_id", "text", "source").repartition(3)
    val bench = Seq((1000L, benchText)).toDF("doc_id", "text")
    val out = CorpusRelease.corpusReleaseRun(docs, bench, "text", "doc_id",
      "source", n = 3, tau = 0.3, minHits = 2L, minQuality = 0.4,
      maxPostings = None).collect()
    // published stages, composed independently
    val losers = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.3, None)
          .select(col("id_a"), col("id_b")))
      .where(col("id") =!= col("component"))
      .collect().map(_.getLong(0)).toSet
    val contam = Decontaminate.contaminationCounts(docs, bench, "text", "doc_id", 3)
      .where(col("n_hits") >= 2L).collect().map(_.getLong(0)).toSet
    val q = docs.select(col("doc_id"), col("source"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("q"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val wantKept = q.keySet
      .filterNot(losers).filterNot(contam).filter(id => q(id)._2 >= 0.4)
    val kept = out.filter(_.getString(0) == "kept").map(_.getLong(1)).toSet
    assert(kept == wantKept)
    assert(losers.contains(42L) && kept.contains(41L))
    assert(contam.contains(51L) && !kept.contains(51L))
    assert(!kept.contains(61L), "1-token doc must fail the quality gate")
    val counts = out.filter(r => !r.getString(0).startsWith("kept"))
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(counts("input") == 34L)
    assert(counts("dedup_dropped") == losers.size.toLong)
    assert(counts("contam_dropped") == (contam -- losers).size.toLong)
    assert(counts("input") == counts("dedup_dropped") + counts("contam_dropped") +
      counts("quality_dropped") + kept.size,
      s"stage counts must sum to input: $counts kept=${kept.size}")
    val bySrc = out.filter(_.getString(0) == "kept_source")
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(bySrc == wantKept.groupBy(id => q(id)._1).view.mapValues(_.size.toLong).toMap)
  }

  test("clusterFidelityReport: a chain cluster reports density < 1, a clique reports 1") {
    import spark.implicits._
    import graft.pipeline.Dedup
    // chain: A~B and B~C qualify, A~C does not (transitive closure
    // glues all three) — the exact over-merge shape the audit exposes
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "alpha beta gamma delta epsilon zeta iota kappa" // j(a,b)=4/8
    val c = "mu nu gamma delta epsilon zeta iota kappa"      // j(b,c)=4/8, j(a,c)=2/10<0.3
    val d1 = "one two three four five six seven"
    val d2 = "one two three four five six seven"           // exact dup of d1
    val docs = Seq((1L, a), (2L, b), (3L, c), (10L, d1), (11L, d2), (20L, "unrelated text entirely"))
      .toDF("doc_id", "text").repartition(2)
    val got = Dedup.clusterFidelityReport(docs, "text", "doc_id",
        n = 3, threshold = 0.3, maxPostings = None)
      .collect().map(r => r.getLong(0) -> r).toMap
    // independent pair ground truth
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.3, None)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toMap
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)) &&
      !pairs.contains((1L, 3L)), s"chain construction broke: ${pairs.keys}")
    val chain = got(1L)
    assert(chain.getAs[Long]("cluster_size") == 3L)
    assert(chain.getAs[Long]("n_pairs") == 2L)
    assert(chain.getAs[Long]("n_possible") == 3L)
    assert(chain.getAs[Double]("density") == 2.0 / 3.0)
    val clique = got(10L)
    assert(clique.getAs[Long]("cluster_size") == 2L &&
      clique.getAs[Double]("density") == 1.0 &&
      clique.getAs[Double]("min_jaccard") == 1.0)
    assert(!got.contains(20L), "singletons have no cluster row")
    // mean over the chain's two pairs matches the decimal mean
    val want = (pairs((1L, 2L)) + pairs((2L, 3L))) / 2
    assert(math.abs(chain.getAs[Double]("mean_jaccard") - want.toDouble) < 1e-12)
  }

  test("contaminationAttribution picks the max-share benchmark doc, ties to the smaller id") {
    import spark.implicits._
    import graft.pipeline.Decontaminate
    val bench = Seq(
      (100L, "red green blue yellow purple orange pink"),
      (200L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    val train = Seq(
      // shares 2 shingles with 100, 5 with 200 -> attributed to 200
      (1L, "red green blue yellow one two three four five six seven"),
      // shares with 100 only
      (2L, "red green blue yellow purple something else here"),
      // 1 shared shingle -> below minHits, absent
      (3L, "one two three unrelated words follow now"),
      // no overlap
      (4L, "completely different content nothing shared at all")
    ).toDF("doc_id", "text").repartition(2)
    val got = Decontaminate.contaminationAttribution(train, bench,
        "text", "doc_id", n = 3, minHits = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(1L, 2L), s"$got")
    assert(got(1L)._1 == 200L, s"doc 1 must attribute to bench 200: ${got(1L)}")
    assert(got(2L)._1 == 100L)
    // exact counts: doc 1 shares "red green blue"/"green blue yellow"
    // with 100 and five 3-shingles of the 1..7 run with 200
    assert(got(1L)._2 == 5L && got(1L)._3 == 7L, s"${got(1L)}")
  }

  test("splitLeakageBySource flags exactly the val docs with a train near-dup") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val rnd = new scala.util.Random(60)
    val words = Seq("the", "and", "of", "alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta", "iota")
    def txt() = (1 to 25 + rnd.nextInt(30)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    val leakText = txt()
    val train = ((1L to 20L).map(i => (i, txt(), s"s${i % 2}")) :+
      (31L, leakText, "s0")).toDF("doc_id", "text", "source")
    val valSplit = Seq(
      (101L, leakText, "s0"), // verbatim leak
      (102L, txt(), "s0"),
      (103L, txt(), "s1")).toDF("doc_id", "text", "source")
    val got = Dedup.splitLeakageBySource(train, valSplit, "text", "doc_id",
        "source", n = 3, tau = 0.3, maxCorpusPostings = None)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // independent: which val docs have a train pair at >= tau
    val leaked = Dedup.incrementalNearDupPairs(valSplit, train, "text",
        "doc_id", 3, 0.3, None)
      .select(col("new_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(leaked.contains(101L))
    val bySrc = valSplit.collect().map(r => (r.getLong(0), r.getString(2)))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    bySrc.foreach { case (src, ids) =>
      val (nv, nl, frac) = got(src)
      assert(nv == ids.length.toLong)
      assert(nl == ids.count(leaked).toLong, s"$src: $got vs leaked=$leaked")
      assert(frac == nl.toDouble / nv)
    }
  }

  test("videoDupPairs: containment catches the extended copy; the hot-frame cap bounds fan-out") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    val rnd = new scala.util.Random(26)
    def txt(n: Int) = (1 to n).map(_ => ('!' + rnd.nextInt(90)).toChar).mkString
    val base = txt(100) // 10 frames
    val docs = (
      (1L to 10L).map(i => (i, txt(80 + rnd.nextInt(40)))) :+
        (21L, base) :+ (22L, base + "xyzabcdefe") // extended copy: 10 of 11 frames shared
    ).toDF("doc_id", "text").repartition(2)
    val hashes = Multimodal.framePerceptualHash(
      Multimodal.textAsAvi(docs, "doc_id", "text")).toDF()
    val got = Multimodal.videoDupPairs(hashes, minContainment = 0.8,
        maxPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got.contains((21L, 22L)), s"extended copy must pair: $got")
    assert(got((21L, 22L)) >= 0.9, s"${got((21L, 22L))}")
    // brute-force ground truth over distinct frame-hash sets
    val sets = hashes.select(col("sample_id"), col("ahash_hi"), col("ahash_lo"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      c = (sets(a) & sets(b)).size.toDouble / math.min(sets(a).size, sets(b).size)
      if c >= 0.8
    } yield (a, b) -> c).toMap
    assert(got == want)
    // a cap of 1 drops every shared frame hash (each shared hash is in
    // >= 2 videos) -> no pairs survive, and nothing blows up
    val capped = Multimodal.videoDupPairs(hashes, minContainment = 0.8,
      maxPostings = Some(1)).collect()
    assert(capped.isEmpty)
  }
}
