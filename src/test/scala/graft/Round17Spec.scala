package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Clustering, Dedup, Sampling, TextAnalysis}

/** Round-17 operators: water-filling budget allocation (t61),
  * tokenizer fertility by language (t62), keep-best dedup (d37), and
  * the one-step Lloyd centroid refresh (s36).
  */
class Round17Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def docsDf = {
    import spark.implicits._
    // three "sources" with very different supply so saturation is real:
    // tiny has 2 docs x 3 tokens; big has 40 docs x 12 tokens
    val tiny = (0 until 2).map(i => (i.toLong, "tiny", "a b c"))
    val mid = (0 until 10).map(i => (100L + i, "mid",
      Seq.fill(6)("w" + i).mkString(" ")))
    val big = (0 until 40).map(i => (200L + i, "big",
      Seq.fill(12)("x" + i).mkString(" ")))
    (tiny ++ mid ++ big).toDF("doc_id", "source", "text")
  }

  // ---------------- t61 water-filling allocation ----------------

  test("budgetAllocation conserves the budget and caps every source at its supply") {
    val out = Sampling.budgetAllocation(docsDf, "source", "text",
      budget = 300L, alpha = 0.5).collect()
    assert(out.length == 3)
    val bySrc = out.map(r => r.getString(0) -> r).toMap
    val avail = bySrc.view.mapValues(_.getLong(2)).toMap
    assert(avail == Map("tiny" -> 6L, "mid" -> 60L, "big" -> 480L))
    val alloc = bySrc.view.mapValues(_.getDouble(5)).toMap
    // nobody over-allocated
    alloc.foreach { case (s, a) =>
      assert(a <= avail(s) + 1e-6, s"$s allocated $a > supply ${avail(s)}")
    }
    // budget fully spent (supply 546 > budget 300)
    assert(math.abs(alloc.values.sum - 300.0) < 1e-4,
      s"allocations ${alloc.values.sum} must sum to the budget")
    // tiny (ratio 4.24) and mid (ratio 18.97 < the 294/9.49 = 31.0
    // level after tiny saturates) both saturate; big takes the rest
    assert(bySrc("tiny").getLong(4) == 1L && alloc("tiny") == 6.0)
    assert(bySrc("mid").getLong(4) == 1L && alloc("mid") == 60.0)
    assert(bySrc("big").getLong(4) == 0L)
    assert(math.abs(alloc("big") - 234.0) < 1e-6,
      s"big absorbs the leftover budget: ${alloc("big")}")
  }

  test("budgetAllocation degenerate ends: B over supply saturates all; B tiny saturates none") {
    val all = Sampling.budgetAllocation(docsDf, "source", "text",
      budget = 100000L, alpha = 0.5).collect()
    all.foreach { r =>
      assert(r.getLong(4) == 1L)
      assert(r.getDouble(5) == r.getLong(2).toDouble, "alloc == supply when B covers everything")
      assert(r.getDouble(6) == 1.0)
    }
    val none = Sampling.budgetAllocation(docsDf, "source", "text",
      budget = 10L, alpha = 0.5).collect()
    assert(none.forall(_.getLong(4) == 0L))
    val sum = none.map(_.getDouble(5)).sum
    assert(math.abs(sum - 10.0) < 1e-6, s"tiny budget still fully allocated: $sum")
    // pure proportional split: alloc ∝ sqrt(n_docs)
    val w = none.map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(math.abs(w("mid") / w("tiny") - math.sqrt(10.0 / 2.0)) < 1e-6)
  }

  test("budgetAllocation matches a driver-side water-filling reference on the sf corpus") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val out = Sampling.budgetAllocation(docs, "source", "text",
        budget = 9000L, alpha = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getDouble(5))).sortBy(_._1)
    // reference: iterate saturation to a fixpoint (the textbook loop
    // the sort-based closed form replaces)
    val base = out.map(t => (t._1, t._2, t._3)).toSeq
    var satRef = Set.empty[String]
    var changed = true
    while (changed) {
      val rem = 9000.0 - base.filter(t => satRef(t._1)).map(_._3.toDouble).sum
      val wRem = base.filter(t => !satRef(t._1)).map(t => math.sqrt(t._2.toDouble)).sum
      val next = base.filter { t =>
        !satRef(t._1) && math.sqrt(t._2.toDouble) * rem / wRem >= t._3.toDouble
      }.map(_._1).toSet
      changed = next.nonEmpty
      satRef ++= next
    }
    val remF = 9000.0 - base.filter(t => satRef(t._1)).map(_._3.toDouble).sum
    val wF = base.filter(t => !satRef(t._1)).map(t => math.sqrt(t._2.toDouble)).sum
    out.foreach { case (s, n, a, satGot, allocGot) =>
      assert((satGot == 1L) == satRef(s), s"saturation flag mismatch for $s")
      val expect = if (satRef(s)) a.toDouble else math.sqrt(n.toDouble) * remF / wF
      assert(math.abs(allocGot - expect) < 1e-4,
        s"$s: got $allocGot expected $expect")
    }
  }

  // ---------------- t62 fertility by language ----------------

  test("tokenizerFertilityByLang reconciles with per-doc encode x langid") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val merges = TextAnalysis.bpeMerges(docs, "text", k = 8)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextAnalysis.tokenizerFertilityByLang(docs, "text", merges)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val perDoc = TextAnalysis.withLanguageId(docs, "text")
      .select(col("doc_id"), col("lang_pred"))
      .join(TextAnalysis.bpeEncode(docs, "text", "doc_id", merges),
        Seq("doc_id"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("t"), sum("n_az_chars").as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == perDoc)
    assert(got.values.map(_._1).sum == docs.count())
  }

  test("tokenizerFertilityByLang fertility column is the rounded ratio, null at zero tokens") {
    import spark.implicits._
    // one doc with no [a-z] at all -> zero tokens for its language
    val docs = Seq((1L, "the and of the and"), (2L, "123 456 !!!"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenizerFertilityByLang(docs, "text",
        Seq(("t", "h"), ("th", "e")))
      .collect().map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(out.contains("en") && !out("en"), "english row carries a fertility")
    assert(out.contains("unknown") && out("unknown"),
      "token-free language reports null fertility")
  }

  // ---------------- d37 keep-best dedup ----------------

  test("dedupedCorpusKeepBest keeps the max-quality member per cluster, min id on ties") {
    import spark.implicits._
    // two mirrored docs: same token stream => same cluster; the longer
    // doc (more tokens) scores higher under t02's length term
    val hi = (1 to 60).map(i => "tok" + (i % 20)).mkString(" ")
    val lo = (1 to 24).map(i => "tok" + (i % 20)).mkString(" ")
    val docs = Seq(
      (10L, "a", lo), (11L, "a", hi), // near-dups (shared 3-gram sets), hi wins
      (30L, "b", "completely different words entirely here")
    ).toDF("doc_id", "source", "text")
    val kept = Dedup.dedupedCorpusKeepBest(docs, "text", "doc_id", "source",
        n = 3, threshold = 0.1, maxPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(kept.contains(11L), "higher-quality member kept, not the min id")
    assert(!kept.contains(10L))
    assert(kept(11L) == 2L, "cluster_size rides the kept row")
    assert(kept(30L) == 1L, "singleton kept with size 1")
    // ties: identical text -> identical quality -> min id wins
    val tied = Seq((5L, "a", hi), (6L, "a", hi)).toDF("doc_id", "source", "text")
    val keptTied = Dedup.dedupedCorpusKeepBest(tied, "text", "doc_id", "source",
        n = 3, threshold = 0.1, maxPostings = None)
      .collect().map(_.getLong(0)).toSet
    assert(keptTied == Set(5L))
  }

  test("dedupedCorpusKeepBest keeps exactly one member per cluster (same cardinality as d11)") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val keepBest = Dedup.dedupedCorpusKeepBest(docs, "text", "doc_id", "source",
      n = 3, threshold = 0.3, maxPostings = None)
    val minId = Dedup.dedupedCorpus(docs, "text", "doc_id",
      n = 3, threshold = 0.3, maxPostings = None)
    assert(keepBest.count() == minId.count(),
      "both policies keep one representative per cluster plus singletons")
    // every kept row's quality must equal the max over its cluster —
    // spot-check via the t57 report's closure: total kept == docs - losers
    assert(keepBest.select(sum(col("cluster_size"))).collect()(0).getLong(0) ==
      docs.count(), "cluster sizes partition the corpus")
  }

  // ---------------- s36 centroid refresh ----------------

  test("centroidRefresh matches a driver-side exact Lloyd step") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val got = Clustering.centroidRefresh(emb, "embedding", "vec_id", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // reference: pull all vectors, assign by cosine (ties min cell),
    // per-dim mean over round-6 values via BigDecimal, L2 to old
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cents = vecs.toSeq.sortBy(_._1).take(8)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val assign = vecs.map { case (id, v) =>
      id -> cents.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }._1
    }
    def r6(d: Double): BigDecimal = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    got.foreach { case (cell, (n, movement)) =>
      val members = vecs.filter { case (id, _) => assign(id) == cell }.values.toSeq
      assert(n == members.size.toLong, s"cell $cell member count")
      val dims = members.head.length
      val oldV = cents.find(_._1 == cell).get._2
      val sq = (0 until dims).map { i =>
        val m = (members.map(v => r6(v(i))).sum / members.size).toDouble
        val d = m - r6(oldV(i)).toDouble
        BigDecimal(d * d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val expect = BigDecimal(math.sqrt(sq.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(movement - expect) < 1e-9,
        s"cell $cell movement $movement vs $expect")
    }
    assert(got.values.map(_._1).sum == vecs.size.toLong,
      "members partition the corpus")
  }

  // ---------------- m27 video curation run ----------------

  test("videoCurationRun: gate, cap, pairs, closure and rollups on a planted fixture") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    // hash ids: A=1 B=2 C=3 D=4 X=8 Y=9 P=11 Q=12 R=13, boilerplate W=99
    // video 1 {A,B,C,D,W}, video 2 {A,B,C,W} (contained in 1),
    // video 3 {X,Y} under-indexed, video 4 {P,Q,R,W} independent
    def f(id: Long, hs: Seq[Long]) =
      hs.zipWithIndex.map { case (h, i) => (id, i, h, h * 7L) }
    val frames = (f(1L, Seq(1, 2, 3, 4, 99)) ++ f(2L, Seq(1, 2, 3, 99)) ++
      f(3L, Seq(8, 9)) ++ f(4L, Seq(11, 12, 13, 99)))
      .toDF("sample_id", "frame_idx", "ahash_hi", "ahash_lo")
    val meta = Seq((1L, "sa"), (2L, "sa"), (3L, "sb"), (4L, "sb"))
      .toDF("sample_id", "source")
    // cap 2: W rides 3 videos -> dropped from the index entirely
    val out = Multimodal.videoCurationRun(frames, meta,
        minContainment = 0.8, minFrames = 3, maxPostings = Some(2))
      .collect()
    val counts = out.filter(r => r.getString(0) != "kept" &&
        r.getString(0) != "kept_source")
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(counts == Map("input" -> 4L, "underindexed_dropped" -> 1L,
      "pairs" -> 1L, "clusters" -> 1L, "dup_dropped" -> 1L))
    val kept = out.filter(_.getString(0) == "kept")
      .map(r => (r.getLong(1), r.getString(2))).toSet
    assert(kept == Set((1L, "sa"), (4L, "sb")),
      s"video 2 collapses into 1, video 3 under-indexed: $kept")
    val bySrc = out.filter(_.getString(0) == "kept_source")
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(bySrc == Map("sa" -> 1L, "sb" -> 1L))
    // stage accounting partitions the input
    assert(kept.size + counts("underindexed_dropped") + counts("dup_dropped") ==
      counts("input"))
  }

  test("videoCurationRun kept set == participants minus videoDupPairs closure losers") {
    import graft.pipeline.Multimodal
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
      .where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .limit(60)
    val un = docs.select(col("doc_id"), col("source"), col("text"))
      .unionByName(docs.select((col("doc_id") + 100000).as("doc_id"),
        col("source"), concat(col("text"), lit("x")).as("text")))
    val fh = Multimodal.framePerceptualHash(
      Multimodal.textAsAvi(un, "doc_id", "text")).toDF().cache()
    try {
      val run = Multimodal.videoCurationRun(fh,
        un.select(col("doc_id"), col("source")),
        minContainment = 0.8, minFrames = 3, maxPostings = Some(100),
        metaIdCol = "doc_id")
      val keptGot = run.where(col("stage") === "kept")
        .select(col("sample_id")).collect().map(_.getLong(0)).toSet
      // independent composition: the published pair operator + closure
      val pairs = Multimodal.videoDupPairs(fh, minContainment = 0.8,
        minFrames = 3, maxPostings = Some(100))
      val losers = Dedup.connectedComponents(
          pairs.select(col("id_a"), col("id_b")))
        .where(col("id") =!= col("component"))
        .collect().map(_.getLong(0)).toSet
      val participants = fh
        .select(col("sample_id").cast("long").as("id"),
          col("ahash_hi"), col("ahash_lo")).distinct()
        .join(fh.select(col("sample_id").cast("long").as("id"),
            col("ahash_hi"), col("ahash_lo")).distinct()
          .groupBy("ahash_hi", "ahash_lo").count()
          .where(col("count") <= 100).drop("count"),
          Seq("ahash_hi", "ahash_lo"))
        .groupBy(col("id")).count().where(col("count") >= 3)
        .collect().map(_.getLong(0)).toSet
      assert(keptGot == participants -- losers)
      assert(keptGot.nonEmpty)
    } finally fh.unpersist()
  }

  // ---------------- t63 split leakage repair ----------------

  test("repairLeakedSplit moves exactly the leaked val docs, train rows untouched") {
    import spark.implicits._
    val shared = (1 to 40).map(i => "tok" + (i % 25)).mkString(" ")
    val train = Seq((1L, "a", shared), (2L, "a", "unrelated train words here entirely"))
      .toDF("doc_id", "source", "text")
    val valS = Seq(
      (10L, "a", shared), // near-dup of train doc 1 -> moves
      (11L, "b", "totally disjoint val content nothing shared anywhere")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.repairLeakedSplit(train, valS, "text", "doc_id", "source",
        n = 3, tau = 0.3, maxCorpusPostings = None)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(out.size == 4)
    assert(out(1L) == ("train", 0L) && out(2L) == ("train", 0L))
    assert(out(10L) == ("train", 1L), "leaked val doc moves to train")
    assert(out(11L) == ("val", 0L), "clean val doc stays")
  }

  test("repairLeakedSplit moved counts reconcile with splitLeakageBySource") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val train = docs.where(col("doc_id") % 7 =!= 0)
    val valS = docs.where(col("doc_id") % 7 === 0)
    val movedBySrc = Dedup.repairLeakedSplit(train, valS, "text", "doc_id",
        "source", maxCorpusPostings = None)
      .where(col("moved") === 1L)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val audit = Dedup.splitLeakageBySource(train, valS, "text", "doc_id",
        "source", maxCorpusPostings = None)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(audit.filter(_._2 > 0L) == movedBySrc,
      "the repair moves exactly the docs the audit counts as leaked")
  }

  // ---------------- s37 PQ cell distortion ----------------

  test("cellDistortionReport matches a driver-side assignment x PQ-error reference") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val got = graft.pipeline.Pq.cellDistortionReport(emb, "embedding",
        "vec_id", k = 8, m = 8, ksub = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cents = vecs.toSeq.sortBy(_._1).take(8)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val books = vecs.toSeq.sortBy(_._1).take(16).map(_._2) // 16 seed vectors
    def subErr(v: Array[Double], j: Int): Double =
      books.map { bv =>
        (0 until 8).map { i =>
          val d = v(j * 8 + i) - bv(j * 8 + i); d * d
        }.sum
      }.min
    def r6(d: Double): Double = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val perVec = vecs.map { case (id, v) =>
      val cell = cents.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }._1
      // left fold in subspace order, like the kernel and the oracle
      val terr = (0 until 8).foldLeft(0.0)((acc, j) => acc + subErr(v, j))
      (id, cell, r6(terr))
    }
    perVec.groupBy(_._2).foreach { case (cell, rows) =>
      val (n, mse, mx) = got(cell)
      assert(n == rows.size.toLong)
      val expMse = (rows.map(r => BigDecimal(r._3)).sum / rows.size).toDouble
      assert(math.abs(mse - expMse) < 1e-9, s"cell $cell mse $mse vs $expMse")
      assert(mx == rows.map(_._3).max)
    }
    assert(got.values.map(_._1).sum == vecs.size.toLong)
  }

  // ---------------- m28 video copy spans ----------------

  test("videoCopySpans islands split on unmatched frames and skip boilerplate") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    // video 1 frames: h1 h2 h3 | h9 (no match) | h4 h5 ; video 2 holds
    // h1..h5; boilerplate hash 99 rides many videos (over cap)
    def f(id: Long, hs: Seq[Long]) =
      hs.zipWithIndex.map { case (h, i) => (id, i, h, h * 3L) }
    val frames = (f(1L, Seq(1, 2, 3, 9, 4, 5)) ++ f(2L, Seq(1, 2, 3, 4, 5)) ++
      f(3L, Seq(99, 21, 22)) ++ f(4L, Seq(99, 31, 32)) ++ f(5L, Seq(99, 41, 42)))
      .toDF("sample_id", "frame_idx", "ahash_hi", "ahash_lo")
    val spans = Multimodal.videoCopySpans(frames, minContainment = 0.8,
        minFrames = 3, maxPostings = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(spans == Set((1L, 2L, 0L, 2L, 3L), (1L, 2L, 4L, 5L, 2L)),
      s"two islands split by the unmatched frame: $spans")
  }

  test("videoCopySpans frame totals reconcile with videoDupPairs n_shared on sf data") {
    import graft.pipeline.Multimodal
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
      .where(octet_length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .limit(60)
    val un = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit("x")).as("text")))
    val fh = Multimodal.framePerceptualHash(
      Multimodal.textAsAvi(un, "doc_id", "text")).toDF().cache()
    try {
      val spanSums = Multimodal.videoCopySpans(fh, 0.8, 3, Some(100))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(col("n_frames")).as("nf"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val pairs = Multimodal.videoDupPairs(fh, 0.8, 3, Some(100))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(pairs.nonEmpty && spanSums.keySet == pairs.keySet)
      // every pair's island frames cover at least its shared DISTINCT
      // hashes (frames can repeat a hash, so >= not ==)
      pairs.foreach { case (k, nShared) =>
        assert(spanSums(k) >= nShared,
          s"pair $k islands ${spanSums(k)} < shared hashes $nShared")
      }
    } finally fh.unpersist()
  }

  // ---------------- d38 idf-weighted Jaccard ----------------

  test("weightedJaccardPairs: boilerplate-only overlap does not pair; rare overlap does") {
    import spark.implicits._
    // a LONG boilerplate prefix rides EVERY doc: its internal
    // 3-grams have df=N -> weight ln(1)=0. Docs 1/2 additionally
    // share rare content; docs 3/4 share ONLY the boilerplate.
    val boiler = (1 to 8).map("b" + _).mkString(" ")
    val docs = Seq(
      (1L, s"$boiler rare alpha beta gamma delta"),
      (2L, s"$boiler rare alpha beta gamma epsilon"),
      (3L, s"$boiler completely different trailing words"),
      (4L, s"$boiler unrelated set of other tokens")
    ).toDF("doc_id", "text")
    val weighted = Dedup.weightedJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.25, maxPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(weighted == Set((1L, 2L)),
      s"only the rare-content pair survives idf weighting: $weighted")
    // plain Jaccard pairs (3, 4) through the shared zero-information
    // boilerplate (6 shared shingles / ~14 union ≈ 0.43)
    val plain = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.25, maxPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain.contains((3L, 4L)),
      s"contrast baseline: plain jaccard pairs through boilerplate: $plain")
  }

  test("weightedJaccardPairs matches a driver-side weighted-Jaccard reference") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val got = Dedup.weightedJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.3, maxPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // reference: shingle sets + idf weights in plain Scala
    val sh = Dedup.shingles(docs, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = sh.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val df = sh.groupBy(_._2).view.mapValues(_.length).toMap
    val n = byDoc.size.toDouble
    def w(s: String): BigDecimal = BigDecimal(math.log(n / df(s)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ids = byDoc.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = byDoc(a) intersect byDoc(b)
      if inter.nonEmpty
      swi = inter.toSeq.map(w).sum
      denom = byDoc(a).toSeq.map(w).sum + byDoc(b).toSeq.map(w).sum - swi
      wj = swi.toDouble / denom.toDouble
      if wj >= 0.3
    } yield (a, b) -> BigDecimal(wj)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expect(k)) < 1e-9, s"$k: $v vs ${expect(k)}")
    }
  }

  // ---------------- s38 residual PQ distortion ----------------

  test("residualDistortionReport matches a driver-side residual/raw reference") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val got = graft.pipeline.Pq.residualDistortionReport(emb, "embedding",
        "vec_id", k = 8, m = 8, ksub = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.size == 8)
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cents = vecs.toSeq.sortBy(_._1).take(8)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def cellOf(v: Array[Double]): Long =
      cents.map { case (c, cv) => (c, cos(v, cv)) }.maxBy { case (c, s) => (s, -c) }._1
    def resOf(v: Array[Double]): Array[Double] = {
      val cv = cents.find(_._1 == cellOf(v)).get._2
      v.indices.map(i => v(i) - cv(i)).toArray
    }
    val rawSeeds = vecs.toSeq.sortBy(_._1).take(16).map(_._2)
    val resSeeds = rawSeeds.map(resOf)
    def subErr(v: Array[Double], books: Seq[Array[Double]], j: Int): Double =
      books.map { bv =>
        (0 until 8).map { i => val d = v(j * 8 + i) - bv(j * 8 + i); d * d }.sum
      }.min
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    (0 until 8).foreach { j =>
      val raws = vecs.values.toSeq.map(v => r6(subErr(v, rawSeeds, j)))
      val ress = vecs.values.toSeq.map(v => r6(subErr(resOf(v), resSeeds, j)))
      val (n, rawMse, resMse) = got(j.toLong)
      assert(n == vecs.size.toLong)
      assert(math.abs(rawMse - (raws.sum / raws.size).toDouble) < 1e-9)
      assert(math.abs(resMse - (ress.sum / ress.size).toDouble) < 1e-9)
    }
    // the operator is a DECISION tool, not a guarantee: on clustered
    // data residuals cut MSE (the IVF-PQ justification); on these
    // structureless synthetic embeddings cosine-assigned centroids
    // don't model magnitude, so residual error comes out HIGHER —
    // exactly the reading that tells an index job NOT to pay for the
    // residual layout here. Pin that the report surfaces the signal.
    val totRaw = got.values.map(_._2).sum
    val totRes = got.values.map(_._3).sum
    assert(totRaw > 0 && totRes > 0 && totRes != totRaw,
      s"report must separate the two layouts: raw $totRaw res $totRes")
  }

  // ---------------- t64 drop-overlap matrix ----------------

  test("dropOverlapMatrix cells partition the corpus and reconcile with the release run") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val train = docs.where(col("doc_id") % 50 =!= 0)
    val bench = docs.where(col("doc_id") % 50 === 0)
    val cells = graft.pipeline.CorpusRelease.dropOverlapMatrix(train, bench,
        "text", "doc_id", "source", maxPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    assert(cells.size == 8, "all 8 cells always report")
    assert(cells.values.sum == train.count(), "cells partition the corpus")
    val run = graft.pipeline.CorpusRelease.corpusReleaseRun(train, bench,
        "text", "doc_id", "source", maxPostings = None)
      .where(col("doc_id").isNull && col("source").isNull)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    def tot(p: ((Long, Long, Long)) => Boolean) =
      cells.filter { case (k, _) => p(k) }.values.sum
    assert(run("dedup_dropped") == tot { case (d, _, _) => d == 1L })
    assert(run("contam_dropped") == tot { case (d, c, _) => d == 0L && c == 1L })
    assert(run("quality_dropped") == tot { case (d, c, q) => d == 0L && c == 0L && q == 1L })
    assert(run("input") == cells.values.sum)
  }

  // ---------------- d39 pair evidence ----------------

  test("pairEvidence ranks the rarest shared shingles first, capped at k") {
    import spark.implicits._
    // docs 1/2 near-dup: share a long run (many shingles); the
    // boilerplate prefix also rides docs 3/4 so its shingles have
    // df=4 while the rare shared content has df=2
    val boiler = (1 to 5).map("b" + _).mkString(" ")
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"$boiler $run one"),
      (2L, s"$boiler $run two"),
      (3L, s"$boiler unrelated trailing content words"),
      (4L, s"$boiler other unrelated trailing material")
    ).toDF("doc_id", "text")
    val ev = Dedup.pairEvidence(docs, "text", "doc_id",
        n = 3, threshold = 0.4, k = 3, maxPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(ev.nonEmpty && ev.forall(e => e._1 == 1L && e._2 == 2L),
      s"only the 1-2 pair qualifies at 0.4: ${ev.toSeq}")
    assert(ev.length == 3, "top-k caps the evidence rows")
    assert(ev.forall(_._5 == 2L),
      s"rare (df=2) shared shingles outrank the df=4 boilerplate: ${ev.toSeq}")
    // ranks are 1..3 and ordered by (df, shingle)
    assert(ev.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
    val sortedByRank = ev.sortBy(_._3).map(_._4).toSeq
    assert(sortedByRank == sortedByRank.sorted,
      "df ties break by shingle text")
  }

  test("pairEvidence covers every qualifying pair with shingles both docs contain") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val ev = Dedup.pairEvidence(docs, "text", "doc_id",
        n = 3, threshold = 0.3, k = 3, maxPostings = None)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(3)))
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.3, maxPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ev.map(_._1).toSet == pairs,
      "every qualifying pair carries evidence (intersection is non-empty by construction)")
    val sh = Dedup.shingles(docs, "text", "doc_id", 3)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    ev.foreach { case ((a, b), s) =>
      assert(sh(a).contains(s) && sh(b).contains(s),
        s"evidence shingle must be shared: ($a,$b) '$s'")
    }
  }

  // ---------------- s39 bits decision ----------------

  test("bitsDecision picks the smallest width meeting the target, else flags unmet") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val sweep = graft.pipeline.Quantize.bitsSweep(emb, "embedding",
        lo = -2.0, hi = 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val met = graft.pipeline.Quantize.bitsDecision(emb, "embedding",
        lo = -2.0, hi = 2.0, targetMse = 0.001).collect()(0)
    val expectBits = sweep.filter(_._2 <= 0.001).keys.min
    assert(met.getLong(0) == expectBits && met.getLong(5) == 1L)
    assert(met.getDouble(2) == sweep(expectBits), "verdict carries the sweep row")
    val unmet = graft.pipeline.Quantize.bitsDecision(emb, "embedding",
        lo = -2.0, hi = 2.0, targetMse = 1e-12).collect()(0)
    assert(unmet.getLong(0) == sweep.keys.max && unmet.getLong(5) == 0L,
      "no width qualifies -> largest candidate, flagged unmet")
  }

  // ---------------- t65 incremental release run ----------------

  test("incrementalReleaseRun dispositions on a planted batch") {
    import spark.implicits._
    import graft.pipeline.CorpusRelease
    val longGood = (1 to 120).map(i => "tok" + (i % 37)).mkString(" ")
    val longGood2 = (1 to 120).map(i => "alt" + (i % 41)).mkString(" ")
    val corpus = Seq((100L, "c", longGood)).toDF("doc_id", "source", "text")
    val bench = Seq((200L, "b", "secret eval question answer pair text here"))
      .toDF("doc_id", "source", "text")
    val batch = Seq(
      (1L, "a", longGood), // near-dup of corpus -> dropped_corpus
      (2L, "a", longGood2), // batch-dup pair with 3, min id kept
      (3L, "a", longGood2 + " extra"), // -> dropped_batch
      (4L, "a", (1 to 120).map(i => "q" + (i % 43)).mkString(" ")
        + " secret eval question answer pair"), // -> dropped_contam
      (5L, "a", "short low"), // -> dropped_quality (tiny score)
      (6L, "a", (1 to 120).map(i => "w" + (i % 47)).mkString(" ")) // admitted
    ).toDF("doc_id", "source", "text")
    val out = CorpusRelease.incrementalReleaseRun(batch, corpus, bench,
        "text", "doc_id", "source", maxPostings = None)
      .collect()
    val counts = out
      .filter(r => r.getString(0) != "admitted" && r.getString(0) != "admitted_source")
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(counts == Map("input" -> 6L, "dropped_corpus" -> 1L,
      "dropped_batch" -> 1L, "dropped_contam" -> 1L, "dropped_quality" -> 1L),
      s"got $counts")
    val admitted = out.filter(_.getString(0) == "admitted")
      .map(r => r.getLong(1)).toSet
    assert(admitted == Set(2L, 6L), s"min-id batch winner + clean doc: $admitted")
    // exact-sum invariant
    assert(counts("input") == counts("dropped_corpus") + counts("dropped_batch") +
      counts("dropped_contam") + counts("dropped_quality") + admitted.size)
  }

  test("incrementalReleaseRun with no bench and no gate == incrementalDedupRun dispositions") {
    import graft.pipeline.CorpusRelease
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val batch = docs.where(col("doc_id") % 7 === 0)
    val corpus = docs.where(col("doc_id") % 7 =!= 0)
    val bench = docs.where(lit(false))
    val admitted = CorpusRelease.incrementalReleaseRun(batch, corpus, bench,
        "text", "doc_id", "source", minQuality = 0.0, maxPostings = None)
      .where(col("stage") === "admitted")
      .collect().map(_.getLong(1)).toSet
    val d35 = graft.pipeline.Dedup.incrementalDedupRun(batch, corpus,
        "text", "doc_id", maxPostings = None, maxCorpusPostings = None)
      .where(col("stage") === "admitted")
      .collect().map(_.getLong(1)).toSet
    assert(admitted == d35,
      "with the release-only stages disabled, the two incremental runs admit the same docs")
  }

  test("centroidRefresh is a fixpoint when every centroid is its own cell") {
    import spark.implicits._
    // k vectors, mutually orthogonal-ish: each is alone in its cell,
    // so the refreshed centroid IS the (rounded) old one -> movement 0
    val rows = (0 until 4).map { i =>
      (i.toLong, Array.tabulate(8)(j => if (j == i * 2) 1.0f else 0.0f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Clustering.centroidRefresh(emb, "embedding", "vec_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 4)
    out.foreach { case (_, n, mv) =>
      assert(n == 1L)
      assert(mv == 0.0, s"self-cell refresh must not move, got $mv")
    }
  }
}
