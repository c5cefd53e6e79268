package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Clustering, Dedup, TextAnalysis}

/** Round-18 operators: prefix-filtered exact similarity join (d40),
  * tombstone/compaction audit (s40), and the per-source percentile
  * gate (t66).
  */
class Round18Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---------------- d40 prefix-filtered pairs ----------------

  // boilerplate-heavy corpus: every doc opens with the same 12-token
  // header (df = N shingles) and closes with a unique 12-token tail
  // (df = 1 shingles) — full-index candidates pair EVERYTHING through
  // the header, but no pair can reach τ = 0.5
  private def boilerplateDocs = {
    import spark.implicits._
    val header = (0 until 12).map(i => s"h$i").mkString(" ")
    (0 until 20).map { d =>
      val tail = (0 until 12).map(i => s"u${d}x$i").mkString(" ")
      (d.toLong, s"$header $tail")
    }.toDF("doc_id", "text")
  }

  // mixed corpus with planted near-dups, exact dups, and short docs
  private def mixedDocs = {
    import spark.implicits._
    val words = Vector("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "merge", "batch")
    val rnd = new scala.util.Random(41)
    val base = (0 until 40).map { i =>
      val len = 4 + rnd.nextInt(24)
      (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val planted = base.take(6).map { case (id, t) =>
      (id + 100L, t + " extra") // strong near-dups
    } ++ base.slice(6, 9).map { case (id, t) => (id + 200L, t) } // exact
    (base ++ planted :+ ((300L, "a b"))).toDF("doc_id", "text")
  }

  test("d40: prefix-filtered pairs == full inverted-index pairs (lossless)") {
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val exact = Dedup.ngramJaccardPairs(mixedDocs, "text", "doc_id",
        n = 3, threshold = tau, maxPostings = None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pf = Dedup.prefixFilterPairs(mixedDocs, "text", "doc_id",
        n = 3, threshold = tau, maxPostings = None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pf == exact, s"τ=$tau: prefix-filtered result must be " +
        s"IDENTICAL to the exact inverted index (got ${pf.size} vs ${exact.size})")
      assert(tau > 0.5 || exact.nonEmpty, s"τ=$tau fixture must have pairs")
    }
  }

  test("d40: boilerplate corpus — prefix index kills the candidate explosion") {
    val docs = boilerplateDocs
    // full inverted index: every pair shares the header shingles
    val (fullInter, _) = {
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.0001, maxPostings = None)
      (pairs.count(), ())
    }
    assert(fullInter == 20L * 19 / 2,
      s"full index must fan out all ${20 * 19 / 2} pairs, got $fullInter")
    // prefix index at τ=0.5: rare tail shingles fill every prefix, the
    // shared header ranks last and is never indexed → zero candidates
    val (cand, _) = Dedup.prefixFilterCandidates(docs, "text", "doc_id",
      n = 3, threshold = 0.5, maxPostings = None)
    assert(cand.count() == 0L,
      "no candidate may survive the prefix cut on a boilerplate-only corpus")
    // and the final result agrees with the exact join (both empty)
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.5, maxPostings = None).count()
    assert(exact == 0L)
  }

  test("d40: exact duplicates always survive the prefix cut at τ=1.0 edge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here now ok")).toDF("doc_id", "text")
    val pf = Dedup.prefixFilterPairs(docs, "text", "doc_id",
      n = 3, threshold = 1.0, maxPostings = None).collect()
    assert(pf.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pf.head.getDouble(2) == 1.0)
  }

  // ---------------- s40 tombstone/compaction audit ----------------

  private def embDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("s40: accounting reconciles against the raw assignment") {
    val emb = embDf
    val deleted = emb.where(col("vec_id") % 3 === 0).select(col("vec_id"))
    val rep = Clustering.tombstoneCompactionReport(emb, "embedding",
      "vec_id", k = 4, deleted, "vec_id", minLiveFrac = 0.8).collect()
    assert(rep.length == 4, "one row per seeded cell")
    assert(rep.map(_.getLong(1)).sum == 60L, "totals cover the corpus")
    assert(rep.map(_.getLong(3)).sum == 20L, "dead mass == deletion set")
    rep.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1), "live + dead == total")
      val frac = r.getDouble(4)
      val expect = math.rint(r.getLong(2).toDouble / r.getLong(1) * 1e6) / 1e6
      assert(math.abs(frac - expect) < 1e-12)
      val action = r.getString(5)
      if (r.getLong(2).toDouble / r.getLong(1) < 0.8) assert(action == "compact")
      else assert(action == "keep")
    }
    // independent check of one cell against assignToSeeds directly
    val assigned = Clustering.assignToSeeds(emb, "embedding", "vec_id", 4)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cell0 = assigned.count(_._2 == rep.head.getLong(0))
    assert(rep.head.getLong(1) == cell0.toLong)
  }

  test("s40: a drained duplicate seed reports an empty cell") {
    import spark.implicits._
    // seed 1 duplicates seed 0 → ties break to cell 0, cell 1 drains
    val v = Array.fill(8)(0.5f)
    val others = (2 until 12).map { i =>
      (i.toLong, Array.tabulate(8)(j => if (j == i % 8) 1f else 0.01f))
    }
    val emb = (Seq((0L, v), (1L, v)) ++ others).toDF("vec_id", "embedding")
    val rep = Clustering.tombstoneCompactionReport(emb, "embedding",
      "vec_id", k = 2, emb.limit(0).select(col("vec_id")), "vec_id",
      minLiveFrac = 0.5).collect().sortBy(_.getLong(0))
    val cell1 = rep(1)
    assert(cell1.getLong(1) == 0L && cell1.getString(5) == "empty")
    assert(cell1.isNullAt(4), "live_frac is null for an empty cell")
    assert(rep(0).getLong(1) >= 2L)
  }

  test("s40: no deletions → everything keep with live_frac 1.0") {
    val emb = embDf
    val rep = Clustering.tombstoneCompactionReport(emb, "embedding",
      "vec_id", k = 4, emb.limit(0).select(col("vec_id")), "vec_id",
      minLiveFrac = 0.8).collect()
    rep.foreach { r =>
      assert(r.getString(5) == "keep" && r.getDouble(4) == 1.0 &&
        r.getLong(3) == 0L)
    }
  }

  // ---------------- t66 percentile gate ----------------

  test("t66: percentile gate admits the same top fraction of every source") {
    import spark.implicits._
    // 'clean' scores high (long prose, stopwords), 'noisy' scores low
    // (short, punct-heavy) — a raw global threshold decimates noisy
    val clean = (0 until 30).map { i =>
      (i.toLong, "clean",
        Seq.fill(40)(Seq("the", "and", "of", "word")(i % 4)).mkString(" "))
    }
    val noisy = (0 until 30).map { i =>
      (100L + i, "noisy", "x.y;z!!" + i)
    }
    val docs = (clean ++ noisy).toDF("doc_id", "source", "text")
    val out = TextAnalysis.percentileGateBySource(docs, "text", "doc_id",
      "source", topFrac = 0.4, rawThreshold = 0.55)
      .collect().map(r => r.getString(0) -> r).toMap
    // percentile gate: identical admitted count per source — the
    // count of i ∈ [0, n) with i/(n−1) ≤ 0.4 is floor(0.4·(n−1)) + 1
    val expectPct = math.floor(0.4 * 29).toLong + 1
    assert(out("clean").getLong(3) == expectPct)
    assert(out("noisy").getLong(3) == expectPct)
    // raw gate: clean sails through, noisy is wiped out
    assert(out("clean").getLong(2) > 0L)
    assert(out("noisy").getLong(2) == 0L,
      "raw threshold must decimate the noisy source in this fixture")
    assert(out("noisy").getDouble(5) > out("noisy").getDouble(4),
      "pct_rate must exceed raw_rate for the decimated source")
  }

  // ---------------- s41 NN-descent round ----------------

  test("s41: refinement never loses recall, counters reconcile") {
    val emb = embDf
    val out = graft.pipeline.GraphAnn.nnDescentRecallAudit(emb,
      "embedding", "vec_id", kCells = 6, k = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    val init = out("init"); val r1 = out("round1")
    // N1 is the top-k of a candidate SUPERSET of N0 under the same
    // total order, so per-query hits are monotone (see scaladoc)
    assert(r1.getDouble(5) >= init.getDouble(5),
      s"round1 recall ${r1.getDouble(5)} < init ${init.getDouble(5)}")
    Seq(init, r1).foreach { r =>
      assert(r.getLong(1) == 60L, "all vectors audited at auditMod=1")
      assert(r.getLong(4) == 60L * 4, "n_possible = N·k when N > k")
      assert(r.getLong(3) <= r.getLong(2), "hits ≤ edges")
      assert(r.getLong(2) <= 60L * 4, "≤ k edges per query")
      assert(r.getDouble(5) ==
        math.rint(r.getLong(3).toDouble / r.getLong(4) * 1e6) / 1e6)
    }
  }

  test("s41: one cell makes the init graph exact (recall 1.0 both stages)") {
    val emb = embDf
    val out = graft.pipeline.GraphAnn.nnDescentRecallAudit(emb,
      "embedding", "vec_id", kCells = 1, k = 5)
      .collect()
    out.foreach { r =>
      assert(r.getDouble(5) == 1.0,
        s"${r.getString(0)}: cell-mates == corpus ⟹ init is already exact")
    }
  }

  test("s41: auditMod samples queries consistently") {
    val emb = embDf
    val full = graft.pipeline.GraphAnn.nnDescentRecallAudit(emb,
      "embedding", "vec_id", kCells = 6, k = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    val sampled = graft.pipeline.GraphAnn.nnDescentRecallAudit(emb,
      "embedding", "vec_id", kCells = 6, k = 4, auditMod = 3L)
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("init", "round1").foreach { st =>
      assert(sampled(st).getLong(1) == 20L, "60 ids, every 3rd audited")
      assert(sampled(st).getLong(4) == 20L * 4)
      assert(sampled(st).getLong(2) <= full(st).getLong(2))
      assert(sampled(st).getLong(3) <= full(st).getLong(3))
    }
  }

  // ---------------- m29 cross-modal dup audit ----------------

  test("m29: planted pairs land in their modality classes") {
    import spark.implicits._
    val tA = "the quick brown fox jumps over the lazy dog again and again ok"
    val tB = "completely unrelated content words filling this other document"
    val samples = Seq(
      (1L, tA, tA),          // anchor
      (2L, tA, tA),          // exact dup of 1 → both
      (3L, tB, tA),          // same caption as 1, different image → caption_only
      (4L, tA + "x", "another caption entirely for this one")
      // near-dup image of 1 (1 appended char), different caption → image_only
    ).toDF("sample_id", "img_text", "caption")
    val out = graft.pipeline.Multimodal.crossModalDupAudit(samples,
      "sample_id", "img_text", "caption", maxHamming = 3, width = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(4))).toMap
    assert(out((1L, 2L)) == "both")
    assert(out((1L, 3L)) == "caption_only")
    assert(out((1L, 4L)) == "image_only")
    assert(out((2L, 3L)) == "caption_only")
    assert(out((2L, 4L)) == "image_only")
    assert(!out.contains((3L, 4L)), "no shared modality between 3 and 4")
  }

  test("m29: kinds partition the union of the two pair sets") {
    import spark.implicits._
    val docs = mixedDocs.limit(20)
    val samples = docs.select(col("doc_id").as("sample_id"),
        col("text").as("img_text"), col("text").as("caption"))
      .unionByName(docs.select((col("doc_id") + 1000L).as("sample_id"),
        concat(col("text"), lit("x")).as("img_text"),
        concat(col("text"), lit("x")).as("caption")))
    val out = graft.pipeline.Multimodal.crossModalDupAudit(samples,
      "sample_id", "img_text", "caption").collect()
    out.foreach { r =>
      val (img, cap, kind) = (r.getLong(2), r.getLong(3), r.getString(4))
      assert(img == 1L || cap == 1L, "every row is dup in ≥1 modality")
      val expect =
        if (img == 1L && cap == 1L) "both"
        else if (img == 1L) "image_only" else "caption_only"
      assert(kind == expect)
    }
    // image side must agree with phashDupPairs run standalone
    val hashes = graft.pipeline.Multimodal.perceptualHash(
      graft.pipeline.Multimodal.textAsBmp(
        samples.select(col("sample_id"), col("img_text")),
        "sample_id", "img_text", width = 10)).toDF()
    val imgPairs = graft.pipeline.Multimodal.phashDupPairs(hashes, 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val audited = out.filter(_.getLong(2) == 1L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(audited == imgPairs)
  }

  // ---------------- t67 fuzzy decontamination ----------------

  test("t67: paraphrased benchmark copies flag by jaccard with evidence") {
    import spark.implicits._
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (200L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // light edit of bench 100: last 2 tokens changed
      (1L, "src0", "alpha beta gamma delta epsilon zeta eta theta iota kappa XX YY"),
      // exact copy of bench 200
      (2L, "src1", "one two three four five six seven eight nine ten eleven twelve"),
      // unrelated
      (3L, "src0", "totally different words having nothing in common with anything here"))
      .toDF("doc_id", "source", "text")
    val out = graft.pipeline.Decontaminate.fuzzyContamination(docs, bench,
      "text", "doc_id", "source", n = 3, tau = 0.3,
      maxCorpusPostings = None).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.contains(1L) && out(1L).getLong(2) == 100L)
    // 8 shared trigrams of 10 each side: J = 8/(10+10-8) = 2/3
    assert(math.abs(out(1L).getDouble(3) - 0.666667) < 1e-6)
    assert(out.contains(2L) && out(2L).getLong(2) == 200L &&
      out(2L).getDouble(3) == 1.0)
    assert(!out.contains(3L), "unrelated doc must not flag")
  }

  test("t67: argmax evidence ties to the smallest benchmark id") {
    import spark.implicits._
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((7L, t), (5L, t)).toDF("doc_id", "text")
    val docs = Seq((1L, "s", t)).toDF("doc_id", "source", "text")
    val out = graft.pipeline.Decontaminate.fuzzyContamination(docs, bench,
      "text", "doc_id", "source", tau = 0.5, maxCorpusPostings = None)
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == 5L)
  }

  // ---------------- s42 ADC vs SDC ----------------

  test("s42: exact reconstruction (corpus == seeds) gives recall 1.0 both modes") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val emb = (0 until 16).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    // ksub = N: every vector's own slice is a centroid at distance 0,
    // so both quantizations are exact and both rankings == exact
    val out = graft.pipeline.Pq.adcSdcRecallCompare(emb, "embedding",
      "vec_id", queryIds = Seq(0L, 1L), k = 5, m = 4, ksub = 16)
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("adc", "sdc").foreach { mth =>
      assert(out(mth).getDouble(5) == 1.0, s"$mth recall must be 1.0")
      assert(out(mth).getLong(1) == 2L && out(mth).getLong(4) == 10L)
    }
  }

  test("s42: counters reconcile on a lossy codebook") {
    val out = graft.pipeline.Pq.adcSdcRecallCompare(embDf, "embedding",
      "vec_id", queryIds = Seq(0L, 1L, 2L), k = 5, m = 4, ksub = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("adc", "sdc").foreach { mth =>
      val r = out(mth)
      assert(r.getLong(1) == 3L)
      assert(r.getLong(2) == 15L, "k returned per query")
      assert(r.getLong(4) == 15L)
      assert(r.getLong(3) <= r.getLong(4) && r.getLong(3) >= 0L)
      assert(r.getDouble(5) ==
        math.rint(r.getLong(3).toDouble / r.getLong(4) * 1e6) / 1e6)
    }
  }

  // ---------------- m30 paired release run ----------------

  test("m30: attribution order — image drops first, caption over the remainder") {
    import spark.implicits._
    val tA = "the quick brown fox jumps over the lazy dog again and again ok"
    val samples = Seq(
      (1L, tA, tA, "web"),          // anchor: kept
      (2L, tA, tA, "web"),          // image-dup AND caption-dup of 1 → image stage
      (3L, tA.reverse, tA, "lab"),  // caption-dup of 1, image differs → caption stage
      (4L, "zz unrelated content entirely different from the others yes ok",
        "a caption of its own", "lab")) // kept
      .toDF("sample_id", "img_text", "caption", "source")
    val rows = graft.pipeline.Multimodal.pairedReleaseRun(samples,
      "sample_id", "img_text", "caption", "source").collect()
    val counts = rows.filter(r => !Seq("admitted", "admitted_source")
      .contains(r.getString(0)))
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(counts("input") == 4L)
    assert(counts("dropped_image") == 1L, "2 drops at the image stage")
    assert(counts("dropped_caption") == 1L, "3 drops at the caption stage")
    val admitted = rows.filter(_.getString(0) == "admitted")
      .map(_.getLong(1)).toSet
    assert(admitted == Set(1L, 4L))
    assert(counts("input") ==
      counts("dropped_image") + counts("dropped_caption") + admitted.size)
    val bySrc = rows.filter(_.getString(0) == "admitted_source")
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(bySrc == Map("web" -> 1L, "lab" -> 1L))
  }

  test("m30: stage arithmetic on a replica-heavy corpus") {
    import spark.implicits._
    val docs = mixedDocs.limit(25)
      .withColumn("source", when(col("doc_id") % 2 === 0, "even").otherwise("odd"))
    val samples = docs.select(col("doc_id").as("sample_id"),
        col("text").as("img_text"), col("text").as("caption"), col("source"))
      .unionByName(docs.select((col("doc_id") + 1000L).as("sample_id"),
        concat(col("text"), lit("x")).as("img_text"),
        col("text").as("caption"), col("source")))
    val rows = graft.pipeline.Multimodal.pairedReleaseRun(samples,
      "sample_id", "img_text", "caption", "source").collect()
    val counts = rows.filter(r => !Seq("admitted", "admitted_source")
      .contains(r.getString(0)))
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val nAdmitted = rows.count(_.getString(0) == "admitted").toLong
    assert(counts("input") == 50L)
    assert(counts("input") ==
      counts("dropped_image") + counts("dropped_caption") + nAdmitted)
    val bySrcSum = rows.filter(_.getString(0) == "admitted_source")
      .map(_.getLong(3)).sum
    assert(bySrcSum == nAdmitted, "per-source rollup covers the admitted set")
  }

  // ---------------- s43 over-fetch under deletes ----------------

  test("s43: over-fetch dominates fetch-k and fills the quota") {
    val emb = embDf
    val deleted = emb.where(col("vec_id") % 3 === 0).select(col("vec_id"))
    val out = Clustering.overfetchUnderDeletes(emb, "embedding", "vec_id",
      queryIds = Seq(1L, 2L), deleted, "vec_id", k = 6, fetchFactor = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val fk = out("fetch_k"); val of = out("overfetch")
    // fetch-k surrenders the dead slots; over-fetch refills from the
    // next ranks — both return ONLY live ids, so hits ≤ returned
    assert(fk.getLong(2) <= 2L * 6, "fetch_k returns at most k per query")
    assert(of.getLong(2) >= fk.getLong(2), "overfetch returns at least as many")
    assert(of.getDouble(5) >= fk.getDouble(5), "overfetch recall dominates")
    Seq(fk, of).foreach { r =>
      assert(r.getLong(1) == 2L && r.getLong(4) == 12L)
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getDouble(5) ==
        math.rint(r.getLong(3).toDouble / r.getLong(4) * 1e6) / 1e6)
    }
    // with a 1/3 deletion rate and 3x over-fetch, the quota refills
    assert(of.getLong(2) == 12L, "3x over-fetch at 1/3 deletions fills k")
  }

  test("s43: no deletions makes both strategies exact") {
    val emb = embDf
    val out = Clustering.overfetchUnderDeletes(emb, "embedding", "vec_id",
      queryIds = Seq(0L), emb.limit(0).select(col("vec_id")), "vec_id",
      k = 5, fetchFactor = 2).collect()
    out.foreach { r =>
      assert(r.getDouble(5) == 1.0, s"${r.getString(0)} must be exact")
      assert(r.getLong(2) == 5L && r.getLong(3) == 5L)
    }
  }

  // ---------------- t68 quality drift ----------------

  test("t68: identical snapshots have ks 0, a shifted one drifts") {
    import spark.implicits._
    val stable = (0 until 20).map(i =>
      (i.toLong, "stable", Seq.fill(30)(Seq("the", "and", "word")(i % 3)).mkString(" ")))
    // old long prose vs new short spam: distribution moves wholesale
    val shiftOld = (100 until 120).map(i =>
      (i.toLong, "shifted", Seq.fill(40)("the word of it").mkString(" ")))
    val shiftNew = (200 until 220).map(i =>
      (i.toLong, "shifted", "x!" + i))
    val oldDocs = (stable ++ shiftOld).toDF("doc_id", "source", "text")
    val newDocs = (stable.map { case (id, s, t) => (id + 1000L, s, t) } ++ shiftNew)
      .toDF("doc_id", "source", "text")
    val out = graft.pipeline.TextAnalysis.qualityDriftBySource(oldDocs,
      newDocs, "text", "source", ksThreshold = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    val st = out("stable")
    assert(st.getDouble(5) == 0.0 && st.getLong(6) == 0L,
      "identical score distributions have zero KS")
    assert(st.getDouble(3) == st.getDouble(4), "means agree when unchanged")
    val sh = out("shifted")
    assert(sh.getDouble(5) == 1.0 && sh.getLong(6) == 1L,
      "disjoint distributions have KS 1 and drift")
    assert(out.values.forall(r => r.getLong(1) == 20L && r.getLong(2) == 20L))
  }

  test("t68: a source absent from one snapshot reports null ks") {
    import spark.implicits._
    val oldDocs = Seq((1L, "gone", "some words here for the test ok fine"))
      .toDF("doc_id", "source", "text")
    val newDocs = Seq((2L, "fresh", "other words also here for this one"))
      .toDF("doc_id", "source", "text")
    val out = graft.pipeline.TextAnalysis.qualityDriftBySource(oldDocs,
      newDocs, "text", "source").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("gone").getLong(2) == 0L && out("gone").isNullAt(5) &&
      out("gone").isNullAt(6) && out("gone").isNullAt(4))
    assert(out("fresh").getLong(1) == 0L && out("fresh").isNullAt(5) &&
      out("fresh").isNullAt(3))
  }

  // ---------------- s44 adaptive nprobe ----------------

  test("s44: candidate budget controls probing; full budget is exact") {
    val emb = embDf // 60 vectors
    val full = Clustering.adaptiveProbeRecall(emb, "embedding", "vec_id",
      queryIds = Seq(0L, 1L), k = 5, numCells = 6,
      targetCandidates = 1000L).collect()
    full.foreach { r =>
      assert(r.getLong(1) == 6L, "budget ≥ corpus probes every cell")
      assert(r.getLong(2) == 59L, "all non-self vectors are candidates")
      assert(r.getDouble(6) == 1.0, "probing everything is exact")
    }
    val tight = Clustering.adaptiveProbeRecall(emb, "embedding", "vec_id",
      queryIds = Seq(0L, 1L), k = 5, numCells = 6,
      targetCandidates = 1L).collect()
    tight.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 6L)
      assert(r.getLong(2) >= 1L, "the budget-1 probe still reaches a non-empty cell")
      assert(r.getLong(2) < 59L, "tight budget must not scan the corpus")
    }
    // recall is monotone in the candidate budget (probe-set superset)
    val fullMap = full.map(r => r.getLong(0) -> r.getDouble(6)).toMap
    tight.foreach { r =>
      assert(r.getDouble(6) <= fullMap(r.getLong(0)))
    }
  }

  test("s44: candidate counts reconcile with the probed cells' members") {
    val emb = embDf
    val out = Clustering.adaptiveProbeRecall(emb, "embedding", "vec_id",
      queryIds = Seq(3L), k = 5, numCells = 4, targetCandidates = 20L)
      .collect().head
    val cells = Clustering.assignToSeeds(emb, "embedding", "vec_id", 4)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n_candidates + (1 if own cell probed) must equal the probed
    // cells' total membership; bound it both ways
    val probedTotalLow = out.getLong(2)
    val probedTotalHigh = out.getLong(2) + 1
    assert(cells.values.sum == 60L)
    assert(probedTotalLow >= 20L - cells.values.max + 1 || out.getLong(1) == 1L,
      "the cut stops at the crossing cell")
    assert(probedTotalHigh <= cells.values.sum)
    assert(out.getLong(4) <= out.getLong(3) && out.getLong(3) <= 5L)
  }

  // ---------------- t69 repeat-epoch plan ----------------

  private def qualityDocs = {
    import spark.implicits._
    // 'clean' scores much higher than 'noisy' (the t66 fixture shape),
    // equal unique-token supply per source
    val clean = (0 until 10).map { i =>
      (i.toLong, "clean",
        Seq.fill(40)(Seq("the", "and", "of", "word")(i % 4)).mkString(" "))
    }
    val noisy = (0 until 10).map { i =>
      (100L + i, "noisy", Seq.fill(40)("x.!;")(0) +
        Seq.fill(39)("z" + i).mkString(" "))
    }
    (clean ++ noisy).toDF("doc_id", "source", "text")
  }

  test("t69: greedy funds the higher-quality source deeper; budget conserved") {
    import spark.implicits._
    val docs = qualityDocs
    val totalUnique = 2L * 400L
    val budget = 900L // funds ~2.25 epochs of one source + part of other
    val out = graft.pipeline.Sampling.repeatEpochPlan(docs, "source",
      "text", budget = budget, maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.values.map(_.getLong(5)).sum == budget,
      "raw allocations must sum exactly to the budget")
    assert(out("clean").getDouble(2) > out("noisy").getDouble(2),
      "fixture sanity: clean must out-score noisy")
    assert(out("clean").getLong(3) >= out("noisy").getLong(3),
      "higher quality is funded at least as deep")
    out.values.foreach { r =>
      assert(r.getLong(5) ==
        r.getLong(3) * r.getLong(1) + r.getLong(4), "raw = full·unique + partial")
      assert(r.getLong(4) < r.getLong(1), "partial is a strict sub-epoch")
    }
    assert(totalUnique * 4 > budget, "fixture must actually ration")
  }

  test("t69: budget beyond supply funds every epoch; effective formula holds") {
    val docs = qualityDocs
    val out = graft.pipeline.Sampling.repeatEpochPlan(docs, "source",
      "text", budget = 1000000L, maxEpochs = 4).collect()
    out.foreach { r =>
      assert(r.getLong(3) == 4L && r.getLong(4) == 0L)
      assert(r.getLong(5) == 4L * r.getLong(1))
      val expected = r.getLong(1).toDouble * 2.0 * (1.0 - 0.0625)
      assert(math.abs(r.getDouble(6) - expected) < 1e-6,
        "effective == unique·2·(1−0.5^4) at full funding")
    }
  }

  // ---------------- review-fix pins (r18 self-review) ----------------

  test("s41: singleton cells (kCells ≥ N) report recall 0, not NULL") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val emb = (0 until 8).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    // every vector seeds its own cell → the cell-mate init graph is
    // EMPTY; the legs must still report well-defined zeros
    val out = graft.pipeline.GraphAnn.nnDescentRecallAudit(emb,
      "embedding", "vec_id", kCells = 8, k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("init", "round1").foreach { st =>
      val r = out(st)
      assert(r.getLong(2) == 0L, s"$st: no edges from singleton cells")
      assert(!r.isNullAt(3) && r.getLong(3) == 0L, s"$st: hits must be 0")
      assert(!r.isNullAt(5) && r.getDouble(5) == 0.0, s"$st: recall must be 0.0")
    }
  }

  test("s44: a zero-candidate query still reports (recall 0.0)") {
    import spark.implicits._
    // 3 well-separated axis vectors: each seeds its own cell and is
    // its only member, so a budget-1 probe finds the query alone
    val emb = Seq(
      (0L, Array.tabulate(8)(j => if (j == 0) 1f else 0f)),
      (1L, Array.tabulate(8)(j => if (j == 3) 1f else 0f)),
      (2L, Array.tabulate(8)(j => if (j == 6) 1f else 0f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.adaptiveProbeRecall(emb, "embedding", "vec_id",
      queryIds = Seq(0L), k = 2, numCells = 3, targetCandidates = 1L)
      .collect()
    assert(out.length == 1, "the query must not vanish from its own audit")
    val r = out.head
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getDouble(6) == 0.0)
  }

  test("m29: the caption-group cap bounds template-caption fan-out losslessly above it") {
    import spark.implicits._
    val template = "click here to read the full article now please thanks"
    val uniques = (0 until 6).map(i =>
      (100L + i, s"unique content piece number $i with its own words entirely", template))
    val samples = ((0 until 5).map(i => (i.toLong,
      s"distinct image text $i for this one here ok", template)) ++ uniques.map {
      case (id, img, _) => (id, img, s"own caption $id")
    }).toDF("sample_id", "img_text", "caption")
    // 5 docs share the template caption: capped at 3 the group drops
    val capped = graft.pipeline.Multimodal.crossModalDupAudit(samples,
      "sample_id", "img_text", "caption", maxCaptionGroup = Some(3))
      .where(col("caption_dup") === 1L).count()
    assert(capped == 0L, "over-cap caption group must not emit pairs")
    val exact = graft.pipeline.Multimodal.crossModalDupAudit(samples,
      "sample_id", "img_text", "caption", maxCaptionGroup = None)
      .where(col("caption_dup") === 1L).count()
    assert(exact == 10L, "uncapped: C(5,2) template pairs")
    // a cap above the group size is exact
    val wide = graft.pipeline.Multimodal.crossModalDupAudit(samples,
      "sample_id", "img_text", "caption", maxCaptionGroup = Some(10))
      .where(col("caption_dup") === 1L).count()
    assert(wide == exact)
  }

  test("t66: rates are exact divisions of the counts") {
    val docs = mixedDocs.withColumn("source",
      when(col("doc_id") % 2 === 0, "even").otherwise("odd"))
    val out = TextAnalysis.percentileGateBySource(docs, "text", "doc_id",
      "source", topFrac = 0.25, rawThreshold = 0.3).collect()
    assert(out.length == 2)
    out.foreach { r =>
      val n = r.getLong(1).toDouble
      assert(r.getDouble(4) ==
        math.rint(r.getLong(2).toDouble / n * 1e6) / 1e6)
      assert(r.getDouble(5) ==
        math.rint(r.getLong(3).toDouble / n * 1e6) / 1e6)
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
    }
  }
}
