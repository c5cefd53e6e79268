package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.GraphAnn

/** Round-19 operators: NN-descent to convergence (s45) and the s41
  * closure adjudication it rests on.
  */
class Round19Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def embDf(n: Int = 60, dim: Int = 8, seed: Int = 7) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  // ---------------- s41 closure adjudication ----------------

  test("s41 closure: cell-confined refinement is a FIXED POINT (round1 ≡ init, exactly)") {
    // the round-19 adjudication behind s45's ring init: every 2-hop
    // candidate is a cell-mate and init is already the exact in-cell
    // top-k, so refinement cannot change ANY counter — not merely
    // "monotone", bit-equal
    val out = GraphAnn.nnDescentRecallAudit(embDf(), "embedding",
      "vec_id", kCells = 6, k = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    val (init, r1) = (out("init"), out("round1"))
    (1 to 5).foreach { i =>
      assert(init.get(i) == r1.get(i),
        s"col $i: init=${init.get(i)} round1=${r1.get(i)} — the closure " +
          "property broke, which means the expansion changed semantics")
    }
  }

  // ---------------- s45 NN-descent to convergence ----------------

  test("s45: recall climbs monotonically, gains reconcile, counters are exact") {
    val out = GraphAnn.nnDescentConverge(embDf(), "embedding", "vec_id",
      k = 4, epsilon = 0.0, maxRounds = 4)
      .orderBy(col("round_no")).collect()
    // epsilon = 0: gain < 0 never happens (monotone), so the loop
    // always runs the full maxRounds — 5 stage rows, none converged
    assert(out.length == 5, s"expected 5 stages, got ${out.length}")
    assert(out.forall(_.getAs[Long]("converged") == 0L))
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("recall") >= a.getAs[Double]("recall"),
        "top-k over a candidate superset cannot lose recall")
      assert(b.getAs[Double]("gain") ==
        math.rint((b.getAs[Double]("recall") - a.getAs[Double]("recall")) * 1e6) / 1e6)
    }
    out.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 60L)
      assert(r.getAs[Long]("n_possible") == 240L, "N·k when N > k")
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_edges"))
      assert(r.getAs[Long]("n_edges") <= 240L)
      assert(r.getAs[Double]("recall") ==
        math.rint(r.getAs[Long]("n_hits").toDouble /
          r.getAs[Long]("n_possible") * 1e6) / 1e6)
    }
    // the descent must actually descend: the ring init is geometry-
    // blind, so four rounds must beat it (the s41 seed provably can't)
    assert(out.last.getAs[Double]("recall") > out.head.getAs[Double]("recall"),
      "refinement bought nothing — exploration is dead")
  }

  test("s45: a huge epsilon stops the loop at round 1, flagged converged") {
    val out = GraphAnn.nnDescentConverge(embDf(), "embedding", "vec_id",
      k = 4, epsilon = 1.1, maxRounds = 6)
      .orderBy(col("round_no")).collect()
    // any gain is < 1.1, so round 1 both runs AND terminates the loop
    assert(out.length == 2, s"expected init + round1, got ${out.length}")
    assert(out.head.getAs[Long]("converged") == 0L)
    assert(out.last.getAs[Long]("round_no") == 1L)
    assert(out.last.getAs[Long]("converged") == 1L)
  }

  test("s45: auditMod samples queries consistently") {
    val full = GraphAnn.nnDescentConverge(embDf(), "embedding", "vec_id",
      k = 4, epsilon = 0.0, maxRounds = 2)
      .orderBy(col("round_no")).collect()
    val sampled = GraphAnn.nnDescentConverge(embDf(), "embedding", "vec_id",
      k = 4, auditMod = 3L, epsilon = 0.0, maxRounds = 2)
      .orderBy(col("round_no")).collect()
    sampled.zip(full).foreach { case (s, f) =>
      assert(s.getAs[Long]("n_queries") == 20L, "60 ids, every 3rd audited")
      assert(s.getAs[Long]("n_possible") == 80L)
      assert(s.getAs[Long]("n_edges") <= f.getAs[Long]("n_edges"))
      assert(s.getAs[Long]("n_hits") <= f.getAs[Long]("n_hits"))
    }
    // the graph itself is auditMod-independent: a sampled audit of the
    // same build can't report MORE hits per edge than the full one
    assert(sampled.last.getAs[Double]("recall") >= 0.0)
  }

  test("s45: ring init requires a dense id column, loudly") {
    import spark.implicits._
    val gappy = Seq((0L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      GraphAnn.nnDescentConverge(gappy, "embedding", "vec_id", k = 2)
    }
    assert(e.getMessage.contains("dense"), e.getMessage)
  }

  test("s45: k ≥ N−1 makes the ring complete — exact at init, converged at round 1") {
    val out = GraphAnn.nnDescentConverge(embDf(n = 4), "embedding",
      "vec_id", k = 5, epsilon = 0.001, maxRounds = 6)
      .orderBy(col("round_no")).collect()
    assert(out.head.getAs[Double]("recall") == 1.0,
      "offsets wrap the whole corpus: the init graph IS the exact graph")
    assert(out.length == 2 && out.last.getAs[Long]("converged") == 1L,
      "zero gain at round 1 must terminate immediately")
  }

  // ---------------- s46 index-maintenance run ----------------

  test("s46 manifest reconciles against the four standalone verdicts") {
    import graft.pipeline.{Clustering, Quantize}
    // old holds the k smallest ids, so the standalone ops (which seed
    // from their own input) and the run (which seeds from OLD — the
    // index's trained state) share seeds by construction
    val emb = embDf(n = 60, dim = 8, seed = 19)
    val oldEmb = emb.where(col("vec_id") % 5 =!= 4)
    val newEmb = emb.where(col("vec_id") % 5 === 4)
    val deleted = emb.where(col("vec_id") % 7 === 3).select(col("vec_id"))
    val run = Clustering.indexMaintenanceRun(oldEmb, newEmb, "embedding",
        "vec_id", k = 4, deleted, "vec_id", minLiveFrac = 0.9,
        maxImbalance = 1.5, maxNewFrac = 0.3,
        queryIds = Seq(0L, 1L), kq = 5, fetchFactor = 2,
        lo = -4.0, hi = 4.0, targetMse = 0.01, bitsList = Seq(2, 4, 8))
      .collect()
    def sec(s: String) = run.filter(_.getString(0) == s)
    // input reconciliation: compaction totals cover old ∪ new
    val nAll = emb.count()
    assert(sec("compaction").length == 4)
    // rebuild section == rebuildDecision (s35 arithmetic)
    val s35 = Clustering.rebuildDecision(oldEmb, newEmb, "embedding",
      "vec_id", k = 4, maxImbalance = 1.5, maxNewFrac = 0.3).collect()(0)
    val dec = sec("rebuild").find(_.getString(1) == "decision").get
    assert(dec.getLong(2) == s35.getAs[Long]("n_total"))
    assert(dec.getLong(2) == nAll)
    assert(dec.getDouble(3) ==
      math.rint(s35.getAs[Double]("imbalance_after") * 1e6) / 1e6)
    assert((dec.getString(4) == "rebuild") == (s35.getAs[Long]("rebuild") == 1L))
    val nfRow = sec("rebuild").find(_.getString(1) == "new_frac").get
    assert(nfRow.getDouble(3) ==
      math.rint(s35.getAs[Double]("new_frac") * 1e6) / 1e6)
    // compaction section == tombstoneCompactionReport over old ∪ new
    val s40 = Clustering.tombstoneCompactionReport(
        emb, "embedding", "vec_id", k = 4, deleted, "vec_id",
        minLiveFrac = 0.9)
      .collect().map(r => r.getLong(0).toString -> r).toMap
    sec("compaction").foreach { r =>
      val ref = s40(r.getString(1))
      assert(r.getLong(2) == ref.getAs[Long]("n_live"), s"cell ${r.getString(1)}")
      assert(r.getString(4) == ref.getAs[String]("action"))
    }
    // sq_bits section == bitsDecision over the LIVE corpus
    val live = emb.join(deleted.withColumnRenamed("vec_id", "__d"),
      col("vec_id") === col("__d"), "left_anti")
    val s39 = Quantize.bitsDecision(live, "embedding", -4.0, 4.0,
      targetMse = 0.01, bitsList = Seq(2, 4, 8)).collect()(0)
    val bits = sec("sq_bits").head
    assert(bits.getLong(2) == s39.getAs[Long]("bits"))
    assert(bits.getDouble(3) == s39.getAs[Double]("mse"))
    assert((bits.getString(4) == "met") == (s39.getAs[Long]("met") == 1L))
    // overfetch section == overfetchUnderDeletes (factored legs)
    val s43 = Clustering.overfetchUnderDeletes(emb, "embedding", "vec_id",
        Seq(0L, 1L), deleted, "vec_id", k = 5, fetchFactor = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    sec("overfetch").foreach { r =>
      val ref = s43(r.getString(1))
      assert(r.getLong(2) == ref.getAs[Long]("n_hits"), r.getString(1))
      assert(r.getDouble(3) == ref.getAs[Double]("recall"))
    }
    // the chosen flag: exactly one, the max-recall strategy, fetch_k
    // on ties
    val chosen = sec("overfetch").filter(_.getString(4) == "chosen")
    assert(chosen.length == 1)
    val best = sec("overfetch").map(_.getDouble(3)).max
    assert(chosen.head.getDouble(3) == best)
  }

  test("s46 overfetch ties choose fetch_k (never over-fetch for nothing)") {
    import graft.pipeline.Clustering
    // no deletions: both strategies are exact → identical recall 1.0
    val emb = embDf(n = 30, dim = 8, seed = 23)
    val none = emb.where(col("vec_id") < 0L).select(col("vec_id"))
    val run = Clustering.indexMaintenanceRun(
        emb.where(col("vec_id") % 5 =!= 4), emb.where(col("vec_id") % 5 === 4),
        "embedding", "vec_id", k = 3, none, "vec_id", minLiveFrac = 0.5,
        maxImbalance = 5.0, maxNewFrac = 0.9,
        queryIds = Seq(0L), kq = 3, fetchFactor = 2,
        lo = -4.0, hi = 4.0, targetMse = 0.01)
      .collect().filter(_.getString(0) == "overfetch")
    assert(run.forall(_.getDouble(3) == 1.0), "no deletions ⟹ both exact")
    assert(run.find(_.getString(4) == "chosen").get.getString(1) == "fetch_k")
  }

  // ---------------- s47 graph beam search ----------------

  test("s47: per-query recall is monotone over hops; the search never scans the corpus") {
    val out = GraphAnn.graphBeamSearch(embDf(n = 80, dim = 8, seed = 31),
      "embedding", "vec_id", queryIds = Seq(1L, 2L), k = 3,
      beamWidth = 8, graphK = 6, buildRounds = 2, hops = 4)
      .orderBy(col("query_id"), col("hop")).collect()
    assert(out.length == 8, "2 queries × 4 hops")
    out.grouped(4).foreach { rows =>
      rows.sliding(2).foreach { case Array(a, b) =>
        assert(b.getAs[Double]("recall") >= a.getAs[Double]("recall"),
          "the beam is a top-cut of a candidate superset — recall " +
            "cannot decrease hop over hop")
      }
      rows.foreach { r =>
        assert(r.getAs[Long]("n_scored") < 80L,
          "graph serving must never score the whole corpus in a hop")
        assert(r.getAs[Long]("n_possible") == 3L)
        assert(r.getAs[Double]("recall") ==
          math.rint(r.getAs[Long]("n_hits").toDouble / 3L * 1e6) / 1e6)
      }
    }
  }

  test("s47: a complete graph reaches exact recall in one hop") {
    // graphK ≥ N−1 with no refinement: the ring wraps the whole
    // corpus, so every vector is the entry's und-neighbor — hop 1
    // scores everything and the beam top-k IS the exact top-k
    val out = GraphAnn.graphBeamSearch(embDf(n = 12, dim = 8, seed = 37),
      "embedding", "vec_id", queryIds = Seq(3L), k = 3,
      beamWidth = 11, graphK = 11, buildRounds = 0, hops = 1).collect()
    assert(out.length == 1 && out.head.getAs[Double]("recall") == 1.0,
      s"complete graph must be exact at hop 1: ${out.toSeq}")
  }

  test("s47: a query that IS the entry vector redirects to the next id") {
    // query 0 == min id: the entry moves to id 1; the search runs and
    // self never appears in any audited beam
    val out = GraphAnn.graphBeamSearch(embDf(n = 40, dim = 8, seed = 41),
      "embedding", "vec_id", queryIds = Seq(0L), k = 3,
      beamWidth = 6, graphK = 4, buildRounds = 1, hops = 3)
      .orderBy(col("hop")).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Long]("n_possible") == 3L))
    assert(out.last.getAs[Long]("n_scored") > 0L)
  }

  // ---------------- d41 prefix-filtered containment ----------------

  private def d41Mixed = {
    import spark.implicits._
    val words = Vector("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "merge", "batch")
    val rnd = new scala.util.Random(53)
    val base = (0 until 30).map { i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }
    // planted containments: doc 100+i is a strict prefix-slice of doc i
    val subs = base.take(5).map { case (id, t) =>
      (id + 100L, t.split(" ").take(8).mkString(" "))
    }
    (base ++ subs).toDF("doc_id", "text")
  }

  test("d41: prefix-filtered containment is IDENTICAL to the exact join at three τ") {
    import graft.pipeline.Dedup
    Seq(0.5, 0.8, 1.0).foreach { tau =>
      val exact = Dedup.containmentPairs(d41Mixed, "text", "doc_id",
          n = 3, threshold = tau, maxPostings = None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.prefixFilterContainment(d41Mixed, "text", "doc_id",
          n = 3, threshold = tau, maxPostings = None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref == exact,
        s"τ=$tau: prefix ${pref.size} vs exact ${exact.size} — " +
          s"missing ${exact -- pref}, extra ${pref -- exact}")
      assert(tau > 0.9 || exact.nonEmpty, s"τ=$tau fixture must have pairs")
    }
  }

  test("d41: boilerplate never enters a sub prefix — the candidate explosion dies") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val header = (0 until 12).map(i => s"h$i").mkString(" ")
    val docs = (0 until 20).map { d =>
      (d.toLong, s"$header " + (0 until 12).map(i => s"u${d}x$i").mkString(" "))
    }.toDF("doc_id", "text")
    val (cand, _) = Dedup.prefixFilterContainmentCandidates(docs, "text",
      "doc_id", n = 3, threshold = 0.6, maxPostings = None)
    assert(cand.count() == 0L,
      "df-ascending prefixes hold only the unique tails — the shared " +
        "header (df = N) generates no candidates, where the full " +
        "intersection pairs all 380 directed combinations")
    // and the exact join agrees nothing qualifies at this τ
    assert(Dedup.containmentPairs(docs, "text", "doc_id", n = 3,
      threshold = 0.6, maxPostings = None).count() == 0L)
  }

  // ---------------- s48 graph index append ----------------

  test("s48: connect/adoption accounting reconciles; id collisions fail loudly") {
    import spark.implicits._
    val corpus = embDf(n = 50, dim = 8, seed = 43)
    val batch = embDf(n = 60, dim = 8, seed = 44)
      .where(col("vec_id") >= 50L) // ids 50..59, disjoint
    val out = graft.pipeline.GraphAnn.graphAppendAudit(corpus, batch,
      "embedding", "vec_id", graphK = 4, buildRounds = 1,
      beamWidth = 8, hops = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("batch").getLong(1) == 10L)
    assert(out("new_edges").getLong(1) == 40L,
      "every new vector connects to exactly graphK nodes when the beam is full")
    assert(out("new_edge_recall").getLong(1) <= 40L)
    assert(out("adopted_nodes").getLong(1) <= out("affected_nodes").getLong(1))
    assert(out("adopted_edges").getLong(1) >= out("adopted_nodes").getLong(1))
    // id collision: loud require, not silent mis-join
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.GraphAnn.graphAppendAudit(corpus,
        corpus.where(col("vec_id") < 3L), "embedding", "vec_id",
        graphK = 2, buildRounds = 0, beamWidth = 4, hops = 1).collect()
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
  }

  test("s48: a complete corpus graph makes every insert exact; an adopted duplicate beats the kth neighbor") {
    import spark.implicits._
    // complete graph (graphK ≥ N−1, no rounds): one hop reaches the
    // whole corpus, so every new vector's adjacency IS its exact top-k
    val corpus = embDf(n = 10, dim = 8, seed = 47)
    val dup = corpus.where(col("vec_id") === 4L)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val out = graft.pipeline.GraphAnn.graphAppendAudit(corpus, dup,
      "embedding", "vec_id", graphK = 3, buildRounds = 0,
      beamWidth = 9, hops = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("new_edge_recall").getDouble(2) == 1.0,
      s"complete graph ⟹ exact insert: ${out("new_edge_recall")}")
    // the new vector is a DUPLICATE of corpus vector 4 (cosine 1.0
    // with it) — vector 4 must adopt it (nothing can outrank cs = 1)
    assert(out("adopted_nodes").getLong(1) >= 1L,
      "a planted duplicate must be adopted by its twin")
  }

  // ---------------- m31 incremental paired release ----------------

  // synthetic "images": 80-char ASCII strings with 'z' blocks in
  // chosen quadrants — distinct block SETS differ in ≥16 phash bits
  // (each block drives 16 lattice cells), while a one-char edit
  // inside a block stays within 3 bits. Transforms that preserve the
  // byte-energy layout (reverse, case flips, one-char prefixes) do
  // NOT make images distinct under phash — learned debugging this
  // very fixture.
  private def img(blocks: Int*): String = {
    val chars = Array.fill(80)('a')
    blocks.foreach(b => (b * 20 until b * 20 + 20).foreach(i => chars(i) = 'z'))
    new String(chars)
  }
  private def tweak(s: String): String = s.substring(0, 79) + "b"

  private def m31Fixture = {
    import spark.implicits._
    val corpus = Seq(
      (1L, img(0), "capA", "web"),
      (2L, img(1), "capB", "web"))
      .toDF("sample_id", "img_text", "caption", "source")
    val batch = Seq(
      // near-dup of corpus image 1 — and its caption is ALSO in the
      // corpus: attribution order must charge the IMAGE stage
      (10L, tweak(img(0)), "capA", "web"),
      // image far from everything, caption already released
      (11L, img(2), "capB", "web"),
      // batch-internal image dup pair: 12 keeps (min id), 13 drops
      (12L, img(3), "c12", "web"),
      (13L, img(3), "c13", "blog"),
      // batch-internal caption dup, images far apart: 14 keeps
      (14L, img(2, 3), "c14", "web"),
      (15L, img(0, 2), "c14", "blog"),
      // clean
      (16L, img(1, 3), "c16", "web"))
      .toDF("sample_id", "img_text", "caption", "source")
    (corpus, batch)
  }

  test("m31: stage sums reconcile, attribution order charges corpus-image first") {
    import graft.pipeline.Multimodal
    val (corpus, batch) = m31Fixture
    val out = Multimodal.incrementalPairedRelease(corpus, batch,
      "sample_id", "img_text", "caption", "source").collect()
    def n(stage: String) = out.find(_.getString(0) == stage).get.getLong(3)
    val admitted = out.filter(_.getString(0) == "admitted")
      .map(_.getLong(1)).toSet
    assert(n("input") == 7L)
    assert(n("corpus_image_dup") == 1L, "sample 10 drops at the IMAGE leg")
    assert(n("corpus_caption_dup") == 1L, "sample 11 drops at the caption leg")
    assert(n("batch_image_pairs") == 1L && n("dropped_image") == 1L,
      "the 12/13 pair keeps min id")
    assert(n("dropped_caption") == 1L, "15 loses the caption group to 14")
    assert(admitted == Set(12L, 14L, 16L), s"got $admitted")
    // conservation: every batch row lands in exactly one bucket
    assert(n("corpus_image_dup") + n("corpus_caption_dup") +
      n("dropped_image") + n("dropped_caption") + admitted.size == n("input"))
    // the corpus is immutable: no corpus id ever appears in the output
    assert(!out.exists(r => !r.isNullAt(1) && r.getLong(1) < 10L))
    // per-source rollup covers the admitted set
    assert(out.filter(_.getString(0) == "admitted_source")
      .map(_.getLong(3)).sum == admitted.size)
  }

  test("m31 equals the full m30 release restricted to the batch (chain-free corpus)") {
    import graft.pipeline.Multimodal
    val (corpus, batch) = m31Fixture
    val incr = Multimodal.incrementalPairedRelease(corpus, batch,
        "sample_id", "img_text", "caption", "source")
      .collect().filter(_.getString(0) == "admitted").map(_.getLong(1)).toSet
    // full run over corpus ∪ batch: corpus ids are smaller, so full-run
    // reps/caption-keeps always prefer the released row — batch
    // admission decisions coincide whenever no batch sample BRIDGES
    // two corpus rows (the documented incremental contract: the
    // released corpus is never re-opened, so chain-merges through
    // dropped batch rows are invisible to the incremental run)
    val full = Multimodal.pairedReleaseRun(corpus.unionByName(batch),
        "sample_id", "img_text", "caption", "source")
      .collect().filter(_.getString(0) == "admitted").map(_.getLong(1)).toSet
    assert(full.filter(_ >= 10L) == incr,
      s"full-run batch admits ${full.filter(_ >= 10L)} != incremental $incr")
    assert(full.filter(_ < 10L) == Set(1L, 2L),
      "the released corpus itself must always survive the full run here")
  }

  // ---------------- t70 LSH-scale fuzzy decontamination ----------------

  test("t70 ⊆ t67: banded flags are a subset with identical exact evidence") {
    import spark.implicits._
    import graft.pipeline.Decontaminate
    val mk = (id: Long, t: String, s: String) => (id, t, s)
    val benchTxt = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val bench = Seq(mk(0L, benchTxt, "suite"),
      mk(50L, "completely different benchmark text about database engines and query plans running fast", "suite"))
      .toDF("doc_id", "text", "source")
    val cands = Seq(
      // exact copy: J = 1 — banding ALWAYS collides (identical sigs)
      mk(1L, benchTxt, "web"),
      // light edit: high J, still caught or honestly missed — but
      // never flagged with different evidence than the exact t67 run
      mk(2L, benchTxt + " extra tail", "web"),
      // unrelated: below tau for both
      mk(3L, "nothing in common with any suite text at all here truly none whatsoever believe me", "web"))
      .toDF("doc_id", "text", "source")
    val t67 = Decontaminate.fuzzyContamination(cands, bench,
      "text", "doc_id", "source", n = 3, tau = 0.5,
      maxCorpusPostings = None)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val t70 = Decontaminate.fuzzyContaminationLsh(cands, bench,
      "text", "doc_id", "source", n = 3, tau = 0.5,
      maxBucket = None)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(t70.keySet.subsetOf(t67.keySet),
      s"banding can only MISS, never invent: ${t70.keySet -- t67.keySet}")
    assert(t70.contains(1L), "an exact copy has identical signatures — " +
      "every band collides, banding can never miss J = 1")
    assert(!t67.contains(3L) && !t70.contains(3L))
    // verification is exact, so a flagged row's evidence matches the
    // lossless run whenever the argmax pair itself collided
    t70.foreach { case (id, (bid, j)) =>
      assert(t67(id) == ((bid, j)),
        s"doc $id: banded evidence ($bid, $j) != exact ${t67(id)}")
    }
  }

  test("t70 maxBucket drops a degenerate template bucket (the d03 guard)") {
    import spark.implicits._
    import graft.pipeline.Decontaminate
    val template = "shared template header text repeated across the whole benchmark suite verbatim"
    val bench = (0 until 20).map(i => (i * 50L, template, "suite"))
      .toDF("doc_id", "text", "source")
    val cands = Seq((1L, template, "web")).toDF("doc_id", "text", "source")
    val capped = Decontaminate.fuzzyContaminationLsh(cands, bench,
      "text", "doc_id", "source", n = 3, tau = 0.5, maxBucket = Some(5))
    assert(capped.count() == 0L,
      "every benchmark row shares one bucket of 20 > cap 5 — dropped")
    val open = Decontaminate.fuzzyContaminationLsh(cands, bench,
      "text", "doc_id", "source", n = 3, tau = 0.5, maxBucket = None)
      .collect()
    assert(open.length == 1 && open.head.getLong(2) == 0L &&
      open.head.getDouble(3) == 1.0,
      "uncapped: flagged against the smallest template id at J = 1")
  }

  test("s45 beats the s41 fixed point on the same corpus at equal k") {
    // the point of the operator: on a corpus where cell-seeding traps
    // recall at the cell boundary, descent keeps climbing past it
    val emb = embDf(n = 80, dim = 8, seed = 11)
    val stuck = GraphAnn.nnDescentRecallAudit(emb, "embedding", "vec_id",
      kCells = 8, k = 4)
      .where(col("stage") === "round1").collect()(0).getDouble(5)
    val descended = GraphAnn.nnDescentConverge(emb, "embedding", "vec_id",
      k = 4, epsilon = 0.0, maxRounds = 6)
      .orderBy(col("round_no")).collect().last.getAs[Double]("recall")
    assert(descended > stuck,
      s"six descent rounds ($descended) should beat the cell ceiling ($stuck)")
  }
}
