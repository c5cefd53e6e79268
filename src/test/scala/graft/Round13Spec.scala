package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Multimodal, TextAnalysis}

/** Round-13 operators: LSH band-shape planner, perplexity bucketing,
  * PQ distortion audit, spectral features.
  */
class Round13Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---------------- d30: LSH band planner ----------------

  test("lshBandPlanner == in-memory S-curve math over the audit pairs") {
    import spark.implicits._
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base), // exact dup: s = 1
      (3L, base.replace("w9", "x9").replace("w33", "x33")), // near dup
      (4L, (1 to 50).map(i => s"u$i").mkString(" ")),
      (5L, ((1 to 25).map(i => s"w$i") ++ (1 to 25).map(i => s"z$i"))
        .mkString(" ")) // partial overlap with 1/2
    ).toDF("doc_id", "text").repartition(3)
    val configs = Seq((1, 8), (2, 4), (4, 2), (8, 1))
    val tau = 0.5

    val sims = Dedup.minHashAccuracyAudit(docs, "text", "doc_id",
        shingleN = 3, numHashes = 8, bands = 4)
      .select("exact_jaccard").collect().map(_.getDouble(0)).toSeq
    assert(sims.nonEmpty, "fixture must produce candidate pairs")

    def pOf(s: Double, b: Int, r: Int): Double = {
      val sr = math.pow(s, r)
      1.0 - math.pow(1.0 - sr, b)
    }
    val expected = configs.map { case (b, r) =>
      val below = sims.filter(_ < tau)
      val above = sims.filter(_ >= tau)
      (b.toLong, r.toLong, below.size.toLong, above.size.toLong,
        below.map(pOf(_, b, r)).sum,
        above.map(s => 1.0 - pOf(s, b, r)).sum,
        if (above.nonEmpty) Some(above.map(pOf(_, b, r)).sum / above.size)
        else None)
    }

    val got = Dedup.lshBandPlanner(docs, "text", "doc_id",
        shingleN = 3, numHashes = 8, auditBands = 4,
        configs = configs, tau = tau)
      .orderBy(col("bands")).collect()
    assert(got.length == configs.size)
    got.zip(expected).foreach { case (row, (b, r, nb, na, fp, fn, rec)) =>
      assert(row.getLong(0) == b && row.getLong(1) == r)
      assert(row.getLong(2) == nb, s"n_below at bands=$b")
      assert(row.getLong(3) == na, s"n_above at bands=$b")
      assert(math.abs(row.getDouble(4) - fp) < 1e-5, s"exp_fp at bands=$b")
      assert(math.abs(row.getDouble(5) - fn) < 1e-5, s"exp_fn at bands=$b")
      rec match {
        case Some(v) =>
          assert(math.abs(row.getDouble(6) - v) < 1e-5, s"recall at bands=$b")
        case None => assert(row.isNullAt(6), s"recall must be null at bands=$b")
      }
    }
    // the S-curve trade: more bands => catches more (recall and FP both
    // non-decreasing), misses less (FN non-increasing)
    val byBands = got.sortBy(_.getLong(0))
    byBands.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(4) <= b.getDouble(4) + 1e-12, "exp_fp monotone")
        assert(a.getDouble(5) >= b.getDouble(5) - 1e-12, "exp_fn monotone")
        assert(a.getDouble(6) <= b.getDouble(6) + 1e-12, "recall monotone")
      case _ =>
    }
  }

  // ---------------- t52: perplexity buckets ----------------

  test("perplexityBuckets == in-memory bucketing of interpolatedLogProb") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val words = Vector("the", "cat", "sat", "mat", "dog", "ran", "fast", "zzq")
    val docs = (0 until 47).map { i =>
      val len = 2 + rnd.nextInt(20)
      (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text").repartition(4)

    val perDoc = TextAnalysis.interpolatedLogProb(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // bucket cut: score desc, id asc; NTILE gives the first
    // (n mod k) buckets one extra row
    val sorted = perDoc.sortBy { case (id, _, lp) => (-lp, id) }
    val n = sorted.length
    val k = 5
    val base = n / k; val extra = n % k
    val expected = (1 to k).map { b =>
      val start = (b - 1) * base + math.min(b - 1, extra)
      val size = base + (if (b <= extra) 1 else 0)
      val slice = sorted.slice(start, start + size)
      val avg = slice.map(t => BigDecimal(t._3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / size
      (b.toLong, size.toLong, slice.map(_._2).sum,
        slice.map(_._3).min, slice.map(_._3).max, avg)
    }

    val got = TextAnalysis.perplexityBuckets(docs, "text", "doc_id",
        lambda = 0.5, buckets = k)
      .orderBy(col("bucket")).collect()
    assert(got.length == k)
    got.zip(expected).foreach { case (r, (b, nd, nb, mn, mx, avg)) =>
      assert(r.getLong(0) == b)
      assert(r.getLong(1) == nd, s"n_docs at bucket $b")
      assert(r.getLong(2) == nb, s"n_bigrams at bucket $b")
      assert(r.getDouble(3) == mn && r.getDouble(4) == mx,
        s"logp range at bucket $b")
      assert(math.abs(r.getDouble(5) - avg) < 1e-9, s"avg_logp at bucket $b")
      assert(math.abs(r.getDouble(6) - math.exp(-r.getDouble(5))) < 1e-5,
        s"ppl at bucket $b")
    }
    // the head/tail ordering: perplexity non-decreasing across buckets
    got.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(6) <= b.getDouble(6) + 1e-9,
        "ppl_of_avg must be non-decreasing in bucket")
      case _ =>
    }
  }

  // ---------------- s32: PQ distortion ----------------

  test("pqSubErrors kernel == in-memory argmin distances; mse reconciles") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val dim = 16; val m = 4; val sub = dim / m; val ksub = 6
    val vecs = (0 until 80).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    // executor-side eval: a LocalRelation would evaluate driver-side
    // and mask serialization bugs
    val emb = vecs.toDF("vec_id", "embedding").repartition(4)
    val books = graft.pipeline.Pq.seedCodebooks(emb, "embedding", "vec_id",
      m, ksub)

    def refErrs(v: Array[Float]): Array[Double] =
      Array.tabulate(m) { j =>
        books(j).map { cent =>
          var d = 0.0
          var i = 0
          while (i < sub) {
            val x = v(j * sub + i).toDouble - cent(i)
            d += x * x
            i += 1
          }
          d
        }.min
      }

    val got = emb.select(col("vec_id"),
        graft.functions.PqExpressions.pqSubErrors(col("embedding"), books)
          .as("errs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      val exp = refErrs(v)
      val act = got(id)
      assert(act.sameElements(exp), s"errs mismatch for vec $id")
    }

    // the reported err per subspace IS the distance of the code the
    // encoder picks (audit and encoder can never disagree)
    val codes = graft.pipeline.Pq.encode(emb, "embedding", books)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Int](r.fieldIndex("codes")).toArray).toMap
    vecs.foreach { case (id, v) =>
      (0 until m).foreach { j =>
        val cent = books(j)(codes(id)(j))
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = v(j * sub + i).toDouble - cent(i); d += x * x; i += 1
        }
        assert(d == got(id)(j), s"err != picked-code distance at ($id, $j)")
      }
    }

    val report = graft.pipeline.Pq.distortionReport(emb, "embedding",
        "vec_id", m, ksub).orderBy(col("j")).collect()
    assert(report.length == m)
    report.foreach { r =>
      val j = r.getLong(0).toInt
      val all = vecs.map { case (_, v) => refErrs(v)(j) }
      assert(r.getLong(1) == vecs.size)
      assert(math.abs(r.getDouble(2) - all.sum / all.size) < 1e-5,
        s"mse at j=$j")
      assert(r.getDouble(3) == all.max, s"max_err at j=$j")
    }
  }

  // ---------------- m19: spectral features ----------------

  test("spectralFeatures == in-memory DFT reference; pure tone concentrates") {
    import spark.implicits._
    val n = 200
    // clip 1: pure tone at bin 3 (offset keeps samples positive-ish,
    // irrelevant to bins >= 1); clip 2: broadband pseudo-noise
    val tone = Array.tabulate(n)(i =>
      (8000 + 6000 * math.cos(2 * math.Pi * 3 * i / n)).toShort)
    val rnd = new scala.util.Random(11)
    val noise = Array.tabulate(n)(_ => (rnd.nextInt(16000)).toShort)
    val media = Seq(
      (1L, Multimodal.WavCodec.encodePcm16(tone, 16000)),
      (2L, Multimodal.WavCodec.encodePcm16(noise, 16000))
    ).toDF("sample_id", "payload").repartition(2)

    def refFeatures(samples: Array[Short], nBins: Int): (Double, Double, Double) = {
      def r6(v: Double): Double =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      val es = (1 to nBins).map { k =>
        var c = 0.0; var s = 0.0
        for (j <- samples.indices) {
          val th = 2.0 * math.Pi * k * j / samples.length
          c += samples(j) * math.cos(th)
          s += samples(j) * math.sin(th)
        }
        val cr = r6(c); val sr = r6(s)
        cr * cr + sr * sr
      }
      val se = es.sum
      val ske = es.zipWithIndex.map { case (e, i) => (i + 1) * e }.sum
      val sk2e = es.zipWithIndex.map { case (e, i) => (i + 1).toDouble * (i + 1) * e }.sum
      val cen = ske / se
      val bw = math.sqrt(math.max(sk2e / se - cen * cen, 0.0))
      val fl = math.exp(es.map(e => math.log(e + 1)).sum / nBins) /
        (es.map(_ + 1.0).sum / nBins)
      (cen, bw, fl)
    }

    val got = Multimodal.spectralFeatures(media, nBins = 8)
      .orderBy(col("sample_id")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    Seq(1L -> tone, 2L -> noise).foreach { case (id, samples) =>
      val (cen, bw, fl) = refFeatures(samples, 8)
      val (gc, gb, gf) = got(id)
      assert(math.abs(gc - cen) < 1e-5, s"centroid clip $id")
      assert(math.abs(gb - bw) < 1e-5, s"bandwidth clip $id")
      assert(math.abs(gf - fl) < 1e-5, s"flatness clip $id")
    }
    // physics: the tone's energy sits at bin 3 with near-zero spread
    // and low flatness; the noise spreads out and is flatter
    val (tc, tb, tf) = got(1L)
    assert(math.abs(tc - 3.0) < 0.05, s"tone centroid $tc !~ 3")
    assert(tb < 0.5, s"tone bandwidth $tb not concentrated")
    val (_, nb2, nf2) = got(2L)
    assert(nf2 > tf, "noise must be flatter than the tone")
    assert(nb2 > tb, "noise must be broader than the tone")
  }

  // ---------------- d31: MinHash signature-size sweep ----------------

  test("minHashSizeSweep == in-memory prefix-match error curve") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),
      (3L, base.replace("w9", "x9").replace("w33", "x33").replace("w51", "q")),
      (4L, ((1 to 30).map(i => s"w$i") ++ (1 to 30).map(i => s"z$i")).mkString(" ")),
      (5L, (1 to 60).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text").repartition(3)
    val ks = Seq(4, 8, 16)

    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def shingles(t: String): Set[String] = {
      val ts = t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
      if (ts.length < 3) Set.empty
      else (0 to ts.length - 3).map(i => s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}").toSet
    }
    val sets = Map(1L -> base, 2L -> base,
      3L -> base.replace("w9", "x9").replace("w33", "x33").replace("w51", "q"),
      4L -> ((1 to 30).map(i => s"w$i") ++ (1 to 30).map(i => s"z$i")).mkString(" "),
      5L -> (1 to 60).map(i => s"u$i").mkString(" ")).map {
      case (id, t) => id -> shingles(t)
    }
    def sig(id: Long): IndexedSeq[String] =
      (0 until 16).map(i => sets(id).map(sh => md5hex(s"$i:$sh")).min)
    // candidate pairs: 4 bands of 2 over the first 8 slots
    val ids = sets.keys.toSeq.sorted
    val cands = for {
      a <- ids; b <- ids if a < b
      if (0 until 4).exists(bd =>
        sig(a)(bd * 2) == sig(b)(bd * 2) && sig(a)(bd * 2 + 1) == sig(b)(bd * 2 + 1))
    } yield (a, b)
    assert(cands.nonEmpty)
    val errsByK = ks.map { k =>
      k -> cands.map { case (a, b) =>
        val est = (0 until k).count(i => sig(a)(i) == sig(b)(i)).toDouble / k
        val inter = (sets(a) & sets(b)).size.toDouble
        val exact = inter / (sets(a).size + sets(b).size - inter)
        math.abs(est - exact)
      }
    }.toMap

    val got = Dedup.minHashSizeSweep(docs, "text", "doc_id", shingleN = 3,
        ks = ks, candidateHashes = 8, auditBands = 4)
      .orderBy(col("k")).collect()
    assert(got.length == ks.size)
    got.foreach { r =>
      val k = r.getLong(0).toInt
      val errs = errsByK(k)
      assert(r.getLong(1) == cands.size, s"n_pairs at k=$k")
      assert(math.abs(r.getDouble(2) - errs.sum / errs.size) < 1e-5,
        s"mean_abs_err at k=$k")
      assert(math.abs(r.getDouble(3) -
        math.sqrt(errs.map(e => e * e).sum / errs.size)) < 1e-5, s"rmse at k=$k")
      assert(math.abs(r.getDouble(4) - errs.max) < 1e-12, s"max at k=$k")
    }
  }

  // ---------------- t53: packing-waste curve ----------------

  test("packingWasteCurve == in-memory concat-chunk accounting") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val docs = (0 until 80).map { i =>
      val len = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(len)("tok").mkString(" "), s"src${i % 3}")
    }.toDF("doc_id", "text", "source").repartition(4)
    val budgets = Seq(16L, 64L, 256L)

    val rows = docs.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").length.toLong,
        r.getString(2)))
    val bySrc = rows.groupBy(_._3).map { case (s, rs) =>
      s -> rs.sortBy(_._1).map(_._2)
    }
    val expected = budgets.map { l =>
      var straddled = 0L
      bySrc.values.foreach { lens =>
        var cum = 0L
        lens.foreach { n =>
          val st = cum; cum += n
          if (st / l != (cum - 1) / l) straddled += 1
        }
      }
      val totals = bySrc.values.map(_.sum)
      val nPacks = totals.map(t => (t + l - 1) / l).sum
      val nTokens = totals.sum
      val nPad = totals.map(t => ((t + l - 1) / l) * l - t).sum
      (l, nPacks, nTokens, nPad, nPad.toDouble / (nPacks * l), straddled)
    }

    val got = graft.pipeline.Sampling.packingWasteCurve(docs, "text",
        "doc_id", "source", budgets)
      .orderBy(col("budget")).collect()
    got.zip(expected).foreach { case (r, (l, np, nt, pad, frac, st)) =>
      assert(r.getLong(0) == l)
      assert(r.getLong(1) == np, s"n_packs at L=$l")
      assert(r.getLong(2) == nt, s"n_tokens at L=$l")
      assert(r.getLong(3) == pad, s"n_padding at L=$l")
      assert(math.abs(r.getDouble(4) - frac) < 1e-12, s"padding_frac at L=$l")
      assert(r.getLong(5) == st, s"n_straddled at L=$l")
    }
    // the trade: longer contexts straddle fewer docs, waste more padding
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(5) >= b.getLong(5), "straddles non-increasing in L")
      case _ =>
    }
  }

  // ---------------- s33: SQ bit-width sweep ----------------

  test("bitsSweep == in-memory affine round-trip; reconciles with the SQ8 path") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 70).map(i =>
      (i.toLong, Array.fill(12)((rnd.nextDouble() * 4 - 2).toFloat)))
    val emb = vecs.toDF("vec_id", "embedding").repartition(3)
    val (lo, hi) = (-2.0, 2.0)
    val bitsList = Seq(2, 4, 8)

    def errOf(x: Double, lev: Double): Double = {
      val code = math.max(0.0, math.min(lev,
        BigDecimal((x - lo) / (hi - lo) * lev)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble))
      x - (code / lev * (hi - lo) + lo)
    }
    val expected = bitsList.map { b =>
      val lev = ((1 << b) - 1).toDouble
      val errs = vecs.flatMap(_._2.map(x => errOf(x.toDouble, lev)))
      (b.toLong, errs.size.toLong,
        errs.map(e => e * e).sum / errs.size, errs.map(math.abs).max)
    }

    val got = graft.pipeline.Quantize.bitsSweep(emb, "embedding", lo, hi,
        bitsList).orderBy(col("bits")).collect()
    got.zip(expected).foreach { case (r, (b, n, mse, mx)) =>
      assert(r.getLong(0) == b)
      assert(r.getLong(1) == n, s"n_values at bits=$b")
      assert(math.abs(r.getDouble(2) - mse) < 1e-5, s"mse at bits=$b")
      assert(math.abs(r.getDouble(3) - mx) < 1e-12, s"max at bits=$b")
    }
    // fidelity is monotone in width
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(2) >= b.getDouble(2), "mse non-increasing in bits")
        assert(a.getDouble(3) >= b.getDouble(3), "max non-increasing in bits")
      case _ =>
    }
    // the 8-bit arm IS the shipped SQ8 round-trip: its worst error
    // must equal the max of s06's per-vector maxReconstructionError
    val sq8Max = graft.pipeline.Quantize.scalarQuantize(emb, "embedding", lo, hi)
      .select(graft.pipeline.Quantize.maxReconstructionError(
        col("embedding"), col("qvec"), lo, hi).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(got.last.getDouble(3) == sq8Max,
      "bits=8 worst error must equal the SQ8 path's")
  }

  // ---------------- d32: containment-threshold curve ----------------

  test("containmentCurve == in-memory max-containment histogram") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, base),                                       // superset
      (2L, (1 to 20).map(i => s"c$i").mkString(" ")),   // contained fully
      (3L, ((1 to 12).map(i => s"c$i") ++ Seq("zz", "qq")).mkString(" ")),
      (4L, (1 to 40).map(i => s"u$i").mkString(" "))    // unrelated
    ).toDF("doc_id", "text").repartition(2)
    val ts = Seq(0.3, 0.6, 0.9, 0.99)

    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val sets = Map(1L -> base,
      2L -> (1 to 20).map(i => s"c$i").mkString(" "),
      3L -> ((1 to 12).map(i => s"c$i") ++ Seq("zz", "qq")).mkString(" "),
      4L -> (1 to 40).map(i => s"u$i").mkString(" ")
    ).map { case (k, v) => k -> shingles(v) }
    val ids = sets.keys.toSeq.sorted
    val dirPairs = for {
      a <- ids; b <- ids if a != b
      inter = (sets(a) & sets(b)).size if inter > 0
    } yield (a, inter.toDouble / sets(a).size)
    val expected = ts.map { t =>
      val hit = dirPairs.filter(_._2 >= t)
      (t, hit.size.toLong, hit.map(_._1).distinct.size.toLong,
        hit.map(_._1).distinct.size.toDouble / 4.0)
    }

    val got = Dedup.containmentCurve(docs, "text", "doc_id", n = 3,
        thresholds = ts, maxPostings = None)
      .orderBy(col("threshold")).collect()
    got.zip(expected).foreach { case (r, (t, np, nd, frac)) =>
      assert(r.getDouble(0) == t)
      assert(r.getLong(1) == np, s"n_pairs at t=$t: ${r.getLong(1)} != $np")
      assert(r.getLong(2) == nd, s"n_docs_dropped at t=$t")
      assert(math.abs(r.getDouble(3) - frac) < 1e-12, s"drop_frac at t=$t")
    }
    // monotone: higher tau can only fire on fewer pairs/docs
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) >= b.getLong(1) && a.getLong(2) >= b.getLong(2))
      case _ =>
    }
  }

  // ---------------- d33: Jaccard-threshold curve ----------------

  test("jaccardThresholdCurve == in-memory keep-min-id histogram") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"j$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base), // jaccard 1 with doc 1
      (3L, base.replace("j7", "x").replace("j21", "y")), // high-jaccard
      (4L, ((1 to 20).map(i => s"j$i") ++ (1 to 20).map(i => s"k$i"))
        .mkString(" ")), // partial
      (5L, (1 to 40).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text").repartition(2)
    val ts = Seq(0.1, 0.4, 0.8, 0.99)

    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val texts = Map(1L -> base, 2L -> base,
      3L -> base.replace("j7", "x").replace("j21", "y"),
      4L -> ((1 to 20).map(i => s"j$i") ++ (1 to 20).map(i => s"k$i")).mkString(" "),
      5L -> (1 to 40).map(i => s"z$i").mkString(" "))
    val sets = texts.map { case (k, v) => k -> shingles(v) }
    val ids = sets.keys.toSeq.sorted
    val pairs = for {
      a <- ids; b <- ids if a < b
      inter = (sets(a) & sets(b)).size if inter > 0
      j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if j >= ts.min
    } yield (b, j) // id_b is the dropped side under keep-min-id
    val expected = ts.map { t =>
      val hit = pairs.filter(_._2 >= t)
      (t, hit.size.toLong, hit.map(_._1).distinct.size.toLong)
    }

    val got = Dedup.jaccardThresholdCurve(docs, "text", "doc_id", n = 3,
        thresholds = ts, maxPostings = None)
      .orderBy(col("threshold")).collect()
    got.zip(expected).foreach { case (r, (t, np, nd)) =>
      assert(r.getDouble(0) == t)
      assert(r.getLong(1) == np, s"n_pairs at t=$t: ${r.getLong(1)} != $np")
      assert(r.getLong(2) == nd, s"n_docs_dropped at t=$t")
      assert(math.abs(r.getDouble(3) - nd / 5.0) < 1e-12, s"drop_frac at t=$t")
    }
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) >= b.getLong(1) && a.getLong(2) >= b.getLong(2),
          "curve must be non-increasing in threshold")
      case _ =>
    }
  }

  // ---------------- m20: octave-band energies ----------------

  test("octaveBandEnergies == in-memory band sums; a tone lands in its octave") {
    import spark.implicits._
    val n = 160
    // tone at bin 5 (band 3: bins 4-7); DC offset keeps samples positive
    val tone = Array.tabulate(n)(i =>
      (9000 + 5000 * math.cos(2 * math.Pi * 5 * i / n)).toShort)
    val media = Seq((1L, Multimodal.WavCodec.encodePcm16(tone, 16000)))
      .toDF("sample_id", "payload").repartition(1)

    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val es = (1 to 15).map { k =>
      var c = 0.0; var s = 0.0
      for (j <- 0 until n) {
        val th = 2.0 * math.Pi * k * j / n
        c += tone(j) * math.cos(th); s += tone(j) * math.sin(th)
      }
      val cr = r6(c); val sr = r6(s)
      k -> (cr * cr + sr * sr)
    }.toMap
    val bandOf = (k: Int) => if (k == 1) 1 else if (k <= 3) 2 else if (k <= 7) 3 else 4
    val expected = (1 to 4).map(b =>
      b.toLong -> r6(math.log1p(es.filter(kv => bandOf(kv._1) == b).values.sum)))
      .toMap

    val got = Multimodal.octaveBandEnergies(media)
      .orderBy(col("band")).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    expected.foreach { case (b, v) =>
      assert(math.abs(got(b) - v) < 1e-5, s"band $b: ${got(b)} != $v")
    }
    // physics: the tone's octave (band 3) carries the most energy
    assert(got(3L) == got.values.max, s"tone must dominate band 3: $got")
  }

  test("lshBandPlanner on a pairless corpus still reports every config") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 30).map(i => s"a$i").mkString(" ")),
        (2L, (1 to 30).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.lshBandPlanner(docs, "text", "doc_id")
      .orderBy(col("bands")).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
      assert(r.isNullAt(6))
    }
  }
}
