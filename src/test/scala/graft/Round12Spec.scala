package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Round-12 operators: edit-distance-verified LSH dedup, closed-form
  * ridge quality training, WAV voice-activity segmentation, and batch
  * maximum-inner-product retrieval.
  */
class Round12Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---------------- d25: LSH + Levenshtein verification ----------------

  /** Plain DP Levenshtein — the in-memory reference. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("lshEditVerifiedPairs == in-memory Levenshtein over the candidate set") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base), // exact dup of 1
      (3L, base.replace("tok7", "tok7x").replace("tok31", "yy")), // near dup
      (4L, (1 to 40).map(i => s"other$i").mkString(" ")), // unrelated
      (5L, base + " tail1 tail2 tail3") // near-superset
    ).toDF("doc_id", "text").repartition(4)
    val cand = Dedup.minHashLshMd5(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val norm = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.trim.replaceAll("[ \\t\\n\\u000B\\f\\r]+", " "))
      .toMap
    val expected = cand.toSeq.flatMap { case (a, b) =>
      val d = lev(norm(a), norm(b))
      val mx = math.max(norm(a).length, norm(b).length)
      val sim = 1.0 - d.toDouble / mx
      if (sim >= 0.9) Some((a, b, d.toLong, sim)) else None
    }.sortBy(p => (p._1, p._2))
    val got = Dedup.lshEditVerifiedPairs(docs, "text", "doc_id", threshold = 0.9)
      .orderBy(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.length == expected.length, s"pair count ${got.toSeq} vs $expected")
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-12, s"sim $g vs $e")
    }
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L && p._4 == 1.0),
      "exact duplicate must verify with dist 0 / sim 1.0")
  }

  test("edit verification rejects the block-swap pair Jaccard accepts") {
    import spark.implicits._
    // half-swapped doc: shingle SET barely changes (Jaccard-verified
    // near-dup) but half the characters move (edit similarity ~0.5)
    val left = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val right = (1 to 30).map(i => s"beta$i").mkString(" ")
    val docs = Seq((1L, s"$left $right"), (2L, s"$right $left"))
      .toDF("doc_id", "text")
    val jac = Dedup.lshVerifiedPairsMd5(docs, "text", "doc_id", threshold = 0.3)
      .collect()
    assert(jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "block swap must stay a Jaccard near-dup (same shingle set up to the seam)")
    val ed = Dedup.lshEditVerifiedPairs(docs, "text", "doc_id", threshold = 0.95)
      .collect()
    assert(!ed.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "edit verification must reject the reordering")
  }

  // ---------------- t48: closed-form ridge training ----------------

  private def ridgeRef(rows: Seq[(Long, Long, Long)], lambda: Double)
      : (Double, Double, Double) = {
    val n = rows.size.toDouble
    val s1 = rows.map(_._1).sum.toDouble; val s2 = rows.map(_._2).sum.toDouble
    val s11 = rows.map(r => r._1 * r._1).sum.toDouble
    val s12 = rows.map(r => r._1 * r._2).sum.toDouble
    val s22 = rows.map(r => r._2 * r._2).sum.toDouble
    val sy = rows.map(_._3).sum.toDouble
    val s1y = rows.map(r => r._1 * r._3).sum.toDouble
    val s2y = rows.map(r => r._2 * r._3).sum.toDouble
    val l = lambda
    val det = n * ((s11 + l) * (s22 + l) - s12 * s12) -
      s1 * (s1 * (s22 + l) - s12 * s2) +
      s2 * (s1 * s12 - (s11 + l) * s2)
    val det0 = sy * ((s11 + l) * (s22 + l) - s12 * s12) -
      s1 * (s1y * (s22 + l) - s12 * s2y) +
      s2 * (s1y * s12 - (s11 + l) * s2y)
    val det1 = n * (s1y * (s22 + l) - s12 * s2y) -
      sy * (s1 * (s22 + l) - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * ((s11 + l) * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - (s11 + l) * s2)
    (det0 / det, det1 / det, det2 / det)
  }

  test("ridgeQualityScore matches the in-memory normal-equation solve") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1 to 60).map { i =>
      val nTok = 5 + rnd.nextInt(40)
      val toks = (0 until nTok).map(_ => s"w${rnd.nextInt(12)}")
      (i.toLong, toks.mkString(" "), if (i % 3 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang").repartition(5)
    val feats = docs.collect().map { r =>
      val toks = r.getString(1).split(" ")
      (r.getLong(0), toks.length.toLong, toks.distinct.length.toLong,
        if (r.getString(2) == "en") 1L else 0L)
    }
    val (b0, b1, b2) = ridgeRef(feats.map(f => (f._2, f._3, f._4)), 10.0)
    val out = TextAnalysis.ridgeQualityScore(docs, "text", "doc_id",
        positive = col("lang") === "en", lambda = 10.0)
      .orderBy(col("id")).collect()
    assert(out.length == feats.length)
    val byId = feats.map(f => f._1 -> f).toMap
    out.foreach { r =>
      val f = byId(r.getLong(0))
      assert(r.getLong(1) == f._2 && r.getLong(2) == f._3 && r.getLong(3) == f._4)
      assert(math.abs(r.getDouble(4) - b0) < 5e-9, s"beta0 ${r.getDouble(4)} vs $b0")
      assert(math.abs(r.getDouble(5) - b1) < 5e-9)
      assert(math.abs(r.getDouble(6) - b2) < 5e-9)
      val score = b0 + b1 * f._2 + b2 * f._3
      assert(math.abs(r.getDouble(7) - score) < 5e-7, s"score ${r.getDouble(7)} vs $score")
    }
  }

  test("ridge shrinks toward zero as lambda grows; lambda=0 solves OLS exactly") {
    import spark.implicits._
    // y IS a deterministic function separable by f1: long docs are 'en'
    val docs = (1 to 30).map { i =>
      val nTok = if (i % 2 == 0) 40 + i else 5 + i % 4
      (i.toLong, (0 until nTok).map(j => s"t${j % 7}").mkString(" "),
        if (i % 2 == 0) "en" else "fr")
    }.toDF("doc_id", "text", "lang")
    def betas(lambda: Double): (Double, Double, Double) = {
      val r = TextAnalysis.ridgeQualityScore(docs, "text", "doc_id",
        col("lang") === "en", lambda).limit(1).collect().head
      (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    }
    val (_, b1small, b2small) = betas(0.0)
    val (_, b1big, b2big) = betas(1e6)
    assert(math.abs(b1big) < math.abs(b1small) || math.abs(b2big) < math.abs(b2small),
      "large lambda must shrink the coefficients")
    // lambda=0 == OLS: residuals orthogonal to features (normal eqs)
    val feats = docs.collect().map { r =>
      val toks = r.getString(1).split(" ")
      (toks.length.toLong, toks.distinct.length.toLong,
        if (r.getString(2) == "en") 1L else 0L)
    }
    val (o0, o1, o2) = ridgeRef(feats, 0.0)
    val r1 = feats.map(f => (f._3 - (o0 + o1 * f._1 + o2 * f._2)) * f._1).sum
    val r2 = feats.map(f => (f._3 - (o0 + o1 * f._1 + o2 * f._2)) * f._2).sum
    assert(math.abs(r1) < 1e-6 && math.abs(r2) < 1e-6,
      s"OLS normal equations violated: $r1 / $r2")
  }

  // ---------------- m15: voice-activity segments ----------------

  test("vadSegments finds exactly the planted loud burst") {
    import spark.implicits._
    // 4 frames of 4 samples: silence, loud, loud, silence
    val samples: Array[Short] =
      (Array.fill(4)(0) ++ Array.fill(8)(1000) ++ Array.fill(4)(0)).map(_.toShort)
    val wav = Multimodal.WavCodec.encodePcm16(samples, 16000)
    val media = Seq((7L, wav)).toDF("sample_id", "payload")
    val segs = Multimodal.vadSegments(media, frameLen = 4, minFrames = 2).collect()
    assert(segs.length == 1)
    val s = segs.head
    assert(s.getLong(0) == 7L && s.getLong(1) == 1L && s.getLong(2) == 2L)
    assert(s.getLong(3) == 2L)
    assert(s.getLong(4) == 8L * 1000L * 1000L, "segment energy is the exact integer sum")
  }

  test("vadSegments: constant signal has no strictly-above-mean frame") {
    import spark.implicits._
    val samples = Array.fill(16)(500.toShort)
    val media = Seq((1L, Multimodal.WavCodec.encodePcm16(samples, 16000)))
      .toDF("sample_id", "payload")
    assert(Multimodal.vadSegments(media, frameLen = 4, minFrames = 1).isEmpty)
  }

  test("vadSegments: isolated single loud frame dropped by minFrames=2") {
    import spark.implicits._
    val samples: Array[Short] =
      (Array.fill(4)(0) ++ Array.fill(4)(1000) ++ Array.fill(8)(0)).map(_.toShort)
    val media = Seq((1L, Multimodal.WavCodec.encodePcm16(samples, 16000)))
      .toDF("sample_id", "payload")
    assert(Multimodal.vadSegments(media, frameLen = 4, minFrames = 2).isEmpty)
    val one = Multimodal.vadSegments(media, frameLen = 4, minFrames = 1).collect()
    assert(one.length == 1 && one.head.getLong(1) == 1L && one.head.getLong(3) == 1L)
  }

  test("vadSegments splits separated bursts and is partitioning-invariant") {
    import spark.implicits._
    // loud(2 frames), silence(2), loud(3), partial silent tail
    val samples: Array[Short] = (Array.fill(8)(900) ++ Array.fill(8)(0) ++
      Array.fill(12)(900) ++ Array.fill(3)(0)).map(_.toShort)
    val media = (0 until 6).map(i => (i.toLong,
      Multimodal.WavCodec.encodePcm16(samples, 16000)))
      .toDF("sample_id", "payload")
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.vadSegments(df, frameLen = 4, minFrames = 2)
        .orderBy(col("sample_id"), col("start_frame")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = run(media)
    assert(got.count(_._1 == 0L) == 2, s"two bursts expected: $got")
    assert(got.filter(_._1 == 0L).map(g => (g._2, g._3, g._4)) ==
      Seq((0L, 1L, 2L), (4L, 6L, 3L)))
    assert(got == run(media.repartition(7)), "partitioning must not change segments")
  }

  // ---------------- d26: content-defined chunking ----------------

  /** In-memory CDC boundary reference: 1-based end positions. */
  private def cdcEnds(s: String, w: Int = 16, mod: Int = 16): Seq[Int] = {
    val M = 2147483648L
    val pows = Seq.iterate(1L, w)(p => p * 31 % M)
    val bs = (w to s.length).filter { i =>
      val h = (0 until w).map(j => s(i - 1 - j).toLong * pows(j)).sum % M
      h % mod == 0
    }
    (bs :+ s.length).distinct
  }

  test("cdcChunkDedup boundaries match the in-memory rolling-hash reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val docs = (1 to 20).map { i =>
      (i.toLong, (0 until 30 + rnd.nextInt(40))
        .map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
    }
    val out = graft.pipeline.Dedup.cdcChunkDedup(
        docs.toDF("doc_id", "text").repartition(3), "text", "doc_id")
      .orderBy(col("doc_id")).collect()
    // reference: chunk digests across the corpus
    val refChunks = docs.flatMap { case (id, t) =>
      val ends = cdcEnds(t)
      ends.zip(0 +: ends.init).map { case (e, s) => (id, t.substring(s, e)) }
    }
    val dfCount = refChunks.groupBy(_._2).view.mapValues(_.size).toMap
    val ref = refChunks.groupBy(_._1).map { case (id, cs) =>
      val dup = cs.filter(c => dfCount(c._2) >= 2)
      id -> (cs.size.toLong, dup.size.toLong,
        dup.map(_._2.length).sum.toDouble / cs.map(_._2.length).sum)
    }
    assert(out.length == ref.size)
    out.foreach { r =>
      val e = ref(r.getLong(0))
      assert(r.getLong(1) == e._1 && r.getLong(2) == e._2,
        s"doc ${r.getLong(0)}: ${(r.getLong(1), r.getLong(2))} vs $e")
      assert(math.abs(r.getDouble(3) - e._3) < 1e-12)
    }
  }

  test("CDC chunking re-syncs after an insertion where fixed chunks misalign") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok${i % 23}x$i").mkString(" ")
    val shifted = "Z " + base // 2-char insertion at the front
    // CDC: boundaries derive from local windows — everything past the
    // first re-sync point chunks identically, so most digests shared
    val endsA = cdcEnds(base)
    val chunksA = endsA.zip(0 +: endsA.init).map { case (e, s) => base.substring(s, e) }
    val endsB = cdcEnds(shifted)
    val chunksB = endsB.zip(0 +: endsB.init).map { case (e, s) => shifted.substring(s, e) }
    val shared = chunksA.toSet.intersect(chunksB.toSet).size
    assert(shared >= chunksA.size / 2,
      s"CDC must re-sync: only $shared of ${chunksA.size} chunks shared")
    // fixed-size chunking on the same pair: every boundary shifts by 2
    val fixedA = base.grouped(16).toSeq
    val fixedB = shifted.grouped(16).toSeq
    val fixedShared = fixedA.toSet.intersect(fixedB.toSet).size
    assert(fixedShared <= 1,
      s"fixed chunking must misalign (got $fixedShared shared)")
    // and the OPERATOR sees the duplication: both docs report high
    // dup ratios when chunked together
    val out = graft.pipeline.Dedup.cdcChunkDedup(
        Seq((1L, base), (2L, shifted)).toDF("doc_id", "text"), "text", "doc_id")
      .orderBy(col("doc_id")).collect()
    assert(out.forall(_.getDouble(3) > 0.4),
      s"insertion-shifted near-dup must share most chunk mass: ${out.toSeq}")
  }

  // ---------------- t49: token-budget selection ----------------

  test("tokenBudgetSelect is the deterministic greedy prefix") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),      // 6 tokens, 6 types
      (2L, "a a a a"),          // 4 tokens, 1 type
      (3L, "x y z w q a b c"),  // 8 tokens, 8 types
      (4L, "p q r s t"),        // 5 tokens, 5 types
      (5L, "m n")               // 2 tokens, 2 types
    ).toDF("doc_id", "text")
    // priority order: 3(8), 1(6), 4(5), 5(2), 2(1); budget 15:
    // cum_before 0, 8, 14 -> doc 4 straddles (14 < 15), then 19 stops
    val out = graft.pipeline.Sampling.tokenBudgetSelect(
        docs, "text", "doc_id", budget = 15L)
      .orderBy(col("cum_before")).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((3L, 0L), (1L, 8L), (4L, 14L)), out.toSeq.toString)
    // a larger budget only APPENDS (greedy prefix property)
    val bigger = graft.pipeline.Sampling.tokenBudgetSelect(
        docs, "text", "doc_id", budget = 16L)
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet.subsetOf(bigger))
  }

  // ---------------- m16: audio quality ----------------

  test("audioQualityReport: designed clip/silence/DC signal") {
    import spark.implicits._
    // 2 clipped (+32700, -32700), 3 silent (0, 100, -4096), 5 normal
    val samples = Array[Short](32700, -32700, 0, 100, -4096,
      8000, -8000, 6000, 5000, 6500)
    val media = Seq((3L, Multimodal.WavCodec.encodePcm16(samples, 16000)))
      .toDF("sample_id", "payload")
    val r = Multimodal.audioQualityReport(media).collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 0.2, "clip ratio")
    assert(r.getDouble(3) == samples.map(_.toInt).sum.toDouble / 10, "dc offset")
    assert(r.getDouble(4) == 0.3, "silence ratio")
    assert(r.getLong(5) == 32700L + 32700L, "dynamic range")
    assert(r.getLong(6) == 32700L, "peak")
  }

  // ---------------- m17: image patches ----------------

  test("imagePatches matches the byte map incl. the zero-padded tail") {
    import spark.implicits._
    // 23 chars -> 10-wide BMP, h=3, zero-padded past byte 23; 5x5
    // patches -> one patch row (rows=3), two patch cols
    val text = "abcdefghijklmnopqrstuvw"
    val docs = Seq((9L, text)).toDF("doc_id", "text")
    val out = Multimodal.imagePatches(
        Multimodal.textAsBmp(docs, "doc_id", "text", width = 10))
      .orderBy(col("patch_row"), col("patch_col")).collect()
    assert(out.length == 2)
    def byteAt(idx: Int): Int = if (idx < text.length) text(idx).toInt else 0
    for ((row, pc) <- out.zipWithIndex) {
      assert(row.getLong(1) == 0L && row.getLong(2) == pc.toLong)
      assert(row.getLong(3) == 15L, "3 real rows x 5 cols")
      val idxs = for (r <- 0 until 3; c <- 0 until 5) yield r * 10 + pc * 5 + c
      val eb = idxs.map(byteAt).sum.toDouble / 15
      val eg = idxs.map(i => if (i < text.length) 255 - byteAt(i) else 0).sum.toDouble / 15
      val er = idxs.map(i => if (i < text.length) (2 * byteAt(i)) % 256 else 0).sum.toDouble / 15
      assert(row.getDouble(4) == er && row.getDouble(5) == eg && row.getDouble(6) == eb,
        s"patch $pc channel means")
    }
  }

  // ---------------- t46 kernel: MLM mask ----------------

  test("MlmMaskSummary kernel == composable HOF chain (fixture + adversarial, off-driver)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val adversarial = Seq(
      (1L, ""), (2L, "   "), (3L, "one"), (4L, "a b c d e f g h i j"),
      (5L, "  leading and   trailing  "), (6L, "UPPER Case MiXeD"),
      (7L, "tab\tand\nnewlineseparators"),
      (8L, ("x " * 300).trim)) ++
      (9 to 40).map(i => (i.toLong,
        (0 until rnd.nextInt(60)).map(_ => s"w${rnd.nextInt(20)}").mkString(" ")))
    val docs = adversarial.toDF("doc_id", "text").repartition(5)
    val kernel = TextAnalysis.mlmMask(docs, "text", "doc_id")
      .orderBy(col("doc_id")).collect()
    val chain = TextAnalysis.mlmMaskComposable(docs, "text", "doc_id")
      .orderBy(col("doc_id")).collect()
    assert(kernel.length == chain.length)
    kernel.zip(chain).foreach { case (k, c) =>
      assert(k.toSeq == c.toSeq, s"kernel/chain diverged:\n$k\n$c")
    }
    // and with a different nibble set
    val k2 = TextAnalysis.mlmMask(docs, "text", "doc_id", Seq("a", "f"))
      .orderBy(col("doc_id")).collect()
    val c2 = TextAnalysis.mlmMaskComposable(docs, "text", "doc_id", Seq("a", "f"))
      .orderBy(col("doc_id")).collect()
    k2.zip(c2).foreach { case (k, c) => assert(k.toSeq == c.toSeq) }
  }

  // ---------------- m18: scene segmentation ----------------

  test("sceneSegments cuts exactly where the hash jumps > maxHamming") {
    import spark.implicits._
    // frames: A, A(+1 bit), A(+2 bits), B(far), B, C(far) — cuts at
    // 0 (first), 3 (A->B), 5 (B->C) => scenes [0..2], [3..4], [5]
    val a = 0x00000000FFFF0000L
    val rows = Seq(
      (1L, 0L, a, 0L), (1L, 1L, a | 1L, 0L), (1L, 2L, a | 3L, 0L),
      (1L, 3L, ~a, 1L), (1L, 4L, ~a, 1L), (1L, 5L, 0x0F0F0F0FL, ~0L))
      .toDF("sample_id", "frame_idx", "ahash_hi", "ahash_lo")
    val segs = Multimodal.sceneSegments(rows, maxHamming = 3)
      .orderBy(col("scene_idx")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(segs.toSeq == Seq((1L, 0L, 2L, 3L), (2L, 3L, 4L, 2L), (3L, 5L, 5L, 1L)),
      segs.toSeq.toString)
  }

  test("sceneSegments: scene frames partition the clip, no gaps or overlaps") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 4).flatMap { s =>
      (0 until 25).map(f => (s.toLong, f.toLong, rnd.nextLong(), rnd.nextLong()))
    }.toDF("sample_id", "frame_idx", "ahash_hi", "ahash_lo")
    val segs = Multimodal.sceneSegments(rows, maxHamming = 10)
      .orderBy(col("sample_id"), col("scene_idx")).collect()
    segs.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val spans = ss.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(spans.head._1 == 0L, "first scene starts at frame 0")
      assert(spans.last._2 == 24L, "last scene ends at the last frame")
      spans.sliding(2).foreach {
        case Array((_, e1, _), (s2, _, _)) => assert(s2 == e1 + 1, "contiguous")
        case _ =>
      }
      assert(spans.map(_._3).sum == 25L, "frame counts partition the clip")
    }
  }

  // ---------------- t50: NB language-ID confusion ----------------

  test("nbLangConfusion: disjoint vocabularies classify perfectly") {
    import spark.implicits._
    val docs = (1 to 40).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      (i.toLong, (0 until 10).map(j => s"${lang}_w${(i + j) % 6}").mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
    val conf = TextAnalysis.nbLangConfusion(docs, "text", "doc_id", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(conf.forall(c => c._1 == c._2), s"off-diagonal predictions: ${conf.toSeq}")
    assert(conf.map(_._3).sum == 40L, "every doc predicted exactly once")
  }

  test("nbLangConfusion: priors break ties toward the majority class") {
    import spark.implicits._
    // identical token distributions; 'maj' has 3x the docs — every
    // likelihood ties, the prior must decide
    val docs = ((1 to 30).map(i => (i.toLong, "w w w", "maj")) ++
      (31 to 40).map(i => (i.toLong, "w w w", "min")))
      .toDF("doc_id", "text", "lang")
    val conf = TextAnalysis.nbLangConfusion(docs, "text", "doc_id", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(conf == Set(("maj", "maj", 30L), ("min", "maj", 10L)),
      s"prior must dominate the tie: $conf")
  }

  // ---------------- s29: retrieval nDCG ----------------

  test("retrievalNdcg: near-lossless quantization scores 1.0; bounds hold") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val emb = (0 until 50).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < 3)
    val wide = graft.pipeline.Quantize.retrievalNdcg(
        emb, "embedding", "vec_id", qs, "vec_id", k = 5, lo = -2.0, hi = 2.0)
      .collect()
    assert(wide.length == 3)
    wide.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 5L)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // binary-exact range: components are in (-1, 1); with lo/hi at
    // ±1.28 the SQ8 grid step is exactly 0.01... no — instead check
    // the degenerate identity: quantizing a corpus whose vectors are
    // already ON grid points reconstructs exactly => ndcg 1.0
    val grid = (0 until 30).map { i =>
      (i.toLong, Array.fill(4)(((rnd.nextInt(256) - 128) + 128).toFloat / 255f * 4f - 2f))
    }.toDF("vec_id", "embedding")
    val exact = graft.pipeline.Quantize.retrievalNdcg(
        grid, "embedding", "vec_id", grid.filter(col("vec_id") < 2), "vec_id",
        k = 5, lo = -2.0, hi = 2.0)
      .collect()
    exact.foreach(r => assert(r.getDouble(2) == 1.0 && r.getLong(1) == 5L,
      s"on-grid corpus must rank identically: $r"))
  }

  // ---------------- d27: dedup impact report ----------------

  test("dedupImpactReport histogram reconciles with the d06 closure and the corpus") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val docs = (Seq((1L, base), (2L, base), (3L, base)) ++ // 3-clique
      Seq((4L, "x1 x2 x3 x4 x5 x6"), (5L, "x1 x2 x3 x4 x5 x6")) ++ // pair
      (6 to 12).map(i => (i.toLong, (1 to 20).map(j => s"u${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val rep = Dedup.dedupImpactReport(docs, "text", "doc_id")
      .orderBy(col("cluster_size")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.toSeq == Seq((1L, 7L, 7L, 0L), (2L, 1L, 2L, 1L), (3L, 1L, 3L, 2L)),
      rep.toSeq.toString)
    assert(rep.map(_._3).sum == 12L, "n_docs must sum to the corpus")
  }

  // ---------------- d28: MinHash accuracy audit ----------------

  test("minHashAccuracyAudit: exact dups estimate 1.0 with zero error; est bounds hold") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), // exact dup: all 8 slots match
      (3L, base.replace("tok5", "zzz").replace("tok30", "qqq")),
      (4L, (1 to 40).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text").repartition(3)
    val out = Dedup.minHashAccuracyAudit(docs, "text", "doc_id")
      .orderBy(col("id_a"), col("id_b")).collect()
    val dup = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(dup.isDefined, "exact duplicate must be a candidate")
    assert(dup.get.getLong(2) == 8L && dup.get.getDouble(3) == 1.0 &&
      dup.get.getDouble(4) == 1.0 && dup.get.getDouble(5) == 0.0)
    out.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 8L,
        "a candidate shares at least one full band => >= 1 matching slot")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  // ---------------- t51: contamination sensitivity curve ----------------

  test("contaminationCurve: flagged counts are non-increasing in n; planted span") {
    import spark.implicits._
    val benchDoc = "copy this exact four token span plus more filler words here"
    // train doc 1 copies a 4-token window; doc 2 shares only single
    // tokens (every 2-gram broken); doc 3 disjoint
    val train = Seq(
      (1L, "unrelated prefix this exact four token ending differently now"),
      (2L, "copy words exact filler this span more token plus here four"),
      (3L, "totally disjoint content nothing shared at all right here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchDoc)).toDF("doc_id", "text")
    val out = graft.pipeline.Decontaminate.contaminationCurve(
        train, bench, "text", "doc_id", ns = Seq(2, 4, 8))
      .orderBy(col("shingle_n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).toSeq == Seq(2L, 4L, 8L))
    val counts = out.map(_._2)
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b; case _ => true },
      s"flagged counts must be non-increasing in n: ${counts.toSeq}")
    assert(counts(1) >= 1L, "the planted 4-token span must flag at n=4")
    assert(counts(2) == 0L, "no 8-token span is shared")
  }

  // ---------------- s30: IVF cell balance ----------------

  test("cellBalanceReport: fractions sum to 1, counts match clusterReport, imbalance exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val emb = (0 until 80).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding").repartition(4)
    val rep = graft.pipeline.Clustering.cellBalanceReport(
        emb, "embedding", "vec_id", k = 4)
      .orderBy(col("cell")).collect()
    val total = rep.map(_.getLong(1)).sum
    assert(total == 80L)
    assert(math.abs(rep.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    val mx = rep.map(_.getLong(1)).max
    rep.foreach(r =>
      assert(r.getDouble(3) == mx.toDouble * 4.0 / 80.0, "imbalance factor"))
    val cr = graft.pipeline.Clustering.clusterReport(emb, "embedding", "vec_id", 4)
      .orderBy(col("cell")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rep.foreach(r => assert(cr(r.getLong(0)) == r.getLong(1),
      "histogram must agree with clusterReport"))
  }

  // ---------------- s31: recall vs nprobe ----------------

  test("recallVsNprobe: monotone in nprobe; full probe budget == exact (recall 1.0)") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val emb = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding").repartition(4)
    val out = graft.pipeline.Ivf.recallVsNprobe(emb, "embedding", "vec_id",
        queryId = 0L, k = 5, numCells = 6, nprobes = Seq(1, 2, 3, 6))
      .orderBy(col("nprobe")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 6L))
    assert(out.map(_._2).sliding(2).forall {
      case Array(a, b) => a <= b; case _ => true },
      s"recall must be monotone in nprobe: ${out.toSeq}")
    assert(out.last._2 == 5L && out.last._3 == 1.0,
      s"probing every cell IS the exact search: ${out.last}")
    out.foreach(r => assert(r._3 == r._2.toDouble / 5.0))
  }

  // ---------------- d29: SemDeDup threshold curve ----------------

  test("semDedupThresholdCurve: monotone, reconciles with semDedup at each threshold") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val emb = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding").repartition(4)
    val ts = Seq(0.1, 0.3, 0.5, 0.99)
    val curve = graft.pipeline.Clustering.semDedupThresholdCurve(
        emb, "embedding", "vec_id", k = 4, thresholds = ts)
      .orderBy(col("threshold")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(curve.map(_._1).toSeq == ts)
    assert(curve.map(_._2).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true },
      s"drops must be non-increasing in threshold: ${curve.toSeq}")
    assert(curve.last._2 == 0L, "threshold 0.99 must drop nothing on random vectors")
    // each curve point must equal the ACTUAL semDedup drop count at
    // that threshold (the curve predicts exactly what d14 would do)
    ts.foreach { t =>
      val dropped = graft.pipeline.Clustering.semDedup(
          emb, "embedding", "vec_id", 4, t)
        .where(!col("keep")).count()
      val point = curve.find(_._1 == t).get
      assert(point._2 == dropped,
        s"curve at $t says ${point._2}, semDedup drops $dropped")
    }
  }

  // ---------------- s28: batch MIPS ----------------

  test("mipsTopKBatch == in-memory inner-product ranking") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
    val emb = vecs.toDF("vec_id", "embedding").repartition(4)
    val got = Similarity.mipsTopKBatch(emb, emb.filter(col("vec_id") < 2),
        "embedding", "vec_id", "vec_id", k = 4)
      .orderBy(col("query_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val expected = (0L until 2L).flatMap { q =>
      val qv = vecs(q.toInt)._2
      vecs.map { case (id, v) =>
        var d = 0.0
        for (i <- v.indices) d += v(i).toDouble * qv(i).toDouble
        (id, d)
      }.sortBy { case (id, d) => (-d, id) }.take(4).zipWithIndex
        .map { case ((id, _), r) => (q, id, r + 1L) }
    }
    assert(got.toSeq == expected)
  }

  test("MIPS ranking is magnitude-aware where cosine is not") {
    import spark.implicits._
    // v2 = 3 * v1: same direction, larger magnitude. Query along the
    // shared direction: cosine ties (v1 wins by id); MIPS must put
    // the long vector first.
    // exactly-representable components so v2 == 3 * v1 bit-exactly
    // and the cosines tie to the last ulp
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)), // query
      (1L, Array(0.5f, 0.25f, 0f)),
      (2L, Array(1.5f, 0.75f, 0f))
    ).toDF("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") > 0)
    val mips = Similarity.mipsTopKBatch(corpus, emb.filter(col("vec_id") === 0),
        "embedding", "vec_id", "vec_id", k = 2)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(mips == Seq(2L, 1L), s"MIPS must rank the scaled vector first: $mips")
    val cos = Similarity.bruteForceTopKBatch(corpus, emb.filter(col("vec_id") === 0),
        "embedding", "vec_id", "vec_id", k = 2)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(cos == Seq(1L, 2L),
      s"cosine must tie on direction and break by id: $cos")
  }
}
