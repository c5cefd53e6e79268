package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Clustering, Dedup, Multimodal, TextAnalysis}

/** Round-9 operators: the cell-blocked embedding near-dup path
  * (d05/d08's declared query) pinned differentially against the
  * all-pairs brute force it replaces.
  */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Blocked pairs must be EXACTLY the same-cell subset of the
    * brute-force pairs: recall within a block is 1.0, and nothing
    * outside a block or below the threshold leaks in. cos_sim must
    * be bit-identical (same expression on both paths).
    */
  private def assertBlockedIsCellScopedBrute(
      emb: DataFrame, tau: Double, k: Int): Unit = {
    val blocked = Dedup.embeddingNearDupsBlocked(emb, "embedding", "vec_id", tau, k)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cells = Clustering.assignToSeeds(emb, "embedding", "vec_id", k)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val brute = Dedup.embeddingNearDups(emb, "embedding", "vec_id", tau)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val expected = brute.filter { case ((a, b), _) => cells(a) == cells(b) }
    assert(blocked.keySet == expected.keySet,
      s"blocked=${blocked.keySet} expected same-cell brute=${expected.keySet}")
    expected.foreach { case (pair, sim) =>
      assert(blocked(pair) == sim, s"cos_sim drift on $pair")
    }
  }

  test("blocked near-dup == same-cell brute force on the fixture corpus") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    assertBlockedIsCellScopedBrute(emb, tau = 0.35, k = 4)
    assertBlockedIsCellScopedBrute(emb, tau = 0.4, k = 8)
  }

  test("blocked near-dup differential on seeded random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed9001L)
    for (trial <- 1 to 6) {
      val n = 40 + rnd.nextInt(60)
      val dim = 8
      val k = 2 + rnd.nextInt(5)
      val tau = 0.3 + rnd.nextDouble() * 0.4
      // planted duplicates: some rows are noisy copies of earlier rows
      val base = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
      for (i <- 0 until n if i > 0 && rnd.nextDouble() < 0.3) {
        val src = rnd.nextInt(i)
        base(i) = base(src).map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
      }
      val emb = base.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toSeq.toDF("vec_id", "embedding")
      withClue(s"trial $trial (n=$n k=$k tau=$tau): ") {
        assertBlockedIsCellScopedBrute(emb, tau, k)
      }
    }
  }

  test("zipfFit degenerate corpora: NULL, never inf/nan") {
    import spark.implicits._
    // every token distinct -> all top-N counts equal -> r2's
    // n*syy - sy*sy denominator is 0; both engines must say NULL
    val flat = Seq((0L, "a b c d"), (1L, "e f g h")).toDF("doc_id", "text")
    val r1 = graft.pipeline.TextAnalysis.zipfFit(flat, "text", topN = 100).head()
    assert(r1.getLong(0) == 8L)
    assert(r1.isNullAt(3), "r2 must be NULL when all counts are equal")
    assert(!r1.isNullAt(1), "slope is defined (ranks differ)")
    // a single token type -> one rank -> slope denominator is 0 too
    val mono = Seq((0L, "x x x")).toDF("doc_id", "text")
    val r2 = graft.pipeline.TextAnalysis.zipfFit(mono, "text", topN = 100).head()
    assert(r2.getLong(0) == 1L)
    assert(r2.isNullAt(1) && r2.isNullAt(3))
  }

  test("events schema is round-stable: ts_ns present on every physical type") {
    val ev = Tables.events(spark, SparkFixture.sfDir)
    assert(ev.columns.contains("ts_ns"))
    assert(ev.schema("ts_ns").dataType == org.apache.spark.sql.types.LongType)
    // ts_ns is consistent with ts at µs precision on every path
    val bad = ev.where(unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad == 0L)
  }

  // ------------------------------------------------------------ nbQualityScore

  test("nbQualityScore matches a hand-computed Naive Bayes") {
    import spark.implicits._
    // pos docs say "good", neg doc says "bad"; "the" is shared
    val docs = Seq(
      (0L, "good the", "en"),
      (1L, "good good", "en"),
      (2L, "bad the", "zh")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nbQualityScore(docs, "text", "doc_id",
      positive = col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // counts: pos tokens: good=3, the=1 (Npos=4); neg: bad=1, the=1 (Nneg=2); V=3
    val (npos, nneg, v) = (4.0, 2.0, 3.0)
    def llr(cp: Long, cn: Long): Double =
      math.log((cp + 1.0) / (npos + v)) - math.log((cn + 1.0) / (nneg + v))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val good = llr(3, 0); val the = llr(1, 1); val bad = llr(0, 1)
    assert(out(0L)._1 == 1L && out(0L)._2 == 2L)
    assert(out(0L)._3 == r6((good + the) / 2))
    assert(out(1L)._3 == r6(good))
    assert(out(2L)._1 == 0L)
    assert(out(2L)._3 == r6((bad + the) / 2))
    // trusted-class docs must outscore the untrusted one
    assert(out(0L)._3 > out(2L)._3 && out(1L)._3 > out(2L)._3)
  }

  test("nbQualityScore differential on seeded corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed9006L)
    for (trial <- 1 to 5) {
      val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff")
      val docs = (0 until 20 + rnd.nextInt(20)).map { i =>
        val n = 1 + rnd.nextInt(8)
        val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        (i.toLong, text, if (rnd.nextBoolean()) "en" else "xx")
      }
      val df = docs.toDF("doc_id", "text", "lang")
      val out = TextAnalysis.nbQualityScore(df, "text", "doc_id",
        positive = col("lang") === "en")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
      // local reference
      val toks = docs.flatMap { case (id, text, lang) =>
        text.split(" ").map(t => (id, if (lang == "en") 1L else 0L, t)) }
      val cls = toks.groupBy(_._3).view.mapValues { ts =>
        (ts.count(_._2 == 1L).toLong, ts.count(_._2 == 0L).toLong) }.toMap
      val npos = cls.values.map(_._1).sum.toDouble
      val nneg = cls.values.map(_._2).sum.toDouble
      val v = cls.size.toDouble
      docs.foreach { case (id, text, _) =>
        val ts = text.split(" ")
        val exp = ts.map { t =>
          val (cp, cn) = cls(t)
          math.log((cp + 1.0) / (npos + v)) - math.log((cn + 1.0) / (nneg + v))
        }.sum / ts.length
        val expR = BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        withClue(s"trial $trial doc $id: ") {
          assert(out(id)._1 == ts.length.toLong)
          assert(math.abs(out(id)._2 - expR) <= 1e-6)
        }
      }
    }
  }

  // --------------------------------------------------------- importanceWeights

  test("importanceWeights: target-like docs up-weight, short docs drop") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha beta", "src0"),  // target
      (1L, "alpha beta gamma", "src1"),       // shares target bigram
      (2L, "delta epsilon zeta", "src1"),     // disjoint from target
      (3L, "single", "src1")                  // no bigrams -> drops out
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.importanceWeights(docs, "text", "doc_id",
        target = col("source") === "src0")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!out.contains(3L), "a bigram-less doc must drop out")
    assert(out(0L)._1 && !out(1L)._1)
    // per-bigram mean: doc 1 shares 'alpha beta' with the target, doc
    // 2 shares nothing — doc 1's per-feature ratio must be higher
    assert(out(1L)._3 / out(1L)._2 > out(2L)._3 / out(2L)._2)
  }

  test("importanceWeights differential on seeded corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed9007L)
    for (trial <- 1 to 5) {
      val vocab = Array("aa", "bb", "cc", "dd", "ee")
      val docs = (0 until 15 + rnd.nextInt(15)).map { i =>
        val n = 2 + rnd.nextInt(6)
        val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        (i.toLong, text, if (rnd.nextInt(4) == 0) "src0" else "srcX")
      }
      val df = docs.toDF("doc_id", "text", "source")
      val out = TextAnalysis.importanceWeights(df, "text", "doc_id",
          target = col("source") === "src0")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
      // local reference over bigram strings
      val bgs = docs.flatMap { case (id, text, src) =>
        val ts = text.split(" ")
        ts.sliding(2).filter(_.length == 2)
          .map(p => (id, src == "src0", p.mkString(" "))).toSeq }
      val fr = bgs.groupBy(_._3).view.mapValues { xs =>
        (xs.size.toLong, xs.count(_._2).toLong) }.toMap
      val nraw = fr.values.map(_._1).sum.toDouble
      val ntgt = fr.values.map(_._2).sum.toDouble
      val v = fr.size.toDouble
      docs.filter(_._2.split(" ").length >= 2).foreach { case (id, text, _) =>
        val ts = text.split(" ")
        val feats = ts.sliding(2).map(_.mkString(" ")).toSeq
        val exp = feats.map { b =>
          val (craw, ctgt) = fr(b)
          math.log((ctgt + 1.0) / (ntgt + v)) - math.log((craw + 1.0) / (nraw + v))
        }.sum
        val expR = BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        withClue(s"trial $trial doc $id: ") {
          assert(out(id)._1 == feats.length.toLong)
          assert(math.abs(out(id)._2 - expR) <= 1e-6)
        }
      }
    }
  }

  // ---------------------------------------------------------------- AviCodec

  test("AviCodec roundtrip: frames survive encode/decode pixel-exact") {
    val rnd = new scala.util.Random(0x5eed9002L)
    for (_ <- 1 to 10) {
      val w = 1 + rnd.nextInt(7)
      val h = 1 + rnd.nextInt(5)
      val stride = ((w * 3 + 3) / 4) * 4
      if (stride * h % 2 == 0) { // encoder precondition: even chunks
        val n = 1 + rnd.nextInt(6)
        val frames = Array.fill(n)(Array.fill(w * h)(
          (rnd.nextInt(256).toByte, rnd.nextInt(256).toByte, rnd.nextInt(256).toByte)))
        val bytes = Multimodal.AviCodec.encodeBgr24(frames, w, h, 40000)
        val (info, out) = Multimodal.AviCodec.decodeFrames(bytes)
        assert((info.width, info.height, info.usPerFrame, info.nFrames) == (w, h, 40000, n))
        for (f <- 0 until n; i <- 0 until w * h) {
          val (b, g, r) = frames(f)(i)
          assert(out(f)(i * 3) == b && out(f)(i * 3 + 1) == g && out(f)(i * 3 + 2) == r,
            s"pixel mismatch at frame $f index $i (w=$w h=$h)")
        }
      }
    }
  }

  test("AviCodec rejects corrupted containers") {
    val frames = Array(Array.fill(10)((1.toByte, 2.toByte, 3.toByte)))
    val good = Multimodal.AviCodec.encodeBgr24(frames, 5, 2, 100000)
    intercept[IllegalArgumentException] {
      Multimodal.AviCodec.decodeFrames("nope".getBytes ++ good.drop(4)) }
    // declared frame count != movi chunks
    val lied = good.clone()
    lied(32 + 16) = 9 // avih dwTotalFrames lives at offset 32+16 in this layout
    intercept[IllegalArgumentException] { Multimodal.AviCodec.decodeFrames(lied) }
    // cut into the single frame's 00db data (idx1 is only 24 bytes,
    // so -30 lands mid-frame) -> the chunk walk must flag truncation
    intercept[IllegalArgumentException] {
      Multimodal.AviCodec.decodeFrames(good.take(good.length - 30)) }
  }

  test("textAsAvi/decodeAviFrames distributed roundtrip matches byte math") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world, twenty-three bytes"), // 31 bytes -> 4 frames
      (2L, "0123456789"),                       // exactly one frame
      (3L, "abc")                               // one padded frame
    ).toDF("doc_id", "text")
    val out = Multimodal.decodeAviFrames(
        Multimodal.textAsAvi(docs, "doc_id", "text"))
      .collect().map(s => ((s.sample_id, s.frame_idx), s)).toMap
    assert(out.size == 4 + 1 + 1)
    val s1 = out((1L, 0L))
    assert(s1.n_frames == 4 && s1.width == 5 && s1.height == 2 && s1.fps == 10)
    assert(s1.n_bytes == 232 + 56 * 4)
    // frame 0 of doc 1: bytes of "hello worl"
    val b0 = "hello worl".getBytes("UTF-8").map(_ & 0xff)
    assert(s1.mean_b == b0.sum.toDouble / 10)
    assert(s1.mean_g == b0.map(255 - _).sum.toDouble / 10)
    assert(s1.mean_r == b0.map(v => (2 * v) % 256).sum.toDouble / 10)
    assert(s1.top_left_b == 'h'.toInt)
    // doc 3 ("abc"): 3 bytes + 7 zero pixels
    val s3 = out((3L, 0L))
    val b3 = "abc".getBytes("UTF-8").map(_ & 0xff)
    assert(s3.mean_b == b3.sum.toDouble / 10)
    assert(s3.mean_g == b3.map(255 - _).sum.toDouble / 10)
    assert(s3.top_left_b == 'a'.toInt)
    // last frame of doc 1 starts at byte 30 -> "s" then 9 zero pixels
    val sLast = out((1L, 3L))
    assert(sLast.top_left_b == 's'.toInt)
  }

  test("hybrid near-dup: blocked semantic leg leaves the lexical leg intact") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    def run(block: Option[Int]) = Dedup.hybridNearDups(
        docs, emb, "text", "doc_id", "embedding", "vec_id",
        n = 3, jaccardThreshold = 0.3, cosineThreshold = 0.5,
        maxPostings = None, semanticBlockCells = block)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), r.getString(4)))
    val brute = run(None)
    val blocked = run(Some(8))
    // lexical evidence is untouched by the semantic blocking
    assert(brute.filter(_._3.isDefined).map(t => (t._1, t._2, t._3)).toSet ==
      blocked.filter(_._3.isDefined).map(t => (t._1, t._2, t._3)).toSet)
    // blocked semantic pairs are a subset of brute-force semantic pairs
    val bruteSem = brute.filter(_._4.isDefined).map(t => (t._1, t._2, t._4)).toSet
    val blockedSem = blocked.filter(_._4.isDefined).map(t => (t._1, t._2, t._4)).toSet
    assert(blockedSem.subsetOf(bruteSem))
  }

  // ---------- d16 spanCoverage ----------

  /** In-memory reference of the duplicated-span coverage semantics:
    * k-token windows, count >= minOccurs anywhere, per-doc
    * interval-union token count via the sorted-starts min(k, gap)
    * identity.
    */
  private def spanRef(docs: Seq[(Long, String)], k: Int, minOccurs: Int)
      : Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq
    }
    val wins = for {
      (id, ts) <- toks
      i <- 1 to ts.length - k + 1
    } yield (id, i, ts.slice(i - 1, i - 1 + k).mkString(" "))
    val cnt = wins.groupBy(_._3).map { case (w, occ) => w -> occ.size }
    val dupStarts = wins.filter(w => cnt(w._3) >= minOccurs)
      .groupBy(_._1).map { case (id, ws) => id -> ws.map(_._2).sorted }
    toks.map { case (id, ts) =>
      val covered = dupStarts.get(id) match {
        case None => 0L
        case Some(starts) =>
          starts.foldLeft((0L, Option.empty[Long])) { case ((acc, prev), i) =>
            val c = prev.fold(k.toLong)(p => math.min(k.toLong, i - p))
            (acc + c, Some(i.toLong))
          }._1
      }
      id -> (ts.length.toLong, covered)
    }.toMap
  }

  test("spanCoverage matches the in-memory reference on seeded corpora with planted spans") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eedd160L)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (trial <- 1 to 8) {
      val k = 3 + rnd.nextInt(4) // 3..6
      val n = 30 + rnd.nextInt(40)
      val texts = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      for (i <- 0 until n) {
        val len = k + rnd.nextInt(40)
        var ts = Array.fill(len)(vocab(rnd.nextInt(vocab.length)))
        // plant: splice a contiguous span of an earlier doc into this one
        if (i > 0 && rnd.nextDouble() < 0.4) {
          val src = texts(rnd.nextInt(i))._2.split(" ")
          val spanLen = math.min(src.length, k + rnd.nextInt(6))
          val from = rnd.nextInt(src.length - spanLen + 1)
          val at = rnd.nextInt(ts.length + 1)
          ts = (ts.take(at) ++ src.slice(from, from + spanLen) ++ ts.drop(at))
        }
        texts += ((i.toLong, ts.mkString(" ")))
      }
      val df = texts.toSeq.toDF("doc_id", "text")
      val expected = spanRef(texts.toSeq, k, minOccurs = 2)
      withClue(s"trial $trial (k=$k n=$n): ") {
        val got = Dedup.spanCoverage(df, "text", "doc_id", k = k)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        assert(got == expected)
        // md5 keyer (the d16 oracle path) pins the identical kernel
        val gotMd5 = Dedup.spanCoverage(df, "text", "doc_id", k = k, keyer = md5(_))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        assert(gotMd5 == expected)
      }
    }
  }

  // ---------- t31 kneserNeyLogProb ----------

  test("kneserNeyLogProb matches an in-memory reference and the KN mass invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eedc431L)
    val vocab = Array("a", "b", "c", "d", "e", "f")
    val D = 0.75
    for (trial <- 1 to 5) {
      val docs = (0 until (20 + rnd.nextInt(30))).map { i =>
        (i.toLong, Seq.fill(2 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
      }
      // reference model tables from first principles
      val bis = docs.flatMap { case (id, t) =>
        val ts = t.split(" ", -1)
        if (ts.length < 2) Nil
        else ts.sliding(2).map(p => (id, p(0), p(1))).toSeq
      }
      val bt = bis.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.size.toLong }
      val c1 = bt.toSeq.groupBy(_._1._1).map { case (w, m) => w -> m.map(_._2).sum }
      val nf = bt.toSeq.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
      val nb = bt.toSeq.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
      val bb = bt.size.toDouble
      def p(w1: String, w2: String): Double =
        (math.max(bt((w1, w2)) - D, 0.0) + D * nf(w1) * (nb(w2) / bb)) / c1(w1)
      // interpolated-KN mass invariant: for every context w1, P over
      // all bigram-table continuation types sums to exactly 1
      val w2types = bt.keySet.map(_._2)
      c1.keys.foreach { w1 =>
        val mass = w2types.toSeq.map { w2 =>
          (math.max(bt.getOrElse((w1, w2), 0L) - D, 0.0) +
            D * nf(w1) * (nb(w2) / bb)) / c1(w1)
        }.sum
        assert(math.abs(mass - 1.0) < 1e-9, s"KN mass for '$w1' = $mass")
      }
      val ref = bis.groupBy(b => (b._1, b._2, b._3)).toSeq
        .map { case ((id, w1, w2), occ) => (id, occ.size.toLong, p(w1, w2)) }
        .groupBy(_._1)
        .map { case (id, rows) =>
          val n = rows.map(_._2).sum
          id -> (n, rows.map(r => r._2 * math.log(r._3)).sum / n)
        }
      val got = graft.pipeline.TextAnalysis.kneserNeyLogProb(
          docs.toDF("doc_id", "text"), "text", "doc_id", discount = D)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      withClue(s"trial $trial: ") {
        assert(got.keySet == ref.keySet)
        ref.foreach { case (id, (n, logp)) =>
          assert(got(id)._1 == n, s"n_bigrams for doc $id")
          assert(math.abs(got(id)._2 - logp) < 1e-6,
            s"mean_logp for doc $id: got ${got(id)._2} ref $logp")
        }
      }
    }
  }

  // ---------- t32 bloomContamination ----------

  test("bloom contamination: no false negatives, exact leg matches contaminationFractions") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val cand = docs.where(col("doc_id") % 50 =!= 0)
    val bench = docs.where(col("doc_id") % 50 === 0)
    val bloom = graft.pipeline.Decontaminate.bloomContamination(
        cand, bench, "text", "doc_id", n = 3, mBits = 4096, kHash = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // Bloom guarantee: membership probes never miss -> per doc
    // bloom_hits >= exact_hits
    bloom.foreach { case (id, (_, bh, eh)) =>
      assert(bh >= eh, s"doc $id: bloom_hits $bh < exact_hits $eh")
    }
    // the exact leg must agree with the established operator
    val fracs = graft.pipeline.Decontaminate.contaminationFractions(
        cand, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    fracs.foreach { case (id, (nHits, nSh)) =>
      assert(bloom(id)._3 == nHits, s"doc $id exact_hits")
      assert(bloom(id)._1 == nSh, s"doc $id n_shingles")
    }
    // docs absent from fractions have zero exact hits
    bloom.foreach { case (id, (_, _, eh)) =>
      if (!fracs.contains(id)) assert(eh == 0L)
    }
    // the false-positive gap exists on this corpus (the filter is
    // loaded enough to matter) — if this ever fails the parameters
    // stopped exercising the interesting regime
    assert(bloom.values.map(_._2).sum > bloom.values.map(_._3).sum)
  }

  // ---------- t33 weightedSample ----------

  test("weightedSample matches the A-ES reference draw on seeded corpora") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rnd = new scala.util.Random(0x5eed7733L)
    for (trial <- 1 to 4) {
      val k = 1 + rnd.nextInt(4)
      val rows = (0 until 80 + rnd.nextInt(60)).map { i =>
        (i.toLong, s"s${rnd.nextInt(5)}", rnd.nextInt(200).toLong) // some weight-0 rows
      }
      val df = rows.toDF("doc_id", "stratum", "wt")
      val expected = rows.filter(_._3 > 0).map { case (id, st, w) =>
        val u = (java.lang.Long.parseLong(md5hex(id.toString).take(12), 16) + 1.0) /
          281474976710656.0
        (st, id, w, math.log(u) / w)
      }.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(r => (-r._4, r._2)).take(k).zipWithIndex
          .map { case ((st, id, w, pr), i) => (st, id) -> ((w, pr, i + 1L)) }
      }
      val got = graft.pipeline.Sampling.weightedSample(df, "stratum", "doc_id", "wt", k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
      withClue(s"trial $trial (k=$k): ") {
        assert(got.keySet == expected.keySet)
        expected.foreach { case (key, (w, pr, rank)) =>
          assert(got(key)._1 == w && got(key)._3 == rank)
          assert(math.abs(got(key)._2 - pr) < 1e-6, s"priority for $key")
        }
      }
    }
  }

  // ---------- t34 classifierAuc ----------

  test("classifierAuc matches the pairwise Mann-Whitney reference, ties included") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eeda0cL)
    for (trial <- 1 to 4) {
      // few distinct scores -> dense ties, the hard case
      val rows = (0 until 60 + rnd.nextInt(80)).map { i =>
        (i.toLong, s"g${rnd.nextInt(3)}",
          (rnd.nextInt(6) * 0.25) - 0.5, rnd.nextBoolean())
      }
      val df = rows.toDF("id", "grp", "score", "pos")
      val expected = rows.groupBy(_._2).flatMap { case (g, rs) =>
        val posS = rs.filter(_._4).map(_._3)
        val negS = rs.filterNot(_._4).map(_._3)
        if (posS.isEmpty || negS.isEmpty) None
        else {
          val wins = (for (p <- posS; n <- negS)
            yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
          Some(g -> ((posS.size.toLong, negS.size.toLong,
            wins / (posS.size.toLong * negS.size))))
        }
      }
      val got = graft.pipeline.TextAnalysis.classifierAuc(df, "grp", "score", col("pos"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      withClue(s"trial $trial: ") {
        assert(got.keySet == expected.keySet)
        expected.foreach { case (g, (np, nn, auc)) =>
          assert(got(g)._1 == np && got(g)._2 == nn)
          assert(math.abs(got(g)._3 - auc) < 1e-6, s"auc for $g: got ${got(g)._3} ref $auc")
        }
      }
    }
  }

  test("spanCoverage edge cases: short docs, within-doc repeats, full coverage") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e a b c"), // within-doc repeated 3-gram "a b c"
      (2L, "x y"), //             shorter than k: no windows, 0 coverage
      (3L, "p q r s t"), //       unique content, 0 coverage
      (4L, "p q r s t") //        exact dup of 3: full coverage both
    ).toDF("doc_id", "text")
    val got = Dedup.spanCoverage(df, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // doc 1: "a b c" appears at starts 1 and 6 -> union = 3 + min(3, 5)
    // = 6 of 8 tokens
    assert(got(1L) == ((8L, 6L, 0.75)))
    assert(got(2L) == ((2L, 0L, 0.0)))
    assert(got(3L) == ((5L, 5L, 1.0)))
    assert(got(4L) == ((5L, 5L, 1.0)))
  }

  // ---------------- PMI collocations ----------------

  private def refPmi(texts: Seq[String], k: Int, minCount: Long)
      : Seq[(String, String, Long, Double)] = {
    val bigrams = texts.flatMap(t =>
      t.split(" ", -1).sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
    val n = bigrams.size.toDouble
    val c12 = bigrams.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val c1 = bigrams.groupBy(_._1).map { case (w, xs) => w -> xs.size.toLong }
    val c2 = bigrams.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    c12.toSeq
      .filter(_._2 >= minCount)
      .map { case ((w1, w2), c) =>
        (w1, w2, c, math.log((c.toDouble * n) / (c1(w1).toDouble * c2(w2).toDouble)))
      }
      .sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }
      .take(k)
  }

  test("pmiCollocations matches the in-memory reference on a known corpus") {
    import spark.implicits._
    // "new york" is a collocation (always together); "the of" pairs are glue
    val texts = Seq(
      "new york is big the cat of the dog",
      "i love new york the end of story",
      "new york new york the best of all",
      "the of the of the of the of the of")
    val got = TextAnalysis.pmiCollocations(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
        "text", k = 5, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val ref = refPmi(texts, k = 5, minCount = 2L)
    assert(got.length == ref.length)
    got.zip(ref).foreach { case ((gw1, gw2, gc, gp), (rw1, rw2, rc, rp)) =>
      assert(gw1 == rw1 && gw2 == rw2 && gc == rc, s"pair order: got ($gw1,$gw2) ref ($rw1,$rw2)")
      assert(math.abs(gp - rp) < 1e-6, s"pmi($gw1,$gw2): got $gp ref $rp")
    }
    assert(got.head._1 == "new" && got.head._2 == "york")
  }

  test("pmiCollocations differential on seeded corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed9035L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 1 to 5) {
      val texts = (0 until 30).map { _ =>
        (0 until 5 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val k = 3 + rnd.nextInt(10)
      val minCount = 1L + rnd.nextInt(3)
      val got = TextAnalysis.pmiCollocations(
          texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
          "text", k, minCount)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val ref = refPmi(texts, k, minCount)
      withClue(s"trial $trial (k=$k minCount=$minCount): ") {
        assert(got.map(g => (g._1, g._2, g._3)).toSeq == ref.map(r => (r._1, r._2, r._3)))
        got.zip(ref).foreach { case (g, r) => assert(math.abs(g._4 - r._4) < 1e-6) }
      }
    }
  }

  // ---------------- vocab overlap ----------------

  test("vocabOverlap matches set arithmetic on the fixture corpus") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val ref = docs.select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (s, xs) => s -> xs.flatMap(_._2.split(" ", -1)).toSet }
    val got = TextAnalysis.vocabOverlap(docs, "text", "source").collect()
    val pairs = ref.keySet.toSeq.flatMap(a =>
      ref.keySet.toSeq.filter(_ > a).map(b => (a, b)))
    assert(got.length == pairs.size, "one row per unordered source pair")
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (va, vb) = (ref(a), ref(b))
      val inter = (va & vb).size.toLong
      assert(r.getLong(2) == va.size.toLong && r.getLong(3) == vb.size.toLong)
      assert(r.getLong(4) == inter, s"intersection of ($a,$b)")
      val jac = inter.toDouble / (va.size + vb.size - inter).toDouble
      assert(math.abs(r.getDouble(5) - jac) < 1e-6)
      assert(math.abs(r.getDouble(6) - inter.toDouble / va.size) < 1e-6)
      assert(math.abs(r.getDouble(7) - inter.toDouble / vb.size) < 1e-6)
    }
  }

  // ---------------- chunk removal ----------------

  private def refDropChunks(texts: Seq[(Long, String)], w: Int, maxDf: Long)
      : Map[Long, (String, Long, Long, Long)] = {
    val chunks = texts.map { case (id, t) =>
      (id, t.split(" ", -1).grouped(w).map(_.mkString(" ")).toVector)
    }
    val df = chunks.flatMap { case (id, cs) => cs.distinct.map(c => (c, id)) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).distinct.size.toLong }
    chunks.map { case (id, cs) =>
      val kept = cs.filter(c => df(c) <= maxDf)
      id -> ((kept.mkString(" "), cs.size.toLong, kept.size.toLong,
        (cs.size - kept.size).toLong))
    }.toMap
  }

  test("dropCommonChunks rebuilds exactly: boilerplate out, order kept") {
    import spark.implicits._
    val texts = Seq(
      1L -> "c1 c1 c1 a b c d e",      // unique chunk then shared tail? no: w=4
      2L -> "c1 c1 c1 a x y z w",      // shares chunk "c1 c1 c1 a" with 1 and 3
      3L -> "c1 c1 c1 a p q r s",      // df("c1 c1 c1 a") = 3 > maxDf=2 -> dropped
      4L -> "solo doc with its own words here",
      5L -> "tiny")
    val got = Dedup.dropCommonChunks(texts.toDF("doc_id", "text"),
        "text", "doc_id", chunkTokens = 4, maxDf = 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val ref = refDropChunks(texts, w = 4, maxDf = 2L)
    assert(got == ref)
    // the shared head chunk is gone from all three carriers
    assert(got(1L)._1 == "b c d e")
    assert(got(5L)._1 == "tiny" && got(5L)._2 == 1L && got(5L)._4 == 0L)
  }

  test("dropCommonChunks differential on seeded corpora with planted boilerplate") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed9018L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 5) {
      val w = 2 + rnd.nextInt(4)
      val maxDf = 1L + rnd.nextInt(3)
      val boiler = (0 until w * 2).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val texts = (0L until 25L).map { id =>
        val body = (0 until 3 + rnd.nextInt(12))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        // ~40% of docs get the boilerplate block PREPENDED (chunk-aligned)
        id -> (if (rnd.nextDouble() < 0.4) s"$boiler $body" else body)
      }
      val got = Dedup.dropCommonChunks(texts.toDF("doc_id", "text"),
          "text", "doc_id", chunkTokens = w, maxDf = maxDf)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      withClue(s"trial $trial (w=$w maxDf=$maxDf): ") {
        assert(got == refDropChunks(texts, w, maxDf))
      }
    }
  }

  // ---------------- random projection ----------------

  test("randomProject kernel is bit-identical to the HOF fold") {
    import spark.implicits._
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val a = graft.pipeline.Similarity.randomProject(emb, "embedding", "vec_id", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = graft.pipeline.Similarity.randomProjectFold(emb, "embedding", "vec_id", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    a.foreach { case (id, v) => assert(v == b(id), s"vec $id kernel != fold") }
    // random seeded vectors too (fold reference is defined for
    // matching dims; the kernel's short-vector min-length behavior is
    // pinned separately below)
    val rnd = new scala.util.Random(0x5eed9023L)
    val rv = (0L until 50L).map { id =>
      (id, Seq.fill(24)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val ka = graft.pipeline.Similarity.randomProject(rv, "embedding", "vec_id", 24, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val kb = graft.pipeline.Similarity.randomProjectFold(rv, "embedding", "vec_id", 24, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    ka.foreach { case (id, v) => assert(v == kb(id), s"random vec $id") }
    // a vector SHORTER than the declared dim: trailing signs idle
    // (min-length), never null-poisoning
    val shortV = Seq((0L, Seq(1.0f, -2.0f))).toDF("vec_id", "embedding")
    val ks = graft.pipeline.Similarity.randomProject(shortV, "embedding", "vec_id", 24, 8)
      .collect().head.getSeq[Double](1)
    val signs = graft.pipeline.Similarity.rademacherSigns(8, 24)
    val exp = (0 until 8).map(j => BigDecimal(
        (1.0 * signs(j)(0) - 2.0 * signs(j)(1)) / math.sqrt(8.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(ks.toSeq == exp)
  }

  test("randomProject of a basis vector reads out one sign column") {
    import spark.implicits._
    val dim = 12; val outDim = 8
    val basis = (0 until dim).map(i =>
      (i.toLong, Seq.tabulate(dim)(d => if (d == i) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.pipeline.Similarity.randomProject(basis, "embedding", "vec_id", dim, outDim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val signs = graft.pipeline.Similarity.rademacherSigns(outDim, dim)
    val scale = math.sqrt(outDim.toDouble)
    for (i <- 0 until dim; j <- 0 until outDim)
      assert(got(i.toLong)(j) == BigDecimal(signs(j)(i) / scale)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"e_$i component $j")
    // sign matrix is balanced-ish (md5 parity, not degenerate)
    val flat = signs.flatten
    assert(flat.count(_ > 0) > flat.length / 4 && flat.count(_ < 0) > flat.length / 4)
  }

  test("randomProject preserves pairwise cosine structure (JL sanity)") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
      .filter(col("vec_id") < 40)
    val orig = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // 32 output dims for the statistical check: per-pair cosine error
    // is ~N(0, 1/√32 ≈ 0.18); bounds sit at ~4.5σ (max over 780
    // pairs) and ~1.4× the expected mean — loose enough to hold for
    // any regenerated fixture, tight enough to catch a broken kernel
    val proj = graft.pipeline.Similarity.randomProject(emb, "embedding", "vec_id", 64, 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ids = orig.keys.toSeq.sorted
    val errs = for (a <- ids; b <- ids if a < b)
      yield math.abs(cos(orig(a), orig(b)) - cos(proj(a), proj(b)))
    assert(errs.max < 0.8, s"worst-pair cosine drift ${errs.max}")
    assert(errs.sum / errs.size < 0.25, s"mean cosine drift ${errs.sum / errs.size}")
  }

  // ---------------- LSH recall report ----------------

  test("lshRecallReport: exact dups always recalled, invariants hold") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val rep = Dedup.lshRecallReport(docs, "text", "doc_id",
        shingleN = 3, numHashes = 8, bands = 4, floor = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rep.nonEmpty)
    rep.foreach { case (bin, nTrue, nHit, recall) =>
      assert(bin >= 0 && bin <= 10)
      assert(nHit <= nTrue && nHit >= 0)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - nHit.toDouble / nTrue) < 1e-6)
    }
    // jaccard-1.0 pairs have identical signatures -> every band
    // collides -> recall is exactly 1
    rep.filter(_._1 == 10L).foreach { case (_, _, _, recall) =>
      assert(recall == 1.0, "exact duplicates must always be candidates")
    }
    // totals reconcile with the exact pair count
    val nExact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.05, maxPostings = None).count()
    assert(rep.map(_._2).sum == nExact)
  }

  // ---------------- span removal ----------------

  private def refDropSpans(texts: Seq[(Long, String)], k: Int, minOccurs: Int)
      : Map[Long, (String, Long, Long, Long)] = {
    val toks = texts.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toVector
    }
    val wins = toks.flatMap { case (id, ts) =>
      if (ts.length >= k) (0 to ts.length - k).map(i0 => (id, i0, ts.slice(i0, i0 + k).mkString(" ")))
      else Seq.empty
    }
    val counts = wins.groupBy(_._3).map { case (w, xs) => w -> xs.size }
    val covered = wins.filter(w => counts(w._3) >= minOccurs)
      .flatMap { case (id, i0, _) => (i0 until i0 + k).map(p => (id, p)) }.toSet
    toks.map { case (id, ts) =>
      val kept = ts.zipWithIndex.collect { case (tok, p) if !covered((id, p)) => tok }
      id -> ((kept.mkString(" "), ts.length.toLong, kept.length.toLong,
        (ts.length - kept.length).toLong))
    }.toMap
  }

  test("dropDuplicatedSpans removes covered tokens, keeps order") {
    import spark.implicits._
    val texts = Seq(
      1L -> "alpha beta gamma delta one two three four tail1 xx",
      2L -> "head2 alpha beta gamma delta one two three four yy", // shares an 8-token run with 1 at a DIFFERENT offset
      3L -> "unique words only in this document right here now ok",
      4L -> "short doc")
    val got = Dedup.dropDuplicatedSpans(texts.toDF("doc_id", "text"),
        "text", "doc_id", k = 6, minOccurs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val ref = refDropSpans(texts, k = 6, minOccurs = 2)
    assert(got == ref)
    // the shared 8-token run is fully covered in both carriers; the
    // non-shared head/tail tokens survive
    assert(got(1L)._1 == "tail1 xx")
    assert(got(2L)._1 == "head2 yy")
    assert(got(3L)._4 == 0L)
    assert(got(4L) == (("short doc", 2L, 2L, 0L)))
  }

  test("dropDuplicatedSpans differential on seeded corpora with planted spans") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed9020L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (trial <- 1 to 5) {
      val k = 3 + rnd.nextInt(4)
      val span = (0 until k + rnd.nextInt(4))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val texts = (0L until 30L).map { id =>
        val words = (0 until 4 + rnd.nextInt(15)).map(_ => vocab(rnd.nextInt(vocab.size)))
        // ~40% of docs get the span spliced at a random offset
        val t = if (rnd.nextDouble() < 0.4) {
          val cut = rnd.nextInt(words.length + 1)
          (words.take(cut) ++ span.split(" ") ++ words.drop(cut)).mkString(" ")
        } else words.mkString(" ")
        id -> t
      }
      val got = Dedup.dropDuplicatedSpans(texts.toDF("doc_id", "text"),
          "text", "doc_id", k = k, minOccurs = 2)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      withClue(s"trial $trial (k=$k): ") {
        assert(got == refDropSpans(texts, k, minOccurs = 2))
      }
    }
  }

  // ---------------- leakage-safe split ----------------

  test("leakageSafeSplit: near-dup clusters never straddle splits") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "an unrelated document with its own words right here")
    ).toDF("doc_id", "text")
    val got = graft.pipeline.Sampling.leakageSafeSplit(df, "text", "doc_id",
        Seq("train" -> 0.5, "test" -> 0.5), n = 3, threshold = 0.3,
        maxPostings = None)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the 1-2-3 cluster shares one rep and thus one split
    assert(got(1L)._1 == 1L && got(2L) == got(1L) && got(3L) == got(1L))
    // singleton keys by its own id and gets the plain hashSplit answer
    assert(got(4L)._1 == 4L)
    val plain = graft.pipeline.Sampling.hashSplit(
        Seq(4L).toDF("rep"), "rep", Seq("train" -> 0.5, "test" -> 0.5))
      .collect().head.getString(1)
    assert(got(4L)._2 == plain)
  }

  // ---------------- soft dedup weights ----------------

  test("softDedupWeights: loss mass sums to one per cluster, 1.0 singletons") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // dup of 1
      (3L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1/2
      (4L, "something entirely different lives in this row here now")
    ).toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(df, "text", "doc_id", n = 3, threshold = 0.3,
        maxPostings = None)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((3L, 0.333333)) && got(2L) == got(1L) && got(3L) == got(1L))
    assert(got(4L) == ((1L, 1.0)))
    // every doc appears exactly once
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  // ---------------- epoch shuffle + length buckets ----------------

  test("epochShuffle: a permutation, epoch-dependent, partitioning-stable") {
    import spark.implicits._
    val ids = (0L until 200L)
    val df1 = ids.toDF("doc_id")
    val p3 = graft.pipeline.Sampling.epochShuffle(df1, "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bijection onto 1..N
    assert(p3.values.toSeq.sorted == (1L to 200L))
    // a different epoch gives a different order
    val p4 = graft.pipeline.Sampling.epochShuffle(df1, "doc_id", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p3 != p4)
    // identical under a different physical partitioning
    val p3b = graft.pipeline.Sampling.epochShuffle(df1.repartition(13), "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p3 == p3b)
  }

  test("lengthBuckets: exact bucket arithmetic on a known corpus") {
    import spark.implicits._
    val texts = Seq(
      1L -> "a",                           // n=1  -> bucket 1
      2L -> ("w " * 9).trim,               // n=9  -> bucket 1
      3L -> ("w " * 16).trim,              // n=16 -> bucket 16
      4L -> ("w " * 40).trim,              // n=40 -> bucket 16
      5L -> ("w " * 64).trim)              // n=64 -> bucket 64
    val got = graft.pipeline.Sampling.lengthBuckets(
        texts.toDF("doc_id", "text"), "text", "doc_id", Seq(1, 16, 64))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) == ((2L, 9L, 10L, BigDecimal(1.0 - 10.0 / 18)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(16L) == ((2L, 40L, 56L, BigDecimal(1.0 - 56.0 / 80)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(64L) == ((1L, 64L, 64L, 0.0)))
  }

  // ---------------- media decoder dispatch ----------------

  test("MediaDecoder dispatches real containers and falls back cleanly") {
    import graft.pipeline.Multimodal
    // WAV: features must come from the PCM samples
    val samples = Array.tabulate(20)(i => (i * 100).toShort)
    val wav = Multimodal.WavCodec.encodePcm16(samples, 16000)
    val (wm, wv) = Multimodal.MediaDecoder.decode(wav)
    val (em, ev) = Multimodal.MediaDecoder.fromSignal(samples.map(_.toDouble), 8)
    assert(wm == em && wv.toSeq == ev.toSeq)
    // BMP: features over the decoded pixel bytes
    val px = Array.tabulate(6)(i => ((i * 3).toByte, (i * 3 + 1).toByte, (i * 3 + 2).toByte))
    val bmp = Multimodal.BmpCodec.encodeBgr24(px, 3, 2)
    val (bm, bv) = Multimodal.MediaDecoder.decode(bmp)
    val pixelBytes = Multimodal.BmpCodec.decodePixels(bmp)._3
    val (ebm, ebv) = Multimodal.MediaDecoder.fromSignal(
      pixelBytes.map(b => (b & 0xff).toDouble), 8)
    assert(bm == ebm && bv.toSeq == ebv.toSeq)
    // non-container text payload -> FakeDecoder unchanged
    val txt = "plain old text".getBytes("UTF-8")
    assert(Multimodal.MediaDecoder.decode(txt) ==
      ((Multimodal.FakeDecoder.decode(txt)._1,
        Multimodal.FakeDecoder.decode(txt)._2)) ||
      Multimodal.MediaDecoder.decode(txt)._1 == Multimodal.FakeDecoder.decode(txt)._1)
    assert(Multimodal.MediaDecoder.decode(txt)._2.toSeq ==
      Multimodal.FakeDecoder.decode(txt)._2.toSeq)
    // corrupt RIFF (declares WAVE, truncated body) -> fallback, no throw
    val corrupt = "RIFFxxxxWAVE".getBytes("UTF-8")
    assert(Multimodal.MediaDecoder.decode(corrupt)._2.toSeq ==
      Multimodal.FakeDecoder.decode(corrupt)._2.toSeq)
    // segment bounds: 3 values over 8 dims -> 5 empty segments are 0
    val (_, sv) = Multimodal.MediaDecoder.fromSignal(Array(8.0, 16.0, 24.0), 8)
    assert(sv.count(_ == 0f) == 5 && sv.toSeq.contains(8f))
  }

  // ---------------- provenance dedup ----------------

  test("exactGroupsWithProvenance keeps sorted distinct sources per group") {
    import spark.implicits._
    val df = Seq(
      (1L, "same text here", "srcB"),
      (2L, "same text here", "srcA"),
      (3L, "Same   TEXT here", "srcC"), // normalizes to the same fp
      (4L, "same text here", "srcA"),   // dup source must not repeat
      (5L, "unique document", "srcZ")   // group of 1 -> not reported
    ).toDF("doc_id", "text", "source")
    val got = Dedup.exactGroupsWithProvenance(df, "text", "doc_id", "source")
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getString(3)))
    assert(got.toSeq == Seq((1L, 4L, "srcA,srcB,srcC")))
  }

  // ---------------- projection recall ----------------

  test("projectionRecall: identity anchors always recall themselves; bounds hold") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val anchors = emb.filter(col("vec_id") < 8)
    val rep = graft.pipeline.Similarity.projectionRecall(
        emb, anchors, "embedding", "vec_id", dim = 64, outDim = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rep.length == 8)
    rep.foreach { case (qid, n, rec) =>
      // the anchor itself is cos=1 in BOTH spaces -> overlap >= 1
      assert(n >= 1 && n <= 10, s"anchor $qid overlap $n")
      assert(math.abs(rec - n / 10.0) < 1e-9)
    }
    // projecting to the FULL dimension count preserves more structure
    // than 8 dims on average (sanity that outDim matters)
    val rep32 = graft.pipeline.Similarity.projectionRecall(
        emb, anchors, "embedding", "vec_id", dim = 64, outDim = 32, k = 10)
      .collect().map(_.getLong(1)).sum
    val rep8 = graft.pipeline.Similarity.projectionRecall(
        emb, anchors, "embedding", "vec_id", dim = 64, outDim = 8, k = 10)
      .collect().map(_.getLong(1)).sum
    assert(rep32 >= rep8, s"recall@32d ($rep32) should not trail recall@8d ($rep8)")
  }

  // ---------------- per-source score normalization ----------------

  test("normalizeScores matches an in-memory robust/percent-rank reference") {
    import spark.implicits._
    // type-7 interpolated quantile (what both percentile and
    // quantile_cont compute)
    def quantile(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * p
      val lo = h.toInt
      if (lo + 1 >= s.length) s(lo) else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    val rows = Seq(
      // group a: ties + spread
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 2.0), (4L, "a", 5.0),
      // group b: constant scores -> IQR 0 -> robust NULL
      (5L, "b", 3.0), (6L, "b", 3.0), (7L, "b", 3.0),
      // group c: singleton -> percent_rank 0
      (8L, "c", 9.0))
    val got = TextAnalysis.normalizeScores(
        rows.toDF("doc_id", "source", "score"), "source", "score", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(3)).map(_.asInstanceOf[Double]), r.getDouble(4))))
      .toMap
    val byGrp = rows.groupBy(_._2)
    rows.foreach { case (id, g, s) =>
      val xs = byGrp(g).map(_._3)
      val (q1, med, q3) = (quantile(xs, 0.25), quantile(xs, 0.5), quantile(xs, 0.75))
      val expRobust = if (q3 - q1 == 0.0) None
        else Some(BigDecimal((s - med) / (q3 - q1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val sortedIds = byGrp(g).sortBy(x => (x._3, x._1)).map(_._1)
      val expPct = if (xs.size == 1) 0.0
        else BigDecimal(sortedIds.indexOf(id).toDouble / (xs.size - 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      withClue(s"doc $id: ") {
        assert(got(id)._1 == expRobust, s"robust got ${got(id)._1} exp $expRobust")
        assert(got(id)._2 == expPct, s"pct got ${got(id)._2} exp $expPct")
      }
    }
  }

  // ---------------- hard negatives ----------------

  test("hardNegatives == label-filtered bruteForceTopKBatch per anchor") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val anchors = emb.filter(col("vec_id") < 5)
    val got = graft.pipeline.Similarity.hardNegatives(
        emb, anchors, "embedding", "vec_id", "label", "vec_id", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
      .groupBy(_._1)
    val anchorRows = anchors.select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.keySet == anchorRows.map(_._1).toSet)
    anchorRows.foreach { case (aid, albl) =>
      val expect = graft.pipeline.Similarity.bruteForceTopKBatch(
          emb.filter(col("label") =!= albl), emb.filter(col("vec_id") === aid),
          "embedding", "vec_id", "vec_id", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      assert(got(aid).sortBy(_._4).toSeq == expect.sortBy(_._4).toSeq,
        s"anchor $aid mismatch")
    }
  }
}
