package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNormalizeExpressions
import graft.pipeline.{Multimodal, Similarity, TextAnalysis}

/** Round-10 operators: native NFC normalization, readability,
  * threshold (radius) similarity search, and the perceptual-hash
  * image near-dup family.
  */
class Round10Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---------------- NFC normalization ----------------

  test("nfc expression matches java.text.Normalizer on adversarial strings") {
    import spark.implicits._
    // composition exclusion (U+1E9B), double marks, Hangul jamo,
    // blocked marks, plain ASCII fast path
    val cases = Seq(
      "café", "Å", "ç", "ố",
      "ẛ̣", "ȩ́", "gärten",
      "가", "ㅾ", "plain ascii", "", "mixed é end",
      "ṩ" /* s + dot-above + dot-below: mark reorder */)
    val out = cases.toDF("s")
      .select(TextNormalizeExpressions.nfc(col("s")).as("n"))
      .as[String].collect()
    val expected = cases.map(Normalizer.normalize(_, Normalizer.Form.NFC))
    assert(out.toSeq == expected)
  }

  test("nfd -> nfc roundtrip restores composed forms; nfc is idempotent") {
    import spark.implicits._
    val composed = Seq("café", "Ångström", "garçon", "ẛ", "한국어")
    val df = composed.toDF("s")
      .select(col("s"),
        TextNormalizeExpressions.nfc(TextNormalizeExpressions.nfd(col("s"))).as("roundtrip"),
        TextNormalizeExpressions.nfc(TextNormalizeExpressions.nfc(col("s"))).as("twice"))
    df.collect().foreach { r =>
      val s = r.getString(0)
      assert(r.getString(1) == Normalizer.normalize(s, Normalizer.Form.NFC),
        s"roundtrip drift on $s")
      assert(r.getString(2) == Normalizer.normalize(s, Normalizer.Form.NFC),
        s"idempotence drift on $s")
    }
  }

  test("nfc fuzz: random combining-mark soup matches the JDK reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x10fc5eedL)
    val marks = Seq('\u0301', '\u0302', '\u0308', '\u0327', '\u030A', '\u0323')
    val bases = "aeiouAcnsoOEU"
    val cases = (1 to 200).map { _ =>
      val sb = new StringBuilder
      (0 until 1 + rnd.nextInt(12)).foreach { _ =>
        sb += bases(rnd.nextInt(bases.length))
        (0 until rnd.nextInt(3)).foreach(_ => sb += marks(rnd.nextInt(marks.size)))
      }
      sb.toString
    }
    // repartition forces a real exchange so the expression rides task
    // serialization (a LocalRelation would evaluate driver-side and
    // mask serializability bugs — this caught an InvalidClassException
    // from a ctor parameter on the expression's abstract base)
    val out = cases.toDF("s").repartition(3)
      .select(col("s"), TextNormalizeExpressions.nfc(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { c =>
      assert(out(c) == Normalizer.normalize(c, Normalizer.Form.NFC))
    }
  }

  test("nfcReport flags changed rows and preserves unchanged ones") {
    import spark.implicits._
    val docs = Seq((1L, "plain"), (2L, "café"), (3L, "café"))
      .toDF("doc_id", "text")
    val rep = TextAnalysis.nfcReport(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(!rep(0).getBoolean(3) && !rep(2).getBoolean(3))
    assert(rep(1).getBoolean(3))
    assert(rep(1).getLong(1) == 5 && rep(1).getLong(2) == 4) // e+mark -> é
    // changed row normalizes to the same md5 as the composed twin
    assert(rep(1).getString(4) == rep(2).getString(4))
  }

  // ---------------- token/bigram hash kernels ----------------

  test("TokenHashes/BigramHashes are hash-identical to the composable chain") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x70cc5eedL)
    val fixed = Seq("", " ", "  ", "a", "a b", "a  b", " a b ",
      "trailing ", "héllo wörld mixé", "a b c d e", "söme  ünïcode tokens")
    val fuzzed = (1 to 150).map { _ =>
      val parts = (0 until rnd.nextInt(8)).map(_ =>
        (0 until rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(28)).toChar).mkString)
      parts.mkString(" " * (1 + rnd.nextInt(2))) // single AND double gaps
    }
    val df = (fixed ++ fuzzed).toDF("s").repartition(3)
    val toks = col("__tk")
    val idxs = when(size(toks) >= 2, sequence(lit(0), size(toks) - 2))
      .otherwise(array().cast("array<int>"))
    val refBigrams = transform(idxs, i => struct(
      xxhash64(element_at(toks, i + 1)).as("h1"),
      xxhash64(element_at(toks, i + 2)).as("h2"),
      xxhash64(concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))
        .as("h12")))
    val out = df
      .withColumn("__tk", split(col("s"), " "))
      .select(col("s"),
        transform(col("__tk"), t => xxhash64(t)).as("ref_tok"),
        graft.functions.TokenHashes(col("s")).as("got_tok"),
        refBigrams.as("ref_big"),
        graft.functions.BigramHashes(col("s")).as("got_big"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"token hashes differ on '${r.getString(0)}'")
      val rb = r.getSeq[org.apache.spark.sql.Row](3).map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2)))
      val gb = r.getSeq[org.apache.spark.sql.Row](4).map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2)))
      assert(rb == gb, s"bigram hashes differ on '${r.getString(0)}'")
    }
    // n-gram slice hashes and the tagged token+gram entries against
    // their composable spellings (n = 3 exercises the multi-token
    // slice; the tagged kernel additionally pins codepoint lengths)
    val idxs3 = when(size(toks) >= 3, sequence(lit(0), size(toks) - 3))
      .otherwise(array().cast("array<int>"))
    val refGram3 = transform(idxs3, i =>
      xxhash64(array_join(slice(toks, i + 1, lit(3)), " ")))
    val refEntries = concat(
      transform(toks, t => struct(lit(0).as("kind"), xxhash64(t).as("h"),
        length(t).as("len"))),
      transform(idxs3, i => struct(lit(1).as("kind"),
        xxhash64(array_join(slice(toks, i + 1, lit(3)), " ")).as("h"),
        lit(0).as("len"))))
    val out2 = df
      .withColumn("__tk", split(col("s"), " "))
      .select(col("s"),
        refGram3.as("ref_g3"),
        graft.functions.NgramSliceHashes(col("s"), 3).as("got_g3"),
        refEntries.as("ref_e"),
        graft.functions.TokenGramEntries(col("s"), 3).as("got_e"))
      .collect()
    out2.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"3-gram hashes differ on '${r.getString(0)}'")
      val re = r.getSeq[org.apache.spark.sql.Row](3).map(x =>
        (x.getInt(0), x.getLong(1), x.getInt(2)))
      val ge = r.getSeq[org.apache.spark.sql.Row](4).map(x =>
        (x.getInt(0), x.getLong(1), x.getInt(2)))
      assert(re == ge, s"tagged entries differ on '${r.getString(0)}'")
    }
  }

  // ---------------- readability ----------------

  test("readability counts and grade on a hand-computed corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),  // 6 words, 2 sents, 6 syll-groups
      (2L, ""),                            // all-zero: clamps, grade = const
      (3L, "why???")                       // 1 word, 1 sent, 1 syll
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 6 && out(0).getLong(2) == 2)
    val syll0 = out(0).getLong(3)
    assert(syll0 == 6, s"vowel groups: e/a/a/e/o/a -> 6, got $syll0")
    val expected0 = 0.39 * (6.0 / 2.0) + 11.8 * (6.0 / 6.0) - 15.59
    assert(out(0).getDouble(4) == expected0)
    assert(out(1).getLong(1) == 0 && out(1).getDouble(4) == 0.39 * 0.0 + 11.8 * 0.0 - 15.59)
    assert(out(2).getLong(1) == 1 && out(2).getLong(2) == 1 && out(2).getLong(3) == 1)
  }

  test("readability word split treats U+000B identically to the oracle class") {
    import spark.implicits._
    // U+000B is whitespace to Java's \S but NOT to RE2's — the
    // explicit class must split on it in BOTH engines; pin the Spark
    // side here (the differential fuzz replays generated corpora).
    val docs = Seq((1L, "ab c")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "text", "doc_id").collect()(0)
    assert(out.getLong(1) == 3, "vertical tab must be a word boundary")
  }

  test("calibrationBins: hand-computed cut, counts, and decimal-exact means") {
    import spark.implicits._
    // 8 docs, 4 bins of 2; score ties broken by id
    val scored = Seq(
      (1L, 0.5, "en"), (2L, 0.5, "de"), (3L, 1.0, "en"), (4L, 1.5, "en"),
      (5L, 2.0, "de"), (6L, 2.5, "de"), (7L, 3.0, "en"), (8L, 3.5, "en")
    ).toDF("doc_id", "s", "lang")
    val bins = TextAnalysis.calibrationBins(scored, "s", "doc_id",
        col("lang") === "en", bins = 4)
      .collect()
    assert(bins.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(bins.forall(_.getLong(1) == 2))
    assert(bins.map(_.getLong(2)).toSeq == Seq(1L, 2L, 0L, 2L))
    assert(bins.map(_.getDouble(3)).toSeq == Seq(0.5, 1.0, 0.0, 1.0))
    assert(bins.map(_.getDouble(4)).toSeq == Seq(0.5, 1.25, 2.25, 3.25))
  }

  test("bpeMerges: hand-checked trajectory, overlap handling, exhaustion") {
    import spark.implicits._
    // freq: "low" x5, "lower" x2, "newest" x6, "widest" x3
    // round 1: "es" wins? pairs: lo(7) ow(7) we(2) er(2) ne(6) ew(6)
    //   we+es+st from newest(6)+widest(3): es=9, st=9, wi(3), de(3), id(3)
    //   -> es=9 ties st=9; tie-break lex: "e s" < "s t" -> merge (e,s)
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "text", k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(merges(0) == ((1, "e", "s", "es", 9L)), merges.mkString(";"))
    // round 2: st -> "est" pairs now: es+t from newest/widest = 9
    assert(merges(1) == ((2, "es", "t", "est", 9L)), merges.mkString(";"))
    // overlap: "aaaa" => "a a a a": pair (a,a) counts 3 per word; the
    // double-space replace merges LEFTMOST non-overlapping -> "aa aa"
    val rep = (0 until 4).map(i => (i.toLong, "aaaa")).toDF("doc_id", "text")
    val m2 = TextAnalysis.bpeMerges(rep, "text", k = 2)
      .collect().map(r => (r.getString(3), r.getLong(4)))
    assert(m2(0) == (("aa", 12L)), m2.mkString(";")) // 3 adjacencies x 4 words
    assert(m2(1) == (("aaaa", 4L)), m2.mkString(";")) // "aa aa" -> one pair each
    // exhaustion: single-char vocab has no pairs -> zero merges
    val single = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMerges(single, "text", k = 4).count() == 0)
  }

  test("bpeMerges: driver-local and distributed rounds are trajectory-identical") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents")
    val local = TextAnalysis.bpeMerges(docs, "text", k = 5).collect().toSeq
    val dist = TextAnalysis.bpeMerges(docs, "text", k = 5, localVocabLimit = 0L)
      .collect().toSeq
    assert(local == dist, s"local=$local\ndist=$dist")
    assert(local.size == 5)
  }

  test("bpeMerges: randomized corpora keep the two paths identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xb9e5eedL)
    for (trial <- 1 to 4) {
      val vocabChars = "abcde"
      val docs = (0 until 30).map { i =>
        val words = (0 until 1 + rnd.nextInt(10)).map(_ =>
          (0 until 1 + rnd.nextInt(6)).map(_ =>
            vocabChars(rnd.nextInt(vocabChars.length))).mkString)
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val k = 2 + rnd.nextInt(5)
      val local = TextAnalysis.bpeMerges(docs, "text", k).collect().toSeq
      val dist = TextAnalysis.bpeMerges(docs, "text", k, localVocabLimit = 0L)
        .collect().toSeq
      assert(local == dist, s"trial $trial k=$k: local=$local dist=$dist")
    }
  }

  // ---------------- threshold similarity search ----------------

  test("rangeSearch == threshold-filtered brute force (cosineFold reference)") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.rangeSearch(emb, queries, "embedding", "vec_id", "vec_id", 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // reference: fold-based cosine over the full cross join
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val ref = emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", Similarity.cosineFold(col("embedding"), col("q_vec")))
      .where(col("cos_sim") >= 0.2)
      .collect().map(r => ((r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")),
        r.getAs[Double]("cos_sim"))).toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (k, v) => assert(got(k) == v, s"cos drift at $k") }
  }

  test("rangeSearchSeeded at full probe == rangeSearch for the same query") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val full = graft.pipeline.Ivf.rangeSearchSeeded(emb, "embedding", "vec_id",
        queryId = 0L, minCos = 0.15, numCells = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val brute = Similarity.rangeSearch(emb, emb.filter(col("vec_id") === 0L),
        "embedding", "vec_id", "vec_id", 0.15)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(full == brute, "full-probe cell pruning must be lossless")
  }

  test("rangeSearchSeeded pruned results are the probed-cell subset") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val pruned = graft.pipeline.Ivf.rangeSearchSeeded(emb, "embedding", "vec_id",
        queryId = 0L, minCos = 0.15, numCells = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val full = graft.pipeline.Ivf.rangeSearchSeeded(emb, "embedding", "vec_id",
        queryId = 0L, minCos = 0.15, numCells = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(pruned.keySet.subsetOf(full.keySet))
    pruned.foreach { case (k, v) => assert(full(k) == v) }
  }

  // ---------------- perceptual hash ----------------

  /** JVM reference aHash from raw text bytes, mirroring the oracle's
    * byte math (width-10 BMP, 8×8 lattice, blue channel = byte).
    */
  private def refAHash(text: String): (Long, Long, Long, Double) = {
    val bytes = text.getBytes("UTF-8")
    val h = (bytes.length + 9) / 10
    val vals = Array.tabulate(64) { i =>
      val sr = ((i / 8).toLong * h / 8).toInt
      val sc = ((i % 8).toLong * 10 / 8).toInt
      val idx = sr * 10 + sc
      if (idx < bytes.length) bytes(idx) & 0xff else 0
    }
    val mean = vals.sum.toDouble / 64
    var hi = 0L; var lo = 0L; var n = 0L
    vals.zipWithIndex.foreach { case (v, i) =>
      if (v > mean) { if (i < 32) hi |= 1L << i else lo |= 1L << (i - 32); n += 1 }
    }
    (hi, lo, n, mean)
  }

  test("perceptualHash through the real BMP codec == byte-math reference") {
    import spark.implicits._
    val texts = Seq((1L, "hello world this is a longer document with plenty of bytes"),
      (2L, "short"), (3L, "x" * 100), (4L, "The quick brown fox jumps over the lazy dog. " * 3))
    val docs = texts.toDF("doc_id", "text")
    val got = Multimodal.perceptualHash(
        Multimodal.textAsBmp(docs, "doc_id", "text", width = 10))
      .collect().map(p => p.sample_id -> p).toMap
    texts.foreach { case (id, t) =>
      val (hi, lo, n, mean) = refAHash(t)
      val p = got(id)
      assert((p.ahash_hi, p.ahash_lo, p.n_set, p.sample_mean) == ((hi, lo, n, mean)),
        s"hash drift on doc $id")
    }
  }

  test("phashDupPairs banded join == quadratic reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xa4a54eedL)
    for (_ <- 1 to 4) {
      val base = (0 until 30).map { i =>
        (i.toLong, (0 until 20 + rnd.nextInt(60)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
      }
      // near-dups: flip one char of some docs
      val dups = base.take(10).map { case (id, t) =>
        (id + 1000L, t.updated(rnd.nextInt(t.length), 'Z')) }
      val docs = (base ++ dups).toDF("doc_id", "text")
      val hashes = Multimodal.perceptualHash(
        Multimodal.textAsBmp(docs, "doc_id", "text", width = 10)).toDF()
      val hs = hashes.collect().map(r =>
        (r.getAs[Long]("sample_id"), r.getAs[Long]("ahash_hi"), r.getAs[Long]("ahash_lo")))
      // band count tracks the threshold (maxHamming+1, uneven top
      // band for 7/9-bit splits): losslessness must hold at EVERY
      // supported threshold, not just the 8-band case
      for (maxH <- Seq(0, 3, 5, 6, 7)) {
        val got = Multimodal.phashDupPairs(hashes, maxHamming = maxH)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val ref = (for {
          (ia, hia, loa) <- hs; (ib, hib, lob) <- hs if ia < ib
          ham = java.lang.Long.bitCount(hia ^ hib) + java.lang.Long.bitCount(loa ^ lob)
          if ham <= maxH
        } yield (ia, ib, ham.toLong)).toSet
        assert(got == ref, s"banding must be lossless at hamming <= $maxH")
      }
    }
  }

  test("framePerceptualHash through the real AVI codec == byte-math reference") {
    import spark.implicits._
    // note the third frame differs in PATTERN, not level: aHash of a
    // constant frame is all-zero bits whatever the constant (every
    // value equals the mean), so "aaaa…" vs "zzzz…" would be dups
    val texts = Seq(
      (1L, "0123456789" * 4), // 4 byte-identical frames
      (2L, "aaaaaaaaaa" + "aaaaaaaaaa" + "azazazazaz"), // frames 0,1 identical, 2 differs
      (3L, "short")) // single padded frame
    val docs = texts.toDF("doc_id", "text")
    val flags = Multimodal.staticFrameFlags(
        Multimodal.framePerceptualHash(
          Multimodal.textAsAvi(docs, "doc_id", "text")).toDF(), maxHamming = 3)
      .collect().map(r => ((r.getAs[Long]("sample_id"), r.getAs[Long]("frame_idx")),
        (r.getAs[Long]("ahash_hi"), r.getAs[Long]("ahash_lo"), r.getAs[Boolean]("dup_prev")))).toMap
    // reference: frame f owns bytes [10f, 10f+10) as a 5x2 grid
    def refFrameHash(text: String, f: Int): (Long, Long) = {
      val bytes = text.getBytes("UTF-8")
      val vals = Array.tabulate(64) { i =>
        val sr = ((i / 8).toLong * 2 / 8).toInt
        val sc = ((i % 8).toLong * 5 / 8).toInt
        val idx = f * 10 + sr * 5 + sc
        if (idx < bytes.length) bytes(idx) & 0xff else 0
      }
      val mean = vals.sum.toDouble / 64
      var hi = 0L; var lo = 0L
      vals.zipWithIndex.foreach { case (v, i) =>
        if (v > mean) { if (i < 32) hi |= 1L << i else lo |= 1L << (i - 32) }
      }
      (hi, lo)
    }
    texts.foreach { case (id, t) =>
      val nf = (t.getBytes("UTF-8").length + 9) / 10
      (0 until nf).foreach { f =>
        val (hi, lo) = refFrameHash(t, f)
        val (ghi, glo, _) = flags((id, f.toLong))
        assert((ghi, glo) == ((hi, lo)), s"frame hash drift doc $id frame $f")
      }
    }
    // doc 1: all four frames byte-identical -> dup_prev from frame 1 on
    assert(!flags((1L, 0L))._3 && (1L to 3L).forall(f => flags((1L, f))._3))
    // doc 2: frames 0 and 1 are byte-identical -> dup_prev on frame 1;
    // frame 0 never dups; frame 2 differs
    assert(!flags((2L, 0L))._3 && flags((2L, 1L))._3 && !flags((2L, 2L))._3)
    // doc 3: a single padded frame, trivially not a dup
    assert(!flags((3L, 0L))._3)
  }

  test("identical images give hamming 0 and phashDupPairs rejects maxHamming > 7") {
    import spark.implicits._
    val docs = Seq((1L, "same bytes exactly"), (2L, "same bytes exactly")).toDF("doc_id", "text")
    val hashes = Multimodal.perceptualHash(
      Multimodal.textAsBmp(docs, "doc_id", "text", width = 10)).toDF()
    val pairs = Multimodal.phashDupPairs(hashes).collect()
    assert(pairs.length == 1 && pairs(0).getLong(2) == 0)
    intercept[IllegalArgumentException] {
      Multimodal.phashDupPairs(hashes, maxHamming = 8)
    }
  }
}
