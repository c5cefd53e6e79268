package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Multimodal, TextAnalysis}

/** Round-11 operators: BPE encoding (tokenizer application), the real
  * PNG codec round-trip, deterministic MLM masking, and the
  * per-source KL divergence report.
  */
class Round11Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---------------- BPE encode ----------------

  test("bpeEncode: hand-checked merges on a tiny corpus") {
    import spark.implicits._
    // merges: (a,b) then (ab,c) — 'abc' -> 'abc' single symbol;
    // 'ab' -> 'ab'; 'ba' stays two symbols
    val docs = Seq((1L, "abc ab ba"), (2L, "cab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, "text", "doc_id",
        Seq(("a", "b"), ("ab", "c")))
      .orderBy(col("doc_id")).collect()
    // doc 1: words abc|ab|ba -> chars 'a b c | a b | b a'
    //   merge(a,b): 'ab c | ab | b a'; merge(ab,c): 'abc | ab | b a'
    val enc1 = "abc | ab | b a"
    assert(out(0).getLong(1) == 4L, "n_tokens excludes boundaries")
    assert(out(0).getLong(2) == 7L)
    assert(out(0).getString(4) == md5hex(enc1))
    assert(out(0).getDouble(3) == 1.75)
    // doc 2: 'c a b' -> merge(a,b): 'c ab'; (ab,c) no adjacency
    assert(out(1).getString(4) == md5hex("c ab"))
    assert(out(1).getLong(1) == 2L)
  }

  test("bpeEncode: merges never cross the | word boundary") {
    import spark.implicits._
    // corpus 'b a' as two words: pair (a,b) never adjacent within a
    // word, only across the boundary — must NOT merge
    val docs = Seq((1L, "xa bx")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, "text", "doc_id",
      Seq(("a", "b"))).collect().head
    assert(out.getString(4) == md5hex("x a | b x"), "cross-word merge happened")
  }

  test("bpeEncode: wordless doc gets zero tokens and null fertility") {
    import spark.implicits._
    val docs = Seq((1L, "123 !!!")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, "text", "doc_id",
      Seq(("a", "b"))).collect().head
    assert(out.getLong(1) == 0L && out.getLong(2) == 0L && out.isNullAt(3))
    assert(out.getString(4) == md5hex(""))
  }

  test("bpeEncode: leftmost non-overlapping within runs (aaa with (a,a))") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, "text", "doc_id",
      Seq(("a", "a"))).collect().head
    // 'a a a' -> 'aa a'; 'a a a a' -> 'aa aa'
    assert(out.getString(4) == md5hex("aa a | aa aa"))
  }

  test("bpeEncode rejects empty or non-[a-z] merge operands") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(docs, "text", "doc_id", Seq(("a", "")))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(docs, "text", "doc_id", Seq(("a", "|")))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(docs, "text", "doc_id", Nil)
    }
  }

  test("BpeEncode kernel == composable regex chain (fixture + random corpora)") {
    import spark.implicits._
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents").limit(100)
    val merges = TextAnalysis.bpeMerges(docs, "text", k = 6)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val a = TextAnalysis.bpeEncode(docs, "text", "doc_id", merges)
      .orderBy(col("doc_id")).collect()
    val b = TextAnalysis.bpeEncodeComposable(docs, "text", "doc_id", merges)
      .orderBy(col("doc_id")).collect()
    assert(a.sameElements(b), "kernel diverged from the chain on the fixture")
    // adversarial/random corpora THROUGH A REPARTITION (off-driver
    // eval — the serialization trap the kernel memory notes)
    val rnd = new scala.util.Random(11)
    val adv = Seq("", "   ", "123 !!!", "a", "ab|cd", "ABC abc aBc",
      "aaa aaaa aaaaa", "x" * 500) ++
      (1 to 40).map(_ => Seq.fill(rnd.nextInt(30))(
        Seq("ab", "ba", "abc", "a", "b", "zz", "9", "!")(rnd.nextInt(8)))
        .mkString(" "))
    val df = adv.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(5)
    val rules = Seq(("a", "b"), ("ab", "c"), ("b", "a"), ("z", "z"))
    val ka = TextAnalysis.bpeEncode(df, "text", "doc_id", rules)
      .orderBy(col("doc_id")).collect()
    val kb = TextAnalysis.bpeEncodeComposable(df, "text", "doc_id", rules)
      .orderBy(col("doc_id")).collect()
    assert(ka.sameElements(kb), "kernel diverged on adversarial corpus")
  }

  test("bpeEncode composes with bpeMerges: induced rules re-tokenize the corpus") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents").limit(50)
    val merges = TextAnalysis.bpeMerges(docs, "text", k = 4)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.size == 4)
    val enc = TextAnalysis.bpeEncode(docs, "text", "doc_id", merges)
    val rows = enc.collect()
    assert(rows.length == 50)
    // merging strictly reduces token count vs character count
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "tokens must not exceed chars")
    }
    // at least one document actually benefited from a merge
    assert(rows.exists(r => r.getLong(1) < r.getLong(2)))
  }

  // ---------------- PNG codec ----------------

  test("PngCodec: encode/decode round-trip is pixel-exact") {
    val pixels = Array.tabulate(10 * 3) { i =>
      ((i * 7 % 256).toByte, (255 - i * 5 % 256).toByte, (i * 11 % 256).toByte)
    }
    val bytes = Multimodal.PngCodec.encodeRgb(pixels, 10, 3)
    // real PNG magic
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
    val (w, h, px) = Multimodal.PngCodec.decodePixels(bytes)
    assert(w == 10 && h == 3)
    pixels.zipWithIndex.foreach { case ((r, g, b), i) =>
      assert(px(i * 3) == r && px(i * 3 + 1) == g && px(i * 3 + 2) == b,
        s"pixel $i mismatch")
    }
  }

  test("decodePng survives serialization (repartitioned, off-driver)") {
    import spark.implicits._
    val docs = Seq((1L, "hello png"), (2L, "another doc here"))
      .toDF("doc_id", "text").repartition(3)
    val out = Multimodal.decodePng(
        Multimodal.textAsPng(docs, "doc_id", "text", width = 4))
      .collect().sortBy(_.sample_id)
    val t1 = "hello png".getBytes("UTF-8")
    assert(out(0).width == 4 && out(0).height == (t1.length + 3) / 4)
    val n = 4L * out(0).height
    assert(out(0).n_pixels == n)
    assert(out(0).mean_r == t1.map(_ & 0xff).sum.toDouble / n)
    assert(out(0).mean_g == t1.map(b => 255 - (b & 0xff)).sum.toDouble / n)
    assert(out(0).mean_b == t1.map(b => ((b & 0xff) * 3) % 256).sum.toDouble / n)
    assert(out(0).top_left_r == ('h'.toInt))
    // compressed payload exists and is not the raw pixel dump
    assert(out(0).n_bytes > 8)
  }

  test("MediaDecoder dispatches PNG magic to the real codec") {
    val pixels = Array.tabulate(8)(i =>
      ((i * 30).toByte, (i * 20).toByte, (i * 10).toByte))
    val bytes = Multimodal.PngCodec.encodeRgb(pixels, 4, 2)
    val (mean, vec) = Multimodal.MediaDecoder.decode(bytes)
    // real branch: mean over the RGB byte signal, NOT FakeDecoder's
    // payload-byte mean
    val signal = Multimodal.PngCodec.decodePixels(bytes)._3.map(b => (b & 0xff).toDouble)
    assert(mean == signal.sum / signal.length)
    val (fakeMean, _) = Multimodal.FakeDecoder.decode(bytes)
    assert(mean != fakeMean, "fell through to FakeDecoder")
    assert(vec.length == 8)
  }

  test("PngCodec rejects non-png bytes cleanly") {
    intercept[IllegalArgumentException] {
      Multimodal.PngCodec.decodePixels("not a png at all".getBytes)
    }
  }

  test("native PNG decode == ImageIO on JDK-encoded files (all filters)") {
    // The JDK PNG encoder picks scanline filters adaptively (Sub/Up/
    // Average/Paeth on gradient-ish content), so decoding ITS output
    // exercises every unfilter branch the native path implements —
    // against ImageIO.read as the pixel-exact reference.
    val rnd = new scala.util.Random(42)
    for ((w, h, kind) <- Seq((1, 1, "noise"), (7, 5, "noise"),
        (64, 48, "gradient"), (33, 17, "stripes"), (16, 16, "noise"))) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = kind match {
          case "noise" => (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
          case "gradient" => ((x * 4) % 256, (y * 4) % 256, (x + y) % 256)
          case _ => (if (x % 2 == 0) 255 else 0, y % 256, 128)
        }
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos))
      val bytes = baos.toByteArray
      val (dw, dh, px) = Multimodal.PngCodec.decodePixels(bytes)
      assert(dw == w && dh == h, s"$kind $w x $h dims")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val k = (y * w + x) * 3
        assert((px(k) & 0xff) == ((rgb >> 16) & 0xff) &&
          (px(k + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
          (px(k + 2) & 0xff) == (rgb & 0xff),
          s"$kind $w x $h pixel ($x,$y)")
      }
    }
  }

  test("native PNG decode handles truecolor+alpha (type 6), alpha dropped") {
    val w = 9; val h = 6
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (rnd.nextInt(256) << 24) | (rnd.nextInt(256) << 16) |
        (rnd.nextInt(256) << 8) | rnd.nextInt(256))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val (dw, dh, px) = Multimodal.PngCodec.decodePixels(baos.toByteArray)
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y) // ARGB; alpha in bits 24-31 ignored
      val k = (y * w + x) * 3
      assert((px(k) & 0xff) == ((rgb >> 16) & 0xff) &&
        (px(k + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (px(k + 2) & 0xff) == (rgb & 0xff), s"pixel ($x,$y)")
    }
  }

  // ---------------- MLM masking ----------------

  test("mlmMask replays the md5 decisions exactly (in-memory reference)") {
    import spark.implicits._
    val texts = Seq((7L, "The quick Brown fox  jumps"), (8L, "one two"))
    val out = TextAnalysis.mlmMask(texts.toDF("doc_id", "text"), "text", "doc_id")
      .orderBy(col("doc_id")).collect()
    texts.zipWithIndex.foreach { case ((id, text), k) =>
      val toks = text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
      val mk = toks.indices.map(i => "012".contains(md5hex(s"$id:${i + 1}").charAt(0)))
      val masked = toks.indices.map(i => if (mk(i)) "[MASK]" else toks(i)).mkString(" ")
      val targets = toks.indices.filter(mk).map(toks).mkString("|")
      val r = out(k)
      assert(r.getLong(1) == toks.length.toLong)
      assert(r.getLong(2) == mk.count(identity).toLong)
      assert(r.getString(4) == md5hex(masked), s"doc $id masked_md5")
      assert(r.getString(5) == md5hex(targets), s"doc $id targets_md5")
      assert(r.getDouble(3) ==
        BigDecimal(mk.count(identity).toDouble / toks.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("mlmMask rate tracks the hex-set size and rejects bad sets") {
    import spark.implicits._
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents").limit(100)
    val full = TextAnalysis.mlmMask(docs, "text", "doc_id",
      maskHex = "0123456789abcdef".map(_.toString))
    // all-hex set masks everything
    assert(full.select(sum(col("n_tokens") - col("n_masked"))).head.getLong(0) == 0L)
    intercept[IllegalArgumentException] {
      TextAnalysis.mlmMask(docs, "text", "doc_id", maskHex = Seq("G"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.mlmMask(docs, "text", "doc_id", maskHex = Nil)
    }
  }

  test("mlmMask is partitioning-invariant (hash math, no RNG state)") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents").limit(60)
    val a = TextAnalysis.mlmMask(docs, "text", "doc_id")
      .orderBy(col("doc_id")).collect()
    val b = TextAnalysis.mlmMask(docs.repartition(7), "text", "doc_id")
      .orderBy(col("doc_id")).collect()
    assert(a.sameElements(b))
  }

  // ---------------- source KL ----------------

  test("sourceKlReport matches an in-memory reference and KL >= 0") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x x y"), ("a", "x z"),
      ("b", "y y z z"), ("b", "z z")).toDF("source", "text")
    val out = TextAnalysis.sourceKlReport(docs, "text", "source").collect()
    // reference
    val toks = Seq("a" -> Seq("x", "x", "y", "x", "z"),
      "b" -> Seq("y", "y", "z", "z", "z", "z"))
    val global = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val nTot = global.values.sum.toDouble
    toks.zipWithIndex.foreach { case ((src, ts), i) =>
      val cs = ts.groupBy(identity).view.mapValues(_.size).toMap
      val ns = ts.size.toDouble
      val kl = cs.toSeq.sortBy(_._1).map { case (w, c) =>
        val ps = c / ns
        ps * math.log(ps / (global(w) / nTot))
      }.sum
      val row = out.find(_.getString(0) == src).get
      assert(row.getLong(1) == ts.size.toLong)
      assert(row.getLong(2) == cs.size.toLong)
      assert(math.abs(row.getDouble(3) - kl) < 1e-6, s"$src kl")
      assert(row.getDouble(3) >= 0.0, "KL must be non-negative")
    }
  }

  test("sourceKlReport: identical-distribution source has KL ~ 0") {
    import spark.implicits._
    val docs = Seq(("a", "x y z"), ("b", "x y z")).toDF("source", "text")
    val out = TextAnalysis.sourceKlReport(docs, "text", "source").collect()
    out.foreach(r => assert(r.getDouble(3) == 0.0))
  }

  // ---------------- cross-source duplication matrix ----------------

  test("crossSourceDups: hand-computed pair combinatorics") {
    import spark.implicits._
    // content X: 2 in a, 1 in b; content Y: 2 in b; content Z: unique
    val docs = Seq(
      ("a", "X"), ("a", "X"), ("b", "X"),
      ("b", "Y"), ("b", "Y"),
      ("a", "Z")).toDF("source", "text")
    val out = graft.pipeline.Dedup.crossSourceDups(docs, "text", "source")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // (a,a): C(2,2)=1 pair of X; (a,b): 2*1=2 X pairs; (b,b): C(2,2)=1 Y pair
    assert(out(("a", "a")) == (1L, 1L))
    assert(out(("a", "b")) == (2L, 1L))
    assert(out(("b", "b")) == (1L, 1L))
    assert(out.size == 3, "unique content must not contribute")
  }

  test("crossSourceDups pair totals reconcile with the doc-pair ground truth") {
    import spark.implicits._
    // brute-force ground truth: count doc pairs with equal fingerprint
    val docs = Seq(
      ("a", "p q"), ("b", "p q"), ("c", "p q"),
      ("a", "r"), ("a", "r"), ("c", "s")).toDF("source", "text").repartition(3)
    val out = graft.pipeline.Dedup.crossSourceDups(docs, "text", "source")
    val total = out.agg(sum(col("n_pairs"))).head.getLong(0)
    // pairs among the three "p q" docs: C(3,2)=3; among "r": 1 → 4
    assert(total == 4L)
    // chunked granularity on chunk-duplicated corpus
    val docs2 = Seq(
      ("a", Seq.fill(20)("w").mkString(" ") + " tail a"),
      ("b", Seq.fill(20)("w").mkString(" ") + " other")).toDF("source", "text")
    val chunked = graft.pipeline.Dedup.crossSourceDups(docs2, "text", "source",
      chunkTokens = Some(20)).collect()
    // the identical first 20-token chunk spans (a,b) exactly once
    assert(chunked.exists(r => r.getString(0) == "a" && r.getString(1) == "b" &&
      r.getLong(2) == 1L))
  }

  // ---------------- two-stage SQ8 re-rank ----------------

  test("rerankedTopK: exact cosines, shortlist-bounded, full shortlist == brute force") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    val n = emb.count().toInt
    val brute = graft.pipeline.Similarity.bruteForceTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // shortlist covering the whole corpus makes stage 1 irrelevant:
    // the two-stage result must equal exact brute force bit-for-bit
    val full = graft.pipeline.Quantize.rerankedTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 10, shortlist = n,
      lo = -2.0, hi = 2.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.sameElements(brute))
    // realistic shortlist: results are a subset of the SQ8 shortlist,
    // scored EXACTLY (cosines match the brute-force values for those ids)
    val short = graft.pipeline.Quantize.quantizedTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 50, lo = -2.0, hi = 2.0)
      .collect().map(_.getLong(0)).toSet
    val staged = graft.pipeline.Quantize.rerankedTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = 10, shortlist = 50,
      lo = -2.0, hi = 2.0).collect()
    assert(staged.length == 10)
    assert(staged.forall(r => short.contains(r.getLong(0))))
    val exactById = graft.pipeline.Similarity.bruteForceTopK(
      emb, "embedding", "vec_id", queryId = 0L, k = n)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    staged.foreach(r =>
      assert(r.getDouble(1) == exactById(r.getLong(0)), s"id ${r.getLong(0)}"))
  }

  test("rerankedTopK rejects shortlist < k") {
    val emb = Tables.load(spark, SparkFixture.sfDir, "embeddings")
    intercept[IllegalArgumentException] {
      graft.pipeline.Quantize.rerankedTopK(emb, "embedding", "vec_id",
        queryId = 0L, k = 10, shortlist = 5, lo = -2.0, hi = 2.0)
    }
  }

  // ---------------- verified LSH pairs ----------------

  test("lshVerifiedPairsMd5 == exact Jaccard restricted to the candidate set") {
    val docs = Tables.load(spark, SparkFixture.sfDir, "documents").limit(200)
    val verified = graft.pipeline.Dedup.lshVerifiedPairsMd5(
      docs, "text", "doc_id", threshold = 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = graft.pipeline.Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", n = 3, threshold = 0.2, maxPostings = None)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cand = graft.pipeline.Dedup.minHashLshMd5(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verified = exact ∩ candidates, with IDENTICAL jaccard values
    val expected = exact.view.filterKeys(cand).toMap
    assert(verified == expected,
      s"verified=${verified.keySet} expected=${expected.keySet}")
    verified.values.foreach(j => assert(j >= 0.2))
  }

  test("lshVerifiedPairsMd5 finds planted exact duplicates with jaccard 1.0") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, base), (2L, base), (3L, "totally different words here now"))
      .toDF("doc_id", "text").repartition(2)
    val out = graft.pipeline.Dedup.lshVerifiedPairsMd5(docs, "text", "doc_id")
      .collect()
    // identical docs share every band -> always candidates -> jaccard 1
    assert(out.length == 1 && out.head.getLong(0) == 1L &&
      out.head.getLong(1) == 2L && out.head.getDouble(2) == 1.0)
  }

  // ---------------- WAV DFT energy ----------------

  test("wavDftEnergy matches an in-memory Goertzel reference; bin 0 is the plain sum") {
    import spark.implicits._
    val texts = Seq((3L, "hello dft world"), (4L, "a"))
    val media = graft.pipeline.Multimodal.textAsWav(
      texts.toDF("doc_id", "text").repartition(2), "doc_id", "text")
    val out = graft.pipeline.Multimodal.wavDftEnergy(media, dftBins = Seq(0, 1))
      .orderBy(col("sample_id"), col("bin")).collect()
    texts.foreach { case (id, text) =>
      val xs = text.getBytes("UTF-8").map(b => (b & 0xff) * 128)
      val n = xs.length
      def ref(k: Int): (Double, Double) = {
        var c = 0.0; var s = 0.0
        for (j <- 0 until n) {
          val theta = 2.0 * math.Pi * k * j / n
          c += xs(j) * math.cos(theta); s += xs(j) * math.sin(theta)
        }
        def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r6(c), r6(s))
      }
      val rows = out.filter(_.getLong(0) == id)
      assert(rows.length == 2)
      rows.foreach { r =>
        val k = r.getLong(1).toInt
        val (ec, es) = ref(k)
        assert(r.getLong(2) == n.toLong)
        assert(r.getLong(3) == xs.map(x => x.toLong * x).sum, "power")
        assert(r.getDouble(4) == ec, s"doc $id bin $k c")
        assert(r.getDouble(5) == es, s"doc $id bin $k s")
      }
      // bin 0: cos=1, sin=0 everywhere -> c is the plain sample sum, s=0
      val b0 = rows.find(_.getLong(1) == 0L).get
      assert(b0.getDouble(4) == xs.sum.toDouble && b0.getDouble(5) == 0.0)
    }
  }

  test("wavDftEnergy rejects empty bins and negative bins") {
    import spark.implicits._
    val media = graft.pipeline.Multimodal.textAsWav(
      Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.pipeline.Multimodal.wavDftEnergy(media, dftBins = Nil)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Multimodal.wavDftEnergy(media, dftBins = Seq(-1))
    }
  }
}
