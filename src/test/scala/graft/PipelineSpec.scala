package graft

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.ops.MergeProcessor
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import org.apache.spark.sql.DataFrame

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "completely different content about spark engines"),
      (4L, "THE  QUICK brown fox jumps over the lazy dog"), // exact dup of 1 after norm
      (5L, "der hund und die katze und der vogel nicht hier")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups normalized duplicates") {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
    val dupGroup = g.find(_.getAs[Long]("group_size") == 2)
    assert(dupGroup.isDefined, "docs 1 and 4 must share a fingerprint")
    assert(dupGroup.get.getAs[Long]("keep_id") == 1L)
    assert(g.length == 4)
  }

  test("ngram jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("maxPostings cap drops hot posting lists, reports them, and completes") {
    import spark.implicits._
    // 30 identical spam docs: ONE shingle shared by all 30 → posting
    // list of 30 ids; every spam pair has jaccard 1.0 through it.
    // Plus one legitimate near-dup pair (31, 32) whose posting lists
    // stay under the cap — so the capped result is non-empty (AQE
    // replaces fully-empty results with EmptyRelation, discarding the
    // executed observe node; see ngramJaccardPairs scaladoc).
    val spam = ((1L to 30L).map(i => (i, "spam spam spam spam spam")) ++
      Seq((31L, "alpha beta gamma delta epsilon"),
          (32L, "alpha beta gamma delta epsilon"))).toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(spam, "text", "doc_id", n = 3,
      threshold = 0.5, maxPostings = None).count()
    assert(exact == 30L * 29 / 2 + 1, "uncapped: all pairs via the hot shingle")
    // capture the observe metric emitted by the capped run
    @volatile var dropped = -1L
    val probe = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.foreach { case (name, r) =>
          if (name.startsWith(Dedup.postingMetricName))
            dropped = r.getAs[Long]("dropped_posting_lists")
        }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(probe)
    try {
      val capped = Dedup.ngramJaccardPairs(spam, "text", "doc_id", n = 3,
        threshold = 0.5, maxPostings = Some(10)).collect()
      assert(capped.length == 1, "only the under-cap pair survives")
      assert((capped.head.getLong(0), capped.head.getLong(1)) == (31L, 32L))
      // listener bus is async: poll briefly for the metric
      val deadline = System.nanoTime() + 10e9.toLong
      while (dropped < 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(dropped == 1, s"expected 1 dropped posting list, saw $dropped")
    } finally spark.listenerManager.unregister(probe)
  }

  test("two capped dedup frames compose in one query (unique observe names)") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val b = Seq((3L, "mu nu xi omicron pi"), (4L, "mu nu xi omicron pi")).toDF("doc_id", "text")
    val both = Dedup.ngramJaccardPairs(a, "text", "doc_id", 3, 0.5, Some(10))
      .unionByName(Dedup.ngramJaccardPairs(b, "text", "doc_id", 3, 0.5, Some(10)))
    assert(both.count() == 2, "one pair per corpus")
  }

  test("tokenStatsApprox agrees with the exact formulation within HLL tolerance") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val approx = TextAnalysis.tokenStatsApprox(d, "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val exactBase = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"))
    val exactDt = d.select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source")).agg(countDistinct(col("tok")).as("dt"))
    val exact = exactBase.join(exactDt, Seq("source"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, e) =>
      val a = approx(src)
      // doc and token totals are exact in both formulations
      assert(a.getAs[Long]("n_docs") == e.getAs[Long]("n_docs"))
      assert(a.getAs[Long]("total_tokens") == e.getAs[Long]("total_tokens"))
      // HLL++ at rsd=0.05: allow 3 sigma
      val dt = e.getAs[Long]("dt").toDouble
      val adt = a.getAs[Long]("approx_distinct_tokens").toDouble
      assert(math.abs(adt - dt) / dt <= 0.15,
        s"$src: approx $adt vs exact $dt off by ${math.abs(adt - dt) / dt}")
    }
  }

  test("hashedShingles sets match the string-shingle sets") {
    val real = spark.read.parquet(s"${SparkFixture.sfDir}/documents.parquet")
    val str = Dedup.shingles(real, "text", "doc_id", 3)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hsh = Dedup.hashedShingles(real, "text", "doc_id", 3)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hsh == str, "per-doc distinct shingle counts must be identical")
    // whitespace/case edge cases
    import spark.implicits._
    val edge = Seq((1L, "  A\tB\nC  d e  "), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val se = Dedup.shingles(edge, "text", "doc_id", 2)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val he = Dedup.hashedShingles(edge, "text", "doc_id", 2)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(he == se, s"edge sets differ: $he vs $se")
  }

  test("connectedComponents: chain, cycle, and isolated pair each collapse to one cluster") {
    import spark.implicits._
    // chain 1-2-3-4-5-6-7-8 (diameter 7 → several propagation rounds),
    // cycle 20-21-22-20, isolated pair 30-31
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L),
      (20L, 21L), (21L, 22L), (22L, 20L),
      (30L, 31L)).toDF("id_a", "id_b")
    // both execution paths must agree: driver union-find (default)
    // and the distributed hash-min propagation (edge limit 0)
    for (limit <- Seq(100000, 0)) {
      // limit 0 also forces the distributed OUTPUT: the returned
      // labelling is cached and owned by the caller — release it
      val df = Dedup.connectedComponents(edges, localEdgeLimit = limit)
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      df.unpersist()
      assert((1L to 8L).forall(got(_) == 1L), s"chain(limit=$limit): $got")
      assert(Seq(20L, 21L, 22L).forall(got(_) == 20L), s"cycle(limit=$limit): $got")
      assert(got(30L) == 30L && got(31L) == 30L, s"pair(limit=$limit): $got")
      assert(got.size == 13)
    }
  }

  test("connectedComponents agrees with brute-force closure on the real pair graph") {
    val real = spark.read.parquet(s"${SparkFixture.sfDir}/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(real, "text", "doc_id", n = 3,
      threshold = 0.3, maxPostings = None).cache()
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find as the independent oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(v => v -> find(v)).toMap
    // force the DISTRIBUTED path so the real-graph check exercises the
    // propagation loop, not the same union-find as the oracle above
    val ccDf = Dedup.connectedComponents(pairs, localEdgeLimit = 0)
    val got = ccDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ccDf.unpersist() // distributed output is caller-owned cache
    pairs.unpersist()
    assert(got == want)
  }

  test("contaminationCounts finds only true shingle overlaps with the benchmark set") {
    import spark.implicits._
    val bench = Seq((100L, "the secret eval answer is forty two")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "we think the secret eval answer is hidden"), // shares "the secret eval", "secret eval answer"
      (2L, "completely unrelated training content here"),
      (3L, "the secret eval answer is forty two exactly") // near-copy: many shared shingles
    ).toDF("doc_id", "text")
    val got = graft.pipeline.Decontaminate
      .contaminationCounts(train, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(2L), "no shared shingle, must be absent")
    // doc 1 shares: "the secret eval", "secret eval answer", "eval answer is"
    assert(got(1L) == 3L, s"doc 1: ${got.get(1L)}")
    // doc 3 shares all 5 benchmark shingles
    assert(got(3L) == 5L, s"doc 3: ${got.get(3L)}")
  }

  test("containmentPairs is directional: embedded quote scores high one way only") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta"), // 2 shingles, both inside doc 2
      (2L, "intro words alpha beta gamma delta and then much more trailing content here"),
      (3L, "unrelated text about something else entirely")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "text", "doc_id", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L)), s"only 1⊂2: $got")
    assert(got((1L, 2L)) == 1.0, "every shingle of doc 1 appears in doc 2")
  }

  test("hybridNearDups labels lexical, semantic, and both-evidence pairs") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // lexical pair with 1
      (3L, "totally different words live in this one here"),
      (4L, "unrelated content again nothing shared at all")).toDF("doc_id", "text")
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),   // orthogonal: no semantic pair
      (3L, Array(0.6f, 0.8f)), (4L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding") // identical
    val got = Dedup.hybridNearDups(d, e, "text", "doc_id", "embedding", "vec_id",
        n = 3, jaccardThreshold = 0.3, cosineThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4)).toMap
    assert(got((1L, 2L)) == "lexical", got.toString)
    assert(got((3L, 4L)) == "semantic", got.toString)
    assert(got.size == 2)
  }

  test("duplicatedChunks finds cross-doc boilerplate, not unique chunks") {
    import spark.implicits._
    val boiler = (1 to 4).map(i => s"license term $i common").mkString(" ") // 16 tokens
    val pad4 = "p1 p2 p3 p4"
    val d = Seq(
      (1L, s"$boiler $pad4 unique tail one"),    // chunk0 = boiler+pad (20 toks)
      (2L, s"$boiler $pad4 other ending here"),  // same chunk0
      (3L, "totally different twenty tokens " + (1 to 16).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedChunks(d, "text", "doc_id",
      windowTokens = 20, strideTokens = 20).collect()
    assert(got.length == 1, got.mkString(";"))
    assert(got(0).getAs[Long]("n_occurrences") == 2)
    assert(got(0).getAs[Long]("n_docs") == 2)
    assert(got(0).getAs[Long]("first_doc") == 1L)
  }

  test("clustering assigns to nearest seed with smallest-cell tie-break") {
    import spark.implicits._
    // seeds: 0 → x-axis, 1 → y-axis; 2/3 cluster with x; 4 is the
    // exact diagonal — equal cosine to both seeds → tie → cell 0
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.8f, 0.0f)),
      (4L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val a = graft.pipeline.Clustering.assignToSeeds(e, "embedding", "vec_id", k = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(a == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L), a.toString)
    val rep = graft.pipeline.Clustering.clusterReport(e, "embedding", "vec_id", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(rep(0L)._1 == 4L, "cell 0 has members 0,2,3,4")
    assert(rep(0L)._2 == 0L, "seed itself is most central (sim 1.0, smallest id)")
    assert(rep(1L) == ((1L, 1L)))
    val samp = graft.pipeline.Clustering.balancedSample(
      e, "embedding", "vec_id", k = 2, perCluster = 2).collect()
    assert(samp.length == 3, "2 from cell 0, 1 from cell 1")
    assert(samp.forall(_.getAs[Long]("rank") <= 2))
  }

  test("clustering seeds are the k smallest ids even when ids are not contiguous") {
    import spark.implicits._
    // ids start at 1000 and are sparse: a `id < k` seed filter would
    // match nothing; the seeds must be the k smallest ids PRESENT
    val e = Seq(
      (1000L, Array(1.0f, 0.0f)), (2500L, Array(0.0f, 1.0f)),
      (9000L, Array(0.9f, 0.1f)), (9001L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val a = graft.pipeline.Clustering.assignToSeeds(e, "embedding", "vec_id", k = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    // cells are named by seed id: 1000 (x-axis) and 2500 (y-axis)
    assert(a == Map(1000L -> 1000L, 2500L -> 2500L,
      9000L -> 1000L, 9001L -> 2500L), a.toString)
    val rep = graft.pipeline.Clustering.clusterReport(e, "embedding", "vec_id", k = 2)
      .collect()
    assert(rep.length == 2, "both seeds must form clusters")
  }

  test("clustering assignment equals local brute-force argmax on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 16
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val k = 5
    def cos(a: Array[Float], b: Array[Float]): Double = {
      // same sequential fold as the codegen kernel: per-element double
      // cast, left-to-right accumulation
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val seeds = vecs.take(k)
    val expected = vecs.map { case (id, v) =>
      id -> seeds.maxBy { case (cell, sv) => (cos(v, sv), -cell) }._1
    }.toMap
    val got = graft.pipeline.Clustering.assignToSeeds(
        vecs.toDF("vec_id", "embedding"), "embedding", "vec_id", k)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(got == expected)
  }

  test("removeContaminated drops only docs over the hit threshold") {
    import spark.implicits._
    val bench = Seq((100L, "the secret eval answer is forty two")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "we think the secret eval answer is hidden"), // many shared shingles
      (2L, "the secret word differs here entirely now"),  // 1 shared ("the secret …"? below threshold)
      (3L, "completely unrelated text about spark plans")).toDF("doc_id", "text")
    val kept = graft.pipeline.Decontaminate.removeContaminated(
        train, bench, "text", "doc_id", n = 3, minHits = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L), "heavily contaminated doc must be removed")
    assert(kept.contains(3L), "clean doc must survive")
    // columns preserved: the output is the corpus, not a report
    assert(graft.pipeline.Decontaminate.removeContaminated(
      train, bench, "text", "doc_id").columns.toSeq == Seq("doc_id", "text"))
  }

  test("contamination fractions normalize hits by the doc's own shingle count") {
    import spark.implicits._
    val bench = Seq((100L, "the secret eval answer is forty two")).toDF("doc_id", "text")
    val train = Seq(
      // 6 tokens -> 4 shingles, 4 shared with bench: frac = 1.0
      (1L, "secret eval answer is forty two"),
      // long doc with the same 4 shared shingles diluted: frac < 0.5
      (2L, "secret eval answer is forty two " +
        (1 to 14).map("filler" + _).mkString(" ")),
      (3L, "completely unrelated text about spark plans")).toDF("doc_id", "text")
    val fr = graft.pipeline.Decontaminate.contaminationFractions(
        train, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("n_shingles"),
          r.getAs[Double]("frac"))).toMap
    assert(!fr.contains(3L), "zero-overlap docs are absent")
    assert(fr(1L)._3 == 1.0, s"fully contained doc: ${fr(1L)}")
    assert(fr(1L)._1 == fr(2L)._1, "same absolute hits")
    assert(fr(2L)._3 < 0.5, s"diluted doc fraction: ${fr(2L)}")
    // the fraction filter keeps the diluted doc an absolute-count
    // threshold would have dropped
    val kept = graft.pipeline.Decontaminate.removeContaminatedFraction(
        train, bench, "text", "doc_id", n = 3, minFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), kept.toString)
  }

  test("token entropy: uniform > repetitive, exact values on tiny docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c"),        // uniform 3 tokens -> ln 3
      (2L, "a a b"),        // H = ln 3 - (2 ln 2)/3
      (3L, "a a a a")).toDF("doc_id", "text") // single token -> 0
    val got = graft.pipeline.TextAnalysis.tokenEntropy(d, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy"))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L) == ((3L, 3L, r6(math.log(3)))), got(1L).toString)
    assert(got(2L) == ((3L, 2L, r6(math.log(3) - 2 * math.log(2) / 3))),
      got(2L).toString)
    assert(got(3L) == ((4L, 1L, 0.0)), got(3L).toString)
    assert(got(1L)._3 > got(2L)._3 && got(2L)._3 > got(3L)._3,
      "diversity ordering must hold")
  }

  test("tfidfKeywords ranks rare terms above ubiquitous ones") {
    import spark.implicits._
    // "common" appears in all 3 docs (df=3, idf=1); each doc's unique
    // term has df=1 (idf=3) and must outrank it
    val d = Seq(
      (1L, "common alpha common"),
      (2L, "common beta"),
      (3L, "common gamma gamma")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfKeywords(d, "text", "doc_id", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    assert(got(1L) == ("alpha", 3.0), got.toString) // 1 * 3/1
    assert(got(2L) == ("beta", 3.0))
    assert(got(3L) == ("gamma", 6.0)) // tf 2 * 3/1
    // ties break on the token string: doc with two df=1 tf=1 terms
    val tie = Seq((1L, "zeta eta"), (2L, "filler")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfKeywords(tie, "text", "doc_id", k = 1)
      .where(col("doc_id") === 1L).collect()
    assert(top.head.getString(1) == "eta", "alphabetical tiebreak")
  }

  test("minhash lsh candidates match exact jaccard on this corpus") {
    val got = Dedup.minHashLsh(docs, "text", "doc_id",
      shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(got.contains((1L, 4L))) // exact dups always survive LSH
  }

  test("simhash: identical docs share signature, near-dups are close") {
    val sig = Dedup.simHash(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(2L)) <
      java.lang.Long.bitCount(sig(1L) ^ sig(3L)))
    val pairs = Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)))
  }

  test("cosine kernels: orthogonal is 0, identical is 1") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(2f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(df, "embedding", "vec_id", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 3L)))
  }

  test("kernel nulls on mismatched vector lengths, like the fold") {
    import spark.implicits._
    val df = Seq((Array(1f, 0f, 5f), Array(1f, 0f))).toDF("a", "b")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("fast"),
      Similarity.cosineFold(col("a"), col("b")).as("fold")).collect().head
    assert(r.isNullAt(0), "kernel must null on length mismatch")
    assert(r.isNullAt(1), "fold nulls on length mismatch")
  }

  test("codegen cosine kernel is bit-identical to the HOF fold") {
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet").limit(50)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .select(
        Similarity.cosine(col("va"), col("vb")).as("fast"),
        Similarity.cosineFold(col("va"), col("vb")).as("fold"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bits differ: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("brute-force knn returns k most similar, excluding the query") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(0.8f, 0.3f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, "embedding", "vec_id", queryId = 0L, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 3L))
  }

  test("IVF with full probing equals brute force; partial probing returns k") {
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet").limit(200)
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    val full = graft.pipeline.Ivf.searchTopK(emb, "embedding", "vec_id", 0L,
        k = 10, numCells = 4, nprobe = 4, iters = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute, "nprobe = numCells must be exhaustive")
    val partial = graft.pipeline.Ivf.searchTopK(emb, "embedding", "vec_id", 0L,
        k = 10, numCells = 4, nprobe = 1, iters = 2)
      .collect()
    assert(partial.length == 10)
    assert(partial.forall(r => r.getDouble(1) <= 1.0 + 1e-9))
  }

  test("frame sampling cuts byte-exact frames with provenance") {
    import spark.implicits._
    val media = Multimodal.textAsMedia(
      Seq((1L, "a" * 600), (2L, "b" * 100)).toDF("doc_id", "text"), "doc_id", "text")
    val rows = Multimodal.sampleFrames(media, frameBytes = 256, every = 2)
      .orderBy("sample_id", "frame_idx").collect()
    // doc 1: frames 0,1,2 → sampled 0,2 (sizes 256, 88); doc 2: frame 0 (100)
    assert(rows.map(r => (r.getLong(0), r.getInt(2), r.getLong(4))).toSeq ==
      Seq((1L, 0, 256L), (1L, 2, 88L), (2L, 0, 100L)))
    // identical frame content → identical digest (dedup-able)
    assert(rows(0).getString(3) != rows(1).getString(3))
  }

  test("resize stub downsamples payloads to the target pixel budget") {
    import spark.implicits._
    val media = Multimodal.textAsMedia(
      Seq((1L, "x" * 1000), (2L, "y")).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.resizeStub(media, targetW = 4, targetH = 4)
      .collect().map(r => r.sample_id -> r).toMap
    assert(out(1L).payload.length == 16)
    assert(out(1L).width == 4 && out(1L).height == 4)
    assert(out(2L).payload.length == 1, "short payloads keep their bytes")
    // deterministic: same input, same bytes
    val again = Multimodal.resizeStub(media, 4, 4).collect()
      .map(r => r.sample_id -> r.payload.toSeq).toMap
    assert(again(1L) == out(1L).payload.toSeq)
  }

  test("int8 quantization bounds error and keeps search usable") {
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet").limit(300)
    val q = graft.pipeline.Quantize.scalarQuantize(emb, "embedding", -2.0, 2.0)
    val errs = q.select(graft.pipeline.Quantize.maxReconstructionError(
        col("embedding"), col("qvec"), -2.0, 2.0).as("e"))
      .collect().map(_.getDouble(0))
    // in-range values err at most half a bucket: 4/255/2 ≈ 0.00784
    assert(errs.max <= 4.0 / 255.0 / 2.0 + 1e-9, s"max err ${errs.max}")
    // quantized search finds mostly the same neighbors as exact
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = graft.pipeline.Quantize.quantizedTopK(
        emb, "embedding", "vec_id", 0L, 10, -2.0, 2.0)
      .collect().map(_.getLong(0)).toSet
    assert((exact intersect approx).size >= 8,
      s"recall too low: ${(exact intersect approx).size}/10")
  }

  test("trained quantization range beats a fixed clip on a skewed corpus") {
    import spark.implicits._
    // a corpus living in [0.00, 0.10]: a generic [-2, 2] clip wastes
    // ~97.5% of the code space on values that never occur
    val rnd = new scala.util.Random(7)
    val emb = (0L until 50L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 0.1f))).toDF("vec_id", "embedding")
    val (lo, hi) = graft.pipeline.Quantize.trainRange(emb, "embedding")
    assert(lo >= 0.0 && hi <= 0.1 + 1e-6 && hi > lo, s"range ($lo, $hi)")
    def maxErr(l: Double, h: Double): Double =
      graft.pipeline.Quantize.scalarQuantize(emb, "embedding", l, h)
        .select(graft.pipeline.Quantize.maxReconstructionError(
          col("embedding"), col("qvec"), l, h).as("e"))
        .agg(org.apache.spark.sql.functions.max("e")).head().getDouble(0)
    val fixedErr = maxErr(-2.0, 2.0)
    val trainedErr = maxErr(lo, hi)
    info(s"max reconstruction err: fixed=[-2,2] $fixedErr, trained=[$lo,$hi] $trainedErr")
    assert(trainedErr <= fixedErr,
      s"trained range must not reconstruct worse: $trainedErr > $fixedErr")
    // bucket width shrinks ~40x, so the bound does too
    assert(trainedErr <= (hi - lo) / 255.0 / 2.0 + 1e-9, s"err $trainedErr")
    // degenerate corpus: all-equal elements still get a usable range
    val flat = Seq((0L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val (flo, fhi) = graft.pipeline.Quantize.trainRange(flat, "embedding")
    assert(fhi > flo, s"degenerate range must be padded: ($flo, $fhi)")
  }

  test("language id picks en and de by stopword score") {
    val langs = docs.select(col("doc_id"), TextAnalysis.languageId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "en")
    assert(langs(5L) == "de")
  }

  test("token count and quality score bounded") {
    val r = docs.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.qualityScore(col("text")).as("q")).collect()
    assert(r.forall(x => x.getLong(0) > 0))
    assert(r.forall(x => x.getDouble(1) >= 0.0 && x.getDouble(1) <= 1.0))
  }

  test("multimodal extractFeatures is deterministic and sized right") {
    val media = Multimodal.textAsMedia(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.sample_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.sample_id)
    assert(f1.map(_.sha256_hex).toSeq == f2.map(_.sha256_hex).toSeq)
    assert(f1.forall(_.feature_vec.length == 8))
    assert(f1.forall(f => f.n_bytes > 0))
  }

  test("WavCodec roundtrip: known PCM encodes and decodes exactly") {
    import graft.pipeline.Multimodal.WavCodec
    val samples = Array[Short](0, 100, -100, 32767, -32768, 1)
    val bytes = WavCodec.encodePcm16(samples, sampleRate = 8000)
    assert(bytes.length == 44 + samples.length * 2)
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    val info = WavCodec.decode(bytes)
    assert(info.sampleRate == 8000 && info.channels == 1 &&
      info.bitsPerSample == 16)
    assert(info.nSamples == 6)
    assert(info.durationMs == 6000L / 8000L) // floor(0.75ms) = 0
    val expAbs = samples.map(s => math.abs(s.toDouble)).sum / 6
    val expRms = math.sqrt(samples.map(s => s.toDouble * s).sum / 6)
    assert(info.meanAbs == expAbs && info.rms == expRms)
  }

  test("WavCodec walks unknown chunks and honors odd-size padding") {
    import graft.pipeline.Multimodal.WavCodec
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-build: RIFF [LIST(3 bytes, padded)] [fmt stereo] [data 2 frames]
    val pcm = Array[Short](10, -10, 20, -20) // L R L R
    val dataLen = pcm.length * 2
    val listLen = 3 // odd → 1 pad byte follows
    val total = 12 + (8 + listLen + 1) + (8 + 16) + (8 + dataLen)
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(total - 8)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")); bb.putInt(listLen)
    bb.put(Array[Byte](1, 2, 3, 0)) // 3 payload + 1 pad
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(2); bb.putInt(44100)
    bb.putInt(44100 * 4); bb.putShort(4); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    pcm.foreach(bb.putShort)
    val info = WavCodec.decode(bb.array())
    assert(info.channels == 2 && info.sampleRate == 44100)
    assert(info.nSamples == 2, "frames, not channel samples")
    assert(info.meanAbs == 15.0)
    // corrupt magic and non-PCM must be rejected, not misread
    val bad = bb.array().clone(); bad(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](WavCodec.decode(bad))
      .getMessage.contains("magic"))
    val nonPcm = bb.array().clone()
    nonPcm(12 + 8 + listLen + 1 + 8) = 3 // audioFormat = 3 (float)
    assert(intercept[IllegalArgumentException](WavCodec.decode(nonPcm))
      .getMessage.contains("PCM"))
  }

  test("textAsWav payloads decode back to the text-derived signal") {
    val wav = Multimodal.textAsWav(docs, "doc_id", "text")
    val decoded = Multimodal.decodeWav(wav).collect()
    val truth = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decoded.nonEmpty && decoded.length == truth.size)
    decoded.foreach { f =>
      val bytes = truth(f.sample_id).getBytes("UTF-8")
      assert(f.n_samples == bytes.length, s"sample ${f.sample_id}")
      assert(f.n_bytes == 44 + 2L * bytes.length)
      val exp = bytes.map(b => (b & 0xff) * 128.0)
      assert(f.mean_abs == exp.sum / exp.length)
      assert(f.rms == math.sqrt(exp.map(x => x * x).sum / exp.length))
    }
  }

  test("binaryFile media ingest maps files to the media schema") {
    val media = Multimodal.readMediaDir(spark, "/root/reference/bin/data/*.parquet")
    val rows = Multimodal.extractFeatures(media).collect()
    assert(rows.length == 2) // superstore.parquet + public-apis.parquet
    assert(rows.forall(_.media_type == "parquet"))
    assert(rows.forall(_.n_bytes > 0))
    assert(rows.map(_.sha256_hex).distinct.length == 2)
  }

  test("merge column aliases collisions and drops target keys") {
    import spark.implicits._
    val base = Seq((1, "x"), (2, "y")).toDF("id", "name")
    val tgt = Seq((1, "t1"), (2, "t2")).toDF("tid", "name")
    val out = MergeProcessor.mergeColumns(base,
      Seq(MergeProcessor.ColumnTarget("tgt", tgt, Seq("id"), Seq("tid"))))
    assert(out.columns.toSeq == Seq("id", "name", "tgt_name"))
    assert(out.count() == 2)
  }

  test("merge row: union by position, optional distinct") {
    import spark.implicits._
    val a = Seq(1, 2).toDF("v")
    val b = Seq(2, 3).toDF("v")
    assert(MergeProcessor.mergeRows(a, Seq(b), distinct = false).count() == 4)
    assert(MergeProcessor.mergeRows(a, Seq(b), distinct = true).count() == 3)
  }

  test("incremental near-dup equals the full run restricted to cross pairs") {
    // the batch-vs-corpus operator must agree exactly with the global
    // pair run filtered to (new, corpus) pairs — same shingles, same
    // jaccard, only the execution shape differs
    val docs = spark.read.parquet(s"${SparkFixture.sfDir}/documents.parquet")
    val newB = docs.where(col("doc_id") % 10 === 0)
    val corp = docs.where(col("doc_id") % 10 =!= 0)
    val inc = graft.pipeline.Dedup.incrementalNearDupPairs(
        newB, corp, "text", "doc_id", n = 3, threshold = 0.2,
        maxCorpusPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = graft.pipeline.Dedup.ngramJaccardPairs(
        docs, "text", "doc_id", n = 3, threshold = 0.2, maxPostings = None)
      .collect().flatMap { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        // full run emits id_a < id_b; reorient to (new, corpus)
        if (a % 10 == 0 && b % 10 != 0) Some((a, b, j))
        else if (b % 10 == 0 && a % 10 != 0) Some((b, a, j))
        else None
      }.toSet
    assert(inc == full, s"incremental=${inc.size} full-cross=${full.size}")
    assert(inc.nonEmpty, "fixture should contain cross-split near-dups")
  }

  test("incremental near-dup spam guard drops hot corpus shingles") {
    import spark.implicits._
    // 30 corpus docs all sharing one spam shingle with the batch doc;
    // plus one legitimate pair under the cap
    val corpus = ((1L to 30L).map(i => (i, "spam spam spam spam spam")) ++
      Seq((31L, "alpha beta gamma delta epsilon"))).toDF("doc_id", "text")
    val batch = Seq((100L, "spam spam spam spam spam"),
      (101L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val exact = graft.pipeline.Dedup.incrementalNearDupPairs(
      batch, corpus, "text", "doc_id", n = 3, threshold = 0.5,
      maxCorpusPostings = None).count()
    assert(exact == 31L, "uncapped: 30 spam pairs + 1 legit pair")
    val capped = graft.pipeline.Dedup.incrementalNearDupPairs(
        batch, corpus, "text", "doc_id", n = 3, threshold = 0.5,
        maxCorpusPostings = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((101L, 31L)),
      s"only the under-cap pair must survive: $capped")
  }

  test("incremental near-dup broadcasts the batch side (no sort-merge join)") {
    val docs = spark.read.parquet(s"${SparkFixture.sfDir}/documents.parquet")
    val df = graft.pipeline.Dedup.incrementalNearDupPairs(
      docs.where(col("doc_id") % 10 === 0),
      docs.where(col("doc_id") % 10 =!= 0),
      "text", "doc_id")
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"new-batch shingles must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus side must never sort-merge on shingles:\n$plan")
  }
}
