package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Round-14 hardening: the CDC chunk-digest kernel's bit-identity
  * with its composable twin, and the capped-postings default
  * invariant over every pair-emitting Dedup API.
  */
class Round14Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---------------- d26 kernel ≡ composable chain ----------------

  test("cdcChunkDedup kernel == composable HOF chain, bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    val base = (1 to 40).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString(" ", " ", "")
    val docs = (
      (1L to 30L).map { i =>
        // varied lengths/content, some exact dups, one insertion-shift
        val t = i % 5 match {
          case 0 => base
          case 1 => base + s" tail$i extra content ${i * 7}"
          case 2 => "X" + base // one-char insertion: CDC must re-sync
          case 3 => (1 to (16 + rnd.nextInt(200)))
            .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
          case _ => s"doc $i " * (3 + rnd.nextInt(20))
        }
        (i, t)
      } :+ (98L, "exactly sixteen!") // boundary: length == window
        :+ (99L, "ünïcode ‡est — multibyte çhars beyond ascii padding")
    ).toDF("doc_id", "text")
      // through a repartition so the kernel evaluates EXECUTOR-side
      // (a LocalRelation would evaluate on the driver and mask
      // serialization bugs — verify-skill gotcha)
      .repartition(4)

    val kernel = Dedup.cdcChunkDedup(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val chain = Dedup.cdcChunkDedupComposable(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(kernel.length == chain.length && kernel.nonEmpty)
    kernel.zip(chain).foreach { case (k, c) =>
      assert(k == c, s"kernel row $k != chain row $c")
    }
    // the dup rows actually exercise the dup accounting
    assert(kernel.exists(_.getLong(2) > 0L), "fixture must contain dup chunks")
  }

  test("CdcChunkDigests: sub-window and empty inputs stay total") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "short"), (3L, "exactly sixteen!"))
      .toDF("doc_id", "text").repartition(2)
      .select(col("doc_id"),
        graft.functions.CdcExpressions.cdcChunkDigests(col("text"), 16, 16)
          .as("chunks"))
      .orderBy("doc_id").collect()
    assert(df(0).getSeq[Any](1).isEmpty) // empty text: no chunks
    val short = df(1).getSeq[org.apache.spark.sql.Row](1)
    assert(short.length == 1 && short.head.getLong(1) == 5L) // one whole-text chunk
    val exact = df(2).getSeq[org.apache.spark.sql.Row](1)
    assert(exact.map(_.getLong(1)).sum == 16L)
  }

  // ---------------- mlmMask string-id agreement (ADVICE r10) ----------------

  test("mlmMask kernel == composable for non-numeric and zero-padded ids") {
    import spark.implicits._
    // '007' used to collapse to 7 via a long cast; 'doc-x' to null
    val docs = Seq(
      ("007", "the quick brown fox jumps over the lazy dog"),
      ("7", "the quick brown fox jumps over the lazy dog"),
      ("doc-x", "pack my box with five dozen liquor jugs"),
      ("", "single"),
      ("42", "numeric id stays numeric")
    ).toDF("doc_id", "text").repartition(2)
    val k = pipeline.TextAnalysis.mlmMask(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val c = pipeline.TextAnalysis.mlmMaskComposable(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(k.length == c.length && k.nonEmpty)
    k.zip(c).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // '007' and '7' see the same text but must mask DIFFERENTLY (the
    // id string is the decision salt) — guards against a re-collapse
    val by = k.map(r => r.getString(0) -> r.getString(4)).toMap
    assert(by("007") != by("7") || k.find(_.getString(0) == "007").get.getLong(2) == 0L,
      "zero-padded id must salt the decisions differently")
  }

  // ---------------- d34: composed dedup pipeline run ----------------

  test("dedupPipelineRun == composition of its published stages") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val alt = (1 to 30).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), (3L, base + " tail"), // cluster {1,2,3}
      (4L, alt), (5L, alt), // cluster {4,5}
      (6L, (1 to 30).map(i => s"z$i").mkString(" ")), // singleton
      (7L, "short") // shingle-free: must be kept
    ).toDF("doc_id", "text").repartition(3)

    val pairs = pipeline.Dedup.lshVerifiedPairsMd5(docs, "text", "doc_id",
      shingleN = 3, numHashes = 8, bands = 4, threshold = 0.3)
    val nCand = pipeline.Dedup.minHashLshMd5(docs, "text", "doc_id",
      shingleN = 3, numHashes = 8, bands = 4).count()
    val nVer = pairs.count()
    val comp = pipeline.Dedup.connectedComponents(
      pairs.select("id_a", "id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val droppedIds = comp.filter { case (id, c) => id != c }.map(_._1).toSet
    val nClusters = comp.map(_._2).distinct.length.toLong

    val got = pipeline.Dedup.dedupPipelineRun(docs, "text", "doc_id",
      shingleN = 3, numHashes = 8, bands = 4, tau = 0.3).collect()
    val kept = got.filter(_.getString(0) == "kept").map(_.getLong(1)).toSet
    val counts = got.filter(_.getString(0) != "kept")
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(kept == (1L to 7L).toSet -- droppedIds)
    assert(kept.contains(7L), "shingle-free docs must survive")
    assert(counts == Map("candidates" -> nCand, "verified" -> nVer,
      "clusters" -> nClusters, "dropped" -> droppedIds.size.toLong))
    assert(droppedIds.nonEmpty && nClusters >= 2L,
      "fixture must exercise real clusters")
    // the audit identity every production log relies on
    assert(kept.size + counts("dropped") == 7L)
  }

  // ---------------- t54: BPE round-trip audit ----------------

  test("bpeRoundTripAudit == independent in-memory BPE over a fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat", "a"),
      (2L, "the thematic cat", "a"),
      (3L, "THE CAT, the cat!", "b"), // case/punct: normalizes into [a-z]+ runs
      (4L, "12345 --- !!!", "b"), // wordless: zero tokens, still round-trips
      (5L, "concatenate that theory", "c")
    ).toDF("doc_id", "text", "source").repartition(3)
    val merges = pipeline.TextAnalysis.bpeMerges(docs, "text", k = 4)
      .orderBy("round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.size == 4)

    // independent reference: leftmost non-overlapping application in
    // induction order over the '|'-joined char stream
    def encode(text: String): Seq[String] = {
      val words = "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
      var syms: Seq[String] = words.mkString("|").map(_.toString)
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    val rows = Seq(
      (1L, "the cat sat on the mat", "a"), (2L, "the thematic cat", "a"),
      (3L, "THE CAT, the cat!", "b"), (4L, "12345 --- !!!", "b"),
      (5L, "concatenate that theory", "c"))
    val expected = rows.groupBy(_._3).map { case (src, rs) =>
      val encs = rs.map(r => (r._2, encode(r._2)))
      val toks = encs.map(_._2.filterNot(_ == "|"))
      val nTok = toks.map(_.size.toLong).sum
      val nCh = toks.map(_.map(_.length).sum.toLong).sum
      src -> (rs.size.toLong,
        encs.count { case (t, s) =>
          s.mkString == "[a-z]+".r.findAllIn(t.toLowerCase).mkString("|") }.toLong,
        nTok, nCh,
        if (nTok == 0L) None
        else Some(BigDecimal(nCh.toDouble / nTok).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
    }

    val got = pipeline.TextAnalysis.bpeRoundTripAudit(docs, "text", "source",
      merges).orderBy("source").collect()
    assert(got.length == 3)
    got.foreach { r =>
      val (nDocs, nOk, nTok, nCh, cpt) = expected(r.getString(0))
      assert(r.getLong(1) == nDocs, s"n_docs for ${r.getString(0)}")
      assert(r.getLong(2) == nOk && nOk == nDocs,
        s"round-trip must hold for every doc in ${r.getString(0)}")
      assert(r.getLong(3) == 0L, "vocab violations must be zero")
      assert(r.getLong(4) == nTok, s"n_tokens for ${r.getString(0)}")
      assert(r.getLong(5) == nCh, s"n_chars for ${r.getString(0)}")
      cpt match {
        case Some(v) => assert(math.abs(r.getDouble(6) - v) < 1e-9)
        case None => assert(r.isNullAt(6))
      }
    }
  }

  // ---------------- capped-postings default invariant ----------------

  test("every pair-emitting Dedup API defaults maxPostings = Some(10000)") {
    // The round-10 smoke proved an uncapped posting list inside a
    // cached pair plan is an 8 GiB-broadcast hard-fail at scale (AQE
    // does not re-plan cached subtrees). This pins the capped default
    // on EVERY public API with a defaulted maxPostings parameter, so
    // the containmentCurve inconsistency cannot recur. (The one
    // documented uncapped path, lshRecallReport's exact leg, passes
    // None explicitly inside the method — it has no default to check.)
    import scala.reflect.runtime.{universe => ru}
    val mirror = ru.runtimeMirror(getClass.getClassLoader)
    val tpe = mirror.moduleSymbol(Dedup.getClass).moduleClass.asClass.toType
    val checked = for {
      m <- tpe.decls.toSeq.collect {
        case s: ru.MethodSymbol if s.isPublic && !s.isSynthetic => s
      }
      (p, i) <- m.paramLists.flatten.zipWithIndex
      // maxPostings and its renamed siblings (maxCorpusPostings)
      if p.name.toString.matches("max\\w*Postings") &&
        p.asTerm.isParamWithDefault
    } yield {
      val getter = Dedup.getClass.getMethods
        .find(_.getName == m.name.toString + "$default$" + (i + 1))
      assert(getter.isDefined, s"${m.name}: default getter missing")
      val v = getter.get.invoke(Dedup)
      assert(v == Some(10000),
        s"${m.name} defaults maxPostings=$v — every pair-emitting API " +
          "must default capped (Some(10000))")
      m.name.toString
    }
    // the invariant is vacuous if reflection finds nothing — pin the
    // known population so a rename doesn't silently skip the check
    val expected = Set("softDedupWeights", "dedupedCorpus",
      "ngramJaccardPairs", "incrementalNearDupPairs", "containmentPairs",
      "containmentCurve", "jaccardThresholdCurve", "dedupImpactReport",
      "hybridNearDups", "prefixFilterContainment")
    assert(expected.subsetOf(checked.toSet),
      s"missing from reflection sweep: ${expected -- checked.toSet}")
  }
}
