package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Clustering, Dedup, Multimodal}

/** Round-15 operators: audio fingerprint dup pairs (m21), the
  * incremental composed dedup run (d35), IVF append cell drift (s34).
  */
class Round15Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---------------- m21: audio fingerprint pairs ----------------

  test("audioFingerprintDupPairs == brute-force all-pairs within tau (lossless blocking)") {
    import spark.implicits._
    val rnd = new scala.util.Random(15)
    // near-dup pairs: same text vs same text with a short tail tweak
    val base = (1 to 120).map(_ => (' ' + rnd.nextInt(64)).toChar).mkString
    val docs = (
      (1L to 20L).map { i =>
        (i, (1 to (40 + rnd.nextInt(120)))
          .map(_ => (' ' + rnd.nextInt(64)).toChar).mkString)
      } :+ (51L, base) :+ (52L, base) // exact dup: diff 0
        :+ (53L, base.dropRight(1) + "!") // near dup
    ).toDF("doc_id", "text").repartition(3)
    val media = Multimodal.textAsWav(docs, "doc_id", "text")
    val tau = 0.125

    val e = Multimodal.octaveBandEnergies(media)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
      }
    val ids = e.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      diffs = (1L to 4L).map(k => math.abs(e(a)(k) - e(b)(k)))
      if diffs.forall(_ <= tau)
    } yield (a, b) -> diffs.max).toMap
    assert(expected.nonEmpty, "fixture must contain qualifying pairs")
    assert(expected.contains((51L, 52L)) && expected((51L, 52L)) == 0.0)

    val got = Multimodal.audioFingerprintDupPairs(media, tau = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet,
      s"missed: ${expected.keySet -- got.keySet}; extra: ${got.keySet -- expected.keySet}")
    got.foreach { case (k, v) => assert(v == expected(k), s"diff at $k") }
  }

  test("audio blocking catches pairs that straddle one grid's cell boundary") {
    // synthetic energy vectors placed around a 0.25-grid boundary:
    // a=0.24, b=0.26 differ by 0.02 <= tau but land in different
    // offset-0 cells — the offset-tau grid must still pair them.
    // Drive through the REAL operator by checking the blocking math
    // directly on the key expressions.
    val tau = 0.125
    def cells(e: Double): Set[(Int, Long)] =
      (0 to 1).map(o => o -> math.floor((e + o * tau) / (2 * tau)).toLong).toSet
    val pairsWithin = Seq((0.24, 0.26), (0.0, 0.125), (0.125, 0.25),
      (0.49, 0.51), (3.99, 4.115))
    pairsWithin.foreach { case (a, b) =>
      assert(math.abs(a - b) <= tau)
      val shared = (0 to 1).exists(o =>
        math.floor((a + o * tau) / (2 * tau)) == math.floor((b + o * tau) / (2 * tau)))
      assert(shared, s"($a, $b) must share a cell in one grid: " +
        s"${cells(a)} vs ${cells(b)}")
    }
  }

  // ---------------- d35: incremental composed run ----------------

  test("incrementalDedupRun == composition of its published stages") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (101L, base),
      (102L, (1 to 30).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text").repartition(2)
    val batch = Seq(
      (1L, base), // corpus dup -> dropped_corpus
      (2L, (1 to 30).map(i => s"n$i").mkString(" ")), // batch rep
      (3L, (1 to 30).map(i => s"n$i").mkString(" ")), // dup of 2 -> dropped_batch
      (4L, (1 to 30).map(i => s"x$i").mkString(" ")), // clean singleton
      (5L, base + " tail") // near-dups corpus doc 101 too
    ).toDF("doc_id", "text").repartition(2)

    val got = Dedup.incrementalDedupRun(batch, corpus, "text", "doc_id",
      n = 3, threshold = 0.3).collect()
    val disp = got.filter(_.isNullAt(2))
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    val counts = got.filter(r => !r.isNullAt(2))
      .map(r => r.getString(0) -> r.getLong(2)).toMap

    // independent composition
    val corpusDups = Dedup.incrementalNearDupPairs(batch, corpus, "text",
      "doc_id", n = 3, threshold = 0.3)
    val cdup = corpusDups.select("new_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val clean = batch.filter(!col("doc_id").isin(cdup.toSeq: _*))
    val bp = Dedup.ngramJaccardPairs(clean, "text", "doc_id", 3, 0.3)
    val comp = Dedup.connectedComponents(bp.select("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bdrop = comp.filter { case (id, c) => id != c }.map(_._1).toSet

    assert(disp.size == 5)
    (1L to 5L).foreach { id =>
      val want =
        if (cdup(id)) "dropped_corpus"
        else if (bdrop(id)) "dropped_batch"
        else "admitted"
      assert(disp(id) == want, s"doc $id: ${disp(id)} != $want")
    }
    assert(cdup.nonEmpty && bdrop.nonEmpty, "fixture must exercise both drops")
    assert(counts("corpus_pairs") == corpusDups.count())
    assert(counts("batch_pairs") == bp.count())
  }

  // ---------------- m22: audio dup clusters ----------------

  test("audioDupClusters == closure of the fingerprint pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(22)
    val base = (1 to 100).map(_ => (' ' + rnd.nextInt(64)).toChar).mkString
    val docs = (
      (1L to 10L).map { i =>
        (i, (1 to (40 + rnd.nextInt(100)))
          .map(_ => (' ' + rnd.nextInt(64)).toChar).mkString)
      } :+ (61L, base) :+ (62L, base) :+ (63L, base) // 3-clique of exact dups
    ).toDF("doc_id", "text").repartition(2)
    val media = Multimodal.textAsWav(docs, "doc_id", "text")
    val pairs = Multimodal.audioFingerprintDupPairs(media, tau = 0.125)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // in-memory union-find over the pair set
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(v => v -> find(v)).toMap
    val sizes = expected.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    val got = Multimodal.audioDupClusters(media, tau = 0.125).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0)), s"rep of ${r.getLong(0)}")
      assert(r.getLong(2) == sizes(r.getLong(1)), s"size at ${r.getLong(0)}")
    }
    assert(got.exists(_.getLong(2) >= 3L), "fixture must form a 3-cluster")
  }

  // ---------------- t55: post-dedup token budget ----------------

  test("dedupTokenBudgetReport == dedupedCorpus + tokenCount composition") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base, "a"), (2L, base, "a"), // dup pair in a
      (3L, (1 to 10).map(i => s"u$i").mkString(" "), "a"),
      (4L, base + " tail", "b"), // near-dups 1 cross-source
      (5L, (1 to 20).map(i => s"z$i").mkString(" "), "b"),
      (6L, "", "c") // empty text: 1 token by the count identity
    ).toDF("doc_id", "text", "source").repartition(2)

    val kept = Dedup.dedupedCorpus(docs, "text", "doc_id",
      n = 3, threshold = 0.3, maxPostings = None)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = Seq((1L, base, "a"), (2L, base, "a"),
      (3L, (1 to 10).map(i => s"u$i").mkString(" "), "a"),
      (4L, base + " tail", "b"), (5L, (1 to 20).map(i => s"z$i").mkString(" "), "b"),
      (6L, "", "c"))
    def ntok(t: String): Long = t.count(_ == ' ').toLong + 1L
    val expected = rows.groupBy(_._3).map { case (src, rs) =>
      val nt = rs.map(r => ntok(r._2)).sum
      val ntKept = rs.filter(r => kept(r._1)).map(r => ntok(r._2)).sum
      src -> (rs.size.toLong, rs.count(r => kept(r._1)).toLong, nt, ntKept)
    }
    assert(kept.size < 6, "fixture must drop docs")

    val got = Dedup.dedupTokenBudgetReport(docs, "text", "doc_id", "source",
      n = 3, threshold = 0.3, maxPostings = None)
      .orderBy("source").collect()
    assert(got.length == 3)
    got.foreach { r =>
      val (nd, ndk, nt, ntk) = expected(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == ndk &&
        r.getLong(3) == nt && r.getLong(4) == ntk, s"row $r")
      assert(math.abs(r.getDouble(5) -
        BigDecimal(ntk.toDouble / nt).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  // ---------------- m23: image dup clusters ----------------

  test("phashDupClusters == closure of the phash pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (
      (1L to 8L).map { i =>
        (i, (1 to (30 + rnd.nextInt(60)))
          .map(_ => (' ' + rnd.nextInt(64)).toChar).mkString)
      } :+ (71L, "A" * 50) :+ (72L, "A" * 50) :+ (73L, "A" * 50)
    ).toDF("doc_id", "text").repartition(2)
    val hashes = Multimodal.perceptualHash(
      Multimodal.textAsBmp(docs, "doc_id", "text", width = 10))
    val pairs = Multimodal.phashDupPairs(hashes.toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(v => v -> find(v)).toMap
    val sizes = expected.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    val got = Multimodal.phashDupClusters(hashes.toDF(), maxHamming = 3)
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0)))
      assert(r.getLong(2) == sizes(r.getLong(1)))
    }
    assert(got.exists(r => r.getLong(2) >= 3L && Set(71L, 72L, 73L)(r.getLong(0))),
      "the identical-image triple must cluster")
  }

  // ---------------- t56: post-dedup temperature mix ----------------

  test("t56 composition: weights computed on the deduped corpus, not the raw one") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    // source 'a' is duplicate-heavy: raw counts overweight it
    val docs = Seq(
      (1L, base, "a"), (2L, base, "a"), (3L, base, "a"),
      (4L, (1 to 30).map(i => s"x$i").mkString(" "), "a"),
      (5L, (1 to 30).map(i => s"y$i").mkString(" "), "b"),
      (6L, (1 to 30).map(i => s"z$i").mkString(" "), "b")
    ).toDF("doc_id", "text", "source").repartition(2)
    val deduped = pipeline.Dedup.dedupedCorpus(docs, "text", "doc_id",
      n = 3, threshold = 0.3, maxPostings = None)
    val got = pipeline.Sampling.temperatureWeights(deduped, "source", 0.5)
      .orderBy("source").collect()
    // after dedup both sources hold 2 docs — equal weights; the raw
    // corpus would give 'a' 2/3 of the natural mass
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 2L, "b" -> 2L))
    got.foreach { r =>
      assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5, s"row $r")
    }
  }

  // ---------------- s34: IVF append cell drift ----------------

  test("cellDriftReport == in-memory assignment accounting") {
    import spark.implicits._
    val rnd = new scala.util.Random(34)
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    val oldEmb = (1L to 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
      .repartition(3)
    val newEmb = (101L to 120L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
      .repartition(2)
    val k = 4

    val got = Clustering.cellDriftReport(oldEmb, newEmb, "embedding", "vec_id", k)
      .orderBy("cell").collect()
    assert(got.length == k)

    val oldCells = Clustering.assignToSeeds(oldEmb, "embedding", "vec_id", k)
      .select("cell").collect().map(_.getLong(0))
    // new batch assigned to the OLD corpus's seeds
    val seeds = oldEmb.orderBy("vec_id").limit(k)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val newCells = Clustering.assignToCentroidArrays(newEmb, "embedding",
      "vec_id", seeds.toSeq).select("cell").collect().map(_.getLong(0))
    val nOld = oldCells.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nNew = newCells.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = (nOld.values.sum + nNew.values.sum).toDouble
    val mx = seeds.map(s => nOld.getOrElse(s._1, 0L) + nNew.getOrElse(s._1, 0L)).max

    got.foreach { r =>
      val cell = r.getLong(0)
      val (o, nw) = (nOld.getOrElse(cell, 0L), nNew.getOrElse(cell, 0L))
      assert(r.getLong(1) == o && r.getLong(2) == nw, s"counts at cell $cell")
      if (o == 0L) assert(r.isNullAt(3))
      else assert(r.getDouble(3) == nw.toDouble / o.toDouble)
      assert(r.getDouble(4) == o.toDouble / total)
      assert(r.getDouble(5) == nw.toDouble / total)
      assert(r.getDouble(6) == mx.toDouble * k / total)
    }
    assert(got.map(_.getDouble(4)).sum + got.map(_.getDouble(5)).sum > 0.99)
  }
}
