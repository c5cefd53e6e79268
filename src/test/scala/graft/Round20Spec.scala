package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{GraphAnn, GraphIndex}

/** Round-20 operators: the persisted graph index (s49 lifecycle) and
  * hierarchical coarse-entry beam search (s50).
  */
class Round20Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def embDf(n: Int = 60, dim: Int = 8, seed: Int = 7) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-gidx-$tag")
      .toFile.getAbsolutePath

  // ---------------- s49 persisted graph index ----------------

  test("s49: the loaded-index beam trajectory is bit-identical to the in-query build") {
    val emb = embDf(n = 80, seed = 31)
    val fresh = GraphAnn.graphBeamSearch(emb, "embedding", "vec_id",
      queryIds = Seq(3L, 11L, 42L), k = 4, beamWidth = 8, graphK = 5,
      buildRounds = 2, hops = 3)
      .orderBy("query_id", "hop").collect().toSeq
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("s49")}/idx", graphK = 5, buildRounds = 2)
    val loaded = GraphAnn.graphBeamSearchLoaded(emb, "embedding",
      "vec_id", h, queryIds = Seq(3L, 11L, 42L), k = 4, beamWidth = 8,
      hops = 3)
      .orderBy("query_id", "hop").collect().toSeq
    // every column including the round-6 recall doubles: the edge SET
    // is deterministic, so serve-from-disk ≡ serve-from-build
    assert(fresh == loaded,
      s"trajectories diverged:\nfresh= $fresh\nloaded=$loaded")
  }

  test("s49: matching params reuse the persisted index; a param change or half-written dir rebuilds") {
    val emb = embDf(n = 40, seed = 5)
    val dir = s"${tmpDir("reuse")}/idx"
    val h1 = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id", dir,
      graphK = 4, buildRounds = 1)
    def edgeFiles: Set[(String, Long)] =
      new java.io.File(s"$dir/edges").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    val before = edgeFiles
    val h2 = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id", dir,
      graphK = 4, buildRounds = 1)
    assert(h2 == h1)
    assert(edgeFiles == before, "matching params must REUSE, not rebuild")
    // a parameter change rebuilds in place (persisted meta comparison)
    val h3 = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id", dir,
      graphK = 5, buildRounds = 1)
    assert(h3.graphK == 5 && GraphIndex.open(spark, dir).graphK == 5)
    // half-written index (edges present, meta gone — a killed build):
    // must rebuild, never open
    graft.pipeline.AnnIndex.deleteDirTree(s"$dir/meta")
    val h4 = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id", dir,
      graphK = 5, buildRounds = 1)
    assert(h4.graphK == 5 && GraphIndex.open(spark, dir).n == 40L)
  }

  test("s49: serving a different corpus against a handle fails loudly (staleness guard)") {
    val emb = embDf(n = 40, seed = 9)
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("stale")}/idx", graphK = 4, buildRounds = 1)
    try {
      val e = intercept[IllegalArgumentException] {
        GraphAnn.graphBeamSearchLoaded(embDf(n = 50, seed = 9),
          "embedding", "vec_id", h, queryIds = Seq(1L), k = 2,
          beamWidth = 4, hops = 1)
      }
      assert(e.getMessage.contains("different corpus"), e.getMessage)
    } finally spark.catalog.clearCache()
  }

  test("s48 loaded: append against the persisted graph matches the in-query build") {
    val emb = embDf(n = 70, seed = 13)
    val corpus = emb.where(col("vec_id") < 56)
    val batch = emb.where(col("vec_id") >= 56)
    val fresh = GraphAnn.graphAppendAudit(corpus, batch, "embedding",
      "vec_id", graphK = 4, buildRounds = 1, beamWidth = 8, hops = 2)
      .orderBy("metric").collect().toSeq
    val h = GraphIndex.buildIfAbsent(corpus, "embedding", "vec_id",
      s"${tmpDir("append")}/idx", graphK = 4, buildRounds = 1)
    val loaded = GraphAnn.graphAppendAuditLoaded(corpus, batch,
      "embedding", "vec_id", h, beamWidth = 8, hops = 2)
      .orderBy("metric").collect().toSeq
    assert(fresh == loaded,
      s"append manifests diverged:\nfresh= $fresh\nloaded=$loaded")
  }

  test("loaded serve releases every cache it pins (no standing-index session leak)") {
    val emb = embDf(n = 50, seed = 3)
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("life")}/idx", graphK = 4, buildRounds = 1)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val out = GraphAnn.graphBeamSearchLoaded(emb, "embedding", "vec_id",
      h, queryIds = Seq(2L, 17L), k = 3, beamWidth = 6, hops = 2)
    assert(out.collect().length == 4)
    // beamServe drops its caches eagerly (the loop is eager), so no
    // polling needed beyond a grace pass for the listener-free path
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    }
    assert(leaked.isEmpty, s"loaded serve leaked cache ids $leaked")
  }

  // ---------------- s50 hierarchical (coarse) entry ----------------

  test("s50: hop-0 audit rows count the coarse scoring; recall is monotone from hop 0") {
    val emb = embDf(n = 80, seed = 57)
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("coarse")}/idx", graphK = 5, buildRounds = 2)
    val out = GraphAnn.graphBeamSearchLoaded(emb, "embedding", "vec_id",
      h, queryIds = Seq(7L, 33L), k = 4, beamWidth = 8, hops = 3,
      coarseEntryK = Some(8))
      .orderBy("query_id", "hop").collect()
    assert(out.length == 2 * 4, s"expected hops 0..3 per query: ${out.length}")
    // hop-0 n_scored = |coarse \ {query}|: query 7 is INSIDE the
    // coarse set (ids 0..7), query 33 is not
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ(7L).head.getAs[Long]("n_scored") == 7L)
    assert(byQ(33L).head.getAs[Long]("n_scored") == 8L)
    byQ.values.foreach { rows =>
      rows.sortBy(_.getAs[Long]("hop")).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Double]("recall") >= a.getAs[Double]("recall"),
            "beam over a candidate superset cannot lose recall")
        case _ =>
      }
    }
  }

  test("s50: the entry is the coarse argmax (a query cloned from a coarse vector enters there)") {
    import spark.implicits._
    // query 20 is an exact clone of coarse vector 5 ⇒ entry must be 5
    // and the hop-0 beam top-k already contains the exact top-1
    val rnd = new scala.util.Random(21)
    val base = (0 until 20).map { i =>
      (i.toLong, Array.fill(6)(rnd.nextGaussian().toFloat))
    }
    val emb = (base :+ (20L, base(5)._2.clone()))
      .toDF("vec_id", "embedding")
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("argmax")}/idx", graphK = 3, buildRounds = 1)
    val out = GraphAnn.graphBeamSearchLoaded(emb, "embedding", "vec_id",
      h, queryIds = Seq(20L), k = 2, beamWidth = 4, hops = 1,
      coarseEntryK = Some(8))
      .orderBy("hop").collect()
    val hop0 = out.head
    assert(hop0.getAs[Long]("hop") == 0L)
    // the entry (vector 5, cosine 1.0 with the query) IS the exact
    // top-1, so the single-node hop-0 beam scores one hit
    assert(hop0.getAs[Long]("n_hits") == 1L, hop0.toString)
  }

  // scoped to THIS fixture (dim 8, 2-hop budget): entry proximity
  // pays at short budgets in low dimension. It is NOT a universal
  // dominance law — greedy walks carry none, and on the
  // near-orthogonal sf corpora the strategies reach parity by hop 5
  // (the __gentry_ab A/B, PLANS.md round-20 notes).
  test("s50: coarse entry reaches at-least the min-id entry's recall at an equal hop budget") {
    val emb = embDf(n = 120, dim = 8, seed = 77)
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("budget")}/idx", graphK = 5, buildRounds = 2)
    val qids = Seq(10L, 55L, 99L)
    def finalRecallSum(coarse: Option[Int]): Double =
      GraphAnn.graphBeamSearchLoaded(emb, "embedding", "vec_id", h,
        queryIds = qids, k = 4, beamWidth = 8, hops = 2,
        coarseEntryK = coarse)
        .where(col("hop") === 2).collect()
        .map(_.getAs[Double]("recall")).sum
    val minId = finalRecallSum(None)
    val hier = finalRecallSum(Some(12))
    assert(hier >= minId,
      s"coarse entry lost recall at equal hops: $hier < $minId")
  }

  // ---------------- s51 delete+repair / s52 tombstone serving ----------------

  test("s52: overfetch never loses to plain; deleted ids cost plain its fill") {
    import spark.implicits._
    val emb = embDf(n = 90, seed = 91)
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("ts")}/idx", graphK = 6, buildRounds = 2)
    val del = (0 until 90 by 7).map(_.toLong).toDF("vec_id") // ~13 deleted
    val out = GraphAnn.graphSearchWithTombstones(emb, "embedding",
      "vec_id", h, del, "vec_id", queryIds = Seq(3L, 40L, 75L), k = 4,
      beamWidth = 10, hops = 3).collect()
    assert(out.length == 6)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      val m = rows.map(r => r.getAs[String]("strategy") -> r).toMap
      val (pl, ov) = (m("plain"), m("overfetch"))
      assert(ov.getAs[Double]("recall") >= pl.getAs[Double]("recall"),
        s"overfetch lost to plain: $ov vs $pl")
      assert(pl.getAs[Long]("n_returned") <= 4L)
      assert(ov.getAs[Long]("n_returned") <= 4L)
      assert(ov.getAs[Long]("n_returned") >= pl.getAs[Long]("n_returned"))
      assert(pl.getAs[Long]("n_possible") == 4L) // live corpus >> k
    }
  }

  test("s52: a tombstoned query id is rejected loudly") {
    import spark.implicits._
    val emb = embDf(n = 40, seed = 19)
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("tsq")}/idx", graphK = 4, buildRounds = 1)
    try {
      val e = intercept[IllegalArgumentException] {
        GraphAnn.graphSearchWithTombstones(emb, "embedding", "vec_id", h,
          Seq(5L).toDF("vec_id"), "vec_id", queryIds = Seq(5L), k = 2,
          beamWidth = 4, hops = 1)
      }
      assert(e.getMessage.contains("tombstoned"), e.getMessage)
    } finally spark.catalog.clearCache()
  }

  test("s51: on a complete graph the repair recovers exact live lists (recall 1.0)") {
    import spark.implicits._
    val n = 14
    val emb = embDf(n = n, seed = 23)
    // graphK >= n-1: the ring init IS the complete graph, so every
    // affected node's (surviving ∪ promoted) candidates cover all
    // live nodes and the repaired top-k equals the exact live top-k
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("rep")}/idx", graphK = n - 1, buildRounds = 0)
    val del = Seq(4L, 9L).toDF("vec_id")
    val out = GraphAnn.graphDeleteRepairLoaded(emb, "embedding",
      "vec_id", h, del, "vec_id").collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
    assert(out("deleted_nodes").getAs[Long]("n") == 2L)
    // complete directed graph: each deleted node has n-1 out-edges
    // and n-1 in-edges, minus the 2 edges between the two deleted
    // nodes counted once each: 2*2*(n-1) - 2
    assert(out("edges_dropped").getAs[Long]("n") == (4L * (n - 1) - 2L))
    assert(out("affected_nodes").getAs[Long]("n") == (n - 2L))
    assert(out("repair_recall").getAs[Double]("x") == 1.0,
      out("repair_recall").toString)
    // every affected node keeps a full list (graphK > live degree)
    assert(out("repaired_edges").getAs[Long]("n") == (n - 2L) * (n - 3L))
  }

  test("s51: an empty tombstone set is a no-op manifest") {
    import spark.implicits._
    val emb = embDf(n = 30, seed = 29)
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("rep0")}/idx", graphK = 4, buildRounds = 1)
    val out = GraphAnn.graphDeleteRepairLoaded(emb, "embedding",
      "vec_id", h, Seq.empty[Long].toDF("vec_id"), "vec_id").collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
    Seq("deleted_nodes", "edges_dropped", "affected_nodes",
      "promoted_candidates", "repaired_edges").foreach { m =>
      assert(out(m).getAs[Long]("n") == 0L, s"$m: ${out(m)}")
    }
    assert(out("repair_recall").getAs[Double]("x") == 0.0)
  }

  test("s51/s52 release every cache they pin (eager maintenance ops)") {
    import spark.implicits._
    val emb = embDf(n = 40, seed = 37)
    val h = GraphIndex.buildIfAbsent(emb, "embedding", "vec_id",
      s"${tmpDir("lifec")}/idx", graphK = 4, buildRounds = 1)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    GraphAnn.graphDeleteRepairLoaded(emb, "embedding", "vec_id", h,
      Seq(9L, 18L).toDF("vec_id"), "vec_id").collect()
    GraphAnn.graphSearchWithTombstones(emb, "embedding", "vec_id", h,
      Seq(9L, 18L).toDF("vec_id"), "vec_id", queryIds = Seq(1L), k = 2,
      beamWidth = 4, hops = 2).collect()
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    }
    assert(leaked.isEmpty, s"maintenance ops leaked cache ids $leaked")
  }

  // ---------------- s53 composed maintenance run ----------------

  test("s53: the composed run reconciles leg-by-leg with the standalone operators") {
    import spark.implicits._
    val emb = embDf(n = 60, seed = 43)
    val corpus = emb.where(col("vec_id") < 48)
    val batch = emb.where(col("vec_id") >= 48)
    val del = Seq(5L, 14L, 23L, 32L).toDF("vec_id")
    val h = GraphIndex.buildIfAbsent(corpus, "embedding", "vec_id",
      s"${tmpDir("mrun")}/idx", graphK = 4, buildRounds = 1)
    val run = GraphAnn.graphMaintenanceRun(corpus, batch, "embedding",
      "vec_id", h, del, "vec_id", queryIds = Seq(1L, 2L), k = 3,
      beamWidth = 6, hops = 2, appendBeamWidth = 6, appendHops = 2)
      .collect().map(r => (r.getAs[String]("stage"),
        r.getAs[String]("metric")) -> r).toMap
    assert(run.size == 17, s"expected 6+6+5 manifest rows, got ${run.size}")
    // append leg == graphAppendAuditLoaded
    val app = GraphAnn.graphAppendAuditLoaded(corpus, batch, "embedding",
      "vec_id", h, beamWidth = 6, hops = 2).collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
    app.foreach { case (m, r) =>
      val c = run(("append", m))
      assert(c.getAs[Long]("n") == r.getAs[Long]("n"),
        s"append/$m n: composed ${c.getAs[Long]("n")} vs ${r.getAs[Long]("n")}")
      val (cx, rx) = (c.getAs[java.lang.Double]("x"), r.getAs[java.lang.Double]("x"))
      assert((cx == null) == (rx == null) && (cx == null || cx == rx),
        s"append/$m x: $cx vs $rx")
    }
    // repair leg == graphDeleteRepairLoaded
    val rep = GraphAnn.graphDeleteRepairLoaded(corpus, "embedding",
      "vec_id", h, del, "vec_id").collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
    rep.foreach { case (m, r) =>
      val c = run(("repair", m))
      assert(c.getAs[Long]("n") == r.getAs[Long]("n"), s"repair/$m")
      val (cx, rx) = (c.getAs[java.lang.Double]("x"), r.getAs[java.lang.Double]("x"))
      assert((cx == null) == (rx == null) && (cx == null || cx == rx),
        s"repair/$m x: $cx vs $rx")
    }
    // serve leg totals == graphSearchWithTombstones summed per strategy
    val srv = GraphAnn.graphSearchWithTombstones(corpus, "embedding",
      "vec_id", h, del, "vec_id", queryIds = Seq(1L, 2L), k = 3,
      beamWidth = 6, hops = 2).collect()
    Seq("plain", "overfetch").foreach { st =>
      val rows = srv.filter(_.getAs[String]("strategy") == st)
      assert(run(("serve", st)).getAs[Long]("n") ==
        rows.map(_.getAs[Long]("n_hits")).sum, s"serve/$st hits")
      assert(run(("serve", s"${st}_returned")).getAs[Long]("n") ==
        rows.map(_.getAs[Long]("n_returned")).sum, s"serve/$st returned")
    }
    assert(run(("serve", "possible")).getAs[Long]("n") ==
      srv.filter(_.getAs[String]("strategy") == "plain")
        .map(_.getAs[Long]("n_possible")).sum)
  }

  test("s53 releases every cache it pins") {
    import spark.implicits._
    val emb = embDf(n = 50, seed = 47)
    val corpus = emb.where(col("vec_id") < 40)
    val batch = emb.where(col("vec_id") >= 40)
    val h = GraphIndex.buildIfAbsent(corpus, "embedding", "vec_id",
      s"${tmpDir("mlife")}/idx", graphK = 3, buildRounds = 1)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    GraphAnn.graphMaintenanceRun(corpus, batch, "embedding", "vec_id",
      h, Seq(9L, 18L).toDF("vec_id"), "vec_id", queryIds = Seq(1L),
      k = 2, beamWidth = 4, hops = 2, appendBeamWidth = 4,
      appendHops = 2).collect()
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    }
    assert(leaked.isEmpty, s"composed run leaked cache ids $leaked")
  }

  test("GraphIndex: concurrent first opens share ONE build; corrupt meta fails loudly") {
    val emb = embDf(n = 30, seed = 61)
    val dir = s"${tmpDir("conc")}/idx"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[GraphIndex.Handle] {
          def call(): GraphIndex.Handle = GraphIndex.openOrBuildCached(
            "r20-conc-test", emb, "embedding", "vec_id", dir,
            graphK = 4, buildRounds = 1)
        })
      }
      val handles = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // computeIfAbsent serializes the first calls on the key: every
      // caller gets the SAME handle and the dir holds one index
      assert(handles.distinct.size == 1, handles.mkString(";"))
      assert(GraphIndex.open(spark, dir).n == 30L)
    } finally pool.shutdownNow()
    // a meta table with the wrong row count is corruption, not
    // absence — open() must throw, never silently rebuild over it
    import spark.implicits._
    val dir2 = s"${tmpDir("corrupt")}/idx"
    GraphIndex.build(emb, "embedding", "vec_id", dir2, graphK = 3,
      buildRounds = 0)
    spark.read.parquet(s"$dir2/meta")
      .unionAll(spark.read.parquet(s"$dir2/meta"))
      .write.mode("overwrite").parquet(s"$dir2/meta2")
    // overwrite meta with the doubled copy (write to a sibling then
    // move — Spark can't overwrite a path it is reading)
    graft.pipeline.AnnIndex.deleteDirTree(s"$dir2/meta")
    new java.io.File(s"$dir2/meta2").renameTo(new java.io.File(s"$dir2/meta"))
    val e = intercept[IllegalStateException] {
      GraphIndex.open(spark, dir2)
    }
    assert(e.getMessage.contains("2 rows"), e.getMessage)
  }
}
