package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Build-once / persist / query-many index lifecycle pins.
  *
  * The contract under test: an [[graft.pipeline.AnnIndex]] probe is a
  * pure read of the persisted index — bit-identical results to the
  * retrain-per-query path, partition-pruned to the probed cells, and
  * with NO training job and NO corpus scan at query time.
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val emb =
    spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")

  private def withIndexDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_idx").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("indexed search == retrain-per-query search, bit for bit") {
    withIndexDir { dir =>
      val h = graft.pipeline.AnnIndex.build(emb, "embedding", "vec_id", dir,
        numCells = 8, m = 16, ksub = 16)
      val indexed = graft.pipeline.AnnIndex
        .searchTopK(emb, h, queryId = 0L, k = 10, nprobe = 4, rerank = 30)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val retrained = graft.pipeline.Pq.searchTopKIvf(emb, "embedding",
        "vec_id", queryId = 0L, k = 10, numCells = 8, nprobe = 4,
        m = 16, ksub = 16, rerank = 30)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(indexed == retrained,
        "the persisted index is a materialization of the same algorithm " +
          "and must not change results")
    }
  }

  test("open() round-trips codebooks, centroids, and meta exactly") {
    withIndexDir { dir =>
      val built = graft.pipeline.AnnIndex.build(emb, "embedding", "vec_id",
        dir, numCells = 6, m = 8, ksub = 8)
      val opened = graft.pipeline.AnnIndex.open(spark, dir)
      assert(opened.m == built.m && opened.ksub == built.ksub &&
        opened.dim == built.dim && opened.numCells == built.numCells)
      assert(opened.idCol == "vec_id" && opened.vecCol == "embedding")
      assert(opened.codebooks.length == built.codebooks.length)
      built.codebooks.zip(opened.codebooks).foreach { case (a, b) =>
        assert(a.length == b.length)
        a.zip(b).foreach { case (ca, cb) => assert(ca.toSeq == cb.toSeq) }
      }
      assert(opened.centroids.map(_._1) == built.centroids.map(_._1))
      opened.centroids.zip(built.centroids).foreach { case ((_, a), (_, b)) =>
        assert(a.toSeq == b.toSeq)
      }
    }
  }

  test("a probe prunes to its cells and never scans the corpus") {
    withIndexDir { dir =>
      val h = graft.pipeline.AnnIndex.build(emb, "embedding", "vec_id", dir,
        numCells = 8, m = 8, ksub = 8)
      val q = emb.where(col("vec_id") === 0L)
        .select(transform(col("embedding"), _.cast("double")))
        .collect()(0).getSeq[Double](0).toArray
      val df = graft.pipeline.AnnIndex.searchTopKVec(spark, h, q, k = 10,
        nprobe = 3)
      val p = plan(df)
      assert(p.contains("PartitionFilters: [cell") ||
        p.contains("PartitionFilters: [(cell"),
        s"probe must prune on the cell partition column:\n$p")
      assert(!p.contains("embeddings.parquet"),
        s"a rerank-free probe must not touch the vector corpus:\n$p")
      assert(df.count() > 0)
    }
  }

  test("no training or corpus job runs at query time") {
    withIndexDir { dir =>
      val h = graft.pipeline.AnnIndex.build(emb, "embedding", "vec_id", dir,
        numCells = 8, m = 8, ksub = 8)
      val q = emb.where(col("vec_id") === 1L)
        .select(transform(col("embedding"), _.cast("double")))
        .collect()(0).getSeq[Double](0).toArray
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val hits = graft.pipeline.AnnIndex
          .searchTopKVec(spark, h, q, k = 10, nprobe = 3).collect()
        // listener delivery is async; onJobStart fires synchronously
        // with job submission, so by the time collect() returned all
        // job starts are counted — a short settle covers stragglers
        Thread.sleep(200)
        assert(hits.nonEmpty)
        // training alone is 10+ jobs (sample collect + Lloyd writes);
        // a pure probe is the TopK collect plus at most schema/AQE
        // bookkeeping
        assert(jobs.get() <= 3,
          s"indexed query ran ${jobs.get()} jobs — is it retraining?")
      } finally spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("buildIfAbsent reuses a complete index; param change rebuilds") {
    withIndexDir { dir =>
      val h1 = graft.pipeline.AnnIndex.buildIfAbsent(emb, "embedding",
        "vec_id", dir, numCells = 6, m = 8, ksub = 8)
      val metaFile = new java.io.File(s"$dir/meta")
        .listFiles().filter(_.getName.endsWith(".parquet")).head
      val mtime = metaFile.lastModified()
      Thread.sleep(1100) // parquet mtime granularity
      val h2 = graft.pipeline.AnnIndex.buildIfAbsent(emb, "embedding",
        "vec_id", dir, numCells = 6, m = 8, ksub = 8)
      assert(metaFile.lastModified() == mtime, "matching params must reuse")
      assert(h2.m == h1.m && h2.centroids.map(_._1) == h1.centroids.map(_._1))
      val h3 = graft.pipeline.AnnIndex.buildIfAbsent(emb, "embedding",
        "vec_id", dir, numCells = 6, m = 16, ksub = 8)
      assert(h3.m == 16, "changed params must rebuild, not serve stale")
    }
  }

  test("batch indexed search equals per-query probes") {
    withIndexDir { dir =>
      val h = graft.pipeline.AnnIndex.build(emb, "embedding", "vec_id", dir,
        numCells = 8, m = 8, ksub = 8)
      val queries = emb.where(col("vec_id") < 3)
      // the rank filter must stay WindowGroupLimit-able: per-map-
      // partition forwarding capped at k per query (the s14 discipline)
      val plan = graft.pipeline.AnnIndex.searchTopKBatch(spark, h, queries,
        "vec_id", "embedding", k = 5, nprobe = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"batch probe must cap per-query forwarding map-side:\n$plan")
      val batch = graft.pipeline.AnnIndex.searchTopKBatch(spark, h, queries,
        "vec_id", "embedding", k = 5, nprobe = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val single = (0L until 3L).flatMap { qid =>
        val q = emb.where(col("vec_id") === qid)
          .select(transform(col("embedding"), _.cast("double")))
          .collect()(0).getSeq[Double](0).toArray
        graft.pipeline.AnnIndex.searchTopKVec(spark, h, q, k = 5, nprobe = 4)
          .collect().zipWithIndex
          .map { case (r, i) => (qid, r.getLong(0), r.getDouble(1), i + 1L) }
      }.toSet
      assert(batch == single)
    }
  }

  test("append encodes with the existing quantizers and neighbors become findable") {
    withIndexDir { dir =>
      val half = emb.where(col("vec_id") < 250)
      val rest = emb.where(col("vec_id") >= 250)
      val h = graft.pipeline.AnnIndex.build(half, "embedding", "vec_id", dir,
        numCells = 8, m = 8, ksub = 8)
      val q = emb.where(col("vec_id") === 0L)
        .select(transform(col("embedding"), _.cast("double")))
        .collect()(0).getSeq[Double](0).toArray
      val before = graft.pipeline.AnnIndex
        .searchTopKVec(spark, h, q, k = 500, nprobe = 8).collect()
        .map(_.getLong(0)).toSet
      assert(before.forall(_ < 250), "nothing above 250 exists yet")
      graft.pipeline.AnnIndex.append(h, rest)
      val after = graft.pipeline.AnnIndex
        .searchTopKVec(spark, h, q, k = 1000, nprobe = 8).collect()
        .map(_.getLong(0)).toSet
      assert(after.size == emb.count(), "full-probe search must see every row")
      assert(after.exists(_ >= 250), "appended rows must be findable")
      // appended codes are exactly encode(original codebooks): the
      // reference encoding of the appended rows matches what search
      // reads back from the index
      val refCodes = graft.pipeline.Pq.encode(
          rest.select(col("vec_id"), col("embedding")), "embedding", h.codebooks)
        .select(col("vec_id"), col("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val diskCodes = spark.read.parquet(h.codesPath)
        .where(col("vec_id") >= 250)
        .select(col("vec_id"), col("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(diskCodes == refCodes,
        "append must persist exactly the existing-codebook encoding")
    }
  }

  test("registry: openOrBuildCached is a map hit after the first call") {
    withIndexDir { dir =>
      val name = s"spec-${System.nanoTime()}"
      val h1 = graft.pipeline.AnnIndex.openOrBuildCached(name, emb,
        "embedding", "vec_id", dir, numCells = 4, m = 8, ksub = 8)
      assert(graft.pipeline.AnnIndex.get(name).contains(h1))
      assert(graft.pipeline.AnnIndex.list().contains(name))
      val h2 = graft.pipeline.AnnIndex.openOrBuildCached(name, emb,
        "embedding", "vec_id", dir, numCells = 4, m = 8, ksub = 8)
      assert(h2 eq h1, "second call must be a registry lookup")
      assert(graft.pipeline.AnnIndex.drop(name))
      assert(graft.pipeline.AnnIndex.get(name).isEmpty)
    }
  }
}
