package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness for bench-drift triage: run named SparkEntry queries
  * N times in isolation (fresh actions, cleared cache between reps)
  * and print per-rep wall times — separates real plan cost from the
  * run-to-run contention the full bench suite can add. Not part of
  * the driver contract.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DriftProfile t05_chunking t13_decontaminate_filter"
  */
object DriftProfile {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q43_window_frames_ranks", "t05_chunking",
        "t13_decontaminate_filter")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (names == Seq("__d12_parts")) { d12Parts(spark, sfDir); spark.stop(); return }
    if (names == Seq("__mmr_ab")) { mmrAb(spark, sfDir); spark.stop(); return }
    if (names == Seq("__range_ab")) { rangeAb(spark, sfDir); spark.stop(); return }
    if (names == Seq("__lev_ab")) { levAb(spark); spark.stop(); return }
    if (names == Seq("__mlm_ab")) { mlmAb(spark, sfDir); spark.stop(); return }
    if (names == Seq("__cdc_ab")) { cdcAb(spark, sfDir); spark.stop(); return }
    if (names == Seq("__gentry_ab")) { gentryAb(spark, sfDir); spark.stop(); return }
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      // warm (scan caches, codegen)
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val times = (1 to 5).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[drift] $n%-28s min=${times.min}%.3f " +
        f"median=${times.sorted.apply(2)}%.3f max=${times.max}%.3f " +
        times.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }

  /** A/B the t46 masking spellings (dev-only): the one-pass
    * MlmMaskSummary kernel vs the composable per-element HOF chain,
    * interleaved round-robin on the sf documents table.
    */
  private def mlmAb(spark: SparkSession, sfDir: String): Unit = {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.cache().count(): Unit
    def run(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "kernel" -> (() => graft.pipeline.TextAnalysis.mlmMask(docs, "text", "doc_id")),
      "hof chain" -> (() => graft.pipeline.TextAnalysis.mlmMaskComposable(docs, "text", "doc_id")))
    variants.foreach { case (_, f) => run(f) } // warm
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to 5).foreach { _ =>
      variants.foreach { case (n, f) => times(n) = times(n) :+ run(f) }
    }
    variants.foreach { case (n, _) =>
      val ts = times(n)
      println(f"[mlm_ab] $n%-10s min=${ts.min}%.3f median=${ts.sorted.apply(2)}%.3f " +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }
    docs.unpersist(): Unit
  }

  /** A/B the d26 chunking spellings (dev-only): the one-pass
    * CdcChunkDigests kernel vs the composable per-position HOF chain,
    * interleaved round-robin on the sf documents table.
    */
  private def cdcAb(spark: SparkSession, sfDir: String): Unit = {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.cache().count(): Unit
    def run(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "kernel" -> (() => graft.pipeline.Dedup.cdcChunkDedup(docs, "text", "doc_id")),
      "hof chain" -> (() => graft.pipeline.Dedup.cdcChunkDedupComposable(docs, "text", "doc_id")))
    variants.foreach { case (_, f) => run(f) } // warm
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to 5).foreach { _ =>
      variants.foreach { case (n, f) => times(n) = times(n) :+ run(f) }
    }
    variants.foreach { case (n, _) =>
      val ts = times(n)
      println(f"[cdc_ab] $n%-10s min=${ts.min}%.3f median=${ts.sorted.apply(2)}%.3f " +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }
    docs.unpersist(): Unit
  }

  /** A/B the d25 verifier kernel (dev-only): full-DP levenshtein vs
    * the thresholded 3-arg form — with the threshold as a per-row
    * COLUMN (the shipped spelling) and as a LITERAL — on 200k
    * synthetic ~500-char near-dup pairs (the 10× ScaleSmoke verify
    * load). Answers whether Spark's banded path actually engages for
    * a non-foldable threshold.
    */
  private def levAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = (0 until 200000).map { i =>
      val s = new StringBuilder
      val rnd = new scala.util.Random(i)
      while (s.length < 500) s.append("tok").append(rnd.nextInt(1000)).append(' ')
      val a = s.toString
      (a, "copy" + (i % 7) + " " + a.substring(math.min(8, a.length)))
    }
    val df = base.toDF("na", "nb").repartition(32)
    org.apache.spark.sql.graftbridge.CacheScope // touch to mirror prod classpath
    df.cache().count(): Unit
    val bound = (floor(lit(0.05) *
      greatest(length(col("na")), length(col("nb"))).cast("double")) + lit(1.0))
      .cast("int")
    def time(label: String)(c: org.apache.spark.sql.Column): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.select(sum(when(c >= 0, 1L).otherwise(0L))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[lev_ab] $label%-22s " +
        runs.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }
    time("full DP")(levenshtein(col("na"), col("nb")))
    time("threshold column")(
      call_function("levenshtein", col("na"), col("nb"), bound))
    time("threshold literal 32")(levenshtein(col("na"), col("nb"), 32))
    df.unpersist(): Unit
  }

  /** A/B the s21 MMR fold cadence (dev-only): foldEvery ∈ {4, 8, k}
    * on the exact s21 shape (queryId 0, k=10, λ=0.7). foldEvery ≥ k
    * means NO fold ever fires — the pure inline-penalty loop; 8 is
    * the shipped default (one fold at pick 8); 4 folds twice. Each
    * variant is warmed once then timed 5×, interleaved round-robin so
    * a contention window cannot bill one variant exclusively.
    */
  private def mmrAb(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val variants = Seq(4, 8, 16)
    def run(fold: Int): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.pipeline.Similarity.mmrTopK(emb, "embedding", "vec_id",
          queryId = 0L, k = 10, lambda = 0.7, foldEvery = fold)
        .orderBy(col("rank"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    variants.foreach(run) // warm all variants
    val times = scala.collection.mutable.Map.empty[Int, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to 5).foreach { _ =>
      variants.foreach(f => times(f) = times(f) :+ run(f))
    }
    variants.foreach { f =>
      val ts = times(f)
      println(f"[mmr_ab] foldEvery=$f%-3d min=${ts.min}%.3f " +
        f"median=${ts.sorted.apply(2)}%.3f max=${ts.max}%.3f " +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }
  }

  /** A/B fanOut on the declared s25/s26 radius searches (dev-only):
    * the r9 verdict asked whether the corpus-side fanOut repartition
    * is even wanted on a broadcast-probe scan query. Runs the EXACT
    * declared queries with `graft.fanout.disable` toggled, variants
    * interleaved round-robin after per-variant warmup.
    */
  private def rangeAb(spark: SparkSession, sfDir: String): Unit = {
    val names = Seq("s25_range_search", "s26_range_search_ivf")
    val variants = Seq(false, true) // fanout disabled?
    def run(name: String, disable: Boolean): Double = {
      sys.props("graft.fanout.disable") = disable.toString
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      sys.props.remove("graft.fanout.disable")
      (System.nanoTime() - t0) / 1e9
    }
    // third case: the heavy-work regime fanOut exists for — same
    // corpus scan, 512 broadcast queries (64x the kernel work/row)
    def heavy(disable: Boolean): Double = {
      import org.apache.spark.sql.functions.col
      sys.props("graft.fanout.disable") = disable.toString
      spark.catalog.clearCache()
      val emb = graft.Tables.load(spark, sfDir, "embeddings")
      val t0 = System.nanoTime()
      graft.pipeline.Similarity.rangeSearch(emb,
          emb.filter(col("vec_id") < 512), "embedding", "vec_id",
          "vec_id", minCos = 0.25)
        .write.format("noop").mode("overwrite").save()
      sys.props.remove("graft.fanout.disable")
      (System.nanoTime() - t0) / 1e9
    }
    val cases: Seq[(String, Boolean => Double)] =
      names.map(n => (n, (v: Boolean) => run(n, v))) :+
        (("s25_shape_512queries", heavy _))
    cases.foreach { case (label, f) =>
      variants.foreach(f) // warm both variants
      val times = scala.collection.mutable.Map.empty[Boolean, Vector[Double]]
        .withDefaultValue(Vector.empty)
      (1 to 5).foreach { _ =>
        variants.foreach(v => times(v) = times(v) :+ f(v))
      }
      variants.foreach { v =>
        val ts = times(v)
        val vl = if (v) "noFanOut" else "fanOut  "
        println(f"[range_ab] $label%-22s $vl min=${ts.min}%.3f " +
          f"median=${ts.sorted.apply(2)}%.3f max=${ts.max}%.3f " +
          ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
      }
    }
  }

  /** Stage breakdown of d12 (dev-only). */
  private def d12Parts(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[d12] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    val toks = split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")
    val idxs = when(size(toks) >= 3, sequence(lit(0), size(toks) - 3))
      .otherwise(array().cast("array<int>"))
    val shingles = transform(idxs, i => array_join(slice(toks, i + 1, lit(3)), " "))
    val sh = docs.select(col("doc_id").as("id"), explode(shingles).as("shingle"))
    t("explode shingles")(sh.count())
    t("explode+8xmd5")(sh.select(col("id") +:
      (0 until 8).map(i => md5(concat_ws(":", lit(i.toString), col("shingle"))).as(s"h$i")): _*).count())
    val aggs = (0 until 8).map(i =>
      min(md5(concat_ws(":", lit(i.toString), col("shingle")))).as(s"m$i"))
    val sig = sh.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    t("signatures")(sig.count())
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", col(s"m${b * 2}"), col(s"m${b * 2 + 1}")).as("key"))
    }
    val banded = sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    t("banded")(banded.count())
    t("pairs")(banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct().count())
  }

  /** A/B the graph-serve ENTRY strategies (dev-only): min-id entry vs
    * the coarse argmax, same standing index, same hop budget, on two
    * query sets — the low-id set (ring-adjacent to the min-id entry,
    * which FLATTERS the fixed entry: the ring init links sequential
    * ids and refinement keeps some of those edges) and a mid-corpus
    * set with no such adjacency. Prints per-hop recall sums. Round-20
    * finding: entry choice on this corpus matters mostly through ring
    * adjacency, which this hook makes visible.
    */
  private def gentryAb(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-gentry")
      .toFile.getAbsolutePath + "/idx"
    val h = graft.pipeline.GraphIndex.buildIfAbsent(emb, "embedding",
      "vec_id", dir, graphK = 10, buildRounds = 3)
    // medoid arm (round 21): 16 Lloyd-trained centroids (a throwaway
    // AnnIndex build exposes them), each mapped to its nearest corpus
    // vector — the principled coarse layer vs the first-16-by-id seed
    val annDir = java.nio.file.Files.createTempDirectory("graft-gentry-med")
      .toFile.getAbsolutePath + "/idx"
    val medoids: Seq[Long] = graft.pipeline.AnnIndex.build(emb,
      "embedding", "vec_id", annDir, numCells = 16, m = 8, ksub = 16)
      .centroids.map { case (_, cv) =>
        emb.select(col("vec_id"),
          graft.pipeline.Similarity.cosine(col("embedding"),
            typedLit(cv.toSeq)).as("cs"))
          .orderBy(col("cs").desc, col("vec_id")).limit(1)
          .head().getLong(0)
      }.distinct
    println(s"[gentry_ab] medoid ids: ${medoids.sorted.mkString(",")}")
    Seq("low-id" -> Seq(1L, 2L, 3L), "mid" -> Seq(201L, 301L, 401L))
      .foreach { case (label, qids) =>
        Seq(("min-id", None, None),
          ("coarse16", Some(16), None),
          ("medoid16", None, Some(medoids))).foreach {
          case (en, ck, ids) =>
            val out = graft.pipeline.GraphAnn.graphBeamSearchLoaded(emb,
              "embedding", "vec_id", h, qids, k = 5, beamWidth = 20,
              hops = 5, coarseEntryK = ck, coarseEntryIds = ids).collect()
            val byHop = out.groupBy(_.getAs[Long]("hop")).toSeq.sortBy(_._1)
              .map { case (hp, rs) =>
                f"h$hp=${rs.map(_.getAs[Double]("recall")).sum}%.1f" }
            println(f"[gentry_ab] $label%-8s $en%-9s " + byHop.mkString(" "))
        }
      }
  }
}
