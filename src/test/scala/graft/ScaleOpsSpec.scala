package graft

import graft.ops.ScaleOps
import org.apache.spark.sql.classic.{Dataset => CDS}
import org.scalatest.funsuite.AnyFunSuite

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[CDS[org.apache.spark.sql.Row]].queryExecution.executedPlan.toString

  test("salted aggregation matches the direct aggregation exactly") {
    val l = spark.read.parquet(s"${SparkFixture.sfDir}/lineitem.parquet")
    val direct = l.groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("l_quantity").as("q"),
        org.apache.spark.sql.functions.max("l_extendedprice").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val salted = ScaleOps.saltedAgg(l, Seq("l_returnflag"),
      Seq(("count", "*", "n"), ("sum", "l_quantity", "q"), ("max", "l_extendedprice", "mx")),
      saltBuckets = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, q, mx)) =>
      assert(n == direct(k)._1)
      assert(math.abs(q - direct(k)._2) < 1e-6)
      assert(mx == direct(k)._3)
    }
    // two-phase shape: two HashAggregate exchanges keyed differently
    val p = plan(ScaleOps.saltedAgg(l, Seq("l_returnflag"),
      Seq(("count", "*", "n")), saltBuckets = 16))
    assert(p.contains("__salt") || p.contains("hashpartitioning(l_returnflag"), p)
  }

  test("IVF index written partitionBy(cell) prunes a probe to its cells") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
    val cents = graft.pipeline.Ivf.buildCentroids(emb, "embedding", "vec_id",
      k = 4, iters = 1)
    val indexed = graft.pipeline.Ivf.assign(emb, cents, "embedding", "vec_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    try {
      // the "index" is the corpus + cell column, laid out BY cell —
      // a probe of nprobe cells then touches only those directories
      indexed.write.partitionBy("cell").mode("overwrite").parquet(dir)
      val idx = spark.read.parquet(dir)
      val probe = idx.where(col("cell").isin(0, 1))
      val p = plan(probe)
      assert(p.contains("PartitionFilters: [cell") ||
        p.contains("PartitionFilters: [cell#") ||
        p.contains("PartitionFilters: [(cell"),
        s"probe must prune on the cell partition column:\n$p")
      // pruning is real: only the probed cells' rows are read, and
      // totals agree with the pre-layout assignment
      val perCell = indexed.groupBy("cell").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(probe.count() == perCell.getOrElse(0, 0L) + perCell.getOrElse(1, 0L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("PQ index write-back: an ADC scan reads codes only, never vectors") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
    val books = graft.pipeline.Pq.trainCodebooks(emb, "embedding", "vec_id",
      m = 8, ksub = 8, iters = 1, maxTrainRows = 1000)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    try {
      // the PQ "index" is (id, codes) — written back once, the ADC
      // scan then reads m ints per row instead of dim floats
      graft.pipeline.Pq.encode(emb, "embedding", books)
        .select(col("vec_id"), col("codes"))
        .write.mode("overwrite").parquet(dir)
      val q = graft.pipeline.Pq.collectQuery(emb, "embedding", "vec_id", 0L)
      val (dt, nt, qn) = graft.pipeline.Pq.adcTables(q, books)
      val scored = spark.read.parquet(dir)
        .withColumn("adc_sim",
          graft.functions.PqExpressions.pqAdcScore(col("codes"), dt, nt, qn))
        .orderBy(col("adc_sim").desc, col("vec_id")).limit(5)
      val p = plan(scored)
      assert(p.contains("ReadSchema: struct<vec_id:bigint,codes:array<int>>"),
        s"ADC scan must read codes only:\n$p")
      assert(!p.contains("embedding"), s"vectors must not be read:\n$p")
      assert(scored.count() == 5)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bucketed pair joins without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = spark.read.parquet(s"${SparkFixture.sfDir}/orders.parquet")
      val c = spark.read.parquet(s"${SparkFixture.sfDir}/customer.parquet")
      val (bo, bc) = ScaleOps.bucketedPair(spark,
        o, "b_orders", "o_custkey", c, "b_customer", "c_custkey", buckets = 4)
      val joined = bo.join(bc, bo("o_custkey") === bc("c_custkey"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
