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
