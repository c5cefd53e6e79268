package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.classic.{Dataset => CDS}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the 100 TB story depends on these staying
  * true (pushdown reaching the scan, small dims broadcast, TopK not
  * global sort, codegen covering the hot expressions). A regression
  * here won't fail correctness tests — only these.
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sfDir

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[CDS[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: ["), "filters must reach the scan")
    assert(plan.contains("GreaterThanOrEqual(o_totalprice") ||
      plan.contains("In(o_orderstatus"), s"expected pushed filters in:\n$plan")
    // projection pruning: unused columns (o_orderdate, o_clerk, ...)
    // must not be read
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("o_orderdate"), "column pruning lost")
  }

  test("small dimension joins are broadcast, not shuffled") {
    val df = SparkEntry.queries("q03_join_revenue_by_nation")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"nation/region should broadcast:\n$plan")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("q08_topk")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"), s"expected TopK:\n$plan")
  }

  test("anti join stays a join (no subquery materialization)") {
    val plan = planOf(SparkEntry.queries("q05_anti_join")(spark, sf))
    assert(plan.contains("LeftAnti"), s"expected left-anti join:\n$plan")
  }

  test("cosine kernel is in the plan and survives CODEGEN_ONLY mode") {
    val plan = planOf(SparkEntry.queries("d05_embedding_neardup")(spark, sf))
    assert(plan.contains("cosinesimilarity") || plan.contains("CosineSimilarity"),
      s"kernel missing from plan:\n$plan")
    // force expression codegen (no interpreter fallback): a broken
    // doGenCode would make this throw instead of silently degrading
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val top = SparkEntry.queries("s01_knn_bruteforce")(spark, sf).collect()
      assert(top.length == 10)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("exact dedup shuffles digests, not documents") {
    val df = graft.pipeline.Dedup.exactGroups(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id")
    val plan = planOf(df)
    // the pre-shuffle projection must already be (fp, doc_id): text
    // is dropped before the exchange (shuffle volume = digests)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(fp")
    assert(exchangeIdx >= 0, s"expected hash exchange on fp:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_min"),
      "map-side partial aggregation expected")
  }

  test("lineitem agg uses partial (map-side) aggregation") {
    val plan = planOf(SparkEntry.queries("q01_pricing_summary")(spark, sf))
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"partial agg expected:\n$plan")
  }
}
