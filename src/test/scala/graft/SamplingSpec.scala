package graft

import graft.pipeline.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("stratified sample returns exactly k per stratum, deterministically") {
    val docs = spark.read.parquet(s"${SparkFixture.sfDir}/documents.parquet")
    val a = Sampling.stratifiedSample(docs, "source", "doc_id", 3)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sampling.stratifiedSample(docs, "source", "doc_id", 3)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b, "same input must pick the same sample")
    val perStratum = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perStratum.values.forall(_ == 3), perStratum.toString)
  }

  test("strata smaller than k return all their rows") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("s", "id")
    val out = Sampling.stratifiedSample(df, "s", "id", 5).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Long]("sample_rank") <= 5))
  }
}
