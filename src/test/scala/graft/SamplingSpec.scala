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

  test("sourceMix honors per-stratum quotas and epoch replication, deterministically") {
    import spark.implicits._
    val df = (1L to 10L).map(i => ("a", i)).toDF("s", "id")
      .union((11L to 20L).map(i => ("b", i)).toDF("s", "id"))
      .union((21L to 25L).map(i => ("c", i)).toDF("s", "id"))
    val mix = Map("a" -> (3, 2), "b" -> (2, 3)) // c absent → dropped
    val run1 = Sampling.sourceMix(df, "s", "id", mix)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    val run2 = Sampling.sourceMix(df, "s", "id", mix)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    assert(run1 == run2, "mixing must be reproducible")
    val byStratum = run1.groupBy(_._1)
    assert(!byStratum.contains("c"), "stratum without a quota is dropped")
    assert(byStratum("a").size == 3 * 2 && byStratum("b").size == 2 * 3)
    // every kept doc appears once per epoch 1..e
    assert(byStratum("a").groupBy(_._2).forall { case (_, rows) =>
      rows.map(_._3).sorted == Seq(1L, 2L) })
    assert(byStratum("b").groupBy(_._2).forall { case (_, rows) =>
      rows.map(_._3).sorted == Seq(1L, 2L, 3L) })
  }

  test("sourceMix with a quota larger than the stratum keeps the whole stratum") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L)).toDF("s", "id")
    val out = Sampling.sourceMix(df, "s", "id", Map("a" -> (10, 1))).collect()
    assert(out.length == 2)
  }
}
