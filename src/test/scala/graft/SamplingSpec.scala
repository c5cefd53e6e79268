package graft

import graft.pipeline.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  test("packSequences assigns streaming first-fit packs per group") {
    val spark = SparkFixture.spark
    import spark.implicits._
    // token counts 300, 300, 500, 100 with budget 512:
    // cum 300/600/1100/1200; pack = floor((cum-n)/512) -> 0, 0, 1, 2
    // (doc 2 straddles 512 and overflows pack 0; doc 3 starts past 1024)
    def words(n: Int) = (1 to n).map("w" + _).mkString(" ")
    val d = Seq(
      (1L, "g", words(300)), (2L, "g", words(300)),
      (3L, "g", words(500)), (4L, "g", words(100)),
      (5L, "h", words(10))).toDF("doc_id", "source", "text")
    val got = graft.pipeline.Sampling.packSequences(d, "text", "doc_id",
        "source", budgetTokens = 512L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"),
          r.getAs[Long]("pack_id"))).toMap
    assert(got(1L) == ((300L, 300L, 0L)), got(1L).toString)
    assert(got(2L) == ((300L, 600L, 0L)), "straddling doc overflows pack 0")
    assert(got(3L) == ((500L, 1100L, 1L)), got(3L).toString)
    assert(got(4L) == ((100L, 1200L, 2L)), got(4L).toString)
    assert(got(5L) == ((10L, 10L, 0L)), "groups pack independently")
  }
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

  test("hashSplit fractions land near target and assignment is growth-stable") {
    val big = spark.range(2000).withColumnRenamed("id", "doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val counts = Sampling.hashSplit(big, "doc_id", splits)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    // md5 is uniform: 2000 draws put train within a loose band
    assert(counts("train") > 1520 && counts("train") < 1680, counts.toString)
    assert(counts("val") > 120 && counts("val") < 280, counts.toString)
    // THE promise: a row's split is a pure function of its id — adding
    // documents must not move any existing document between splits
    val small = Sampling.hashSplit(
        spark.range(500).withColumnRenamed("id", "doc_id"), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = Sampling.hashSplit(big, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) =>
      assert(grown(id) == s, s"id $id moved from $s to ${grown(id)} on growth")
    }
  }

  test("hashSplit boundary quantization: fraction grid is 1/65536, last takes rest") {
    // fractions below the grid floor to zero-width: a 1/65536-wide
    // first split keeps exactly the ids whose md5 prefix is '0000'
    val df = spark.range(100000).withColumnRenamed("id", "doc_id")
    val tiny = Sampling.hashSplit(df, "doc_id",
        Seq("a" -> (1.0 / 65536), "b" -> 0.5))
      .where(org.apache.spark.sql.functions.col("split") === "a").count()
    // P(prefix = 0000) = 1/65536 per id: expect ~1.5 of 100k; bound loosely
    assert(tiny <= 10, s"grid-width split too wide: $tiny rows")
  }
}
