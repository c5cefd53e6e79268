package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("asofJoin picks the most recent right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq( // (qid, sym-key, ts, px)
      (1L, 10L, 100L, 1.0), (2L, 10L, 200L, 2.0), (3L, 10L, 300L, 3.0),
      (4L, 20L, 150L, 9.0)).toDF("qid", "k", "ts", "px")
    val trades = Seq( // (tid, key, ts)
      (1L, 10L, 250L),  // between quotes 2 and 3 -> px 2.0
      (2L, 10L, 300L),  // EXACTLY at quote 3 -> inclusive -> 3.0
      (3L, 10L, 50L),   // before any quote -> null
      (4L, 20L, 500L),  // key 20 -> 9.0
      (5L, 30L, 100L)). // key with no quotes -> null
      toDF("tid", "k", "ts")
    val got = graft.ops.TemporalJoins.asofJoin(
        trades, quotes, "k", "ts", "ts",
        rightPayload = Seq("px", "qid"), rightOrd = Some("qid"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(got(1L) == ((Some(2.0), Some(2L))))
    assert(got(2L) == ((Some(3.0), Some(3L))), "equal ts must match (inclusive)")
    assert(got(3L) == ((None, None)), "no earlier right row -> nulls")
    assert(got(4L) == ((Some(9.0), Some(4L))))
    assert(got(5L) == ((None, None)), "unseen key -> nulls")
    // inner mode drops the unmatched rows
    val inner = graft.ops.TemporalJoins.asofJoin(
      trades, quotes, "k", "ts", "ts", Seq("px"), inner = true)
    assert(inner.count() == 3)
    // output column naming: left columns verbatim, payload suffixed
    assert(inner.columns.toSeq == Seq("tid", "k", "ts", "px_asof"))
  }

  test("asofJoin ties on (key, ts) break to the largest rightOrd") {
    import spark.implicits._
    val right = Seq((1L, 10L, 100L, "a"), (2L, 10L, 100L, "b"))
      .toDF("rid", "k", "ts", "v")
    val left = Seq((1L, 10L, 100L)).toDF("lid", "k", "ts")
    val got = graft.ops.TemporalJoins.asofJoin(
        left, right, "k", "ts", "ts", Seq("v"), rightOrd = Some("rid"))
      .head().getString(3)
    assert(got == "b", "largest rid must win the tie")
  }

  test("forward asofJoin picks the earliest right row at or after each left ts") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 10L, 100L, 1.0), (2L, 10L, 200L, 2.0), (3L, 10L, 300L, 3.0))
      .toDF("qid", "k", "ts", "px")
    val trades = Seq(
      (1L, 10L, 150L),  // next quote is 200 -> 2.0
      (2L, 10L, 200L),  // exactly at 200 -> inclusive -> 2.0
      (3L, 10L, 350L)). // nothing after -> null
      toDF("tid", "k", "ts")
    val got = graft.ops.TemporalJoins.asofJoin(
        trades, quotes, "k", "ts", "ts", Seq("px"),
        rightOrd = Some("qid"), forward = true)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(1L -> Some(2.0), 2L -> Some(2.0), 3L -> None), got.toString)
  }

  test("asofJoin null keys and timestamps never match, left rows survive") {
    import spark.implicits._
    val right = Seq(
      (Some(10L), Some(100L), 1.0),
      (None: Option[Long], Some(50L), 8.0),   // null key: unmatchable
      (Some(10L), None: Option[Long], 9.0))   // null ts: unmatchable
      .toDF("k", "ts", "px")
    val left = Seq(
      (1L, Some(10L), Some(200L)),            // matches the real quote
      (2L, Some(10L), None: Option[Long]),    // null ts -> no match
      (3L, None: Option[Long], Some(200L)))   // null key -> no match
      .toDF("lid", "k", "ts")
    for (fwd <- Seq(false, true)) {
      val got = graft.ops.TemporalJoins.asofJoin(
          left, right, "k", "ts", "ts", Seq("px"), forward = fwd)
        .collect().map(r => r.getLong(0) ->
          Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
      assert(got.keySet == Set(1L, 2L, 3L), s"fwd=$fwd: all left rows kept")
      assert(got(2L).isEmpty && got(3L).isEmpty,
        s"fwd=$fwd: null key/ts must not match: $got")
      if (!fwd) assert(got(1L) == Some(1.0), got.toString)
      else assert(got(1L).isEmpty, "forward: no quote at/after ts 200")
    }
  }

  test("rangeJoin matches points to half-open intervals exactly once") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 100L))
      .toDF("pid", "pt")
    val intervals = Seq((1L, 10L, 20L), (2L, 15L, 30L), (3L, 40L, 40L))
      .toDF("iid", "lo", "hi")
    // bucketWidth much smaller than the intervals: pairs span many
    // buckets but must still appear exactly once
    val got = graft.ops.TemporalJoins.rangeJoin(
        points, intervals, "pt", "lo", "hi", bucketWidth = 3L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 1L), (3L, 1L), (3L, 2L), (4L, 2L)), got.toString)
    // pt=20 vs [10,20): hi exclusive; pt=10 vs [10,20): lo inclusive;
    // empty interval [40,40) matches nothing; each pair exactly once
    val counts = graft.ops.TemporalJoins.rangeJoin(
        points, intervals, "pt", "lo", "hi", bucketWidth = 3L)
      .groupBy("pid", "iid").count().where(col("count") > 1).count()
    assert(counts == 0, "no duplicate pairs")
  }

  test("intervalJoin emits each overlapping pair exactly once") {
    import spark.implicits._
    val a = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 200L, 210L))
      .toDF("aid", "alo", "ahi")
    val b = Seq((1L, 90L, 150L), (2L, 100L, 120L), (3L, 55L, 58L))
      .toDF("bid", "blo", "bhi")
    // a1=[0,100) overlaps b1=[90,150) and b3=[55,58) but NOT b2=[100,120)
    // (half-open: they only touch); a2=[50,60) overlaps b3; a3 nothing
    val got = graft.ops.TemporalJoins.intervalJoin(
        a, b, "alo", "ahi", "blo", "bhi", bucketWidth = 7L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == Seq((1L, 1L), (1L, 3L), (2L, 3L)), got.mkString(","))
    assert(got.length == got.toSet.size, "no duplicate pairs")
  }

  test("intervalJoin agrees with the naive cross-join filter on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def ivs(n: Int, tag: String) = (1L to n.toLong).map { i =>
      val lo = rnd.nextInt(900).toLong; (i, lo, lo + 1 + rnd.nextInt(120).toLong)
    }.toDF(s"${tag}id", s"${tag}lo", s"${tag}hi")
    val a = ivs(120, "a"); val b = ivs(80, "b")
    val naive = a.crossJoin(b)
      .where(col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.ops.TemporalJoins.intervalJoin(
        a, b, "alo", "ahi", "blo", "bhi", bucketWidth = 50L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "exactly-once violated")
    assert(got.toSet == naive,
      s"missing=${naive -- got.toSet} extra=${got.toSet -- naive}")
  }

  test("asofJoinSkewed == asofJoin on skewed random data, all modes") {
    import spark.implicits._
    // 90% of rows on one hot key — the corpus that serializes the
    // single-key window and motivates the bucketed variant. Ties,
    // sparse keys, and unmatched rows all present.
    val rnd = new scala.util.Random(17)
    def key() = if (rnd.nextInt(10) < 9) 7L else rnd.nextInt(5).toLong
    val leftRows = (1L to 400L).map(i => (i, key(), rnd.nextInt(5000).toLong))
    val rightRows = (1L to 300L).map(i =>
      (i, key(), rnd.nextInt(5000).toLong, rnd.nextDouble()))
    val left = leftRows.toDF("lid", "k", "ts")
    val right = rightRows.toDF("rid", "k", "ts", "v")
    for (forward <- Seq(false, true); inner <- Seq(false, true)) {
      val base = graft.ops.TemporalJoins.asofJoin(
          left, right, "k", "ts", "ts", Seq("v", "rid"),
          rightOrd = Some("rid"), inner = inner, forward = forward)
        .collect()
        .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4)))).toSet
      for (width <- Seq(1L, 64L, 1000L, 100000L)) {
        val skewed = graft.ops.TemporalJoins.asofJoinSkewed(
            left, right, "k", "ts", "ts", Seq("v", "rid"),
            bucketWidth = width, rightOrd = Some("rid"),
            inner = inner, forward = forward)
          .collect()
          .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4)))).toSet
        assert(skewed == base,
          s"forward=$forward inner=$inner width=$width: " +
            s"missing=${(base -- skewed).take(3)} extra=${(skewed -- base).take(3)}")
      }
    }
  }

  test("asofJoinSkewed splits the hot key across (key, bucket) partitions") {
    import spark.implicits._
    val left = (1L to 100L).map(i => (i, 1L, i * 10L)).toDF("lid", "k", "ts")
    val right = (1L to 50L).map(i => (i, 1L, i * 17L, i.toDouble))
      .toDF("rid", "k", "ts", "v")
    val df = graft.ops.TemporalJoins.asofJoinSkewed(
      left, right, "k", "ts", "ts", Seq("v"), bucketWidth = 100L)
    val plan = df.queryExecution.executedPlan.toString
    // the main merge window must be keyed by (key, bucket), not key
    assert(plan.contains("windowspecdefinition(__k") &&
      plan.contains("__b"),
      s"merge window must partition by (key, bucket):\n$plan")
    // rejects non-integral ts up front
    val tsDf = left.withColumn("ts", org.apache.spark.sql.functions
      .timestamp_micros(col("ts")))
    val e = intercept[IllegalArgumentException] {
      graft.ops.TemporalJoins.asofJoinSkewed(
        tsDf, right, "k", "ts", "ts", Seq("v"), bucketWidth = 100L)
    }
    assert(e.getMessage.contains("unix_micros"))
  }

  test("rangeJoin agrees with the naive cross-join filter on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = (1L to 200L).map(i => (i, rnd.nextInt(1000).toLong)).toDF("pid", "pt")
    val ivs = (1L to 50L).map { i =>
      val lo = rnd.nextInt(950).toLong; (i, lo, lo + 1 + rnd.nextInt(80).toLong)
    }.toDF("iid", "lo", "hi")
    val naive = points.crossJoin(ivs)
      .where(col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = graft.ops.TemporalJoins.rangeJoin(
        points, ivs, "pt", "lo", "hi", bucketWidth = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive,
      s"missing=${naive -- bucketed} extra=${bucketed -- naive}")
  }
}
