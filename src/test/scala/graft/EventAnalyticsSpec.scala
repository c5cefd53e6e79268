package graft

import graft.ops.EventAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Unit semantics for the event-analytics compositions beyond what
  * the q64/q65 oracles pin (week unit, 7-day window): month cohorts,
  * boundary inclusion, and RANGE-frame peer handling.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("cohortRetention month unit: offsets are whole months from the cohort") {
    import spark.implicits._
    val events = Seq(
      (ts("2024-01-05 10:00:00"), 1L), // cohort Jan
      (ts("2024-01-20 10:00:00"), 1L), // same month → offset 0
      (ts("2024-03-02 10:00:00"), 1L), // offset 2
      (ts("2024-02-10 10:00:00"), 2L), // cohort Feb
      (ts("2024-03-15 10:00:00"), 2L)  // offset 1
    ).toDF("ts", "user_id")
    val got = EventAnalytics.cohortRetention(events, "user_id", "ts", "month")
      .collect()
      .map(r => (r.getAs[Timestamp]("cohort_start").toString.take(7),
        r.getAs[Long]("offset"), r.getAs[Long]("n_users")))
      .toSet
    assert(got == Set(
      ("2024-01", 0L, 1L), ("2024-01", 2L, 1L),
      ("2024-02", 0L, 1L), ("2024-02", 1L, 1L)), got.toString)
  }

  test("cohortRetention counts a user once per unit regardless of activity volume") {
    import spark.implicits._
    val events = (1 to 50).map(i =>
      (ts(f"2024-01-01 10:$i%02d:00"), 7L)).toDF("ts", "user_id")
    val got = EventAnalytics.cohortRetention(events, "user_id", "ts", "week")
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("n_users") == 1L)
  }

  test("trailingWindowStats includes the window edge and excludes beyond it") {
    import spark.implicits._
    val events = Seq(
      (ts("2024-01-01 00:00:00"), 1L, 10.0),
      (ts("2024-01-08 00:00:00"), 1L, 1.0),  // exactly 7 days later: inclusive
      (ts("2024-01-15 00:00:01"), 1L, 2.0)   // 7d + 1s after the 2nd: excluded
    ).toDF("ts", "user_id", "value")
    val got = EventAnalytics.trailingWindowStats(events, "user_id", "ts",
        "value", 7L * 24 * 3600 * 1000000L)
      .orderBy("ts")
      .collect().map(r => (r.getAs[Long]("win_n"), r.getAs[Double]("win_sum")))
    assert(got(0) == ((1L, 10.0)))
    assert(got(1) == ((2L, 11.0)), s"edge must be inclusive: ${got(1)}")
    assert(got(2) == ((1L, 2.0)), s"beyond the window must drop: ${got(2)}")
  }

  test("trailingWindowStats treats equal timestamps as peers (both included)") {
    import spark.implicits._
    val events = Seq(
      (ts("2024-01-01 00:00:00"), 1L, 1.0),
      (ts("2024-01-01 00:00:00"), 1L, 2.0)
    ).toDF("ts", "user_id", "value")
    val got = EventAnalytics.trailingWindowStats(events, "user_id", "ts",
        "value", 1000000L)
      .collect().map(r => (r.getAs[Long]("win_n"), r.getAs[Double]("win_sum")))
    // RANGE frames include all order-by peers in both engines
    assert(got.forall(_ == ((2L, 3.0))), got.mkString(";"))
  }

  test("sessionize: gaps strictly over the threshold break, edges don't") {
    import spark.implicits._
    val gap = 30L * 60 * 1000000L
    val events = Seq(
      (1L, 0L), (2L, gap),         // exactly the gap later: same session
      (3L, 2 * gap + 1),           // gap + 1µs: breaks
      (4L, 2 * gap + 2)
    ).toDF("eid", "tus")
    val got = EventAnalytics.sessionize(events, "eid", "tus", gap)
    // single-row keys: each its own partition, idx 0 everywhere
    assert(got.collect().forall(_.getAs[Long]("session_idx") == 0L))
    val one = Seq((1L, 0L), (1L, gap), (1L, 2 * gap + 1), (1L, 2 * gap + 2))
      .toDF("uid", "tus")
    val idx = EventAnalytics.sessionize(one, "uid", "tus", gap)
      .orderBy("tus").collect().map(_.getAs[Long]("session_idx")).toSeq
    assert(idx == Seq(0L, 0L, 1L, 1L), idx.toString)
    // non-integral ts rejected up front
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.sessionize(
        one.withColumn("tus", timestamp_micros(col("tus"))), "uid", "tus", gap)
    }
    assert(e.getMessage.contains("unix_micros"))
  }

  test("sessionizeSkewed == sessionize on a 90%-one-key corpus, many widths") {
    import spark.implicits._
    // the corpus that serializes the single-key session window: 90% of
    // rows on one hot user, ts ties present (ord tie-break exercised)
    val rnd = new scala.util.Random(23)
    val rows = (1L to 600L).map { i =>
      val k = if (rnd.nextInt(10) < 9) 7L else rnd.nextInt(5).toLong
      (i, k, rnd.nextInt(3000).toLong)
    }
    val events = rows.toDF("eid", "uid", "tus")
    val gap = 40L
    val base = EventAnalytics.sessionize(events, "uid", "tus", gap,
        ordCol = Some("eid"))
      .select("eid", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // widths below, at, and far above the gap; width 1 = every row its
    // own bucket (all stitching through the directory), width 100000 =
    // one bucket (degenerates to the base plan)
    for (width <- Seq(1L, 7L, 40L, 64L, 1000L, 100000L)) {
      val skewed = EventAnalytics.sessionizeSkewed(events, "uid", "tus", gap,
          bucketWidth = width, ordCol = Some("eid"))
        .select("eid", "session_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(skewed == base,
        s"width=$width: diff=${(base -- skewed).take(3)} / ${(skewed -- base).take(3)}")
    }
  }

  test("sessionizeSkewed: hot key's main window runs per (key, bucket)") {
    import spark.implicits._
    val events = (1L to 200L).map(i => (i, 1L, i * 10L)).toDF("eid", "uid", "tus")
    val df = EventAnalytics.sessionizeSkewed(events, "uid", "tus",
      gapMicros = 25L, bucketWidth = 500L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(uid") && plan.contains("__b"),
      s"session window must partition by (key, bucket):\n$plan")
  }

  test("trailingWindowStatsSkewed == trailingWindowStats on a hot-key corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (1L to 500L).map { i =>
      val k = if (rnd.nextInt(10) < 9) 7L else rnd.nextInt(4).toLong
      (i, k, ts("2024-01-01 00:00:00").toInstant.plusSeconds(rnd.nextInt(86400 * 20).toLong))
    }
    val events = rows.map { case (i, k, t) =>
      (i, k, Timestamp.from(t), rnd.nextInt(1000) / 100.0)
    }.toDF("eid", "uid", "ts", "value")
    val win = 3L * 24 * 3600 * 1000000L
    val base = EventAnalytics.trailingWindowStats(events, "uid", "ts", "value", win)
      .select("eid", "win_n", "win_sum", "win_avg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    // bucket = the window span (the minimum legal width) and wider
    for (width <- Seq(win, 2 * win, 10 * win)) {
      val skewed = EventAnalytics.trailingWindowStatsSkewed(
          events, "uid", "ts", "value", win, bucketWidth = width)
        .select("eid", "win_n", "win_sum", "win_avg").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(skewed == base, s"width=$width: diff sample " +
        s"${(base -- skewed).take(2)} / ${(skewed -- base).take(2)}")
    }
    // a width smaller than the window span would silently truncate
    // frames — rejected
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.trailingWindowStatsSkewed(
        events, "uid", "ts", "value", win, bucketWidth = win - 1)
    }
    assert(e.getMessage.contains("cover"))
  }
}
