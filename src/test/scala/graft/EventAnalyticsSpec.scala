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
}
