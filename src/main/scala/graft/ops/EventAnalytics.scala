package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-log analytics compositions (cohort retention, time-range
  * rolling aggregates) — the product-analytics shapes the reference's
  * users run over its `events`-style tables via plain SQL
  * (`lib/src/server/http/query.rs` routes arbitrary SELECTs); here
  * they are first-class operators with scale-shaped plans.
  */
object EventAnalytics {

  /** Classic cohort-retention triangle: users are assigned to the
    * cohort of their first event's `unit` (week/month/day), and each
    * (cohort, offset) cell counts the distinct users active that many
    * units later.
    *
    * Scale shape: both the cohort assignment (`groupBy(user).min(ts)`)
    * and the activity dedup (`distinct` over (user, unit)) partial-
    * aggregate map-side and shuffle on the user key, so the join that
    * follows reuses the same hash partitioning — one exchange
    * lineage, no re-shuffle (AQE folds the co-partitioned sides).
    * The final rollup's key space is tiny (cohorts × offsets), and its
    * `count(DISTINCT user)` input is already distinct per (user, unit)
    * — no expansion. Nothing touches the driver.
    *
    * Offsets divide exactly: both sides are truncated to the same unit
    * boundary, so the day difference is an exact multiple of the unit
    * length (weeks — months use `months_between`, exact on
    * boundaries).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      unit: String = "week"): DataFrame = {
    val cohorts = events.groupBy(col(userCol))
      .agg(date_trunc(unit, min(col(tsCol))).as("cohort_start"))
    val activity = events
      .select(col(userCol), date_trunc(unit, col(tsCol)).as("active_start"))
      .distinct()
    val offset: Column = unit match {
      case "week" =>
        (datediff(col("active_start"), col("cohort_start")) / 7).cast("long")
      case "day" =>
        datediff(col("active_start"), col("cohort_start")).cast("long")
      case "month" =>
        months_between(col("active_start"), col("cohort_start")).cast("long")
      case other =>
        throw new IllegalArgumentException(s"unsupported unit: $other")
    }
    activity.join(cohorts, userCol)
      .groupBy(col("cohort_start"), offset.as("offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Rolling aggregate over a TIME-RANGE frame (e.g. each event's
    * trailing-7-day sum/count/avg per user) — the RANGE BETWEEN
    * INTERVAL window shape. Spark's `rangeBetween` takes numeric
    * bounds, so the frame is ordered by the µs epoch — exactly the
    * interval arithmetic the SQL spelling implies.
    *
    * The sum accumulates DECIMAL(`precision`,`scale`), not double: a
    * sliding double sum is accumulation-order-specific per engine, a
    * decimal sum is exact — the avg is then ONE double division,
    * bit-identical everywhere. The default (20,2) holds |value| up to
    * 10^18 at cent resolution; a value overflowing the precision (or
    * carrying more fractional digits than `scale`) would be silently
    * nulled/rounded by the non-ANSI cast, so pick them to FIT the
    * data, not the fixture.
    *
    * The µs order key is materialized ONCE (`__ord`) and both window
    * aggregates order by that attribute, so Catalyst plans a single
    * exchange + a single sort; deriving `unix_micros(ts)` per
    * aggregate would plan two Window operators each with its own
    * partition-wide sort (caught reading the q65 plan dump).
    * Incremental frame state is O(window rows), never the partition.
    */
  def trailingWindowStats(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, windowMicros: Long,
      precision: Int = 20, scale: Int = 2): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    require(precision > scale && scale >= 0, "invalid decimal shape")
    // the helper/output names would silently clobber caller columns
    // (same contract assignToCentroidArrays documents for cell/sim)
    Seq("__ord", "win_n", "win_sum", "win_avg").foreach { c =>
      require(!events.columns.contains(c),
        s"trailingWindowStats: input must not already have a '$c' column")
    }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ord"))
      .rangeBetween(-windowMicros, 0)
    events
      .withColumn("__ord", unix_micros(col(tsCol)))
      // both aggregates in ONE projection: sequential withColumns
      // leave a Project between the Window ops, which blocks
      // Catalyst's CollapseWindow — two Window operators over the
      // same spec instead of one
      .select(col("*"),
        count(lit(1)).over(w).as("win_n"),
        sum(col(valCol).cast(DecimalType(precision, scale))).over(w)
          .cast("double").as("win_sum"))
      .withColumn("win_avg", col("win_sum") / col("win_n"))
      .drop("__ord")
  }
}
