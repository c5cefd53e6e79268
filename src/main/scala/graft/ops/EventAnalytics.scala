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

  /** Batch sessionization: each row gains a `session_idx` — the
    * running count of >`gapMicros` idle gaps before it within its
    * key — so `groupBy(key, session_idx)` rolls events into sessions
    * (the q62 shape, and the batch twin of the streaming sessionizer).
    *
    * Timestamps must be INTEGRAL (epoch micros via `unix_micros`):
    * gap arithmetic is exact long subtraction, never interval/double.
    *
    * Scale shape: one exchange + sort on the key, two window passes
    * that CollapseWindow fuses over the shared sort. Skewed keys
    * serialize exactly like the as-of merge — one hot user puts its
    * whole history on one reducer; [[sessionizeSkewed]] is the
    * bucketed variant for that corpus.
    *
    * @param ordCol deterministic tie-break among rows sharing
    *               (key, ts) — required for a stable `session_idx`
    *               when timestamps can collide.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapMicros: Long, ordCol: Option[String] = None): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    requireIntegral(events, tsCol, "sessionize")
    Seq("__brk", "session_idx").foreach { c =>
      require(!events.columns.contains(c),
        s"sessionize: input must not already have a '$c' column")
    }
    val ord = ordCol.map(col).getOrElse(lit(0L))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, ord.asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__brk",
        when(col(tsCol) - lag(col(tsCol), 1).over(w) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__brk")).over(wRun))
      .drop("__brk")
  }

  /** Skew-resistant sessionization: [[sessionize]] semantics, row for
    * row, with each key's history PRE-SPLIT across coarse time buckets
    * — the [[TemporalJoins.asofJoinSkewed]] trick applied to the
    * session window, because a window (unlike a join) cannot be split
    * mid-partition by AQE and one hot user at 100 TB serializes a
    * reducer.
    *
    *  1. rows bucket by `floor(ts / bucketWidth)`; local breaks and a
    *     local running break count compute per (key, bucket) — the
    *     big exchange now has |active buckets| × more parallelism on
    *     the hot key;
    *  2. a per-(key, bucket) summary (first ts, last ts, local break
    *     total — ONE row per active bucket, index-sized) feeds a
    *     directory window per key: the bucket's boundary break is
    *     `first_ts − previous bucket's last_ts > gap`, and its offset
    *     is the prefix sum of earlier buckets' (breaks + boundary)
    *     plus its own boundary;
    *  3. offsets join back on (key, bucket) — the join reuses the
    *     bucketed partitioning — and `session_idx = offset + local`.
    *
    * Sessions whose gaps close inside a bucket never leave it; only
    * the boundary comparison crosses buckets, through the tiny
    * directory. Results are row-identical to [[sessionize]]
    * (EventAnalyticsSpec differential).
    */
  def sessionizeSkewed(events: DataFrame, keyCol: String, tsCol: String,
      gapMicros: Long, bucketWidth: Long,
      ordCol: Option[String] = None): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireIntegral(events, tsCol, "sessionizeSkewed")
    Seq("__b", "__brk", "__lidx", "__off", "session_idx").foreach { c =>
      require(!events.columns.contains(c),
        s"sessionizeSkewed: input must not already have a '$c' column")
    }
    val ord = ordCol.map(col).getOrElse(lit(0L))
    // exact long floor-bucket — floor(ts/w) in IEEE double mis-buckets
    // |ts| > 2^53 (the asofJoinSkewed discipline)
    val ev = events.withColumn("__b",
      expr(s"(`$tsCol` - pmod(`$tsCol`, ${bucketWidth}L)) div ${bucketWidth}L"))
    val wB = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(tsCol).asc, ord.asc)
    val local = ev
      .withColumn("__brk",
        when(col(tsCol) - lag(col(tsCol), 1).over(wB) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("__lidx", sum(col("__brk"))
        .over(wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val summ = local.groupBy(col(keyCol), col("__b"))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"),
        sum(col("__brk")).as("__breaks"))
    // directory window: one row per ACTIVE (key, bucket); lag(1) is
    // the previous active bucket, so empty buckets neither break nor
    // block a session spanning them
    val wDir = Window.partitionBy(col("__ok")).orderBy(col("__ob").asc_nulls_first)
    val offsets = summ
      .select(col(keyCol).as("__ok"), col("__b").as("__ob"),
        col("__first"), col("__last"), col("__breaks"))
      .withColumn("__bnd",
        when(col("__first") - lag(col("__last"), 1).over(wDir) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("__off",
        coalesce(sum(col("__breaks") + col("__bnd"))
          .over(wDir.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          + col("__bnd"))
      .select(col("__ok"), col("__ob"), col("__off"))
    // null-safe join keys: a null key (or a null-ts bucket) groups in
    // the window semantics of the base operator, so it must keep its
    // offset row here too, not drop out of an EqualTo join
    local
      .join(offsets,
        col(keyCol) <=> col("__ok") && col("__b") <=> col("__ob"))
      .withColumn("session_idx", col("__off") + col("__lidx"))
      .drop("__b", "__brk", "__lidx", "__ok", "__ob", "__off")
  }

  private def requireIntegral(df: DataFrame, c: String, op: String): Unit = {
    val integral = df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType |
        org.apache.spark.sql.types.IntegerType |
        org.apache.spark.sql.types.ShortType |
        org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    require(integral,
      s"$op needs an integral ts column (epoch micros); " +
        s"$c is ${df.schema(c).dataType.catalogString} — cast with unix_micros")
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

  /** Skew-resistant [[trailingWindowStats]]: identical output, but the
    * RANGE window runs per (key, time-bucket) instead of per key, so a
    * hot key's history spreads over |buckets| reducers.
    *
    * The trick differs from sessionization because a trailing frame
    * needs actual ROWS from the past, not a summary: with
    * `bucketWidth >= windowMicros` every row's frame reaches at most
    * one bucket back, so each row is written TWICE — once into its
    * home bucket, once as a "ghost" contributor into the next — and
    * the per-(key, bucket) window then sees exactly the rows any
    * frame in that bucket can touch. Only home rows emit; every
    * underlying event appears exactly once in any frame (its home
    * copy for same-bucket frames, its ghost copy for next-bucket
    * frames — never both, they live in different partitions).
    *
    * Cost: 2× the exchanged rows, buying |active buckets|×
    * parallelism on the hot key — the standard trade; use the base
    * operator until skew actually bites. The decimal-exact sum makes
    * the result bit-identical to [[trailingWindowStats]] regardless
    * of the changed accumulation grouping (spec differential).
    */
  def trailingWindowStatsSkewed(events: DataFrame, keyCol: String,
      tsCol: String, valCol: String, windowMicros: Long, bucketWidth: Long,
      precision: Int = 20, scale: Int = 2): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    require(bucketWidth >= windowMicros,
      "bucketWidth must cover windowMicros so a frame spans <= 2 buckets")
    require(precision > scale && scale >= 0, "invalid decimal shape")
    Seq("__ord", "__pb", "__home", "win_n", "win_sum", "win_avg").foreach { c =>
      require(!events.columns.contains(c),
        s"trailingWindowStatsSkewed: input must not already have a '$c' column")
    }
    val ev = events.withColumn("__ord", unix_micros(col(tsCol)))
    val home = ev
      .withColumn("__home", lit(1))
      .withColumn("__pb",
        expr(s"(__ord - pmod(__ord, ${bucketWidth}L)) div ${bucketWidth}L"))
    val ghost = home
      .withColumn("__home", lit(0))
      .withColumn("__pb", col("__pb") + 1)
    val w = Window.partitionBy(col(keyCol), col("__pb"))
      .orderBy(col("__ord"))
      .rangeBetween(-windowMicros, 0)
    home.unionByName(ghost)
      .select(col("*"),
        count(lit(1)).over(w).as("win_n"),
        sum(col(valCol).cast(DecimalType(precision, scale))).over(w)
          .cast("double").as("win_sum"))
      .where(col("__home") === 1)
      .withColumn("win_avg", col("win_sum") / col("win_n"))
      .drop("__ord", "__pb", "__home")
  }
}
