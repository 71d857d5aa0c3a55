package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over an event stream: date-spine gap-fill, staged
  * funnel conversion, and cohort retention. The reference's analytics stage
  * stops at a single top-k aggregate (airflow.py:655-662); these are the
  * calendar-aware operators the same warehouse needs next (the schedule
  * feed is a day-grained timetable — airflow.py:160-163 `dayorder`/
  * `starttime`/`endtime` — so day-spine semantics are native to its domain).
  *
  * 100 TB posture (SURVEY §5): every operator here reduces the raw stream
  * to a DIMENSION-sized frame (days × series, funnel stages, cohort weeks)
  * with ordinary partial-agg groupBys BEFORE any window/join runs. The only
  * windows are over those post-agg frames (≤ tens of thousands of rows for
  * decades of days), never over the event data itself.
  */
object TimeSeries {

  /** Full day spine over [min(dateCol), max(dateCol)] of `bounds` — one
    * row per calendar day, generated (sequence+explode), never stored.
    * `bounds` is typically the UNFILTERED stream so a sparse filtered
    * series gap-fills against real activity bounds. */
  def dateSpine(bounds: DataFrame, dateCol: Column): DataFrame =
    bounds.agg(min(dateCol).as("mn"), max(dateCol).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("day"))

  /** Left-join a (day, ...) daily aggregate onto the spine, zero-fill the
    * count column, and forward-fill `fillCol` with the last non-null value
    * in day order. The forward-fill window is a single partition BY
    * CONSTRUCTION over the dimension-sized spine — days, not data (a
    * century is ~36k rows); the data-sized work all happened in the
    * upstream partial agg. */
  def gapFill(spine: DataFrame, daily: DataFrame, countCol: String,
              fillCol: String): DataFrame = {
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col(countCol), lit(0L)).as(countCol),
        coalesce(last(col(fillCol), ignoreNulls = true).over(w), lit(0.0)).as(fillCol))
  }

  /** Linear interpolation over the spine: known (day, value) points stay,
    * interior gaps take the straight line between the surrounding known
    * points, and edge gaps extend the nearest known value. Same
    * dimension-sized single-partition window argument as [[gapFill]] —
    * the spine is days, not data. One forward and one backward
    * ignore-nulls window pass; the interpolation itself is one
    * projection with a single division (deterministic across engines). */
  def interpFill(spine: DataFrame, daily: DataFrame, valueCol: String): DataFrame = {
    val wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.orderBy("day").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    spine.join(daily, Seq("day"), "left")
      .withColumn("__i", datediff(col("day"), lit("1970-01-01").cast("date")).cast("double"))
      .withColumn("__pv", last(v, ignoreNulls = true).over(wp))
      .withColumn("__pi", last(when(v.isNotNull, col("__i")), ignoreNulls = true).over(wp))
      .withColumn("__nv", first(v, ignoreNulls = true).over(wn))
      .withColumn("__ni", first(when(v.isNotNull, col("__i")), ignoreNulls = true).over(wn))
      .select(col("day"),
        when(v.isNotNull, v)
          .when(col("__pv").isNull, col("__nv"))
          .when(col("__nv").isNull, col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (col("__i") - col("__pi")) / (col("__ni") - col("__pi")))
          .as(valueCol))
  }

  /** Ordered-stage funnel with a conversion window: stage k counts users
    * whose earliest stage-k event falls strictly after — and within
    * `withinHours` of — their earliest qualifying stage-(k-1) event.
    * One groupBy(user) per stage plus one same-key join — all shuffles are
    * on the user key (AQE-coalesced), and each stage's frame only shrinks.
    * Returns (stage, stage_idx, users). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String], withinHours: Int): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(withinHours > 0, "withinHours must be positive")
    // Earliest stage-0 event per user.
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(tsCol).as("t"))
    var out = Seq((stages.head, 0, reached))
    for ((st, i) <- stages.zipWithIndex.drop(1)) {
      val prev = reached.withColumnRenamed("t", "t_prev")
      reached = events.filter(col(typeCol) === st)
        .join(prev, userCol)
        .filter(col(tsCol) > col("t_prev") &&
          col(tsCol) <= col("t_prev") + expr(s"INTERVAL $withinHours HOUR"))
        .groupBy(userCol).agg(min(tsCol).as("t"))
      out = out :+ ((st, i, reached))
    }
    out.map { case (st, i, df) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(st).as("stage"), lit(i.toLong).as("stage_idx"), col("users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by the Monday-truncated week of their
    * first event; for each (cohort_week, week_offset), the distinct users
    * active that week and their share of the cohort.
    *
    * ONE fact-sized shuffle total. The naive form pays three (a
    * first-seen groupBy AND an activity distinct, then re-shuffles to
    * join them); all collapse because week-trunc commutes with min —
    * `trunc_week(min(day)) = min(trunc_week(day))` (the earliest day
    * lies inside the earliest active week) — so the cohort is derivable
    * from each user's distinct active-week SET alone. That set is
    * calendar-bounded (≤ weeks in the data's time span, independent of
    * event volume), so one user-keyed collect_set aggregation replaces
    * distinct + per-user window: the map-side partial set dedups like
    * partial-distinct would, the single exchange moves set-sized
    * payloads, and cohort = array_min of the set with week offsets
    * exploded from it — no second user-key exchange, no window sort
    * (r14: the window's re-shuffle + sort was 2 of q_retention's 4
    * exchanges at sf1). Cohort size needs no separate user-level agg
    * either: every user is active in their own cohort week by
    * construction, so `cohort_users` IS the week_n=0 active count — a
    * dim-sized self-lookup, broadcast. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    // The only fact-sized stage: map-side partial collect_set (dedups
    // like partial-distinct), one user-keyed shuffle of week-set rows.
    // Null timestamps are filtered EXPLICITLY (r15 ADVICE): collect_set
    // silently drops nulls, so a user whose every event has a null ts
    // would vanish here while a window/distinct form (and the oracle's
    // DISTINCT) would emit a null-cohort group — the equivalence must
    // not depend on the generator never producing null ts.
    val weekSets = events.filter(col(tsCol).isNotNull)
      .select(col(userCol), to_date(date_trunc("week", day)).as("wk"))
      .groupBy(col(userCol)).agg(collect_set(col("wk")).as("wks"))
    // users × active-weeks after the explode (weeks-per-user is
    // calendar-bounded); the (cohort, week_n) agg exchange is tiny.
    val counts = weekSets
      .select(array_min(col("wks")).as("cohort"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort"), (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_n"))
      .agg(count(lit(1)).as("active_users"))
    val cohortSize = counts.filter(col("week_n") === 0L)
      .select(col("cohort"), col("active_users").as("cohort_users"))
    counts.join(broadcast(cohortSize), "cohort")
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_n"), col("active_users"),
        (col("active_users").cast("double") / col("cohort_users")).as("retention"))
      .orderBy("cohort_week", "week_n")
  }
}
