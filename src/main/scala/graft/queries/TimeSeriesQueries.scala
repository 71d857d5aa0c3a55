package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries
import graft.sources.Tables

/** SURVEY §2 group B (time-series rows) — calendar-aware analytics over the
  * `events` stream: date-spine gap-fill, windowed funnel conversion, cohort
  * retention, and a gap-robust trailing moving average.
  *
  * Scale shape shared by all four (SURVEY §5): the raw stream reduces to a
  * DIMENSION-sized frame first (days × types, funnel stages, cohort weeks)
  * via ordinary partial-agg groupBys; windows/joins only ever run over
  * those post-agg frames. Determinism (SURVEY §4): day arithmetic is
  * integer, value sums go through DECIMAL, each ratio is one double
  * division, temporal outputs are formatted strings.
  */
object TimeSeriesQueries {

  val all: Seq[QueryDef] = Seq(

    // B21 — date-spine gap-fill: a sparse daily series (big-ticket
    // purchases) joined onto the full activity-day spine; missing days get
    // count 0 and carry the last seen daily total forward. The spine is
    // GENERATED (sequence+explode over one min/max row), never stored; the
    // forward-fill window runs over the spine (30 rows here, ~36k for a
    // century) — days, not data.
    QueryDef.sql("q_date_spine_fill",
      """WITH bounds AS (SELECT CAST(min(ts) AS DATE) mn, CAST(max(ts) AS DATE) mx FROM events),
        |spine AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        |  FROM events WHERE event_type = 'purchase' AND value > 195 GROUP BY 1)
        |SELECT strftime(s.day, '%Y-%m-%d') AS day,
        |  coalesce(d.n_events, 0) AS n_events,
        |  coalesce(last_value(d.day_value IGNORE NULLS)
        |    OVER (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS day_value
        |FROM spine s LEFT JOIN daily d ON s.day = d.day
        |ORDER BY day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val daily = ev
        .filter(col("event_type") === "purchase" && col("value") > 195)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("day_value"))
      val spine = TimeSeries.dateSpine(ev, to_date(col("ts")))
      TimeSeries.gapFill(spine, daily, "n_events", "day_value")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_events"), col("day_value"))
        .orderBy("day")
    },

    // B49 — linear interpolation over the date spine (the gap-fill B21
    // forward-fills; interpolation is the other standard reconstruction —
    // metering/finance series where a flat carry-forward biases sums).
    // Sparse input: high-value purchase days only. Interior gaps take the
    // line between surrounding known days, edges extend the nearest known
    // value. Same scale shape as B21: all data-sized work is the upstream
    // partial agg; the windows run over the dimension-sized spine.
    QueryDef.sql("q_interp_fill",
      """WITH bounds AS (SELECT CAST(min(ts) AS DATE) mn, CAST(max(ts) AS DATE) mx FROM events),
        |spine AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        |  FROM events WHERE event_type = 'purchase' AND value > 195 GROUP BY 1),
        |j AS (SELECT s.day, d.day_value AS v,
        |        CAST(datediff('day', DATE '1970-01-01', s.day) AS DOUBLE) AS i
        |      FROM spine s LEFT JOIN daily d ON s.day = d.day),
        |f AS (SELECT day, v, i,
        |        last_value(v IGNORE NULLS) OVER wp AS pv,
        |        last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER wp AS pi,
        |        first_value(v IGNORE NULLS) OVER wn AS nv,
        |        first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER wn AS ni
        |      FROM j
        |      WINDOW wp AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wn AS (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (i - pi) / (ni - pi) END AS day_value
        |FROM f ORDER BY day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val daily = ev
        .filter(col("event_type") === "purchase" && col("value") > 195)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("day_value"))
      val spine = TimeSeries.dateSpine(ev, to_date(col("ts")))
      TimeSeries.interpFill(spine, daily, "day_value")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_value"))
        .orderBy("day")
    },

    // B22 — windowed funnel: view → click (≤12 h after first view) →
    // purchase (≤12 h after that click). Each stage is one user-keyed
    // groupBy + one same-key join; the reached set only shrinks stage
    // over stage, so the heaviest shuffle is the first.
    QueryDef.sql("q_funnel",
      """WITH s0 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type='view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s0 ON e.user_id=s0.user_id
        |       AND e.ts > s0.t AND e.ts <= s0.t + INTERVAL 12 HOUR
        |       WHERE e.event_type='click' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id=s1.user_id
        |       AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 12 HOUR
        |       WHERE e.event_type='purchase' GROUP BY 1)
        |SELECT 'view' AS stage, CAST(0 AS BIGINT) AS stage_idx, count(*) AS users FROM s0
        |UNION ALL SELECT 'click', CAST(1 AS BIGINT), count(*) FROM s1
        |UNION ALL SELECT 'purchase', CAST(2 AS BIGINT), count(*) FROM s2
        |ORDER BY stage_idx""".stripMargin) { (s, d) =>
      TimeSeries.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), withinHours = 12)
        .orderBy("stage_idx")
    },

    // B23 — cohort retention: users bucketed by the Monday week of their
    // first event; per (cohort, week offset) the distinct active users and
    // their share of the cohort. Monday truncation and day/7 offsets are
    // integer-deterministic in both engines.
    QueryDef.sql("q_retention",
      """WITH fs AS (SELECT user_id, CAST(date_trunc('week', min(CAST(ts AS DATE))) AS DATE) AS cohort
        |            FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
        |        FROM events WHERE ts IS NOT NULL),
        |cs AS (SELECT cohort, count(*) AS cohort_users FROM fs GROUP BY 1)
        |SELECT cohort_week, week_n, count(*) AS active_users,
        |  CAST(count(*) AS DOUBLE)/any_value(cohort_users) AS retention FROM (
        |  SELECT act.user_id, strftime(fs.cohort,'%Y-%m-%d') AS cohort_week,
        |     CAST(datediff('day', fs.cohort, act.wk) // 7 AS BIGINT) AS week_n, cs.cohort_users
        |  FROM act JOIN fs USING(user_id) JOIN cs ON fs.cohort=cs.cohort) t
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin) { (s, d) =>
      TimeSeries.retention(Tables.events(s, d), "user_id", "ts")
    },

    // B56 — lag-feature generation (the supervised-learning feature
    // table every forecasting pipeline starts from): per (type, day) the
    // daily total with calendar-aware lag-1 / lag-7 values and the
    // week-over-week delta. CALENDAR-aware: a lag is NULL unless the
    // row exactly lag days back is that many calendar days back — row
    // offsets over a gappy series would silently shift features (B24's
    // RANGE-frame discipline applied to lags). Windows over the daily
    // aggregate only.
    QueryDef.sql("q_lag_features",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2, 3),
        |l AS (SELECT event_type, day, di, x,
        |        lag(x, 1) OVER w AS p1, lag(di, 1) OVER w AS d1,
        |        lag(x, 7) OVER w AS p7, lag(di, 7) OVER w AS d7
        |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
        |  CASE WHEN di - d1 = 1 THEN p1 END AS lag1,
        |  CASE WHEN di - d7 = 7 THEN p7 END AS lag7,
        |  CASE WHEN di - d7 = 7 THEN x - p7 END AS wow_delta
        |FROM l ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x"))
        .withColumn("di",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("p1", lag("x", 1).over(w)).withColumn("d1", lag("di", 1).over(w))
        .withColumn("p7", lag("x", 7).over(w)).withColumn("d7", lag("di", 7).over(w))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"), col("x"),
          when(col("di") - col("d1") === 1, col("p1")).as("lag1"),
          when(col("di") - col("d7") === 7, col("p7")).as("lag7"),
          when(col("di") - col("d7") === 7, col("x") - col("p7")).as("wow_delta"))
        .orderBy("event_type", "day")
    },

    // B55 — weekly-seasonality strength per event type: the share of
    // daily-total variance explained by day-of-week means,
    // R² = 1 − SS_resid/SS_total (the ANOVA form of "how weekly is this
    // series" — B44 profiles counts by dow; this quantifies the VALUE
    // seasonality as one number). Daily totals are exact DECIMAL; the
    // squared deviations are ~30-term double sums per type, far inside
    // the 9-digit gate. All frames dimension-sized.
    QueryDef.sql("q_seasonality_strength",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2, 3),
        |gm AS (SELECT event_type, count(*) AS n_days,
        |         list_reduce(list(x ORDER BY day), (a, b) -> a + b) / count(*) AS mu
        |       FROM daily GROUP BY 1),
        |dm AS (SELECT event_type, dow,
        |         list_reduce(list(x ORDER BY day), (a, b) -> a + b) / count(*) AS dmu
        |       FROM daily GROUP BY 1, 2),
        |ss AS (SELECT d.event_type,
        |         list_reduce(list((d.x - gm.mu) * (d.x - gm.mu) ORDER BY d.day), (a, b) -> a + b) AS ss_total,
        |         list_reduce(list((d.x - dm.dmu) * (d.x - dm.dmu) ORDER BY d.day), (a, b) -> a + b) AS ss_resid
        |       FROM daily d JOIN gm USING (event_type)
        |                    JOIN dm ON d.event_type = dm.event_type AND d.dow = dm.dow
        |       GROUP BY 1)
        |SELECT ss.event_type, gm.n_days,
        |  1.0 - ss.ss_resid / ss.ss_total AS r2_dow
        |FROM ss JOIN gm USING (event_type) ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"),
          dayofweek(to_date(col("ts"))).as("dow0"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x"))
        // ISO dow (Mon=1..Sun=7) from Spark's Sun=1..Sat=7
        .withColumn("dow", ((col("dow0") + 5) % 7 + 1).cast("long"))
      // all day-level double sums pinned by day (round-10 rule)
      def pinned(v: String) =
        expr(s"aggregate(array_sort(collect_list(named_struct('day', day, 'v', $v))), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x.v)")
      val gm = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), (pinned("x") / count(lit(1))).as("mu"))
      val dm = daily.groupBy("event_type", "dow")
        .agg((pinned("x") / count(lit(1))).as("dmu"))
      val ss = daily.join(broadcast(gm), "event_type")
        .join(broadcast(dm), Seq("event_type", "dow"))
        .groupBy("event_type")
        .agg(pinned("(x - mu) * (x - mu)").as("ss_total"),
          pinned("(x - dmu) * (x - dmu)").as("ss_resid"))
      ss.join(broadcast(gm.select("event_type", "n_days")), "event_type")
        .select(col("event_type"), col("n_days"),
          (lit(1.0) - col("ss_resid") / col("ss_total")).as("r2_dow"))
        .orderBy("event_type")
    },

    // B54 — CUSUM changepoint detection per event type: the day where
    // the cumulative deviation from the series mean peaks — the classic
    // level-shift locator. Order-free formulation: cusum_d =
    // CAST(running DECIMAL sum AS DOUBLE) − idx·μ (exact prefix sums, one
    // multiply-subtract per day — no running double accumulation to
    // drift), argmax |cusum| with earliest-day tie-break. Windows run
    // over the dimension-sized daily aggregate (B24's discipline).
    QueryDef.sql("q_changepoint_cusum",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*) AS n_days,
        |         CAST(sum(total) AS DOUBLE) / count(*) AS mu
        |       FROM daily GROUP BY 1),
        |cu AS (SELECT d.event_type, d.day,
        |         CAST(sum(d.total) OVER (PARTITION BY d.event_type ORDER BY d.day
        |                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |           - (row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)) * st.mu
        |           AS cusum,
        |         st.n_days
        |       FROM daily d JOIN st USING (event_type)),
        |rk AS (SELECT event_type, day, cusum, n_days,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY abs(cusum) DESC, day) AS rn
        |       FROM cu)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day,
        |  abs(cusum) AS max_abs_cusum, CAST(n_days AS BIGINT) AS n_days
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      val st = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          (sum("total").cast("double") / count(lit(1))).as("mu"))
      val wd = Window.partitionBy("event_type").orderBy("day")
      val cu = daily.join(broadcast(st), "event_type")
        .select(col("event_type"), col("day"), col("n_days"),
          (sum("total").over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") - row_number().over(wd) * col("mu")).as("cusum"))
      val wr = Window.partitionBy("event_type").orderBy(abs(col("cusum")).desc, col("day"))
      cu.withColumn("rn", row_number().over(wr))
        .filter(col("rn") === 1)
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("cp_day"),
          abs(col("cusum")).as("max_abs_cusum"), col("n_days"))
        .orderBy("event_type")
    },

    // B52 — cohort LTV curves: cumulative purchase revenue per cohort
    // user by weeks-since-signup (the revenue twin of B23's retention
    // matrix — "how much has the average week-X signup spent by week
    // X+n"). All data-scale work is two user-keyed aggs; the cumulative
    // window runs over the cohort×week matrix (bounded). The running sum
    // stays DECIMAL until the single closing division by cohort size.
    QueryDef.sql("q_cohort_ltv",
      """WITH fs AS (SELECT user_id, CAST(date_trunc('week', min(CAST(ts AS DATE))) AS DATE) AS cohort
        |            FROM events GROUP BY 1),
        |cs AS (SELECT cohort, count(*) AS cohort_users FROM fs GROUP BY 1),
        |pur AS (SELECT user_id, CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
        |               sum(CAST(value AS DECIMAL(18,2))) AS rev
        |        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |wkrev AS (SELECT fs.cohort,
        |            CAST(datediff('day', fs.cohort, pur.wk) // 7 AS BIGINT) AS week_n,
        |            sum(pur.rev) AS rev
        |          FROM pur JOIN fs USING (user_id) GROUP BY 1, 2)
        |SELECT strftime(w.cohort, '%Y-%m-%d') AS cohort_week, week_n,
        |  CAST(CAST(sum(rev) OVER (PARTITION BY w.cohort ORDER BY week_n
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |       / cs.cohort_users AS DOUBLE) AS ltv_per_user
        |FROM wkrev w JOIN cs ON w.cohort = cs.cohort
        |ORDER BY cohort_week, week_n""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val fs = ev.groupBy("user_id")
        .agg(date_trunc("week", min(to_date(col("ts")))).cast("date").as("cohort"))
      val cs = fs.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
      val pur = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("week", to_date(col("ts"))).cast("date").as("wk"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      val wkrev = pur.join(fs, "user_id")
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_n"))
        .agg(sum("rev").as("rev"))
      val w = Window.partitionBy("cohort").orderBy("week_n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      wkrev.join(broadcast(cs), "cohort")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("week_n"),
          (sum(col("rev")).over(w).cast("double") / col("cohort_users"))
            .cast("double").as("ltv_per_user"))
        .orderBy("cohort_week", "week_n")
    },

    // B24 — 7-day trailing moving average of daily value per event type.
    // RANGE frame over the integer day index, so calendar gaps shrink the
    // frame instead of silently stretching it (the ROWS-frame bug). The
    // window runs over the daily aggregate (days × types — bounded), and
    // the frame sum stays DECIMAL until the single closing division.
    QueryDef.sql("q_moving_avg",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
        |         sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events GROUP BY 1,2,3)
        |SELECT event_type, strftime(day,'%Y-%m-%d') AS day,
        |  CAST(CAST(sum(total) OVER w AS DOUBLE) / count(*) OVER w AS DOUBLE) AS ma7,
        |  CAST(total AS DOUBLE) AS day_total
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("sum(CAST(value AS DECIMAL(18,2)))").as("total"))
        .withColumn("day_idx", datediff(col("day"), lit("1970-01-01").cast("date")))
      val w = Window.partitionBy("event_type").orderBy("day_idx").rangeBetween(-6, 0)
      daily.select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          (sum("total").over(w).cast("double") / count(lit(1)).over(w))
            .cast("double").as("ma7"),
          col("total").cast("double").as("day_total"))
        .orderBy("event_type", "day")
    },

    // B31 — trailing 7-day active users (WAU) per day: each distinct
    // (user, day) credits the 7 target days it stays "active" for —
    // explode-and-count replaces a sliding DISTINCT window (which Spark
    // can't express and nobody can merge). The explode is a narrow ×7 on
    // id-sized rows; the count_distinct shuffles (day, user) pairs once.
    // At 100 TB the same query with approx_count_distinct is the
    // mergeable-sketch scale path (the A13/A18x ladder).
    QueryDef.sql("q_rolling_wau",
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |mx AS (SELECT max(day) AS mx FROM ud),
        |x AS (SELECT user_id, CAST(unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS tday FROM ud)
        |SELECT strftime(tday, '%Y-%m-%d') AS day, count(DISTINCT user_id) AS wau
        |FROM x, mx WHERE tday <= mx GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val mx = ud.agg(max("day").as("mx"))
      ud.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("tday"))
        .crossJoin(broadcast(mx))
        .filter(col("tday") <= col("mx"))
        .groupBy(date_format(col("tday"), "yyyy-MM-dd").as("day"))
        .agg(count_distinct(col("user_id")).as("wau"))
        .orderBy("day")
    },

    // B32 — last-touch attribution: each purchase is credited to the
    // user's most recent preceding non-purchase event type. One carry
    // window per user (the B6 sessionize shape — bounded per-partition
    // state), then a k-key aggregate; purchases with no prior touch
    // report as 'none' instead of silently dropping.
    QueryDef.sql("q_attribution",
      """WITH s AS (SELECT user_id, ts, event_type,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
        |  FROM events)
        |SELECT coalesce(channel, 'none') AS channel, count(*) AS purchases FROM s
        |WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("event_type"),
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w).as("channel"))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("purchases"))
        .orderBy("channel")
    },

    // B29 — Markov transition matrix of the event stream: P(next type |
    // type) per user-ordered step. The lag/lead window is partitioned by
    // user (bounded per-partition state at any scale — same shape as
    // B4/B6); the matrix itself is a k²-row aggregate. Row-normalizing
    // totals derive FROM the pair counts (no second pass over events).
    QueryDef.sql("q_transition_matrix",
      """WITH seq AS (SELECT user_id, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM events),
        |p AS (SELECT event_type AS src, next_type AS dst, count(*) AS n FROM seq
        |      WHERE next_type IS NOT NULL GROUP BY 1,2),
        |t AS (SELECT src, sum(n) AS tot FROM p GROUP BY 1)
        |SELECT p.src, p.dst, p.n, CAST(p.n AS DOUBLE)/t.tot AS prob
        |FROM p JOIN t USING (src) ORDER BY src, dst""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val p = Tables.events(s, d)
        .select(col("event_type").as("src"), lead("event_type", 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      val t = p.groupBy("src").agg(sum("n").as("tot"))
      p.join(broadcast(t), "src")
        .select(col("src"), col("dst"), col("n"),
          (col("n").cast("double") / col("tot")).as("prob"))
        .orderBy("src", "dst")
    },

    // B36 — exponentially weighted moving average (half-life smoothing) of
    // daily value per event type. The weight depends on the CURRENT row's
    // day (w = 0.5^(day_now - day_then)), which a window frame sum cannot
    // express — so the trailing 14-day frame is an explicit self-join of
    // the DAILY aggregate (days × types — dimension-sized; the ×14 fan-out
    // never touches raw events). α = 0.5 makes every weight an exact power
    // of two, so the weighted sums differ only by addition order (≪ the
    // 9-sig-digit compare).
    QueryDef.sql("q_ewma",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM events GROUP BY 1,2,3),
        |pairs AS (
        |  SELECT a.event_type, a.day, a.total, b.day_idx AS b_idx, b.total AS b_total,
        |    1.0 / CAST((1 << CAST(a.day_idx - b.day_idx AS INTEGER)) AS DOUBLE) AS den
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type
        |   AND b.day_idx BETWEEN a.day_idx - 13 AND a.day_idx),
        |p2 AS (SELECT event_type, day, total, b_idx, b_total * den AS num, den FROM pairs)
        |SELECT event_type, strftime(day,'%Y-%m-%d') AS day,
        |  total AS day_total,
        |  list_reduce(list(num ORDER BY b_idx), (a, b) -> a + b)
        |    / list_reduce(list(den ORDER BY b_idx), (a, b) -> a + b) AS ewma
        |FROM p2 GROUP BY event_type, day, total ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("total"))
        .withColumn("day_idx", datediff(col("day"), lit("1970-01-01").cast("date")))
      val b = daily.select(col("event_type").as("b_type"),
        col("day_idx").as("b_idx"), col("total").as("b_total"))
      // EWMA weights as EXACT powers of two (1 / (1 << k)) instead of
      // libm pow(0.5, k), and the window sums pinned by source-day —
      // both engines now agree bit-for-bit on any host (round 10).
      def pinned(v: String) =
        expr(s"aggregate(array_sort(collect_list(named_struct('b_idx', b_idx, 'v', $v))), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x.v)")
      daily.join(b, col("event_type") === col("b_type") &&
          col("b_idx").between(col("day_idx") - 13, col("day_idx")))
        .withColumn("den",
          lit(1.0) / expr("CAST(shiftleft(1, CAST(day_idx - b_idx AS INT)) AS DOUBLE)"))
        .withColumn("num", col("b_total") * col("den"))
        .groupBy(col("event_type"), col("day"), col("total"))
        .agg((pinned("num") / pinned("den")).as("ewma"))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("total").as("day_total"), col("ewma"))
        .orderBy("event_type", "day")
    },

    // B37 — distribution position of each day within its type: percent_rank
    // and cume_dist of the daily total. Both are pure rank arithmetic over
    // the ORDER BY key, so ties land identically on any engine; the window
    // runs over the daily aggregate (days × types), never over events.
    QueryDef.sql("q_percent_rank",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM events GROUP BY 1,2)
        |SELECT event_type, strftime(day,'%Y-%m-%d') AS day, total AS day_total,
        |  percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume
        |FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY total)
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("total")
      Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("total"))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("total").as("day_total"),
          percent_rank().over(w).as("pct_rank"), cume_dist().over(w).as("cume"))
        .orderBy("event_type", "day")
    },

    // B38 — rolling z-score anomaly flags: days whose total deviates more
    // than 2σ from the SAME type's trailing 28-day window (current day
    // excluded — the day under test must not shift its own baseline).
    // Frame sums stay DECIMAL (exact, order-free); mean/std/z are derived
    // from those exact sums by one identical closed form per engine. The
    // RANGE frame runs over the day index of the daily aggregate — B24's
    // calendar-aware bounded-frame shape, dimension-sized at any scale.
    QueryDef.sql("q_anomaly_zscore",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
        |         sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events GROUP BY 1,2,3),
        |st AS (
        |  SELECT event_type, day, CAST(total AS DOUBLE) AS day_total,
        |    count(*) OVER w AS n,
        |    CAST(CAST(sum(total) OVER w AS VARCHAR) AS DOUBLE) AS s,
        |    CAST(CAST(sum(total*total) OVER w AS VARCHAR) AS DOUBLE) AS sq
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
        |               RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, strftime(day,'%Y-%m-%d') AS day, day_total,
        |  (day_total - s/n) / sqrt((sq - s*s/n)/(n-1)) AS z
        |FROM st
        |WHERE n >= 7 AND abs((day_total - s/n) / sqrt((sq - s*s/n)/(n-1))) > 2
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("day_idx").rangeBetween(-28, -1)
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("sum(CAST(value AS DECIMAL(18,2)))").as("total"))
        .withColumn("day_idx", datediff(col("day"), lit("1970-01-01").cast("date")))
      val st = daily.select(col("event_type"), col("day"),
        col("total").cast("double").as("day_total"),
        count(lit(1)).over(w).as("n"),
        sum("total").over(w).cast("double").as("s"),
        sum(col("total") * col("total")).over(w).cast("double").as("sq"))
      val z = (col("day_total") - col("s") / col("n")) /
        sqrt((col("sq") - col("s") * col("s") / col("n")) / (col("n") - 1))
      st.filter(col("n") >= 7 && abs(z) > 2)
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("day_total"), z.as("z"))
        .orderBy("event_type", "day")
    },

    // B43 — lag-7 autocorrelation of the daily totals per event type (the
    // weekly-seasonality detector: ρ₇ near 1 = strong weekly cycle).
    // The series self-joins at exactly lag 7 on the integer day index
    // (calendar-aware — gaps drop pairs rather than shifting them), and
    // the correlation is B19's exact-DECIMAL co-moment closed form over
    // the paired values. Everything runs on the dimension-sized daily
    // frame.
    QueryDef.sql("q_autocorr",
      """WITH daily AS (
        |  SELECT event_type, datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
        |         sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events GROUP BY 1,2),
        |p AS (SELECT a.event_type, a.total AS x, b.total AS y
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND b.day_idx = a.day_idx + 7),
        |s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        |      FROM p GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS acf7
        |FROM s ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("day_idx"))
        .agg(expr("sum(CAST(value AS DECIMAL(18,2)))").as("total"))
      val b = daily.select(col("event_type").as("b_type"),
        col("day_idx").as("b_idx"), col("total").as("y"))
      val p = daily.join(b, col("event_type") === col("b_type") &&
          col("b_idx") === col("day_idx") + 7)
        .select(col("event_type"), col("total").as("x"), col("y"))
      val st = p.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      st.select(col("event_type"), col("n").cast("long").as("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))).as("acf7"))
        .orderBy("event_type")
    },

    // B44 — day-of-week activity profile: per (type, ISO dow) event count,
    // share of the type's total, and the chi-square contribution vs a
    // uniform-day null — the calendar-seasonality audit B43 quantifies at
    // lag 7, broken out by weekday. Integer dow arithmetic both engines;
    // shares and chi-square terms are single divisions of exact counts
    // over the k×7-row aggregate.
    QueryDef.sql("q_dow_profile",
      """WITH c AS (SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow, count(*) AS n
        |           FROM events GROUP BY 1,2),
        |t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.event_type, dow, CAST(n AS BIGINT) AS n,
        |  CAST(n AS DOUBLE) / tot AS share,
        |  pow(CAST(n AS DOUBLE) - tot / 7.0, 2) / (tot / 7.0) AS chi2_term
        |FROM c JOIN t ON c.event_type = t.event_type
        |ORDER BY c.event_type, dow""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("event_type"), dayofweek(col("ts")).as("sundow"))
        .agg(count(lit(1)).as("n"))
        // Spark dayofweek is 1=Sunday; ISO dow is 1=Monday
        .select(col("event_type"),
          (((col("sundow") + 5) % 7) + 1).cast("long").as("dow"), col("n"))
      val t = c.groupBy("event_type").agg(sum("n").as("tot"))
      c.join(broadcast(t), "event_type")
        .select(col("event_type"), col("dow"), col("n").cast("long").as("n"),
          (col("n").cast("double") / col("tot")).as("share"),
          (pow(col("n").cast("double") - col("tot") / 7.0, 2) / (col("tot") / 7.0))
            .as("chi2_term"))
        .orderBy("event_type", "dow")
    },

    // B30 — top event paths: the 10 most frequent 3-step event-type
    // sequences (path analysis / session n-grams). Two leads over the
    // same user-partitioned window (ONE window spec ⇒ one sort), then a
    // bounded k³-key aggregate and a deterministic top-k.
    QueryDef.sql("q_top_paths",
      """WITH seq AS (SELECT event_type AS e1,
        |  lead(event_type,1) OVER w AS e2, lead(event_type,2) OVER w AS e3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n FROM seq
        |WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      graft.operators.Relational.topKByAgg(
        Tables.events(s, d)
          .select(col("event_type").as("e1"),
            lead("event_type", 1).over(w).as("e2"),
            lead("event_type", 2).over(w).as("e3"))
          .filter(col("e3").isNotNull)
          .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n")),
        10, Seq(col("n").desc, col("path")))
    },

    // B62 — gaps & islands: per-user consecutive-active-day streaks (the
    // engagement-streak / uptime-run operator). The classic epochday −
    // row_number island key: constant within a run of consecutive days,
    // strictly decreasing across a gap. Both windows partition BY USER —
    // hash-distributed, no global sort anywhere; the data-scale input
    // reduces to distinct (user, day) first, so the window runs over
    // active-days, not raw events. Integer arithmetic end to end.
    QueryDef.sql("q_streaks",
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (SELECT user_id,
        |        datediff('day', DATE '1970-01-01', day)
        |          - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM days),
        |st AS (SELECT user_id, grp, count(*) AS len FROM r GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak,
        |  count(*) AS n_streaks, CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM st GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("day")
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val r = days.select(col("user_id"),
        (datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
          - row_number().over(w)).as("grp"))
      r.groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max("len").as("longest_streak"),
          count(lit(1)).as("n_streaks"),
          sum("len").cast("long").as("n_active_days"))
        .orderBy("user_id")
    },

    // B63 — seasonal-naive forecast backtest: forecast(day) =
    // revenue(day − 7 days), scored over every day with a calendar match
    // (a JOIN on day−7, not a row-offset lag — B56's gappy-series
    // discipline). Error metrics are chosen to be ORDER-FREE: WAPE
    // (Σ|err|/Σactual), bias, MAE, RMSE — every sum is an exact DECIMAL
    // over the day-sized aggregate (|err| and err² are exact decimal
    // products), closed with one double division each; no double
    // accumulates in engine-dependent order. The data-scale stage is the
    // single daily partial agg; everything after is date-dimension-sized.
    QueryDef.sql("q_forecast_backtest",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |j AS (SELECT d.day, d.rev, f.rev AS fc,
        |        CAST(abs(d.rev - f.rev) AS DECIMAL(18,2)) AS aerr,
        |        d.rev - f.rev AS err
        |      FROM daily d JOIN daily f ON f.day = d.day - 7)
        |SELECT count(*) AS n_days,
        |  CAST(sum(aerr) AS DOUBLE) / count(*) AS mae,
        |  sqrt(list_reduce(list(CAST(aerr AS DOUBLE) * CAST(aerr AS DOUBLE) ORDER BY day),
        |         (a, b) -> a + b) / count(*)) AS rmse,
        |  CAST(sum(aerr) AS DOUBLE) / CAST(sum(rev) AS DOUBLE) AS wape,
        |  CAST(sum(err) AS DOUBLE) / CAST(sum(rev) AS DOUBLE) AS bias
        |FROM j""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val j = daily.as("d")
        .join(daily.as("f"), col("f.day") === date_sub(col("d.day"), 7))
        .select(col("d.day").as("day"), col("d.rev").as("rev"), col("f.rev").as("fc"))
        .withColumn("aerr", abs(col("rev") - col("fc")).cast("decimal(18,2)"))
        .withColumn("err", col("rev") - col("fc"))
      j.agg(count(lit(1)).as("n_days"),
          (sum("aerr").cast("double") / count(lit(1))).as("mae"),
          // square in DOUBLE space: a decimal aerr² overflows DuckDB's
          // int64 decimal multiply once daily revenue has 9+ digits of
          // cents (seen at sf0.1); aerr itself stays an exact DECIMAL,
          // its double image is exact, and the double sum pins by day
          // (round-10 rule: double-sum order is host-dependent)
          sqrt(expr("aggregate(array_sort(collect_list(named_struct('day', day, " +
            "'v', CAST(aerr AS DOUBLE) * CAST(aerr AS DOUBLE)))), " +
            "CAST(0 AS DOUBLE), (a, x) -> a + x.v)")
            / count(lit(1))).as("rmse"),
          (sum("aerr").cast("double") / sum("rev").cast("double")).as("wape"),
          (sum("err").cast("double") / sum("rev").cast("double")).as("bias"))
    },

    // B65 — order inter-arrival statistics per market segment (the
    // purchase-cadence readout feeding churn/LTV models): per-customer
    // day gaps from ONE customer-partitioned lag window (tie-break
    // orderkey — engine-identical pairing on same-day orders), then a
    // segment rollup joined through the broadcast customer dim. Gaps are
    // integers, so every statistic is an exact integer aggregate closed
    // by one double division.
    QueryDef.sql("q_interarrival",
      """WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS day
        |           FROM orders),
        |g AS (SELECT o_custkey,
        |        datediff('day',
        |          lag(day) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey),
        |          day) AS gap
        |      FROM o)
        |SELECT c_mktsegment, count(*) AS n_gaps,
        |  CAST(sum(gap) AS DOUBLE) / count(*) AS avg_gap_days,
        |  min(gap) AS min_gap, max(gap) AS max_gap
        |FROM g JOIN customer ON c_custkey = o_custkey
        |WHERE gap IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("day"), col("o_orderkey"))
      val g = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("day"))
        .select(col("o_custkey"),
          datediff(col("day"), lag("day", 1).over(w)).as("gap"))
        .filter(col("gap").isNotNull)
      g.join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_gaps"),
          (sum("gap").cast("double") / count(lit(1))).as("avg_gap_days"),
          min("gap").as("min_gap"), max("gap").as("max_gap"))
        .orderBy("c_mktsegment")
    },

    // B68 — cumulative unique users by day ("total users ever" curve):
    // the pattern that makes running-distinct LINEAR — a running
    // count(DISTINCT) re-deduplicates the entire history per day
    // (quadratic, and distincts don't merge; A21's lesson). Instead:
    // first-seen day per user (ONE user-keyed partial agg — the only
    // data-scale stage), new-user counts per day, prefix sum over the
    // DATE-DIMENSION-sized frame. Integer arithmetic end to end.
    QueryDef.sql("q_cumulative_users",
      """WITH fs AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        |            FROM events GROUP BY 1),
        |nu AS (SELECT first_day AS day, count(*) AS new_users FROM fs GROUP BY 1),
        |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day,
        |  CAST(coalesce(nu.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY d.day) AS BIGINT) AS cum_users
        |FROM days d LEFT JOIN nu ON nu.day = d.day
        |ORDER BY day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val fs = ev.groupBy("user_id").agg(min(to_date(col("ts"))).as("first_day"))
      val nu = fs.groupBy(col("first_day").as("day")).agg(count(lit(1)).as("new_users"))
      val days = ev.select(to_date(col("ts")).as("day")).distinct()
      days.join(broadcast(nu), Seq("day"), "left")
        .select(col("day"), coalesce(col("new_users"), lit(0L)).as("nu0"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("nu0").cast("long").as("new_users"),
          sum("nu0").over(Window.orderBy(col("day"))).cast("long").as("cum_users"))
        .orderBy("day")
    },

    // B69 — daily OHLC bars (open/high/low/close + volume + turnover):
    // the time-series summary every monitoring/market pipeline draws.
    // The Spark side is ONE partial-aggregated groupBy — open/close via
    // min_by/max_by over the unique (ts, event_id) struct key (mergeable
    // like any min — no window, no second pass); the ORACLE gets the
    // same open/close from rank windows. Two mechanisms, one hash
    // (H7's cross-paradigm discipline). Turnover is an exact DECIMAL
    // sum; ties on ts are broken by event_id on both sides.
    QueryDef.sql("q_ohlc",
      """WITH r AS (SELECT CAST(ts AS DATE) AS day, value, ts, event_id,
        |    row_number() OVER (PARTITION BY CAST(ts AS DATE)
        |                       ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY CAST(ts AS DATE)
        |                       ORDER BY ts DESC, event_id DESC) AS rn_z
        |  FROM events)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_z = 1 THEN value END) AS close,
        |  count(*) AS volume,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS turnover
        |FROM r GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(expr("min_by(value, struct(ts, event_id))").as("open"),
          max("value").as("high"), min("value").as("low"),
          expr("max_by(value, struct(ts, event_id))").as("close"),
          count(lit(1)).as("volume"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("turnover"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("open"), col("high"), col("low"), col("close"),
          col("volume"), col("turnover"))
        .orderBy("day")
    },

    // B86 — Kaplan-Meier survival of the inter-order spell (B65's gaps
    // promoted to a real survival analysis WITH censoring): each
    // consecutive-order gap is an observed spell; the open tail from a
    // customer's last order to the dataset horizon is a CENSORED spell —
    // dropping it (what a naive mean-gap does) biases survival low,
    // which is exactly the mistake KM exists to fix. Pipeline: one
    // customer-keyed lead window over orders (data-scale, many
    // partitions), spell rollup to a distinct-length table (bounded by
    // the date range — report-sized), reverse-cumulative risk set,
    // survival as exp(Σ ln(1−d/n)) — the SAME closed form both engines
    // (Spark has no product aggregate; DuckDB's would be a different
    // float path). The terminal all-die factor guards to NULL EXPLICITLY
    // in both engines (Spark's log(0) is NULL but DuckDB's ln(0) RAISES
    // — the engines must agree by construction, not accident), and the
    // output keeps only event lengths with survivors (d>0 AND n>d).
    QueryDef.sql("q_survival_km",
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS gmx FROM orders),
        |s1 AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d0,
        |         CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
        |              ORDER BY o_orderdate, o_orderkey) AS DATE) AS nxt
        |       FROM orders),
        |sp AS (SELECT CAST(date_diff('day', d0, coalesce(nxt, gmx)) AS BIGINT) AS len,
        |              CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
        |       FROM s1 CROSS JOIN mx),
        |g AS (SELECT len, CAST(sum(ev) AS BIGINT) AS d, count(*) AS c
        |      FROM sp GROUP BY 1),
        |r AS (SELECT len, d,
        |        CAST(sum(c) OVER (ORDER BY len DESC) AS BIGINT) AS n_risk
        |      FROM g),
        |km AS (SELECT len, d, n_risk,
        |         list_reduce(list(CASE WHEN n_risk > d
        |                      THEN 1.0 - CAST(d AS DOUBLE)/n_risk ELSE 1.0 END)
        |             OVER (ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |           (a, b) -> a * b) AS survival
        |       FROM r)
        |SELECT len AS t_days, d AS d_events, n_risk, survival
        |FROM km WHERE d > 0 AND n_risk > d ORDER BY t_days""".stripMargin) { (s, d) =>
      val wLead = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val mx = Tables.orders(s, d)
        .agg(max(to_date(col("o_orderdate"))).as("gmx"))
      val sp = Tables.orders(s, d)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d0"),
          to_date(lead(col("o_orderdate"), 1).over(wLead)).as("nxt"))
        .crossJoin(broadcast(mx))
        .select(datediff(coalesce(col("nxt"), col("gmx")), col("d0"))
            .cast("long").as("len"),
          when(col("nxt").isNull, 0L).otherwise(1L).as("ev"))
      val g = sp.groupBy("len")
        .agg(sum("ev").cast("long").as("d"), count(lit(1)).as("c"))
      // distinct-length table: bounded by the calendar range, so the
      // unpartitioned windows below run over a report-sized frame
      val wRisk = Window.orderBy(col("len").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wSurv = Window.orderBy(col("len"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // survival is the KM PRODUCT directly — a len-pinned multiplicative
      // fold, not exp(Σ ln): no transcendentals, so the two engines agree
      // bit-for-bit on any host (round-10 portability rule).
      g.withColumn("n_risk", sum("c").over(wRisk).cast("long"))
        .withColumn("factor",
          when(col("n_risk") > col("d"),
            lit(1.0) - col("d").cast("double") / col("n_risk")).otherwise(1.0))
        .withColumn("fl", collect_list(struct(col("len"), col("factor"))).over(wSurv))
        .withColumn("survival",
          expr("aggregate(array_sort(fl), CAST(1.0 AS DOUBLE), (a, x) -> a * x.factor)"))
        .drop("factor", "fl")
        .filter(col("d") > 0 && col("n_risk") > col("d"))
        .select(col("len").as("t_days"), col("d").as("d_events"),
          col("n_risk"), col("survival"))
        .orderBy("t_days")
    },

    // B97 — Theil-Sen robust trend of daily revenue (the outlier-immune
    // counterpart of F2's OLS slope: median of all pairwise slopes,
    // breakdown point 29%). The ONLY data-scale stage is the daily
    // rollup (exact-DECIMAL revenue); everything after operates on the
    // date-DIMENSION-sized table (~2.5k days at ANY fact volume — 10
    // years is 3.6k rows at 100 TB too), so the O(d²) slope median runs
    // on the DRIVER over the collected rollup — the F12/Pca dim-sized
    // collect discipline, NOT a data-scale collect. (The distributed
    // alternative was measured: Spark's exact `percentile` over the 3M
    // near-distinct slope doubles costs 10-15 s vs 0.2 s of driver
    // arithmetic — its per-partition value maps are built for repeated
    // values, not continuous data.) Median = average of the two middle
    // slopes, replicating DuckDB's even-count interpolation exactly;
    // slope terms are the same double division in both engines.
    QueryDef.sql("q_theil_sen",
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |         CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS rev
        |  FROM lineitem GROUP BY 1),
        |sl AS (SELECT (b.rev - a.rev) / CAST(datediff('day', a.day, b.day) AS DOUBLE) AS s
        |       FROM daily a JOIN daily b ON a.day < b.day),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, median(s) AS slope FROM sl)
        |SELECT n_pairs, slope,
        |  (SELECT median(rev - slope*CAST(datediff('day', DATE '1995-01-01', day) AS DOUBLE))
        |   FROM daily) AS intercept
        |FROM m""".stripMargin) { (s, d) =>
      val daily = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").cast("date").as("day"))
        .agg(expr("CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE)").as("rev"))
        .orderBy("day")
        .collect() // date-dim-sized (see scaladoc): bounded at any scale
        .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1)))
      def median(a: Array[Double]): Double = {
        java.util.Arrays.sort(a)
        val n = a.length
        if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2
      }
      val nd = daily.length
      val slopes = new scala.collection.mutable.ArrayBuilder.ofDouble
      var i = 0
      while (i < nd) {
        var j = i + 1
        while (j < nd) {
          slopes += (daily(j)._2 - daily(i)._2) / (daily(j)._1 - daily(i)._1).toDouble
          j += 1
        }
        i += 1
      }
      val sl = slopes.result()
      val slope = median(sl.clone())
      val epoch0 = java.time.LocalDate.parse("1995-01-01").toEpochDay
      val intercept = median(daily.map { case (day, rev) =>
        rev - slope * (day - epoch0).toDouble
      })
      import s.implicits._
      Seq((sl.length.toLong, slope, intercept)).toDF("n_pairs", "slope", "intercept")
    },

    // B99 — WINDOWED funnel (ClickHouse windowFunnel semantics): the whole
    // view→click→purchase sequence must fit inside 24 h of the ANCHOR
    // view, and any occurrence can anchor — where B22's greedy-min funnel
    // commits to each stage's first hit, this finds a qualifying sequence
    // whenever one exists. Algorithm (the part worth keeping at 100 TB):
    // NOT the naive per-user triple self-join (cubic in events/user) but
    // one user-partitioned window scan carrying two running maxima — the
    // latest prior view anchor, then the latest anchor among QUALIFYING
    // clicks; a purchase closes the funnel iff it sits within the window
    // of that carried anchor. Greedy max-anchor is exact: for any closing
    // event the best prior pair is the one with the latest anchor.
    // Window order is (t, event_id) — a TOTAL order, so same-timestamp
    // ties resolve identically in both engines.
    QueryDef.sql("q_funnel_windowed",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS t, event_id
        |  FROM events WHERE event_type IN ('view','click','purchase')),
        |w1 AS (
        |  SELECT user_id, event_type, t, event_id,
        |    max(CASE WHEN event_type='view' THEN t END) OVER
        |      (PARTITION BY user_id ORDER BY t, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_run
        |  FROM e),
        |w2 AS (
        |  SELECT *,
        |    max(CASE WHEN event_type='click' AND v_run IS NOT NULL
        |             AND t - v_run <= 86400000 THEN v_run END) OVER
        |      (PARTITION BY user_id ORDER BY t, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cv_run
        |  FROM w1)
        |SELECT 'view' AS stage, CAST(0 AS BIGINT) AS stage_idx,
        |       CAST(count(DISTINCT CASE WHEN event_type='view' THEN user_id END) AS BIGINT) AS users FROM w2
        |UNION ALL
        |SELECT 'click', CAST(1 AS BIGINT),
        |       CAST(count(DISTINCT CASE WHEN event_type='click' AND v_run IS NOT NULL
        |                  AND t - v_run <= 86400000 THEN user_id END) AS BIGINT) FROM w2
        |UNION ALL
        |SELECT 'purchase', CAST(2 AS BIGINT),
        |       CAST(count(DISTINCT CASE WHEN event_type='purchase' AND cv_run IS NOT NULL
        |                  AND t - cv_run <= 86400000 THEN user_id END) AS BIGINT) FROM w2
        |ORDER BY stage_idx""".stripMargin) { (s, d) =>
      val winMs = 86400000L
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("t"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val w1 = e.withColumn("v_run",
        max(when(col("event_type") === "view", col("t"))).over(w))
      val w2 = w1.withColumn("cv_run",
        max(when(col("event_type") === "click" && col("v_run").isNotNull &&
          col("t") - col("v_run") <= winMs, col("v_run"))).over(w))
      val agg = w2.agg(
        count_distinct(when(col("event_type") === "view", col("user_id"))).as("u0"),
        count_distinct(when(col("event_type") === "click" && col("v_run").isNotNull &&
          col("t") - col("v_run") <= winMs, col("user_id"))).as("u1"),
        count_distinct(when(col("event_type") === "purchase" && col("cv_run").isNotNull &&
          col("t") - col("cv_run") <= winMs, col("user_id"))).as("u2"))
      agg.select(expr("stack(3, 'view', CAST(0 AS BIGINT), u0, " +
          "'click', CAST(1 AS BIGINT), u1, 'purchase', CAST(2 AS BIGINT), u2) " +
          "AS (stage, stage_idx, users)"))
        .orderBy("stage_idx")
    },

    // B100 — 30-day ROLLING Pearson correlation between daily revenue and
    // daily quantity (the co-movement monitor B19's global corr can't
    // localize: a regime change shows as the rolling series breaking, not
    // as a shifted global scalar). Determinism across engines comes from
    // keeping the five component sums EXACT DECIMAL through the window
    // frames — daily revenue is (18,4) (the product of 2-dp price and
    // 2-dp discount factor is EXACTLY 4-dp, so the cast is lossless;
    // a (18,2) cast would round .xx5000 ties, which the engines round
    // differently), quantity (18,2); every product stays inside both
    // engines' exact-decimal range and windowed decimal sums are exact —
    // with one double closed form at the end
    // (windowed DOUBLE sums would differ: DuckDB's segment-tree window
    // aggregation adds floats in a different order than Spark's running
    // frame). The windows ride the date-dimension-sized rollup.
    QueryDef.sql("q_rolling_corr",
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |         CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DECIMAL(18,4)) AS rev,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS qty
        |  FROM lineitem GROUP BY 1),
        |w AS (
        |  SELECT day,
        |    count(*) OVER win AS n,
        |    sum(rev) OVER win AS sx, sum(qty) OVER win AS sy,
        |    sum(CAST(rev AS DECIMAL(19,4)) * CAST(rev AS DECIMAL(19,4))) OVER win AS sxx,
        |    sum(CAST(qty AS DECIMAL(19,2)) * CAST(qty AS DECIMAL(19,2))) OVER win AS syy,
        |    sum(CAST(rev AS DECIMAL(19,4)) * CAST(qty AS DECIMAL(19,2))) OVER win AS sxy
        |  FROM daily
        |  WINDOW win AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)),
        |w2 AS (SELECT day, n,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dsx, CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS dsy,
        |  CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dsxx, CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS dsyy,
        |  CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dsxy FROM w)
        |SELECT day, CAST(n AS BIGINT) AS n,
        |  (CAST(n AS DOUBLE)*dsxy - dsx*dsy) /
        |  (sqrt(CAST(n AS DOUBLE)*dsxx - dsx*dsx) *
        |   sqrt(CAST(n AS DOUBLE)*dsyy - dsy*dsy)) AS corr
        |FROM w2 WHERE n = 30 ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").cast("date").as("day"))
        .agg(
          expr("CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DECIMAL(18,4))").as("rev"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))").as("qty"))
      // date-dim-sized single-partition window: report-scale by design
      val win = Window.orderBy("day").rowsBetween(-29, Window.currentRow)
      // (q_stl_decompose shares this date-dim window discipline below)
      daily.select(col("day"),
          count(lit(1)).over(win).as("n"),
          sum("rev").over(win).as("sx"), sum("qty").over(win).as("sy"),
          sum(col("rev") * col("rev")).over(win).as("sxx"),
          sum(col("qty") * col("qty")).over(win).as("syy"),
          sum(col("rev") * col("qty")).over(win).as("sxy"))
        .filter(col("n") === 30)
        .selectExpr("day", "CAST(n AS BIGINT) AS n",
          """(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
            |(sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
            | sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS corr""".stripMargin)
        .orderBy("day")
    },

    // B102 — classical seasonal DECOMPOSITION of daily revenue
    // (trend + weekly seasonal + residual — the series B55's strength
    // scalar summarizes): trend is a centered 7-day mean over EXACT
    // decimal sums (B100's discipline — lossless (18,4) daily values,
    // decimal window sums, ONE double division by 7); detrended values
    // are then identical doubles in both engines, and the per-weekday
    // seasonal means re-enter DECIMAL(28,12) before their cross-series
    // sum (B84 ordering rule). Weekday labels only partition — each
    // engine's own dow function induces the SAME day-classes, so labels
    // never need to agree cross-engine and are not output. All windows
    // ride the date-dimension rollup.
    QueryDef.sql("q_stl_decompose",
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |         CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DECIMAL(18,4)) AS rev
        |  FROM lineitem GROUP BY 1),
        |tr AS (
        |  SELECT day, rev,
        |    CAST(sum(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE) / 7 AS trend,
        |    count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
        |  FROM daily),
        |dt AS (SELECT day, CAST(rev AS DOUBLE) AS rev, trend,
        |              CAST(rev AS DOUBLE) - trend AS detr, dayofweek(day) AS dow
        |       FROM tr WHERE wn = 7),
        |se AS (SELECT dow, list_reduce(list(detr ORDER BY day), (a, b) -> a + b) / count(*) AS seasonal
        |       FROM dt GROUP BY 1)
        |SELECT day, rev, trend, seasonal, detr - seasonal AS residual
        |FROM dt JOIN se USING (dow) ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").cast("date").as("day"))
        .agg(expr("CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DECIMAL(18,4))").as("rev"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val dt = daily
        .select(col("day"), col("rev"),
          (sum("rev").over(w7).cast("double") / 7).as("trend"),
          count(lit(1)).over(w7).as("wn"))
        .filter(col("wn") === 7)
        .select(col("day"), col("rev").cast("double").as("rev"), col("trend"),
          (col("rev").cast("double") - col("trend")).as("detr"),
          dayofweek(col("day")).as("dow"))
      // day-pinned double fold: the old DECIMAL(28,12) re-entry relied on
      // DuckDB's double→DECIMAL cast, which is not correctly rounded
      val se = dt.groupBy("dow")
        .agg((expr("aggregate(array_sort(collect_list(named_struct('day', day, 'v', detr))), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x.v)") / count(lit(1))).as("seasonal"))
      dt.join(broadcast(se), "dow")
        .select(col("day"), col("rev"), col("trend"), col("seasonal"),
          (col("detr") - col("seasonal")).as("residual"))
        .orderBy("day")
    },

    // B103 — join-EXPLOSION audit (the pre-flight for any self/fact-fact
    // join, and the diagnostic that decides when B28's skew report turns
    // into A15's salting): per-key pair fan-out n², the total predicted
    // self-join cardinality, and the top offenders — one key-partial agg
    // plus a TakeOrdered over the key-dimension table; the n*n sum casts
    // to BIGINT in the oracle (DuckDB would type it HUGEINT — the r1/r7
    // defect class) and each factor is already BIGINT so the product is
    // exact in both engines.
    QueryDef.sql("q_join_explosion",
      """WITH lk AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n
        |            FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(n*n) AS BIGINT) AS total_pairs,
        |               CAST(count(*) AS BIGINT) AS n_keys FROM lk)
        |SELECT k, n, CAST(n*n AS BIGINT) AS pairs, total_pairs, n_keys
        |FROM lk CROSS JOIN tot ORDER BY pairs DESC, k LIMIT 10""".stripMargin) { (s, d) =>
      val lk = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("n"))
      val tot = lk.agg(sum(col("n") * col("n")).as("total_pairs"),
        count(lit(1)).as("n_keys"))
      graft.operators.Relational.topKByAgg(
        lk.crossJoin(broadcast(tot))
          .select(col("k"), col("n"), (col("n") * col("n")).as("pairs"),
            col("total_pairs"), col("n_keys")),
        10, Seq(col("pairs").desc, col("k")))
    },

    // B105 — lead/lag CROSS-correlation between orders PLACED and revenue
    // SHIPPED (B43's autocorrelation across two series: the peak lag IS
    // the fulfillment delay, the signal a same-day correlation cannot
    // see). Two date-dim rollups, an 8-lag fan-out over the date
    // dimension, and per-lag closed-form correlation from EXACT decimal
    // component sums (B100 discipline; cnt enters as DECIMAL(14,0) so the
    // cnt·rev product stays inside 38 digits in BOTH engines — a bare
    // long would promote to DECIMAL(20,0) and tip Spark into the
    // precision-loss path).
    QueryDef.sql("q_cross_corr",
      """WITH oc AS (SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
        |            FROM orders GROUP BY 1),
        |rv AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |              CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DECIMAL(18,4)) AS rev
        |       FROM lineitem GROUP BY 1),
        |lg AS (SELECT unnest([0,1,2,3,4,5,6,7]) AS lag),
        |j AS (SELECT lag, CAST(cnt AS DECIMAL(14,0)) AS x, rv.rev AS y
        |      FROM oc CROSS JOIN lg JOIN rv ON rv.day = oc.day + lag),
        |a AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |        sum(x) AS sx, sum(y) AS sy,
        |        sum(x*x) AS sxx,
        |        sum(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4))) AS syy,
        |        sum(x*y) AS sxy
        |      FROM j GROUP BY 1),
        |b AS (SELECT lag, n,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dsx, CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS dsy,
        |  CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dsxx, CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS dsyy,
        |  CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dsxy FROM a)
        |SELECT lag, n,
        |  (CAST(n AS DOUBLE)*dsxy - dsx*dsy) /
        |  (sqrt(CAST(n AS DOUBLE)*dsxx - dsx*dsx) *
        |   sqrt(CAST(n AS DOUBLE)*dsyy - dsy*dsy)) AS xcorr
        |FROM b ORDER BY lag""".stripMargin) { (s, d) =>
      val oc = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val rv = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").cast("date").as("day"))
        .agg(expr("CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DECIMAL(18,4))").as("rev"))
      val j = oc
        .select(col("day"), col("cnt").cast("decimal(14,0)").as("x"),
          explode(expr("array(0,1,2,3,4,5,6,7)")).as("lag"))
        .join(rv.select(col("day").as("rday"), col("rev").as("y")),
          expr("rday = date_add(day, lag)"))
      val a = j.groupBy("lag").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      a.selectExpr("CAST(lag AS INT) AS lag", "n",
          """(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
            |(sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
            | sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS xcorr""".stripMargin)
        .orderBy("lag")
    },

    // B107 — Holt LINEAR exponential smoothing of daily revenue
    // (level + trend — the forecaster B36's trendless EWMA and B63's
    // seasonal-naive bracket between them): the recursion is inherently
    // sequential over the date DIMENSION, so it runs on the driver over
    // the collected rollup (B97/C24 dim-collect discipline; the one
    // data-scale stage is the exact-DECIMAL daily aggregate). α=0.3,
    // β=0.1, textbook init (l₁=y₁, b₁=y₂−y₁). Output: the 7-day
    // forecast fan f_h = level + h·trend plus one-step in-sample MAE —
    // forecasts are exactly linear in h by construction, which the spec
    // asserts along with an independent recompute of the recursion.
    QueryDef.rowsOnly("q_holt_linear") { (s, d) =>
      val daily = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").cast("date").as("day"))
        .agg(expr("CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE)").as("rev"))
        .orderBy("day").collect().map(_.getDouble(1)) // date-dim-sized
      val (alpha, beta) = (0.3, 0.1)
      var level = daily(0)
      var trend = daily(1) - daily(0)
      var absErr = 0.0
      var i = 1
      while (i < daily.length) {
        val f = level + trend // one-step forecast made at t-1
        absErr += math.abs(daily(i) - f)
        val l1 = alpha * daily(i) + (1 - alpha) * (level + trend)
        trend = beta * (l1 - level) + (1 - beta) * trend
        level = l1
        i += 1
      }
      val mae = absErr / (daily.length - 1)
      import s.implicits._
      (1 to 7).map(h => (h.toLong, level + h * trend, level, trend, mae))
        .toDF("h", "forecast", "level", "trend", "mae")
    },

    // B109 — fulfillment SLA report: per priority class, the share of
    // line items shipped within 30/60/90 days of the order date (the
    // ops scorecard B105's cross-correlation lag hints at, made
    // explicit). One fact-fact equi-join on the order key + one
    // conditional partial agg — every threshold is a codegen'd CASE in
    // the same pass, counts exact, one double division per class.
    QueryDef.sql("q_ship_sla",
      """WITH lat AS (
        |  SELECT o_orderpriority AS prio,
        |         datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS dl
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
        |SELECT prio, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN dl <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS within_30,
        |  CAST(sum(CASE WHEN dl <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS within_60,
        |  CAST(sum(CASE WHEN dl <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS within_90,
        |  CAST(sum(CASE WHEN dl <= 30 THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS sla_30
        |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // reads (prio, shipdate, orderdate) off the staged shared fact —
      // the join ran once in StagedTables.orderLines; parquet pruning
      // keeps this a 3-column scan
      val lat = StagedTables.orderLines(s, d)
        .select(col("o_orderpriority").as("prio"),
          datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")).as("dl"))
      lat.groupBy("prio").agg(
          count(lit(1)).as("n"),
          sum(when(col("dl") <= 30, 1L).otherwise(0L)).as("within_30"),
          sum(when(col("dl") <= 60, 1L).otherwise(0L)).as("within_60"),
          sum(when(col("dl") <= 90, 1L).otherwise(0L)).as("within_90"))
        .select(col("prio"), col("n"), col("within_30"), col("within_60"),
          col("within_90"), (col("within_30").cast("double") / col("n")).as("sla_30"))
        .orderBy("prio")
    },

    // B114 — Bollinger bands over daily revenue: the volatility envelope
    // (20-day mean ± 2σ) every monitoring dashboard draws. The raw
    // stream reduces to the date-dimension rollup first (§5 discipline);
    // the 20-row window runs over that dim-sized series with EXACT
    // decimal sums of the daily totals and their squares — variance is
    // the fixed closed form over those two sums, never a streaming
    // stddev (engine-order-dependent). Squared daily totals pass 2^53
    // unscaled, so both engines exit via the correctly-rounded path
    // (DuckDB VARCHAR). Warm-up rows (n < 2) emit NULL bands — never a
    // zero divide under ANSI.
    QueryDef.sql("q_bollinger",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT day, CAST(CAST(total AS VARCHAR) AS DOUBLE) AS close,
        |    count(*) OVER win AS n,
        |    CAST(CAST(sum(total) OVER win AS VARCHAR) AS DOUBLE) AS s,
        |    CAST(CAST(sum(total*total) OVER win AS VARCHAR) AS DOUBLE) AS q
        |  FROM daily
        |  WINDOW win AS (ORDER BY day_idx ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT strftime(day,'%Y-%m-%d') AS day, close, s / n AS ma20,
        |  CASE WHEN n >= 2 THEN s / n + 2.0 * sqrt((q - (s/n)*s) / (n - 1)) END AS band_upper,
        |  CASE WHEN n >= 2 THEN s / n - 2.0 * sqrt((q - (s/n)*s) / (n - 1)) END AS band_lower
        |FROM w ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("sum(CAST(o_totalprice AS DECIMAL(18,2)))").as("total"))
        .withColumn("day_idx", datediff(col("day"), lit("1970-01-01").cast("date")))
      val win = Window.orderBy("day_idx").rowsBetween(-19, 0)
      daily.select(col("day"),
          col("total").cast("double").as("close"),
          count(lit(1)).over(win).as("n"),
          sum("total").over(win).cast("double").as("s"),
          sum(expr("total*total")).over(win).cast("double").as("q"))
        .selectExpr("date_format(day,'yyyy-MM-dd') AS day", "close", "s / n AS ma20",
          "CASE WHEN n >= 2 THEN s / n + 2.0D * sqrt((q - (s/n)*s) / (n - 1)) END AS band_upper",
          "CASE WHEN n >= 2 THEN s / n - 2.0D * sqrt((q - (s/n)*s) / (n - 1)) END AS band_lower")
        .orderBy("day")
    },

    // B115 — maximum drawdown per event type: peak-to-trough decline of
    // the daily-value series (the risk statistic behind B54's changepoint
    // and B38's anomaly scan — "how bad did it get, and when"). Running
    // peak is an EXACT decimal running max over the dim-sized daily
    // rollup; drawdown is one double division per dim row; the trough is
    // the argmax picked by a totally-ordered row_number (dd DESC, day) —
    // ties resolve to the earliest day in both engines.
    QueryDef.sql("q_drawdown",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
        |         sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events GROUP BY 1, 2, 3),
        |dd AS (
        |  SELECT event_type, day, total,
        |    max(total) OVER (PARTITION BY event_type ORDER BY day_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM daily),
        |r AS (
        |  SELECT event_type, day,
        |    CAST(peak AS DOUBLE) AS peak_value, CAST(total AS DOUBLE) AS trough_value,
        |    (CAST(peak AS DOUBLE) - total) / CAST(peak AS DOUBLE) AS drawdown,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY (CAST(peak AS DOUBLE) - total) / CAST(peak AS DOUBLE) DESC, day) AS rn
        |  FROM dd)
        |SELECT event_type, strftime(day,'%Y-%m-%d') AS trough_day,
        |  peak_value, trough_value, drawdown AS max_drawdown
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("sum(CAST(value AS DECIMAL(18,2)))").as("total"))
        .withColumn("day_idx", datediff(col("day"), lit("1970-01-01").cast("date")))
      val peakW = Window.partitionBy("event_type").orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = daily.withColumn("peak", max("total").over(peakW))
        .withColumn("drawdown",
          (col("peak").cast("double") - col("total")) / col("peak").cast("double"))
      val rnW = Window.partitionBy("event_type").orderBy(col("drawdown").desc, col("day"))
      dd.withColumn("rn", row_number().over(rnW))
        .filter(col("rn") === 1)
        .selectExpr("event_type", "date_format(day,'yyyy-MM-dd') AS trough_day",
          "CAST(peak AS DOUBLE) AS peak_value", "CAST(total AS DOUBLE) AS trough_value",
          "drawdown AS max_drawdown")
        .orderBy("event_type")
    },

    // B116 — 14-day RSI (Cutler's simple-average form) of daily revenue:
    // the bounded momentum oscillator — unlike Wilder's recursive EWMA
    // form it is a pure windowed ratio, so it stays declarative and
    // mergeable. Day-over-day deltas, gains/losses, and their 14-row
    // window sums are all EXACT decimal over the date-dim rollup; RSI =
    // (100·g)/(g+l) is one fixed double expression; windows shorter than
    // 14 deltas emit NULL (warm-up), an all-flat window emits NULL (zero
    // denominator), both as explicit CASE arms — never an ANSI divide
    // error. Headroom: 14-day gain sums in cents stay under 2^53 to
    // ~sf10k.
    QueryDef.sql("q_rsi",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders GROUP BY 1, 2),
        |delta AS (
        |  SELECT day, total,
        |    total - lag(total) OVER (ORDER BY day_idx) AS diff
        |  FROM daily),
        |gl AS (
        |  SELECT day, total,
        |    CASE WHEN diff > 0 THEN diff ELSE CAST(0 AS DECIMAL(18,2)) END AS gain,
        |    CASE WHEN diff < 0 THEN -diff ELSE CAST(0 AS DECIMAL(18,2)) END AS loss,
        |    CASE WHEN diff IS NULL THEN 0 ELSE 1 END AS has_diff
        |  FROM delta),
        |w AS (
        |  SELECT day, CAST(total AS DOUBLE) AS close,
        |    sum(has_diff) OVER win AS n_diffs,
        |    CAST(sum(gain) OVER win AS DOUBLE) AS g,
        |    CAST(sum(loss) OVER win AS DOUBLE) AS l
        |  FROM gl
        |  WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT strftime(day,'%Y-%m-%d') AS day, close,
        |  CASE WHEN n_diffs >= 14 AND g + l > 0 THEN (100.0 * g) / (g + l) END AS rsi14
        |FROM w ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("sum(CAST(o_totalprice AS DECIMAL(18,2)))").as("total"))
        .withColumn("day_idx", datediff(col("day"), lit("1970-01-01").cast("date")))
      val lagW = Window.orderBy("day_idx")
      val gl = daily
        .withColumn("diff", col("total") - lag("total", 1).over(lagW))
        .selectExpr("day", "total",
          "CASE WHEN diff > 0 THEN diff ELSE CAST(0 AS DECIMAL(18,2)) END AS gain",
          "CASE WHEN diff < 0 THEN -diff ELSE CAST(0 AS DECIMAL(18,2)) END AS loss",
          "CASE WHEN diff IS NULL THEN 0 ELSE 1 END AS has_diff")
      val win = Window.orderBy("day").rowsBetween(-13, 0)
      gl.select(col("day"), col("total").cast("double").as("close"),
          sum("has_diff").over(win).as("n_diffs"),
          sum("gain").over(win).cast("double").as("g"),
          sum("loss").over(win).cast("double").as("l"))
        .selectExpr("date_format(day,'yyyy-MM-dd') AS day", "close",
          "CASE WHEN n_diffs >= 14 AND g + l > 0 THEN (100.0D * g) / (g + l) END AS rsi14")
        .orderBy("day")
    },

    // B117 — peak interval concurrency: how many orders are OPEN
    // (placed, not yet fully shipped) on the busiest days — the classic
    // sweep-line / gaps-and-overlaps operator (B13's range join asks
    // "which pairs overlap"; this asks "how deep does the overlap
    // stack"). Intervals reduce to ±1 boundary deltas (+1 at placement,
    // −1 the day after the last shipment), the sweep is ONE running sum
    // over the date-dimension delta rollup — the raw fact tables are
    // touched exactly once each, and the 100 TB cost is the per-order
    // max(l_shipdate) partial agg. Top-20 under total order
    // (concurrency DESC, day). Integer end to end.
    QueryDef.sql("q_interval_overlap",
      """WITH iv AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_day,
        |         max(CAST(l_shipdate AS DATE)) AS end_day
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |deltas AS (
        |  SELECT start_day AS day, CAST(1 AS BIGINT) AS delta FROM iv
        |  UNION ALL
        |  SELECT end_day + INTERVAL 1 DAY, CAST(-1 AS BIGINT) FROM iv),
        |curve AS (
        |  SELECT CAST(day AS DATE) AS day, sum(delta) AS d FROM deltas GROUP BY 1),
        |sweep AS (
        |  SELECT day, CAST(sum(d) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS concurrency
        |  FROM curve)
        |SELECT strftime(day,'%Y-%m-%d') AS day, concurrency
        |FROM sweep ORDER BY concurrency DESC, day LIMIT 20""".stripMargin) { (s, d) =>
      // the orders⋈lineitem shuffle AND the order-grain rollup are the
      // staged shared tables (StagedTables.orderLines → orderMax; the
      // cast commutes with max since to_date is monotone); this query
      // is then a 15M-row scan + a date-dimension-sized sweep
      val iv = StagedTables.orderMax(s, d)
        .select(to_date(col("o_orderdate")).as("start_day"),
          to_date(col("max_ship")).as("end_day"))
      val deltas = iv.select(col("start_day").as("day"), lit(1L).as("delta"))
        .unionAll(iv.select(date_add(col("end_day"), 1).as("day"), lit(-1L).as("delta")))
      val curve = deltas.groupBy("day").agg(sum("delta").as("d"))
      val sweepW = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.operators.Relational.topKByAgg(
        curve.select(col("day"), sum("d").over(sweepW).cast("long").as("concurrency")),
        20, Seq(col("concurrency").desc, col("day")))
        .selectExpr("date_format(day,'yyyy-MM-dd') AS day", "concurrency")
    },

    // B121 — rolling 30-day OLS trend slope of daily revenue: the local
    // trend estimate B97's global Theil–Sen summarizes (a dashboard
    // wants "slope right NOW", windowed). Every window co-moment is
    // EXACT — x (day index) and x² sums are integers, y and x·y sums
    // are decimals — so the slope is one fixed closed form per dim row
    // with a single double exit per sum; the x·y sums pass 2^53
    // unscaled → VARCHAR-path exit. Windows ride the date-dim rollup.
    // Warm-up rows (n < 2) emit NULL — never an ANSI zero divide.
    QueryDef.sql("q_rolling_beta",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS x,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT day,
        |    CAST(count(*) OVER win AS BIGINT) AS n,
        |    CAST(sum(x) OVER win AS BIGINT) AS sx,
        |    CAST(sum(x*x) OVER win AS BIGINT) AS sxx,
        |    CAST(CAST(sum(y) OVER win AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(y*x) OVER win AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM daily
        |  WINDOW win AS (ORDER BY x ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
        |SELECT strftime(day,'%Y-%m-%d') AS day, n,
        |  CASE WHEN n >= 2 THEN
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / CAST(n * sxx - sx * sx AS DOUBLE)
        |  END AS slope30
        |FROM w ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("sum(CAST(o_totalprice AS DECIMAL(18,2)))").as("y"))
        .withColumn("x", datediff(col("day"), lit("1970-01-01").cast("date")))
      val win = Window.orderBy("x").rowsBetween(-29, 0)
      daily.select(col("day"),
          count(lit(1)).over(win).cast("long").as("n"),
          sum("x").over(win).cast("long").as("sx"),
          sum(expr("x*x")).over(win).cast("long").as("sxx"),
          sum("y").over(win).cast("double").as("sy"),
          sum(expr("y*x")).over(win).cast("double").as("sxy"))
        .selectExpr("date_format(day,'yyyy-MM-dd') AS day", "n",
          """CASE WHEN n >= 2 THEN
            |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            |    / CAST(n * sxx - sx * sx AS DOUBLE)
            |END AS slope30""".stripMargin)
        .orderBy("day")
    },

    // B122 — conversion-latency distribution: hours from a user's FIRST
    // view to their FIRST purchase (for users whose first purchase
    // followed their first view) — B22/B99 report IF users convert; this
    // reports HOW LONG conversion takes, the number an SLA or attribution
    // window is tuned against. ONE per-user conditional min partial agg
    // (the only data-scale stage), integer millisecond arithmetic, then
    // an hours-dim histogram with an exact cumulative share — dim-sized
    // window, one double division per row.
    QueryDef.sql("q_conversion_lag",
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS v,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS p
        |  FROM events GROUP BY 1),
        |l AS (SELECT user_id, (p - v) // 3600000 AS lag_hours
        |      FROM pu WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v),
        |g AS (SELECT lag_hours, CAST(count(*) AS BIGINT) AS n_users FROM l GROUP BY 1),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS total FROM g)
        |SELECT lag_hours, n_users,
        |  CAST(sum(n_users) OVER (ORDER BY lag_hours
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / total AS cum_share
        |FROM g CROSS JOIN t ORDER BY lag_hours""".stripMargin) { (s, d) =>
      val pu = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", unix_millis(col("ts")))).as("v"),
          min(when(col("event_type") === "purchase", unix_millis(col("ts")))).as("p"))
      val g = pu.filter(col("v").isNotNull && col("p").isNotNull && col("p") >= col("v"))
        .select(expr("(p - v) DIV 3600000").as("lag_hours"))
        .groupBy("lag_hours").agg(count(lit(1)).cast("long").as("n_users"))
      val t = g.agg(sum("n_users").cast("long").as("total"))
      val cumW = Window.orderBy("lag_hours")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.crossJoin(broadcast(t))
        .select(col("lag_hours"), col("n_users"),
          (sum("n_users").over(cumW).cast("double") / col("total")).as("cum_share"))
        .orderBy("lag_hours")
    },

    // B123 — DAU growth accounting: every day's active-user count
    // decomposed into NEW + RETAINED + RESURRECTED, with CHURNED =
    // yesterday's actives who vanished (actives(d−1) − retained(d)) —
    // the canonical growth dashboard, and the decomposition B23's
    // retention triangle can't give (retention tracks one cohort
    // forward; this explains each month's composition). The stream
    // reduces to the distinct (user, month) frame first (ONE partial
    // agg — the only data-scale stage); classification is two
    // user-partitioned window functions over that dim-sized frame;
    // churn is a self-join on day−1 over the date-dim counts.
    // Integer day arithmetic end to end.
    QueryDef.sql("q_growth_accounting",
      """WITH um AS (
        |  SELECT DISTINCT user_id,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS m
        |  FROM events),
        |f AS (
        |  SELECT user_id, m,
        |    min(m) OVER (PARTITION BY user_id) AS first_m,
        |    lag(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m
        |  FROM um),
        |c AS (
        |  SELECT m, CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(sum(CASE WHEN m = first_m THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |    CAST(sum(CASE WHEN m <> first_m AND prev_m = m - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN m <> first_m AND prev_m <> m - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM f GROUP BY 1)
        |SELECT c.m AS day_idx, c.n_active, c.n_new, c.n_retained, c.n_resurrected,
        |  coalesce(p.n_active, 0) - c.n_retained AS n_churned
        |FROM c LEFT JOIN c p ON p.m = c.m - 1
        |ORDER BY day_idx""".stripMargin) { (s, d) =>
      val um = Tables.events(s, d)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("m"))
        .distinct()
      val uw = Window.partitionBy("user_id")
      val f = um.select(col("user_id"), col("m"),
        min("m").over(uw).as("first_m"),
        lag("m", 1).over(uw.orderBy("m")).as("prev_m"))
      val c = f.groupBy("m")
        .agg(count(lit(1)).cast("long").as("n_active"),
          sum(when(col("m") === col("first_m"), 1).otherwise(0)).cast("long").as("n_new"),
          sum(when(col("m") =!= col("first_m") && col("prev_m") === col("m") - 1, 1)
            .otherwise(0)).cast("long").as("n_retained"),
          sum(when(col("m") =!= col("first_m") && col("prev_m") =!= col("m") - 1, 1)
            .otherwise(0)).cast("long").as("n_resurrected"))
      val p = c.select(col("m").as("pm"), col("n_active").as("prev_active"))
      c.join(broadcast(p), col("pm") === col("m") - 1, "left")
        .select(col("m").as("day_idx"), col("n_active"), col("n_new"),
          col("n_retained"), col("n_resurrected"),
          (coalesce(col("prev_active"), lit(0L)) - col("n_retained")).as("n_churned"))
        .orderBy("day_idx")
    },

    // B124 — DAU/WAU stickiness per week: average daily actives over
    // weekly actives — the engagement-intensity scalar beside B123's
    // composition and B31's rolling WAU. Both numerator and denominator
    // are exact distinct counts off the SAME (user, day) reduce (one
    // data-scale pass); stickiness is one double division per week row.
    QueryDef.sql("q_stickiness",
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
        |    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
        |  FROM events),
        |g AS (
        |  SELECT wk, CAST(count(*) AS BIGINT) AS user_days,
        |    CAST(count(DISTINCT day) AS BIGINT) AS n_days,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM ud GROUP BY 1)
        |SELECT strftime(wk,'%Y-%m-%d') AS week, n_days, wau,
        |  CAST(user_days AS DOUBLE) / n_days AS avg_dau,
        |  CAST(user_days AS DOUBLE) / n_days / wau AS stickiness
        |FROM g ORDER BY week""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          date_trunc("week", to_date(col("ts"))).cast("date").as("wk"))
        .distinct()
      ud.groupBy("wk")
        .agg(count(lit(1)).cast("long").as("user_days"),
          countDistinct("day").cast("long").as("n_days"),
          countDistinct("user_id").cast("long").as("wau"))
        .selectExpr("date_format(wk,'yyyy-MM-dd') AS week", "n_days", "wau",
          "CAST(user_days AS DOUBLE) / n_days AS avg_dau",
          "CAST(user_days AS DOUBLE) / n_days / wau AS stickiness")
        .orderBy("week")
    },

    // B129 — customer SEGMENT MIGRATION matrix: spend terciles in the
    // first half of the date range vs the second, cross-tabulated — the
    // who-moved-where view B53's static RFM grid can't give (and B29's
    // event transitions lifted to the customer-value dimension). Two
    // conditional exact-cents partial aggs in ONE orders pass; terciles
    // assigned by ntile(3) under a TOTAL order (cents DESC, custkey) so
    // both engines cut identical boundaries; customers absent from a
    // period land in tercile 0 ("inactive") via the outer-join
    // coalesce. Output is the ≤4×4 migration matrix with exact counts.
    QueryDef.sql("q_segment_migration",
      """WITH b AS (
        |  SELECT min(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS lo,
        |         max(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS hi
        |  FROM orders),
        |cr AS (
        |  SELECT o_custkey AS c,
        |    sum(CASE WHEN datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |             <= (lo + hi) // 2
        |        THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS r1,
        |    sum(CASE WHEN datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |             > (lo + hi) // 2
        |        THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS r2
        |  FROM orders CROSS JOIN b GROUP BY 1),
        |t1 AS (SELECT c, CAST(ntile(3) OVER (ORDER BY r1 DESC, c) AS BIGINT) AS seg1
        |       FROM cr WHERE r1 > 0),
        |t2 AS (SELECT c, CAST(ntile(3) OVER (ORDER BY r2 DESC, c) AS BIGINT) AS seg2
        |       FROM cr WHERE r2 > 0),
        |m AS (SELECT coalesce(t1.c, t2.c) AS c,
        |        coalesce(seg1, 0) AS seg_from, coalesce(seg2, 0) AS seg_to
        |      FROM t1 FULL JOIN t2 ON t1.c = t2.c)
        |SELECT seg_from, seg_to, CAST(count(*) AS BIGINT) AS n_customers
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val days = datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
      val o = Tables.orders(s, d).select(col("o_custkey").as("c"),
        days.as("day"), expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val b = o.agg(min("day").as("lo"), max("day").as("hi"))
      val cr = o.crossJoin(broadcast(b))
        .groupBy("c")
        .agg(sum(when(col("day") <= expr("(lo + hi) DIV 2"), col("cents"))
            .otherwise(0L)).as("r1"),
          sum(when(col("day") > expr("(lo + hi) DIV 2"), col("cents"))
            .otherwise(0L)).as("r2"))
        .persist()
      val t1 = cr.filter(col("r1") > 0).select(col("c"),
        ntile(3).over(Window.orderBy(col("r1").desc, col("c"))).cast("long").as("seg1"))
      val t2 = cr.filter(col("r2") > 0).select(col("c").as("c2"),
        ntile(3).over(Window.orderBy(col("r2").desc, col("c"))).cast("long").as("seg2"))
      t1.join(t2, col("c") === col("c2"), "full_outer")
        .select(coalesce(col("seg1"), lit(0L)).as("seg_from"),
          coalesce(col("seg2"), lit(0L)).as("seg_to"))
        .groupBy("seg_from", "seg_to")
        .agg(count(lit(1)).cast("long").as("n_customers"))
        .orderBy("seg_from", "seg_to")
    }
  )
}
