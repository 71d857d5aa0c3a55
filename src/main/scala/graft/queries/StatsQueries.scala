package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2 group B (stats rows) — feature-engineering / data-diagnostic
  * statistics: per-group z-score standardization, IQR outlier fences,
  * quartile binning, and a key-skew report (the diagnostic that decides
  * when `operators.Skew.saltedJoin` is worth its replication cost).
  *
  * Determinism (SURVEY §4): moments come from exact DECIMAL sums; each
  * derived statistic is one fixed IEEE expression over those sums (sqrt is
  * correctly rounded, so the whole closed form is bit-stable); quartiles
  * are exact ranked data values (ceil-rank, no interpolation); every
  * ratio is a single double division.
  */
object StatsQueries {

  val all: Seq[QueryDef] = Seq(

    // B25 — per-segment z-score of account balance. Stats are a 5-row
    // broadcast (sum/sum-of-squares/count per segment — partial-agg,
    // mergeable); the standardization itself is a narrow map over the
    // fact table. Never a per-group window at scale.
    QueryDef.sql("q_zscore",
      """WITH st AS (
        |  SELECT c_mktsegment, count(*) AS n,
        |    sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s1,
        |    sum(CAST(c_acctbal*c_acctbal AS DECIMAL(28,4))) AS s2
        |  FROM customer GROUP BY 1),
        |sd AS (SELECT c_mktsegment, n,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2
        |  FROM st)
        |SELECT c_custkey, c_mktsegment,
        |  CAST((c_acctbal - s1/n)
        |    / sqrt(s2/n - (s1/n)*(s1/n)) AS DOUBLE) AS z
        |FROM customer JOIN sd USING (c_mktsegment)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val st = cust.groupBy("c_mktsegment").agg(
        count(lit(1)).as("n"),
        expr("sum(CAST(c_acctbal AS DECIMAL(18,2)))").as("s1"),
        expr("sum(CAST(c_acctbal*c_acctbal AS DECIMAL(28,4)))").as("s2"))
      cust.join(broadcast(st), "c_mktsegment")
        .select(col("c_custkey"), col("c_mktsegment"),
          expr("""CAST((c_acctbal - CAST(s1 AS DOUBLE)/n)
                 |  / sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)) AS DOUBLE)""".stripMargin).as("z"))
        .orderBy("c_custkey")
    },

    // B53 — RFM segmentation (recency / frequency / monetary quintiles):
    // the standard customer-base cut. Per-customer stats are one
    // partial agg over orders; the three ntile(5) windows run over the
    // CUSTOMER-sized aggregate with unique tie-breaks (custkey), so both
    // engines assign identical quintiles. Output is the 5³ segment grid
    // (counts + exact decimal value), not per-customer rows. Same
    // single-partition-window caveat as B27: at 100 TB the quintile cuts
    // come from the mergeable quantile sketch (B14x) and the scores from
    // a broadcast join against the 4 cut points instead.
    QueryDef.sql("q_rfm_segments",
      """WITH c AS (SELECT o_custkey, max(o_orderdate) AS last_o, count(*) AS freq,
        |             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
        |           FROM orders GROUP BY 1),
        |sc AS (SELECT o_custkey, mon,
        |  ntile(5) OVER (ORDER BY last_o, o_custkey) AS r_score,
        |  ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
        |  ntile(5) OVER (ORDER BY mon, o_custkey) AS m_score
        |  FROM c)
        |SELECT r_score, f_score, m_score, count(*) AS n_customers,
        |  CAST(sum(mon) AS DOUBLE) AS total_value
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val c = Tables.orders(s, d).groupBy("o_custkey")
        .agg(max("o_orderdate").as("last_o"), count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("mon"))
      val sc = c.select(col("o_custkey"), col("mon"),
        ntile(5).over(Window.orderBy(col("last_o"), col("o_custkey"))).cast("long").as("r_score"),
        ntile(5).over(Window.orderBy(col("freq"), col("o_custkey"))).cast("long").as("f_score"),
        ntile(5).over(Window.orderBy(col("mon"), col("o_custkey"))).cast("long").as("m_score"))
      sc.groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"),
          sum("mon").cast("double").as("total_value"))
        .orderBy("r_score", "f_score", "m_score")
    },

    // B50 — MAD (median absolute deviation) outliers per event type: the
    // robust complement of B26's IQR fences — immune to the outliers it
    // hunts (mean/stddev fences move with the contamination; medians
    // don't). Discrete lower-median idiom both engines compute
    // identically (no interpolation); flag = |v − med| > 3·1.4826·MAD
    // (1.4826 ≈ 1/Φ⁻¹(3/4) rescales MAD to σ under normality). Two
    // rank-window passes by construction (median of deviations needs the
    // median first); at 100 TB the same fences come from the mergeable
    // quantile sketch (B14x) instead of exact ranks.
    QueryDef.sql("q_mad_outlier",
      """WITH r1 AS (
        |  SELECT event_type, CAST(value AS DOUBLE) AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events),
        |med AS (SELECT event_type, max(CASE WHEN rn = (cnt+1)//2 THEN v END) AS med
        |        FROM r1 GROUP BY 1),
        |r2 AS (
        |  SELECT r1.event_type, v, med, abs(v - med) AS dev,
        |    row_number() OVER (PARTITION BY r1.event_type
        |                       ORDER BY abs(v - med), v, rn) AS drn,
        |    count(*) OVER (PARTITION BY r1.event_type) AS cnt2
        |  FROM r1 JOIN med USING (event_type))
        |SELECT event_type, max(med) AS med,
        |  max(CASE WHEN drn = (cnt2+1)//2 THEN dev END) AS mad,
        |  count(CASE WHEN dev > 3 * 1.4826 *
        |    (SELECT max(CASE WHEN i.drn = (i.cnt2+1)//2 THEN i.dev END)
        |     FROM r2 i WHERE i.event_type = r2.event_type) THEN 1 END) AS n_outliers,
        |  count(*) AS n
        |FROM r2 GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val w1 = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      val c1 = Window.partitionBy("event_type")
      val r1 = ev.select(col("event_type"), col("value").cast("double").as("v"),
        row_number().over(w1).as("rn"), count(lit(1)).over(c1).as("cnt"))
      val med = r1.groupBy("event_type")
        .agg(max(when(col("rn") === expr("(cnt+1) div 2"), col("v"))).as("med"))
      val r2 = r1.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("v") - col("med")))
      val w2 = Window.partitionBy("event_type").orderBy(col("dev"), col("v"), col("rn"))
      val ranked2 = r2.select(col("event_type"), col("v"), col("med"), col("dev"),
        row_number().over(w2).as("drn"), count(lit(1)).over(c1).as("cnt2"))
      val mad = ranked2.groupBy("event_type")
        .agg(max(when(col("drn") === expr("(cnt2+1) div 2"), col("dev"))).as("mad"))
      ranked2.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(max("med").as("med"), max("mad").as("mad"),
          count(when(col("dev") > lit(3) * lit(1.4826) * col("mad"), 1)).as("n_outliers"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // B26 — IQR outlier fences per segment: exact discrete quartiles
    // (ceil-rank data values, q_percentiles' idiom), Tukey 1.5×IQR fences,
    // outlier counts. The rank window is the exact path; at 100 TB the
    // same fences come from B14x's mergeable quantile sketch instead.
    QueryDef.sql("q_outlier_iqr",
      """WITH ranked AS (
        |  SELECT c_mktsegment, CAST(c_acctbal AS DOUBLE) AS val,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS cnt
        |  FROM customer),
        |q AS (SELECT c_mktsegment,
        |    max(CASE WHEN rn = (cnt+3)//4 THEN val END) AS q1,
        |    max(CASE WHEN rn = (3*cnt+3)//4 THEN val END) AS q3
        |  FROM ranked GROUP BY 1)
        |SELECT c.c_mktsegment, max(q.q1) AS q1, max(q.q3) AS q3,
        |  count(CASE WHEN c.c_acctbal < q.q1 - 1.5*(q.q3-q.q1)
        |              OR c.c_acctbal > q.q3 + 1.5*(q.q3-q.q1) THEN 1 END) AS n_outliers,
        |  count(*) AS n
        |FROM customer c JOIN q USING (c_mktsegment)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      val ranked = cust.select(col("c_mktsegment"), col("c_acctbal").cast("double").as("val"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("c_mktsegment")).as("cnt"))
      val q = ranked.groupBy("c_mktsegment").agg(
        max(when(col("rn") === expr("(cnt+3) div 4"), col("val"))).as("q1"),
        max(when(col("rn") === expr("(3*cnt+3) div 4"), col("val"))).as("q3"))
      cust.join(broadcast(q), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(max("q1").as("q1"), max("q3").as("q3"),
          count(when(col("c_acctbal") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
                     col("c_acctbal") > col("q3") + lit(1.5) * (col("q3") - col("q1")), 1)).as("n_outliers"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // B27 — quartile binning (feature bucketing): ntile(4) per segment
    // under a TOTAL order (balance, key) so tie placement is identical in
    // both engines; per-bin count and exact-decimal mean.
    QueryDef.sql("q_ntile_bin",
      """SELECT c_mktsegment, bin, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_bal
        |FROM (SELECT c_mktsegment, c_acctbal,
        |   CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS BIGINT) AS bin
        | FROM customer) t
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).cast("long").as("bin"))
        .groupBy("c_mktsegment", "bin")
        .agg(count(lit(1)).as("n"),
          (expr("CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)") / count(lit(1))).as("avg_bal"))
        .orderBy("c_mktsegment", "bin")
    },

    // B28 — key-skew report: the 10 heaviest join keys and their share of
    // the fact table — the measurement that justifies (or rules out)
    // salting/skew-join handling for a key (pairs with A15). One
    // partial-agg groupBy + a single-row broadcast total + top-k.
    // B39 — PSI drift report (population stability index): the standard
    // production monitor for "has this feature's distribution moved since
    // the reference window". Events are split into two halves at the
    // integer-µs midpoint of the time range; `value` is bucketed into 10
    // fixed-width bins whose edges come from the GLOBAL min/max (B18's
    // identical-double bin arithmetic, so boundaries can't drift between
    // engines); per bin the reference share p, current share q, and the
    // PSI contribution (p−q)·ln(p/q). Shares are single double divisions
    // of exact counts; ln follows C10's values-not-ranks precedent. Scale
    // shape: one broadcast 1-row bounds aggregate + one 10-key partial
    // agg — no window, no join over data. Empty-in-either-half bins carry
    // a NULL contribution (the standard epsilon fudge hides real
    // emptiness; a monitor should SEE it).
    QueryDef.sql("q_psi_drift",
      s"""WITH b AS (SELECT min(value) AS mn, max(value) AS mx,
        |                  min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events),
        |binned AS (
        |  SELECT CAST(least(floor((value - mn) * 10.0 / (mx - mn)), 9) AS BIGINT) AS bin,
        |         CASE WHEN epoch_us(ts) < t0 + (t1 - t0) // 2 THEN 0 ELSE 1 END AS half
        |  FROM events CROSS JOIN b),
        |c AS (SELECT bin,
        |        sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_ref,
        |        sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_cur
        |      FROM binned GROUP BY 1),
        |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM c),
        |pq AS (SELECT bin, n_ref, n_cur,
        |         CAST(n_ref AS DOUBLE) / tr AS p, CAST(n_cur AS DOUBLE) / tc AS q
        |       FROM c CROSS JOIN t)
        |SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
        |  p, q,
        |  CASE WHEN n_ref > 0 AND n_cur > 0
        |       THEN (p - q) * ${graft.functions.PortableMath.lnSql("(p / q)")}
        |  END AS psi_term
        |FROM pq ORDER BY bin""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val b = ev.agg(min("value").as("mn"), max("value").as("mx"),
        min(unix_micros(col("ts"))).as("t0"), max(unix_micros(col("ts"))).as("t1"))
      val binned = ev.crossJoin(broadcast(b))
        .select(
          least(floor((col("value") - col("mn")) * 10.0 / (col("mx") - col("mn"))), lit(9))
            .cast("long").as("bin"),
          // integer µs midpoint — `div`, not `/` (Spark's / on longs is a
          // double division; DuckDB's // floors, and a .5 µs boundary
          // could flip a row's half)
          when(unix_micros(col("ts")) < expr("t0 + (t1 - t0) div 2"), 0)
            .otherwise(1).as("half"))
      val c = binned.groupBy("bin")
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_cur"))
      val t = c.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
      val p = col("n_ref").cast("double") / col("tr")
      val q = col("n_cur").cast("double") / col("tc")
      c.crossJoin(broadcast(t))
        .select(col("bin"), col("n_ref").cast("long").as("n_ref"),
          col("n_cur").cast("long").as("n_cur"), p.as("p"), q.as("q"),
          when(col("n_ref") > 0 && col("n_cur") > 0,
            (p - q) * graft.functions.PortableMath.pLn(p / q)).as("psi_term"))
        .orderBy("bin")
    },

    // B42 — Gini concentration per event type: how unequally value is
    // distributed across events (0 = uniform, →1 = one event carries
    // everything) — the revenue-concentration / whale-detection audit.
    // G = (2·Σr·x − (n+1)·Σx) / (n·Σx) over row_number ranks: equal
    // values swapping ranks leaves Σr·x unchanged, so ANY deterministic
    // total order gives the same G — no average-rank machinery needed.
    // Rank·value products and sums stay exact DECIMAL; one closing double
    // division. Per-group rank window shares B14's few-groups caveat.
    QueryDef.sql("q_gini",
      """WITH r AS (SELECT event_type AS g, CAST(value AS DECIMAL(18,2)) AS x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn
        |  FROM events),
        |s AS (SELECT g, count(*) AS n, sum(x) AS sx, sum(rn * x) AS srx
        |      FROM r GROUP BY 1)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST(2 * srx - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE) AS gini
        |FROM s ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      val r = Tables.events(s, d).select(col("event_type").as("g"),
        col("value").cast("decimal(18,2)").as("x"),
        row_number().over(w).as("rn"))
      r.groupBy("g").agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("rn") * col("x")).as("srx"))
        .select(col("g").as("event_type"), col("n").cast("long").as("n"),
          ((lit(2) * col("srx") - (col("n") + 1) * col("sx")).cast("double") /
            (col("n") * col("sx")).cast("double")).as("gini"))
        .orderBy("event_type")
    },

    // B41 — Spearman rank correlation per group: Pearson over average
    // ranks, robust to monotone nonlinearity where B19 is not. Ranks are
    // kept INTEGER by doubling (2·avgrank = 2·rank + ties − 1), so the
    // co-moment sums are exact DECIMALs and the one closed form at the
    // end is B19's bit-stable IEEE expression — no transcendentals, no
    // order-dependence. The doubling cancels in the correlation (scale
    // invariance). Scale note: per-group rank windows share B14's
    // few-groups straggler caveat; the B10x salt-and-merge ladder is the
    // 100× path (ranks are NOT mergeable, so the sketch route there is
    // approximate ranks via B14x quantiles).
    QueryDef.sql("q_spearman",
      """WITH r AS (
        |  SELECT l_returnflag AS g,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rx,
        |    count(*) OVER (PARTITION BY l_returnflag, l_quantity) AS ntx,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS ry,
        |    count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) AS nty
        |  FROM lineitem),
        |i AS (SELECT g, CAST(2*rx + ntx - 1 AS DECIMAL(18,0)) AS x,
        |             CAST(2*ry + nty - 1 AS DECIMAL(18,0)) AS y FROM r),
        |s AS (SELECT g, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        |      FROM i GROUP BY 1)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS spearman
        |FROM s ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wx = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      val wy = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val ntx = Window.partitionBy("l_returnflag", "l_quantity")
      val nty = Window.partitionBy("l_returnflag", "l_extendedprice")
      val i = Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
          (rank().over(wx) * 2 + count(lit(1)).over(ntx) - 1)
            .cast("decimal(18,0)").as("x"),
          (rank().over(wy) * 2 + count(lit(1)).over(nty) - 1)
            .cast("decimal(18,0)").as("y"))
      val st = i.groupBy("g").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      st.select(col("g").as("l_returnflag"), col("n").cast("long").as("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
            .as("spearman"))
        .orderBy("l_returnflag")
    },

    // B40 — Benford leading-digit audit (the fraud/synthetic-data tell on
    // any naturally-skewed positive amount column): observed share of each
    // leading digit 1..9 vs Benford's log10(1+1/d), with the chi-square
    // contribution per digit. Determinism: the double is scaled to exact
    // cents with round() (identical for positive values both engines) and
    // the leading digit comes from BIGINT STRING formatting — integer
    // formatting is engine-stable where double formatting is not.
    // log10 follows C10's values-not-ranks precedent. One narrow
    // projection + a 9-key aggregate; the n total rides along as a
    // broadcast scalar.
    QueryDef.sql("q_benford", {
      import graft.functions.PortableMath
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |           FROM orders WHERE o_totalprice > 0),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM c),
        |e AS (SELECT digit, n, total,
        |        ${PortableMath.lnSql("(1.0 + 1.0/digit)")} / ${PortableMath.lnSql("10.0")} AS benford
        |      FROM c CROSS JOIN t)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        |  CAST(n AS DOUBLE) / total AS share,
        |  benford,
        |  pow(CAST(n AS DOUBLE) - total * benford, 2)
        |    / (total * benford) AS chi2_term
        |FROM e ORDER BY digit""".stripMargin
    }) { (s, d) =>
      val digit = substring(round(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit")
      val c = Tables.orders(s, d).filter(col("o_totalprice") > 0)
        .select(digit).groupBy("digit").agg(count(lit(1)).as("n"))
      val t = c.agg(sum("n").as("total"))
      val benford = graft.functions.PortableMath.pLn(lit(1.0) + lit(1.0) / col("digit")) /
        graft.functions.PortableMath.pLn(lit(10.0))
      c.crossJoin(broadcast(t))
        .select(col("digit"), col("n").cast("long").as("n"),
          (col("n").cast("double") / col("total")).as("share"),
          benford.as("benford"),
          (pow(col("n").cast("double") - col("total") * benford, 2) /
            (col("total") * benford)).as("chi2_term"))
        .orderBy("digit")
    },

    QueryDef.sql("q_skew_report",
      """WITH k AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM orders)
        |SELECT o_custkey, n, CAST(n AS DOUBLE)/total AS share
        |FROM k, t ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin) { (s, d) =>
      val ord = Tables.orders(s, d)
      val k = ord.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val t = ord.agg(count(lit(1)).cast("double").as("total"))
      graft.operators.Relational.topKByAgg(
        k.crossJoin(broadcast(t))
          .select(col("o_custkey"), col("n"),
            (col("n").cast("double") / col("total")).as("share")),
        10, Seq(col("n").desc, col("o_custkey")))
    },

    // B58 — chi-square test of independence: event_type × ISO day-of-week
    // contingency table with expected counts and per-cell chi² terms (the
    // A/B-test / drift-audit workhorse next to B39's PSI). One partial agg
    // over events builds the k×7 contingency; marginals are re-aggregated
    // from that TINY table and broadcast back — the data-scale input is
    // touched exactly once. Determinism: observed counts are integers;
    // expected = CAST(r AS DOUBLE)*c/n is one fixed multiply-divide; each
    // chi² term is one closed-form double expression over those.
    QueryDef.sql("q_chi_square",
      """WITH obs AS (
        |  SELECT event_type, CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
        |         count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY 1),
        |ct AS (SELECT dow, sum(o) AS c FROM obs GROUP BY 1),
        |t AS (SELECT sum(o) AS n FROM obs)
        |SELECT obs.event_type, obs.dow, CAST(obs.o AS BIGINT) AS observed,
        |  CAST(rt.r AS DOUBLE) * ct.c / t.n AS expected,
        |  pow(obs.o - CAST(rt.r AS DOUBLE) * ct.c / t.n, 2)
        |    / (CAST(rt.r AS DOUBLE) * ct.c / t.n) AS chi2_term
        |FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN t
        |ORDER BY event_type, dow""".stripMargin) { (s, d) =>
      val obs = Tables.events(s, d)
        .groupBy(col("event_type"),
          // ISO dow (Mon=1..Sun=7) from Spark's Sun=1..Sat=7
          (((dayofweek(to_date(col("ts"))) + 5) % 7) + 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("o"))
      val rt = obs.groupBy("event_type").agg(sum("o").as("r"))
      val ct = obs.groupBy("dow").agg(sum("o").as("c"))
      val t = obs.agg(sum("o").as("n"))
      val e = col("r").cast("double") * col("c") / col("n")
      obs.join(broadcast(rt), "event_type").join(broadcast(ct), "dow")
        .crossJoin(broadcast(t))
        .select(col("event_type"), col("dow"), col("o").cast("long").as("observed"),
          e.as("expected"),
          (pow(col("o") - e, 2) / e).as("chi2_term"))
        .orderBy("event_type", "dow")
    },

    // B59 — Welch's unequal-variance t-test: urgent vs low-priority order
    // values. Both groups reduce to (n, Σx, Σx²) in ONE partial agg over
    // the fact table (exact DECIMAL sums — mergeable, map-side combined);
    // the t statistic and Welch–Satterthwaite df are a closed form over
    // those six numbers, evaluated in one fixed expression tree on a
    // 1-row frame. Nothing here changes shape at 100 TB.
    QueryDef.sql("q_welch_ttest",
      """WITH g AS (
        |  SELECT o_orderpriority AS grp, count(*) AS n,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s1,
        |    sum(CAST(o_totalprice*o_totalprice AS DECIMAL(28,4))) AS s2
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT','5-LOW') GROUP BY 1),
        |gd AS (SELECT grp, n,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2
        |  FROM g),
        |m AS (SELECT grp, n, s1/n AS mean,
        |        (s2 - (s1/n)*s1)/(n-1) AS var
        |      FROM gd),
        |a AS (SELECT n AS n1, mean AS m1, var AS v1 FROM m WHERE grp = '1-URGENT'),
        |b AS (SELECT n AS n2, mean AS m2, var AS v2 FROM m WHERE grp = '5-LOW')
        |SELECT n1, n2, m1 - m2 AS mean_diff,
        |  (m1 - m2) / sqrt(v1/n1 + v2/n2) AS t_stat,
        |  pow(v1/n1 + v2/n2, 2)
        |    / (pow(v1/n1, 2)/(n1-1) + pow(v2/n2, 2)/(n2-1)) AS welch_df
        |FROM a CROSS JOIN b""".stripMargin) { (s, d) =>
      val g = Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(col("o_orderpriority").as("grp"))
        .agg(count(lit(1)).as("n"),
          expr("sum(CAST(o_totalprice AS DECIMAL(18,2)))").as("s1"),
          expr("sum(CAST(o_totalprice*o_totalprice AS DECIMAL(28,4)))").as("s2"))
      val m = g.selectExpr("grp", "n", "CAST(s1 AS DOUBLE)/n AS mean",
        "(CAST(s2 AS DOUBLE) - (CAST(s1 AS DOUBLE)/n)*CAST(s1 AS DOUBLE))/(n-1) AS var")
      val a = m.filter(col("grp") === "1-URGENT")
        .selectExpr("n AS n1", "mean AS m1", "var AS v1")
      val b = m.filter(col("grp") === "5-LOW")
        .selectExpr("n AS n2", "mean AS m2", "var AS v2")
      a.crossJoin(b).selectExpr(
        "n1", "n2", "m1 - m2 AS mean_diff",
        "(m1 - m2) / sqrt(v1/n1 + v2/n2) AS t_stat",
        """pow(v1/n1 + v2/n2, 2)
          |  / (pow(v1/n1, 2)/(n1-1) + pow(v2/n2, 2)/(n2-1)) AS welch_df""".stripMargin)
    },

    // B60 — two-sample Kolmogorov–Smirnov statistic (binned ECDF):
    // returned vs non-returned line-item prices. The data-scale pass is
    // ONE groupBy on a fixed-width bin id (floor(v/100), integer key,
    // partial-agg); the ECDF difference then runs as a cumulative window
    // over the ~1000-row BIN table — the exact per-value KS would need a
    // global sort of the fact table, which is precisely what the binned
    // form avoids at 100 TB (documented resolution: D is exact for the
    // binned distributions, a ≤bin-width approximation of the continuous
    // one). CDF ratios are single int→double divisions; D is a max over
    // them.
    QueryDef.sql("q_ks_test",
      """WITH b AS (
        |  SELECT CAST(floor(l_extendedprice/100.0) AS BIGINT) AS bin,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS c2
        |  FROM lineitem WHERE l_returnflag IN ('R','N') GROUP BY 1),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c2) AS BIGINT) AS n2 FROM b),
        |c AS (SELECT bin,
        |        sum(c1) OVER (ORDER BY bin) AS a1,
        |        sum(c2) OVER (ORDER BY bin) AS a2
        |      FROM b)
        |SELECT max(t.n1) AS n1, max(t.n2) AS n2,
        |  max(abs(CAST(a1 AS DOUBLE)/t.n1 - CAST(a2 AS DOUBLE)/t.n2)) AS ks_d,
        |  max(abs(CAST(a1 AS DOUBLE)/t.n1 - CAST(a2 AS DOUBLE)/t.n2))
        |    * sqrt(CAST(max(t.n1) AS DOUBLE) * max(t.n2) / (max(t.n1) + max(t.n2))) AS ks_scaled
        |FROM c CROSS JOIN t""".stripMargin) { (s, d) =>
      val b = Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("R", "N"))
        .groupBy(floor(col("l_extendedprice") / 100.0).cast("long").as("bin"))
        .agg(sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("c1"),
          sum(when(col("l_returnflag") === "N", 1).otherwise(0)).as("c2"))
      val t = b.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      val w = Window.orderBy("bin")
      val c = b.select(col("bin"),
        sum("c1").over(w).as("a1"), sum("c2").over(w).as("a2"))
      val diff = abs(col("a1").cast("double") / col("n1") -
        col("a2").cast("double") / col("n2"))
      c.crossJoin(broadcast(t))
        .agg(max("n1").as("n1"), max("n2").as("n2"),
          max(diff).as("ks_d"),
          (max(diff) * sqrt(max(col("n1")).cast("double") * max(col("n2")) /
            (max(col("n1")) + max(col("n2"))))).as("ks_scaled"))
    },

    // B61 — per-segment winsorization at the exact p05/p95 ceil-rank
    // values (B14's quantile idiom): the robust-cleaning twin of B20's
    // min-max scale. The cut points come from the per-group rank window;
    // they broadcast back onto the fact table as a 5-row dim, and the
    // clip itself is a narrow least/greatest projection. Report output:
    // clip counts (integers) and DECIMAL-sum means before/after. Same
    // per-group-window caveat as B14 — at 100 TB the cuts come from the
    // mergeable quantile sketch (B14x) instead; the clip pass is
    // unchanged.
    QueryDef.sql("q_winsorize",
      """WITH ranked AS (
        |  SELECT c_mktsegment, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal, c_custkey) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS cnt
        |  FROM customer),
        |cuts AS (
        |  SELECT c_mktsegment,
        |    max(CASE WHEN rn = (cnt + 19) // 20 THEN c_acctbal END) AS p05,
        |    max(CASE WHEN rn = (19*cnt + 19) // 20 THEN c_acctbal END) AS p95
        |  FROM ranked GROUP BY 1),
        |clipped AS (
        |  SELECT c.c_mktsegment, c.c_acctbal AS v,
        |    least(greatest(c.c_acctbal, k.p05), k.p95) AS w, k.p05, k.p95
        |  FROM customer c JOIN cuts k USING (c_mktsegment))
        |SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CASE WHEN v < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(sum(CASE WHEN v > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        |  max(p05) AS p05, max(p95) AS p95,
        |  CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_before,
        |  CAST(sum(CAST(w AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_after
        |FROM clipped GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val ranked = cust.select(col("c_mktsegment"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("c_mktsegment")).as("cnt"))
      val cuts = ranked.groupBy("c_mktsegment").agg(
        max(when(col("rn") === expr("(cnt + 19) div 20"), col("c_acctbal"))).as("p05"),
        max(when(col("rn") === expr("(19*cnt + 19) div 20"), col("c_acctbal"))).as("p95"))
      val clipped = cust.join(broadcast(cuts), "c_mktsegment")
        .select(col("c_mktsegment"), col("c_acctbal").as("v"),
          least(greatest(col("c_acctbal"), col("p05")), col("p95")).as("w"),
          col("p05"), col("p95"))
      clipped.groupBy("c_mktsegment").agg(
          count(lit(1)).as("n"),
          sum(when(col("v") < col("p05"), 1).otherwise(0)).as("n_clipped_low"),
          sum(when(col("v") > col("p95"), 1).otherwise(0)).as("n_clipped_high"),
          max("p05").as("p05"), max("p95").as("p95"),
          (sum(col("v").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("mean_before"),
          (sum(col("w").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("mean_after"))
        .orderBy("c_mktsegment")
    },

    // B66 — revenue concentration (Lorenz/Pareto deciles): how much of
    // total revenue the top decile of customers carries — the
    // concentration CURVE behind B42's single Gini number. Customer
    // revenue is one partial agg over orders; the ntile(10) window runs
    // over the CUSTOMER-sized aggregate with a unique tie-break
    // (B53's discipline; B14x sketch cuts at 100 TB); shares are exact
    // DECIMAL sums closed by one double division against the broadcast
    // total.
    QueryDef.sql("q_pareto",
      """WITH c AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |           FROM orders GROUP BY 1),
        |t AS (SELECT sum(rev) AS total FROM c),
        |d AS (SELECT o_custkey, rev,
        |        ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
        |      FROM c),
        |g AS (SELECT decile, count(*) AS n_customers, sum(rev) AS rev FROM d GROUP BY 1)
        |SELECT decile, n_customers,
        |  CAST(g.rev AS DOUBLE) AS revenue,
        |  CAST(g.rev AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
        |  CAST(sum(g.rev) OVER (ORDER BY decile) AS DOUBLE)
        |    / CAST(t.total AS DOUBLE) AS cum_share
        |FROM g CROSS JOIN t ORDER BY decile""".stripMargin) { (s, d) =>
      val c = Tables.orders(s, d).groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val t = c.agg(sum("rev").as("total"))
      val dec = c.select(col("o_custkey"), col("rev"),
        ntile(10).over(Window.orderBy(col("rev").desc, col("o_custkey"))).as("decile"))
      val g = dec.groupBy("decile")
        .agg(count(lit(1)).as("n_customers"), sum("rev").as("rev"))
      g.crossJoin(broadcast(t))
        .select(col("decile"), col("n_customers"),
          col("rev").cast("double").as("revenue"),
          (col("rev").cast("double") / col("total").cast("double")).as("share"),
          (sum("rev").over(Window.orderBy("decile")).cast("double") /
            col("total").cast("double")).as("cum_share"))
        .orderBy("decile")
    },

    // B67 — 2-D Mahalanobis outliers on (quantity, price): the
    // MULTIVARIATE complement of B26/B50 — a row can be unremarkable in
    // each margin yet far off the joint correlation axis, which is what
    // the cross term catches. Five EXACT moments in ONE partial agg
    // (m_linreg's sufficient-statistics discipline), the 2×2 covariance
    // inverted in closed form inside the same broadcast row, d² as one
    // fixed expression per row, top-20 via TakeOrderedAndProject with
    // key tie-breaks. The moments use F24's split-long-cents sums, not
    // DECIMAL(38,4): cents are exact integers, a hi/lo BIGINT pair sums
    // them associative-exactly at double-sum speed (the DECIMAL
    // accumulation was this query's entire 14× gap — measured 5.5×
    // cheaper in F24), and the exact integer exits to DOUBLE through
    // Spark's correctly-rounded decimal path / DuckDB's correctly-rounded
    // VARCHAR path — the direct DuckDB DECIMAL→DOUBLE cast double-rounds
    // above 2^53 (r9 ADVICE). Headroom: lo < 1e6·rows, hi < 1e8·rows —
    // exact to ~9e10 lineitem rows (~sf15k); beyond that, widen to a
    // 3-way split or pre-aggregate per date partition.
    QueryDef.sql("q_mahalanobis", {
      def sp(v: String, n: String) =
        s"sum(($v) // 1000000) AS ${n}_hi, sum(($v) % 1000000) AS ${n}_lo"
      def un(n: String, scale: String) =
        s"CAST(CAST(CAST(${n}_hi AS HUGEINT)*1000000 + ${n}_lo AS VARCHAR) AS DOUBLE) / $scale AS $n"
      s"""WITH c AS (SELECT CAST(round(l_quantity*100) AS BIGINT) AS qc,
        |              CAST(round(l_extendedprice*100) AS BIGINT) AS pc FROM lineitem),
        |m AS (SELECT count(*) AS n, ${sp("qc", "sx")}, ${sp("pc", "sy")},
        |        ${sp("qc*qc", "sxx")}, ${sp("pc*pc", "syy")}, ${sp("qc*pc", "sxy")}
        |      FROM c),
        |u AS (SELECT n, ${un("sx", "100.0")}, ${un("sy", "100.0")},
        |        ${un("sxx", "10000.0")}, ${un("syy", "10000.0")}, ${un("sxy", "10000.0")}
        |      FROM m),
        |p AS (SELECT sx/n AS mx, sy/n AS my,
        |        sxx/n - (sx/n)*(sx/n) AS vx, syy/n - (sy/n)*(sy/n) AS vy,
        |        sxy/n - (sx/n)*(sy/n) AS cxy FROM u)
        |SELECT l_orderkey, l_linenumber, l_quantity AS x, l_extendedprice AS y,
        |  ((l_quantity-mx)*(l_quantity-mx)*vy
        |    - 2*cxy*(l_quantity-mx)*(l_extendedprice-my)
        |    + (l_extendedprice-my)*(l_extendedprice-my)*vx)
        |  / (vx*vy - cxy*cxy) AS d2
        |FROM lineitem CROSS JOIN p
        |ORDER BY d2 DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin
    }) { (s, d) =>
      val li = Tables.lineitem(s, d)
      def sp(v: String, n: String) = Seq(
        s"sum(($v) DIV 1000000) AS ${n}_hi", s"sum(($v) % 1000000) AS ${n}_lo")
      def un(n: String, scale: String) =
        s"CAST(CAST(${n}_hi AS DECIMAL(38,0))*1000000 + ${n}_lo AS DOUBLE) / $scale AS $n"
      val m = li
        .selectExpr("CAST(round(l_quantity*100) AS BIGINT) AS qc",
          "CAST(round(l_extendedprice*100) AS BIGINT) AS pc")
        .selectExpr(Seq("count(*) AS n") ++ sp("qc", "sx") ++ sp("pc", "sy") ++
          sp("qc*qc", "sxx") ++ sp("pc*pc", "syy") ++ sp("qc*pc", "sxy"): _*)
      val p = m
        .selectExpr("n", un("sx", "100.0D"), un("sy", "100.0D"),
          un("sxx", "10000.0D"), un("syy", "10000.0D"), un("sxy", "10000.0D"))
        .selectExpr("sx/n AS mx", "sy/n AS my",
          "sxx/n - (sx/n)*(sx/n) AS vx", "syy/n - (sy/n)*(sy/n) AS vy",
          "sxy/n - (sx/n)*(sy/n) AS cxy")
      graft.operators.Relational.topKByAgg(
        li.crossJoin(broadcast(p)).selectExpr(
          "l_orderkey", "l_linenumber", "l_quantity AS x", "l_extendedprice AS y",
          """((l_quantity-mx)*(l_quantity-mx)*vy
            |  - 2*cxy*(l_quantity-mx)*(l_extendedprice-my)
            |  + (l_extendedprice-my)*(l_extendedprice-my)*vx)
            |/ (vx*vy - cxy*cxy) AS d2""".stripMargin),
        20, Seq(col("d2").desc, col("l_orderkey"), col("l_linenumber")))
    },

    // A13x — pre-aggregated mergeable HLL sketches (DataSketches
    // hll_sketch_agg/hll_union_agg): per-DAY sketches of active users are
    // the stored rollup; weekly distincts come from UNIONING the daily
    // sketches — no second pass over events, the rollup pattern exact
    // distinct counts structurally cannot support (A21's lesson:
    // distincts don't merge; sketches do). At 100 TB the daily sketch
    // table is date-dimension-sized and answers any ad-hoc date-range
    // distinct query by sketch union alone. Estimator ⇒ rows-only;
    // agreement with exact weekly distincts is spec'd (HllRollupSpec).
    QueryDef.rowsOnly("q_hll_presketch") { (s, d) =>
      val ev = Tables.events(s, d)
      val daily = ev
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .groupBy("day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count(lit(1)).as("n_events"))
      daily
        .withColumn("week", date_format(date_trunc("week", col("day")), "yyyy-MM-dd"))
        .groupBy("week")
        .agg(sum("n_events").as("n_events"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
        .orderBy("week")
    },

    // A13y — pre-aggregated mergeable KLL QUANTILE sketches (DataSketches
    // kll_sketch_agg_double): the quantile analog of A13x — per-DAY value
    // sketches are the stored rollup; weekly p50/p95/p99 come from
    // MERGING daily sketches, never a second pass over events. Exact
    // percentiles don't merge (B14's lesson: a median of medians is not
    // the median); KLL sketches do, with a proven rank-error bound the
    // spec checks against the exact twin. At 100 TB the daily sketch
    // table is date-dimension-sized and any ad-hoc date-range quantile is
    // a sketch merge. Estimator ⇒ rows-only (KllRollupSpec binds it).
    QueryDef.rowsOnly("q_kll_presketch") { (s, d) =>
      val daily = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("value"))
        .groupBy("day")
        .agg(expr("kll_sketch_agg_double(value)").as("sk"),
          count(lit(1)).as("n_events"))
      daily
        .withColumn("week", date_format(date_trunc("week", col("day")), "yyyy-MM-dd"))
        .groupBy("week")
        .agg(sum("n_events").as("n_events"),
          expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5D)").as("p50"),
          expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.95D)").as("p95"),
          expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.99D)").as("p99"))
        .orderBy("week")
    },

    // B98 — audience OVERLAP via theta sketches (DataSketches
    // theta_sketch_agg / theta_intersection_agg): distinct users per
    // event type, plus the pairwise intersection estimate — the set
    // operation HLL structurally cannot express (HLL unions only; theta
    // keeps a hash sample so it intersects). The per-type sketch build is
    // one partial agg over events; the 4×4 type-pair frame is
    // sketch-dimension-sized. The production shape at 100 TB: per-segment
    // sketches are stored once, and any audience-overlap question is
    // sketch algebra, not a fact re-scan. Estimator ⇒ rows-only;
    // KllRollupSpec checks each estimate against the exact overlap.
    QueryDef.rowsOnly("q_theta_overlap") { (s, d) =>
      val sk = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(expr("theta_sketch_agg(user_id)").as("sk"),
          count(lit(1)).as("n_events"))
      val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
      val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"))
      a.join(b, col("type_a") < col("type_b")) // type² sketch pairs: bounded
        .select(col("type_a"), col("type_b"),
          expr("theta_sketch_estimate(ska)").as("users_a"),
          expr("theta_sketch_estimate(skb)").as("users_b"),
          // intersection is an aggregate: feed it the pair's two sketches
          explode(array(col("ska"), col("skb"))).as("x"))
        .groupBy("type_a", "type_b", "users_a", "users_b")
        .agg(expr("theta_sketch_estimate(theta_intersection_agg(x))").as("overlap"))
        .orderBy("type_a", "type_b")
    },

    // B84 — one-way ANOVA F-test: does mean order value differ across
    // market segments? The B59 (Welch) two-sample test generalized to k
    // groups. Float discipline (the r8 driver red, root-caused by the
    // judge): NEVER bounce a large double back through DECIMAL — when the
    // double's ulp exceeds the decimal scale, Spark's shortest-repr cast
    // and DuckDB's exact-binary cast produce different decimal images.
    // Instead the group stats (n, Σx, Σx²) stay EXACT DECIMAL through the
    // k-row reduce; each group's quotient term s²/n is computed ONCE in
    // DOUBLE (the only inexact step, an identical IEEE op sequence in
    // both engines), and the k-term double sum is order-pinned by a
    // seg-sorted left fold — aggregate(array_sort(collect_list)) here,
    // list_reduce(list(... ORDER BY seg)) in the oracle — so neither
    // engine's group ordering can perturb the rounding. The segment
    // lookup is a 2-column projection of customer with no broadcast
    // hint — AQE broadcasts it while it fits and falls back to a
    // shuffled join at the scale where customer is no longer
    // dimension-sized. The oracle's DECIMAL→DOUBLE exits go through a
    // VARCHAR round-trip: DuckDB's direct cast double-rounds
    // (hugeint→double, then scale divide) and is 1 ulp off for ~25% of
    // unscaled values > 2^53 — q_tot crosses that line at every shipped
    // sf — while text→double is correctly rounded, matching Spark's
    // BigDecimal path exactly (r9 ADVICE, verified on sf0.1 q_g).
    QueryDef.sql("q_anova",
      """WITH g AS (
        |  SELECT c_mktsegment AS seg,
        |    count(*) AS n_g,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s_g,
        |    sum(CAST(o_totalprice*o_totalprice AS DECIMAL(38,4))) AS q_g
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  GROUP BY 1),
        |t AS (
        |  SELECT seg, n_g, s_g, q_g,
        |    (CAST(CAST(s_g AS VARCHAR) AS DOUBLE)/n_g)
        |      *CAST(CAST(s_g AS VARCHAR) AS DOUBLE) AS sb_t
        |  FROM g),
        |r AS (
        |  SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(CAST(sum(s_g) AS VARCHAR) AS DOUBLE) AS s_tot,
        |    CAST(CAST(sum(q_g) AS VARCHAR) AS DOUBLE) AS q_tot,
        |    list_reduce(list(sb_t ORDER BY seg), (a, b) -> a + b) AS sb_term
        |  FROM t)
        |SELECT k, n,
        |  sb_term - (s_tot/n)*s_tot AS ss_between,
        |  q_tot - sb_term AS ss_within,
        |  ((sb_term - (s_tot/n)*s_tot)/(k-1)) / ((q_tot - sb_term)/(n-k)) AS f_stat
        |FROM r""".stripMargin) { (s, d) =>
      val seg = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      val g = Tables.orders(s, d)
        .join(seg, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n_g"),
          expr("sum(CAST(o_totalprice AS DECIMAL(18,2)))").as("s_g"),
          expr("sum(CAST(o_totalprice*o_totalprice AS DECIMAL(38,4)))").as("q_g"))
      val t = g.selectExpr("seg", "n_g", "s_g", "q_g",
        "(CAST(s_g AS DOUBLE)/n_g)*CAST(s_g AS DOUBLE) AS sb_t")
      t.agg(count(lit(1)).as("k"), sum("n_g").cast("long").as("n"),
          expr("CAST(sum(s_g) AS DOUBLE)").as("s_tot"),
          expr("CAST(sum(q_g) AS DOUBLE)").as("q_tot"),
          expr("aggregate(array_sort(collect_list(struct(seg, sb_t))), " +
            "CAST(0 AS DOUBLE), (a, x) -> a + x.sb_t)").as("sb_term"))
        .selectExpr("k", "n",
          "sb_term - (s_tot/n)*s_tot AS ss_between",
          "q_tot - sb_term AS ss_within",
          "((sb_term - (s_tot/n)*s_tot)/(k-1)) / ((q_tot - sb_term)/(n-k)) AS f_stat")
    },

    // B89 — bootstrap CI for mean order value, DETERMINISTIC where RNG
    // bootstraps are not: the Poissonized bootstrap (each row enters
    // replicate r with multiplicity ~ Poisson(1), the standard
    // one-pass/streaming resample) with the multiplicity drawn by
    // inverse-CDF ladder from the md5 fraction of (key, r) — H6's
    // engine-identical uniform, so both engines materialize the SAME 20
    // resamples. Scale shape: the ×B explode is projection-only and
    // collapses immediately into a B-keyed partial agg (map-side
    // combine — raw rows never shuffle); replicate means are exact
    // DECIMAL ratios; the final spread re-enters DECIMAL before the
    // cross-replicate sum (B84's ordering discipline). Normal-interval
    // CI = boot_mean ± 1.96·boot_se — closed form, no percentile rank
    // games over 20 values.
    QueryDef.sql("q_bootstrap_ci", {
      val u = graft.operators.Curation.uniformDuck(
        "CAST(o_orderkey AS VARCHAR) || '_' || CAST(g.r AS VARCHAR)")
      s"""WITH reps AS (
         |  SELECT o_totalprice, CAST(g.r AS INTEGER) AS r,
         |    (CASE WHEN $u < 0.3678794412 THEN 0
         |          WHEN $u < 0.7357588823 THEN 1
         |          WHEN $u < 0.9196986029 THEN 2
         |          WHEN $u < 0.9810118431 THEN 3
         |          WHEN $u < 0.9963401532 THEN 4
         |          WHEN $u < 0.9994058152 THEN 5 ELSE 6 END) AS w
         |  FROM orders CROSS JOIN unnest(range(0, 20)) AS g(r)),
         |m AS (
         |  SELECT r,
         |    CAST(sum(CAST(w*o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
         |      / CAST(sum(w) AS BIGINT) AS mean_r
         |  FROM reps GROUP BY 1),
         |b AS (
         |  SELECT count(*) AS nb,
         |    list_reduce(list(mean_r ORDER BY r), (a, b) -> a + b) AS sm,
         |    list_reduce(list(mean_r*mean_r ORDER BY r), (a, b) -> a + b) AS sq
         |  FROM m),
         |f AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS mean
         |  FROM orders)
         |SELECT n, mean, sm/nb AS boot_mean,
         |  sqrt((sq - sm*sm/nb)/(nb-1)) AS boot_se,
         |  sm/nb - 1.96*sqrt((sq - sm*sm/nb)/(nb-1)) AS ci_lo,
         |  sm/nb + 1.96*sqrt((sq - sm*sm/nb)/(nb-1)) AS ci_hi
         |FROM f CROSS JOIN b""".stripMargin
    }) { (s, d) =>
      val uu = graft.operators.Curation.uniform(
        concat(col("o_orderkey").cast("string"), lit("_"), col("r").cast("string")))
      val reps = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          explode(expr("sequence(0, 19)")).as("r"))
        .select(col("o_totalprice"), col("r"),
          when(uu < 0.3678794412, 0).when(uu < 0.7357588823, 1)
            .when(uu < 0.9196986029, 2).when(uu < 0.9810118431, 3)
            .when(uu < 0.9963401532, 4).when(uu < 0.9994058152, 5)
            .otherwise(6).as("w"))
      val m = reps.groupBy("r")
        .agg((sum(expr("CAST(w*o_totalprice AS DECIMAL(28,6))")).cast("double") /
          sum("w").cast("long")).as("mean_r"))
      // replicate-pinned double folds: the former DECIMAL(28,12)/(38,12)
      // re-entries relied on DuckDB's double→DECIMAL cast, which is not
      // correctly rounded at high scale (round-10 finding)
      val b = m.agg(count(lit(1)).as("nb"),
        expr("aggregate(array_sort(collect_list(named_struct('r', r, 'v', mean_r))), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x.v)").as("sm"),
        expr("aggregate(array_sort(collect_list(named_struct('r', r, 'v', mean_r*mean_r))), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x.v)").as("sq"))
      val f = Tables.orders(s, d).agg(count(lit(1)).as("n"),
        (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("mean"))
      f.crossJoin(broadcast(b))
        .selectExpr("n", "mean", "sm/nb AS boot_mean",
          "sqrt((sq - sm*sm/nb)/(nb-1)) AS boot_se",
          "sm/nb - 1.96*sqrt((sq - sm*sm/nb)/(nb-1)) AS ci_lo",
          "sm/nb + 1.96*sqrt((sq - sm*sm/nb)/(nb-1)) AS ci_hi")
    },

    // B92 — Mann-Whitney U (two-sample rank-sum, urgent vs low priority
    // order value): the nonparametric counterpart of B59's Welch t —
    // detects a location shift with no normality assumption, and its U
    // statistic IS F9's AUC numerator (U = AUC·n1·n2), tying the test
    // family to the ranking family. Ranks come from F9's distributed
    // machinery (dense ids via range-partitioned surrogate keys, per-
    // value groups carry min-rank + tie count — no global single-sort
    // window); average ranks are exact halves, so every rank term
    // re-enters DECIMAL losslessly and the rank sum is EXACT in both
    // engines (not an FP-order truce). Tie-corrected normal
    // approximation; Σ(t³−t) falls out per row as nt²−1.
    QueryDef.sql("q_mann_whitney",
      """WITH s AS (SELECT o_totalprice AS v,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT','5-LOW')),
        |r AS (SELECT v, g1, rank() OVER (ORDER BY v) AS rk,
        |        count(*) OVER (PARTITION BY v) AS nt FROM s),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN g1 = 1
        |         THEN CAST(rk + (nt-1)/2.0 AS DECIMAL(28,6)) END) AS DOUBLE) AS r1,
        |    CAST(sum(g1) AS BIGINT) AS n1, count(*) AS n,
        |    CAST(sum(nt*nt - 1) AS BIGINT) AS tsum
        |  FROM r)
        |SELECT n1, n - n1 AS n2,
        |  r1 - n1*(n1+1)/2.0 AS u1,
        |  (r1 - n1*(n1+1)/2.0) / (n1*(n - n1)) AS auc,
        |  (r1 - n1*(n1+1)/2.0 - n1*(n - n1)/2.0)
        |    / sqrt( (CAST(n1 AS DOUBLE)*(n - n1)/12.0)
        |            * ((n + 1) - CAST(tsum AS DOUBLE)/(n*(n-1.0))) ) AS z
        |FROM a""".stripMargin) { (s, d) =>
      import graft.operators.Relational
      val sc = Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_totalprice").as("v"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("g1"))
      val ranked = Relational.surrogateKey(sc, "rid", Seq(col("v")))
      val per = ranked.groupBy("v")
        .agg((min(col("rid")) + 1L).as("minrk"), count(lit(1)).as("nt"),
          sum("g1").as("n1v"))
      per.agg(
          sum(expr("CAST(n1v * (minrk + (nt-1)/2.0D) AS DECIMAL(28,6))"))
            .cast("double").as("r1"),
          sum("n1v").cast("long").as("n1"), sum("nt").cast("long").as("n"),
          sum(expr("nt*(nt*nt - 1)")).cast("long").as("tsum"))
        .selectExpr("n1", "n - n1 AS n2",
          "r1 - n1*(n1+1)/2.0D AS u1",
          "(r1 - n1*(n1+1)/2.0D) / (n1*(n - n1)) AS auc",
          """(r1 - n1*(n1+1)/2.0D - n1*(n - n1)/2.0D)
            |  / sqrt( (CAST(n1 AS DOUBLE)*(n - n1)/12.0D)
            |          * ((n + 1) - CAST(tsum AS DOUBLE)/(n*(n-1.0D))) ) AS z""".stripMargin)
    },

    // B91 — Wald-Wolfowitz runs test on the daily revenue sequence: is
    // above/below-median alternation random, or does revenue trend/mean-
    // revert? (The nonparametric complement of B43's autocorrelation —
    // no distributional assumption at all.) Daily rollup is the only
    // data-scale stage; median is the exact lower order statistic with a
    // (rev, day) tie-broken rank; the median day itself is excluded
    // (standard practice — and the only value that can EQUAL the median
    // in doubles); run boundaries from one lag window over the
    // date-dimension-sized daily table; closed-form normal approximation
    // z = (R − μ)/σ from the integer run/sign counts.
    QueryDef.sql("q_runs_test",
      """WITH dly AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1),
        |med AS (SELECT rev AS m FROM (
        |    SELECT rev, row_number() OVER (ORDER BY rev, day) AS rn,
        |           count(*) OVER () AS n FROM dly)
        |  WHERE rn = (n+1)//2),
        |sgn AS (SELECT day, rev > m AS above FROM dly CROSS JOIN med WHERE rev <> m),
        |r AS (SELECT above, lag(above) OVER (ORDER BY day) AS prev FROM sgn),
        |agg AS (SELECT
        |    CAST(sum(CASE WHEN prev IS NULL OR above <> prev THEN 1 ELSE 0 END) AS BIGINT) AS runs,
        |    CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT) AS n2 FROM r)
        |SELECT runs, n1, n2,
        |  1.0 + 2.0*n1*n2/(n1+n2) AS mu,
        |  sqrt((2.0*n1*n2*(2.0*n1*n2 - n1 - n2)) / ((n1+n2)*(n1+n2)*(n1+n2-1.0))) AS sigma,
        |  (runs - (1.0 + 2.0*n1*n2/(n1+n2))) /
        |    sqrt((2.0*n1*n2*(2.0*n1*n2 - n1 - n2)) / ((n1+n2)*(n1+n2)*(n1+n2-1.0))) AS z
        |FROM agg""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dly = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
      // exact lower-median order statistic over the date-dim-sized rollup
      val ranked = dly
        .withColumn("rn", row_number().over(Window.orderBy(col("rev"), col("day"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      val med = ranked.filter(col("rn") === expr("(n+1) div 2")).select(col("rev").as("m"))
      val sgn = dly.crossJoin(broadcast(med))
        .filter(col("rev") =!= col("m"))
        .select(col("day"), (col("rev") > col("m")).as("above"))
      val r = sgn.withColumn("prev", lag(col("above"), 1).over(Window.orderBy("day")))
      r.agg(
          sum(when(col("prev").isNull || col("above") =!= col("prev"), 1).otherwise(0))
            .cast("long").as("runs"),
          sum(when(col("above"), 1).otherwise(0)).cast("long").as("n1"),
          sum(when(col("above"), 0).otherwise(1)).cast("long").as("n2"))
        .selectExpr("runs", "n1", "n2",
          // double-D literals: Spark types bare 1.0/2.0 as DECIMAL and
          // the whole closed form would go decimal (dtype-gate find)
          "1.0D + 2.0D*n1*n2/(n1+n2) AS mu",
          "sqrt((2.0D*n1*n2*(2.0D*n1*n2 - n1 - n2)) / ((n1+n2)*(n1+n2)*(n1+n2-1.0D))) AS sigma",
          """(runs - (1.0D + 2.0D*n1*n2/(n1+n2))) /
            | sqrt((2.0D*n1*n2*(2.0D*n1*n2 - n1 - n2)) / ((n1+n2)*(n1+n2)*(n1+n2-1.0D))) AS z""".stripMargin)
    },

    // B95 — EXACT Kendall tau-b over the full fact table, at any scale:
    // the O(n²) pair statistic collapses onto the (x, y) CONTINGENCY
    // table when both variables are low-cardinality (quantity has 50
    // values, discount 11 → 550 cells, fixed by the value domain, not
    // the data volume). Concordant/discordant pair counts come from one
    // cell×cell pass (550² — a bounded broadcast nested-loop, the SAME
    // bounded-domain argument as the B18 histogram); tie terms from the
    // marginals. Every count is an exact BIGINT; tau is one closed-form
    // double expression over their images (the (n0−n1)(n0−n2) product
    // would overflow int64 at ~1e6 rows, so each factor casts to DOUBLE
    // BEFORE the multiply — in both engines).
    QueryDef.sql("q_kendall_tau",
      """WITH ct AS (
        |  SELECT l_quantity AS x, l_discount AS y, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |cd AS (
        |  SELECT
        |    CAST(sum(CASE WHEN a.y < b.y THEN a.c*b.c ELSE 0 END) AS BIGINT) AS conc,
        |    CAST(sum(CASE WHEN a.y > b.y THEN a.c*b.c ELSE 0 END) AS BIGINT) AS disc
        |  FROM ct a JOIN ct b ON a.x < b.x),
        |tx AS (SELECT CAST(sum(cx*(cx-1)) AS BIGINT) AS t2x
        |       FROM (SELECT sum(c) AS cx FROM ct GROUP BY x)),
        |ty AS (SELECT CAST(sum(cy*(cy-1)) AS BIGINT) AS t2y
        |       FROM (SELECT sum(c) AS cy FROM ct GROUP BY y)),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ct)
        |SELECT n, conc, disc,
        |  (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE)) /
        |  sqrt( (CAST(n AS DOUBLE)*(n-1)/2 - CAST(t2x AS DOUBLE)/2)
        |      * (CAST(n AS DOUBLE)*(n-1)/2 - CAST(t2y AS DOUBLE)/2) ) AS tau
        |FROM cd, tx, ty, nn""".stripMargin) { (s, d) =>
      val ct = Tables.lineitem(s, d)
        .groupBy(col("l_quantity").as("x"), col("l_discount").as("y"))
        .agg(count(lit(1)).as("c"))
      val a = ct.select(col("x").as("ax"), col("y").as("ay"), col("c").as("ac"))
      val b = ct.select(col("x").as("bx"), col("y").as("by"), col("c").as("bc"))
      val cd = a.join(b, col("ax") < col("bx")) // 550×550 cells: bounded BNLJ
        .agg(
          sum(when(col("ay") < col("by"), col("ac") * col("bc")).otherwise(0L)).as("conc"),
          sum(when(col("ay") > col("by"), col("ac") * col("bc")).otherwise(0L)).as("disc"))
      val tx = ct.groupBy("x").agg(sum("c").as("cx"))
        .agg(sum(col("cx") * (col("cx") - 1)).as("t2x"))
      val ty = ct.groupBy("y").agg(sum("c").as("cy"))
        .agg(sum(col("cy") * (col("cy") - 1)).as("t2y"))
      val nn = ct.agg(sum("c").as("n"))
      cd.crossJoin(broadcast(tx)).crossJoin(broadcast(ty)).crossJoin(broadcast(nn))
        .selectExpr("n", "conc", "disc",
          """(CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE)) /
            |sqrt( (CAST(n AS DOUBLE)*(n-1)/2 - CAST(t2x AS DOUBLE)/2)
            |    * (CAST(n AS DOUBLE)*(n-1)/2 - CAST(t2y AS DOUBLE)/2) ) AS tau""".stripMargin)
    },

    // B96 — mutual information + normalized MI between customer segment
    // and order priority (the categorical-association audit chi² (B58)
    // ranks but can't SIZE: MI is in nats, comparable across pairs). One
    // data-scale contingency pass; marginals and entropies derive from
    // the 25-cell table. Ordering discipline: each p·ln term re-enters
    // DECIMAL(28,18) before its sum (B84), so neither engine's cell
    // order can perturb the total; the 1-row n/marginal factors
    // broadcast.
    QueryDef.sql("q_mutual_info", {
      // Portable ln + key-pinned folds (round 10): the former
      // CAST(<double> AS DECIMAL(28,18)) re-entry is NOT engine-portable
      // (DuckDB's double→DECIMAL cast isn't correctly rounded at high
      // scale) and ln() itself is host-libm-dependent in DuckDB.
      import graft.functions.PortableMath.lnSql
      s"""WITH j AS (
        |  SELECT c_mktsegment AS sgm, o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS c
        |  FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1, 2),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
        |mx AS (SELECT sgm, CAST(sum(c) AS BIGINT) AS cx FROM j GROUP BY 1),
        |my AS (SELECT pri, CAST(sum(c) AS BIGINT) AS cy FROM j GROUP BY 1),
        |mir AS (SELECT sgm, pri, CAST(c AS DOUBLE)/n AS pxy,
        |          CAST(c AS DOUBLE)*n/(CAST(cx AS DOUBLE)*cy) AS ratio
        |        FROM j JOIN mx USING (sgm) JOIN my USING (pri) CROSS JOIN nn),
        |mil AS (SELECT sgm, pri, pxy * ${lnSql("ratio")} AS v FROM mir),
        |mit AS (SELECT list_reduce(list(v ORDER BY sgm, pri), (a, b) -> a + b) AS mi FROM mil),
        |exr AS (SELECT sgm, CAST(cx AS DOUBLE)/n AS px FROM mx CROSS JOIN nn),
        |exl AS (SELECT sgm, -(px * ${lnSql("px")}) AS v FROM exr),
        |ex AS (SELECT list_reduce(list(v ORDER BY sgm), (a, b) -> a + b) AS hx FROM exl),
        |eyr AS (SELECT pri, CAST(cy AS DOUBLE)/n AS py FROM my CROSS JOIN nn),
        |eyl AS (SELECT pri, -(py * ${lnSql("py")}) AS v FROM eyr),
        |ey AS (SELECT list_reduce(list(v ORDER BY pri), (a, b) -> a + b) AS hy FROM eyl)
        |SELECT n, mi, hx, hy, mi/sqrt(hx*hy) AS nmi FROM mit, ex, ey, nn""".stripMargin
    }) { (s, d) =>
      import graft.functions.PortableMath.pLn
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment").as("sgm"), col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("c"))
      val nn = j.agg(sum("c").as("n"))
      val mx = j.groupBy("sgm").agg(sum("c").as("cx"))
      val my = j.groupBy("pri").agg(sum("c").as("cy"))
      val mit = j.join(broadcast(mx), "sgm").join(broadcast(my), "pri")
        .crossJoin(broadcast(nn))
        .selectExpr("sgm", "pri", "CAST(c AS DOUBLE)/n AS pxy",
          "CAST(c AS DOUBLE)*n/(CAST(cx AS DOUBLE)*cy) AS ratio")
        .select(col("sgm"), col("pri"), (col("pxy") * pLn(col("ratio"))).as("v"))
        .agg(expr("aggregate(array_sort(collect_list(named_struct('sgm', sgm, 'pri', pri, 'v', v))), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x.v)").as("mi"))
      val ex = mx.crossJoin(broadcast(nn))
        .selectExpr("sgm", "CAST(cx AS DOUBLE)/n AS px")
        .select(col("sgm"), (-(col("px") * pLn(col("px")))).as("v"))
        .agg(expr("aggregate(array_sort(collect_list(named_struct('sgm', sgm, 'v', v))), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x.v)").as("hx"))
      val ey = my.crossJoin(broadcast(nn))
        .selectExpr("pri", "CAST(cy AS DOUBLE)/n AS py")
        .select(col("pri"), (-(col("py") * pLn(col("py")))).as("v"))
        .agg(expr("aggregate(array_sort(collect_list(named_struct('pri', pri, 'v', v))), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x.v)").as("hy"))
      mit.crossJoin(broadcast(ex)).crossJoin(broadcast(ey)).crossJoin(broadcast(nn))
        .selectExpr("n", "mi", "hx", "hy", "mi/sqrt(hx*hy) AS nmi")
    },

    // B101 — EXACT quartiles of a data-scale column by two-pass BRACKET
    // SELECTION — the scale-correct alternative to both exact
    // `percentile` (builds a per-partition value map; measured 10-15 s on
    // 3M near-distinct doubles in B97's profiling — it's built for
    // repeated values) and `approx_percentile` (wrong answer). Pass 1:
    // count + a t-digest bracket around each target rank (±1% rank
    // margin, two orders above the sketch's rank error). Pass 2: ONE
    // conditional aggregate counts rows below each bracket and collects
    // the in-bracket slivers (~2% of n each; the margin shrinks with
    // sketch accuracy at larger n — the 100 TB setting is acc 10⁶ →
    // ~10⁻⁵n sliver). The driver then indexes the sorted sliver at the
    // exact global rank and interpolates — selection, not sorting: no
    // global sort, no value map, two linear scans at any scale.
    // Equal-endpoint brackets (a massively duplicated value) short-cut to
    // the endpoint itself.
    QueryDef.sql("q_exact_quartiles",
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.75) AS p75
        |FROM lineitem""".stripMargin) { (s, d) =>
      val xs = Tables.lineitem(s, d).select(col("l_extendedprice").as("x"))
      val qs = Seq(0.25, 0.5, 0.75)
      val margin = 0.01
      // pass 1: count + bracket endpoints (one t-digest over the column)
      val probes = qs.flatMap(q => Seq(math.max(0.0, q - margin), math.min(1.0, q + margin)))
      val r1 = xs.agg(count(lit(1)).as("n"),
        expr(s"approx_percentile(x, array(${probes.mkString(",")}), 10000)").as("br")).head()
      val n = r1.getLong(0)
      val br = r1.getAs[scala.collection.Seq[Double]](1)
      // pass 2: one aggregate — below-counts and in-bracket slivers for all
      // three quantiles together
      val aggs = qs.indices.flatMap { i =>
        val (lo, hi) = (br(2 * i), br(2 * i + 1))
        Seq(
          sum(when(col("x") < lo, 1L).otherwise(0L)).as(s"below$i"),
          sort_array(collect_list(when(col("x") >= lo && col("x") <= hi, col("x"))))
            .as(s"sliver$i"))
      }
      val r2 = xs.agg(aggs.head, aggs.tail: _*).head()
      val vals = qs.indices.map { i =>
        val (lo, hi) = (br(2 * i), br(2 * i + 1))
        if (lo == hi) lo // degenerate bracket: a massively duplicated value
        else {
          val below = r2.getAs[Long](s"below$i")
          val sliver = r2.getAs[scala.collection.Seq[Double]](s"sliver$i")
          val pos = (n - 1) * qs(i) // 0-based continuous rank
          val k0 = pos.toLong
          val frac = pos - k0
          def at(k: Long): Double = {
            val idx = k - below
            require(idx >= 0 && idx < sliver.length,
              s"rank $k outside bracket [$lo,$hi] (below=$below, sliver=${sliver.length})")
            sliver(idx.toInt)
          }
          val v0 = at(k0)
          if (frac == 0.0) v0 else v0 + (at(k0 + 1) - v0) * frac
        }
      }
      import s.implicits._
      Seq((n, vals(0), vals(1), vals(2))).toDF("n", "p25", "p50", "p75")
    },

    // B108 — DETERMINISTIC randomization test for the urgent-vs-rest mean
    // order value (the assumption-free companion to B59's Welch t: no
    // normality, no variance model — just "is the observed gap bigger
    // than chance relabelings produce?"). Where RNG permutation tests
    // aren't reproducible across engines or partitionings, the 20
    // relabelings here are HASH-pseudo-random (H6's md5-fraction uniform
    // over (key, round) — engine-identical by construction), each row
    // reassigned Bernoulli(n1/n) — the randomization-test variant of the
    // exact permutation null (group sizes vary binomially; documented).
    // Plan shape: ONE ×20 projection fan-out collapsing into a 20-group
    // partial agg — raw rows never shuffle, every group sum is exact
    // DECIMAL, and p = (1 + #extreme)/(R+1) is the standard add-one
    // estimate.
    QueryDef.sql("q_perm_test", {
      val u = graft.operators.Curation.uniformDuck("k || '_' || r")
      s"""WITH base AS (
         |  SELECT o_orderkey AS k, o_totalprice AS v,
         |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
         |  FROM orders),
         |ob AS (SELECT CAST(sum(g) AS BIGINT) AS n1, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(CASE WHEN g = 1 THEN CAST(v AS DECIMAL(18,2)) END) AS DOUBLE) AS s1,
         |              CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS st FROM base),
         |obs AS (SELECT n1, n, s1/n1 - (st - s1)/(n - n1) AS d_obs,
         |               CAST(n1 AS DOUBLE)/n AS p1 FROM ob),
         |fan AS (SELECT base.k, base.v, r.r, obs.p1 FROM base
         |        CROSS JOIN (SELECT unnest(generate_series(1, 20)) AS r) r CROSS JOIN obs),
         |perm AS (
         |  SELECT r,
         |    CAST(sum(CASE WHEN $u < p1 THEN CAST(v AS DECIMAL(18,2)) END) AS DOUBLE) AS ps1,
         |    CAST(sum(CASE WHEN $u < p1 THEN 1 ELSE 0 END) AS BIGINT) AS pn1,
         |    CAST(count(*) AS BIGINT) AS pn,
         |    CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS pst
         |  FROM fan GROUP BY 1),
         |pd AS (SELECT r, ps1/pn1 - (pst - ps1)/(pn - pn1) AS d_r FROM perm)
         |SELECT obs.n, obs.n1, obs.d_obs,
         |  CAST(sum(CASE WHEN abs(d_r) >= abs(d_obs) THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
         |  (1.0 + sum(CASE WHEN abs(d_r) >= abs(d_obs) THEN 1 ELSE 0 END)) / 21.0 AS p_value
         |FROM pd CROSS JOIN obs GROUP BY 1, 2, 3""".stripMargin
    }) { (s, d) =>
      import graft.operators.Curation
      val base = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), col("o_totalprice").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("g"))
      val obs = base.agg(
          sum("g").as("n1"), count(lit(1)).as("n"),
          expr("CAST(sum(CASE WHEN g = 1 THEN CAST(v AS DECIMAL(18,2)) END) AS DOUBLE)").as("s1"),
          expr("CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)").as("st"))
        .selectExpr("n1", "n", "s1/n1 - (st - s1)/(n - n1) AS d_obs",
          "CAST(n1 AS DOUBLE)/n AS p1")
      val fan = base
        .crossJoin(broadcast(obs.select("p1")))
        .select(col("k"), col("v"), col("p1"),
          explode(expr("sequence(1, 20)")).as("r"))
        .withColumn("in1", Curation.uniform(concat(col("k"), lit("_"), col("r"))) < col("p1"))
      val pd = fan.groupBy("r").agg(
          expr("CAST(sum(CASE WHEN in1 THEN CAST(v AS DECIMAL(18,2)) END) AS DOUBLE)").as("ps1"),
          sum(when(col("in1"), 1L).otherwise(0L)).as("pn1"),
          count(lit(1)).as("pn"),
          expr("CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)").as("pst"))
        .selectExpr("ps1/pn1 - (pst - ps1)/(pn - pn1) AS d_r")
      pd.crossJoin(broadcast(obs))
        .groupBy("n", "n1", "d_obs")
        .agg(sum(when(abs(col("d_r")) >= abs(col("d_obs")), 1L).otherwise(0L)).as("n_extreme"),
          ((lit(1.0) + sum(when(abs(col("d_r")) >= abs(col("d_obs")), 1L).otherwise(0L))) / 21.0)
            .as("p_value"))
    },

    // Cross-engine canary for functions/PortableMath.scala: evaluates
    // every portable transcendental over a 1000-point deterministic grid
    // (exact integer-derived inputs, so both engines start from identical
    // bits) and pushes the results through the driver's bit-exact hash
    // gate. If any engine/compiler/libm change ever breaks the IEEE
    // op-for-op parity the portable layer depends on, THIS query reds
    // first — with a diff that names the drifting function.
    QueryDef.sql("q_math_portable", {
      import graft.functions.PortableMath._
      s"""WITH g AS (SELECT DISTINCT CAST(o_orderkey % 1000 AS BIGINT) AS g FROM orders),
         |b AS (SELECT g,
         |  CAST(g + 1 AS DOUBLE) AS xp,
         |  CAST(g + 1 AS DOUBLE) / 1000.0 AS p,
         |  (CAST(g AS DOUBLE) - 500.0) / 160.0 AS ang,
         |  (CAST(g AS DOUBLE) - 500.0) / 10.0 AS w,
         |  CAST(g AS DOUBLE) / 1000.0 AS z,
         |  CAST(g AS DOUBLE) / 50.0 AS ex
         |  FROM g)
         |SELECT g,
         |  ${lnSql("xp")} AS ln_x,
         |  ${lnSql("p")} AS ln_p,
         |  ${log2Sql("xp")} AS log2_x,
         |  ${sinSql("ang")} AS sin_a,
         |  ${cosSql("ang")} AS cos_a,
         |  ${atanSql("w")} AS atan_w,
         |  ${asinSql("z")} AS asin_z,
         |  ${exp2Sql("ex")} AS exp2_x
         |FROM b ORDER BY g""".stripMargin
    }) { (s, d) =>
      import graft.functions.PortableMath._
      val g = Tables.orders(s, d)
        .select((col("o_orderkey") % 1000).cast("long").as("g")).distinct()
      val b = g.select(col("g"),
        (col("g") + lit(1L)).cast("double").as("xp"),
        ((col("g") + lit(1L)).cast("double") / lit(1000.0)).as("p"),
        ((col("g").cast("double") - lit(500.0)) / lit(160.0)).as("ang"),
        ((col("g").cast("double") - lit(500.0)) / lit(10.0)).as("w"),
        (col("g").cast("double") / lit(1000.0)).as("z"),
        (col("g").cast("double") / lit(50.0)).as("ex"))
      b.select(col("g"),
        pLn(col("xp")).as("ln_x"),
        pLn(col("p")).as("ln_p"),
        pLog2(col("xp")).as("log2_x"),
        pSin(col("ang")).as("sin_a"),
        pCos(col("ang")).as("cos_a"),
        pAtan(col("w")).as("atan_w"),
        pAsin(col("z")).as("asin_z"),
        expr(exp2SparkSql("ex")).as("exp2_x"))
        .orderBy("g")
    },

    // B110 — Cramér's V: the EFFECT-SIZE companion to B58's chi² report
    // (a chi² statistic grows with n; V normalizes it to [0,1] so the
    // association strength is comparable across corpus sizes — the number
    // a 100 TB drift monitor actually thresholds on). Same contingency
    // shape as B58: cell counts in one partial agg, margins as two
    // agg-sized broadcasts; chi² is a pinned left fold over the ≤ r·c
    // cell terms (B84's list_reduce / aggregate(array_sort(...)) pair —
    // a plain double SUM would be engine-order-dependent); V closes with
    // one division + one correctly-rounded sqrt.
    QueryDef.sql("q_cramers_v",
      """WITH obs AS (
        |  SELECT event_type, CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
        |         count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY 1),
        |ct AS (SELECT dow, sum(o) AS c FROM obs GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
        |cell AS (
        |  SELECT obs.event_type, obs.dow,
        |    (obs.o - CAST(rt.r AS DOUBLE) * ct.c / t.n)
        |      * (obs.o - CAST(rt.r AS DOUBLE) * ct.c / t.n)
        |      / (CAST(rt.r AS DOUBLE) * ct.c / t.n) AS term
        |  FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN t),
        |agg AS (
        |  SELECT (SELECT n FROM t) AS n,
        |    (SELECT count(*) FROM rt) AS rk,
        |    (SELECT count(*) FROM ct) AS ck,
        |    list_reduce(list(term ORDER BY event_type, dow), (a, b) -> a + b) AS chi2
        |  FROM cell)
        |SELECT CAST(n AS BIGINT) AS n, CAST((rk - 1) * (ck - 1) AS BIGINT) AS dof, chi2,
        |  sqrt(chi2 / CAST(n * (least(rk, ck) - 1) AS DOUBLE)) AS cramers_v
        |FROM agg""".stripMargin) { (s, d) =>
      val obs = Tables.events(s, d)
        .groupBy(col("event_type"),
          (((dayofweek(to_date(col("ts"))) + 5) % 7) + 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("o"))
      val rt = obs.groupBy("event_type").agg(sum("o").as("r"))
      val ct = obs.groupBy("dow").agg(sum("o").as("c"))
      val t = obs.agg(sum("o").cast("long").as("n"))
      val rk = rt.agg(count(lit(1)).as("rk"))
      val ck = ct.agg(count(lit(1)).as("ck"))
      val e = col("r").cast("double") * col("c") / col("n")
      obs.join(broadcast(rt), "event_type").join(broadcast(ct), "dow")
        .crossJoin(broadcast(t))
        .select(col("event_type"), col("dow"), col("n"),
          ((col("o") - e) * (col("o") - e) / e).as("term"))
        .agg(first("n").as("n"),
          expr("aggregate(array_sort(collect_list(struct(event_type, dow, term))), " +
            "CAST(0 AS DOUBLE), (a, x) -> a + x.term)").as("chi2"))
        .crossJoin(broadcast(rk)).crossJoin(broadcast(ck))
        .selectExpr("CAST(n AS BIGINT) AS n",
          "CAST((rk - 1) * (ck - 1) AS BIGINT) AS dof", "chi2",
          "sqrt(chi2 / CAST(n * (least(rk, ck) - 1) AS DOUBLE)) AS cramers_v")
    },

    // B111 — Cohen's d: pairwise standardized mean difference of order
    // value across market segments — the effect size behind B59's Welch
    // t (a t-statistic says "significant at this n"; d says "big enough
    // to matter", which is n-free). Group moments are ONE exact-DECIMAL
    // partial agg (B84's discipline: cents-exact sums, correctly-rounded
    // DECIMAL→DOUBLE exit on both engines via the VARCHAR path in
    // DuckDB); the k(k−1)/2 pairs come from a self-join of the 5-row
    // stats frame — segment² is a constant, never data-scale. Pooled-SD
    // closed form is one fixed IEEE expression.
    QueryDef.sql("q_cohens_d",
      """WITH g AS (
        |  SELECT c_mktsegment AS seg, count(*) AS n,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
        |    sum(CAST(o_totalprice*o_totalprice AS DECIMAL(38,4))) AS q
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  GROUP BY 1),
        |st AS (
        |  SELECT seg, CAST(n AS BIGINT) AS n,
        |    CAST(CAST(s AS VARCHAR) AS DOUBLE) / n AS mean,
        |    (CAST(CAST(q AS VARCHAR) AS DOUBLE)
        |      - (CAST(CAST(s AS VARCHAR) AS DOUBLE) / n)
        |        * CAST(CAST(s AS VARCHAR) AS DOUBLE)) / (n - 1) AS vr
        |  FROM g)
        |SELECT a.seg AS seg_a, b.seg AS seg_b, a.n AS n_a, b.n AS n_b,
        |  a.mean AS mean_a, b.mean AS mean_b,
        |  (a.mean - b.mean)
        |    / sqrt(((a.n - 1) * a.vr + (b.n - 1) * b.vr) / (a.n + b.n - 2)) AS cohens_d
        |FROM st a JOIN st b ON a.seg < b.seg
        |ORDER BY seg_a, seg_b""".stripMargin) { (s, d) =>
      val seg = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      val st = Tables.orders(s, d)
        .join(seg, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"),
          expr("sum(CAST(o_totalprice AS DECIMAL(18,2)))").as("s"),
          expr("sum(CAST(o_totalprice*o_totalprice AS DECIMAL(38,4)))").as("q"))
        .selectExpr("seg", "CAST(n AS BIGINT) AS n",
          "CAST(s AS DOUBLE) / n AS mean",
          "(CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n) * CAST(s AS DOUBLE)) / (n - 1) AS vr")
      val a = st.select(col("seg").as("seg_a"), col("n").as("n_a"),
        col("mean").as("mean_a"), col("vr").as("vr_a"))
      val b = st.select(col("seg").as("seg_b"), col("n").as("n_b"),
        col("mean").as("mean_b"), col("vr").as("vr_b"))
      a.join(broadcast(b), col("seg_a") < col("seg_b"))
        .selectExpr("seg_a", "seg_b", "n_a", "n_b", "mean_a", "mean_b",
          "(mean_a - mean_b) / sqrt(((n_a - 1) * vr_a + (n_b - 1) * vr_b) " +
            "/ (n_a + n_b - 2)) AS cohens_d")
        .orderBy("seg_a", "seg_b")
    },

    // B112 — two-proportion z-test: the A/B-test primitive (did variant
    // A's conversion rate beat B's beyond noise?). Cohorts are a
    // deterministic user_id split; "converted" = the user crossed a
    // fixed purchase-count threshold (≥14 — chosen off the cross-scale
    // median so neither cohort is ever all-0/all-1, which would zero the
    // pooled variance) — the whole test reduces to FOUR integers, so the
    // statistic is
    // a fixed closed form over exact counts (no variance estimation on
    // doubles at all). At 100 TB the per-user reduce is the only
    // data-scale stage and it's one partial agg.
    QueryDef.sql("q_prop_ztest",
      """WITH pu AS (
        |  SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
        |         THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |g AS (SELECT user_id % 2 AS grp, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(conv) AS BIGINT) AS x
        |      FROM pu GROUP BY 1),
        |p AS (SELECT
        |  max(CASE WHEN grp = 0 THEN n END) AS n0, max(CASE WHEN grp = 0 THEN x END) AS x0,
        |  max(CASE WHEN grp = 1 THEN n END) AS n1, max(CASE WHEN grp = 1 THEN x END) AS x1
        |  FROM g)
        |SELECT n0, x0, n1, x1,
        |  CAST(x0 AS DOUBLE) / n0 AS p0, CAST(x1 AS DOUBLE) / n1 AS p1,
        |  (CAST(x0 AS DOUBLE) / n0 - CAST(x1 AS DOUBLE) / n1)
        |    / nullif(sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
        |        * (1.0 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
        |        * (1.0 / n0 + 1.0 / n1)), 0) AS z
        |FROM p""".stripMargin) { (s, d) =>
      val pu = Tables.events(s, d)
        .groupBy("user_id")
        .agg(when(sum(when(col("event_type") === "purchase", 1).otherwise(0)) >= 14, 1)
          .otherwise(0).as("conv"))
      pu.groupBy((col("user_id") % 2).as("grp"))
        .agg(count(lit(1)).cast("long").as("n"), sum("conv").cast("long").as("x"))
        .agg(max(when(col("grp") === 0, col("n"))).as("n0"),
          max(when(col("grp") === 0, col("x"))).as("x0"),
          max(when(col("grp") === 1, col("n"))).as("n1"),
          max(when(col("grp") === 1, col("x"))).as("x1"))
        .selectExpr("n0", "x0", "n1", "x1",
          "CAST(x0 AS DOUBLE) / n0 AS p0", "CAST(x1 AS DOUBLE) / n1 AS p1",
          // nullif(denominator, 0): an all- or never-converted cohort pair
          // (pooled rate 0 or 1) must yield z = NULL IDENTICALLY in both
          // engines — bare division diverges (Spark legacy NULL vs DuckDB
          // IEEE inf/NaN) the moment some other scale degenerates the
          // cohorts; threshold tuning alone was carrying this before.
          "(CAST(x0 AS DOUBLE) / n0 - CAST(x1 AS DOUBLE) / n1) " +
            "/ nullif(sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1)) " +
            "* (1.0 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1)) " +
            "* (1.0 / n0 + 1.0 / n1)), 0) AS z")
    },

    // B113 — Herfindahl–Hirschman concentration index per nation: how
    // concentrated is each nation's revenue across its customers (the
    // antitrust statistic, and the data-pipeline statistic for "is one
    // source/customer dominating this shard"). Revenue is cents-exact
    // BIGINT; the share-square sum needs rev² — up to ~2.5e19 per
    // customer, past BIGINT — so it accumulates in DECIMAL(38,0) (Spark)
    // / HUGEINT (DuckDB), both exiting to DOUBLE correctly rounded (the
    // VARCHAR path on the DuckDB side). HHI = 10⁴·Σrev²/(Σrev)² — one
    // fixed expression per nation; headroom: Σrev < 2^53 to ~sf100.
    QueryDef.sql("q_herfindahl",
      """WITH crev AS (
        |  SELECT c_nationkey, o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(rev) AS BIGINT) AS rev_cents,
        |    CAST(CAST(sum(CAST(rev AS HUGEINT) * rev) AS VARCHAR) AS DOUBLE) AS sumsq
        |  FROM crev GROUP BY 1)
        |SELECT n_name AS nation, n_customers, rev_cents,
        |  10000.0 * sumsq / (CAST(rev_cents AS DOUBLE) * rev_cents) AS hhi
        |FROM agg JOIN nation ON n_nationkey = c_nationkey
        |ORDER BY nation""".stripMargin) { (s, d) =>
      val crev = Tables.orders(s, d)
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_nationkey", "o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      val agg = crev.groupBy("c_nationkey")
        .agg(count(lit(1)).cast("long").as("n_customers"),
          sum("rev").cast("long").as("rev_cents"),
          expr("CAST(sum(CAST(rev AS DECIMAL(38,0)) * rev) AS DOUBLE)").as("sumsq"))
      agg.join(broadcast(Tables.nation(s, d)),
          col("n_nationkey") === col("c_nationkey"))
        .selectExpr("n_name AS nation", "n_customers", "rev_cents",
          "10000.0 * sumsq / (CAST(rev_cents AS DOUBLE) * rev_cents) AS hhi")
        .orderBy("nation")
    },

    // B120 — CUPED variance reduction for the B112 A/B cohorts: adjust
    // each cohort's post-period mean by θ·(pre-period deviation), the
    // industry-standard experiment-sensitivity technique (θ = pooled
    // cov(pre,post)/var(pre); pre-period behavior explains away noise
    // the treatment can't have caused). The pre/post split is integer
    // day arithmetic off the global [min,max] midpoint; per-user pre and
    // post are ONE exact-DECIMAL conditional partial agg; θ and the
    // adjusted means are fixed closed forms over the exact co-moment
    // sums (m_linreg's sufficient-statistics discipline — adjusted means
    // need NO per-row pass: mean_adj = mean_post − θ·(mean_pre −
    // grand_mean_pre) is agg algebra). DECIMAL exits via the
    // correctly-rounded VARCHAR path (products pass 2^53 unscaled).
    QueryDef.sql("q_cuped",
      """WITH b AS (
        |  SELECT min(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS lo,
        |         max(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS hi
        |  FROM events),
        |pu AS (
        |  SELECT user_id, user_id % 2 AS cohort,
        |    sum(CASE WHEN datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) <= (lo + hi) // 2
        |        THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS pre,
        |    sum(CASE WHEN datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) > (lo + hi) // 2
        |        THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS post
        |  FROM events CROSS JOIN b GROUP BY 1, 2),
        |u AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(CAST(sum(pre) AS VARCHAR) AS DOUBLE) AS sx,
        |        CAST(CAST(sum(post) AS VARCHAR) AS DOUBLE) AS sy,
        |        CAST(CAST(sum(pre*pre) AS VARCHAR) AS DOUBLE) AS sxx,
        |        CAST(CAST(sum(pre*post) AS VARCHAR) AS DOUBLE) AS sxy
        |      FROM pu),
        |t AS (SELECT sx / n AS gmean_pre,
        |        (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta
        |      FROM u),
        |c AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users,
        |        CAST(CAST(sum(pre) AS VARCHAR) AS DOUBLE) AS csx,
        |        CAST(CAST(sum(post) AS VARCHAR) AS DOUBLE) AS csy
        |      FROM pu GROUP BY 1)
        |SELECT cohort, n_users,
        |  csy / n_users AS mean_post, csx / n_users AS mean_pre,
        |  csy / n_users - theta * (csx / n_users - gmean_pre) AS mean_adjusted,
        |  theta
        |FROM c CROSS JOIN t ORDER BY cohort""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("value"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("day"))
      val b = ev.agg(min("day").as("lo"), max("day").as("hi"))
      val pu = ev.crossJoin(broadcast(b))
        .groupBy(col("user_id"), (col("user_id") % 2).as("cohort"))
        .agg(
          sum(expr("CASE WHEN day <= (lo + hi) DIV 2 " +
            "THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END")).as("pre"),
          sum(expr("CASE WHEN day > (lo + hi) DIV 2 " +
            "THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END")).as("post"))
        .persist()
      val t = pu.agg(count(lit(1)).cast("long").as("n"),
          expr("CAST(sum(pre) AS DOUBLE)").as("sx"),
          expr("CAST(sum(post) AS DOUBLE)").as("sy"),
          expr("CAST(sum(pre*pre) AS DOUBLE)").as("sxx"),
          expr("CAST(sum(pre*post) AS DOUBLE)").as("sxy"))
        .selectExpr("sx / n AS gmean_pre",
          "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta")
      pu.groupBy("cohort")
        .agg(count(lit(1)).cast("long").as("n_users"),
          expr("CAST(sum(pre) AS DOUBLE)").as("csx"),
          expr("CAST(sum(post) AS DOUBLE)").as("csy"))
        .crossJoin(broadcast(t))
        .selectExpr("cohort", "n_users",
          "csy / n_users AS mean_post", "csx / n_users AS mean_pre",
          "csy / n_users - theta * (csx / n_users - gmean_pre) AS mean_adjusted",
          "theta")
        .orderBy("cohort")
    }
  )
}
