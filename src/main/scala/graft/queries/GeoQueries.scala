package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** SURVEY §2 group B (spatial) — distance joins on the cell-bucketing
  * pattern.
  *
  * Reference tie-in: the reference's warehouse carries Latitude/Longitude
  * for every facility and Yelp listing (airflow.py:108-131 into_df_yelp;
  * DDL airflow.py:263-460) but pandas never joins on them. "Which
  * facilities are near which listings" IS the natural next query, and at
  * scale a distance join must NOT be a cross join: bucket both sides
  * into fixed-size lat/lon cells, explode the probe side to its 3×3
  * neighborhood (cell edge ≥ radius, so no true pair can escape), and
  * the candidate join becomes an EQUI-join on cell id; the exact
  * haversine then filters candidates. Probe fan-out is a constant 9×,
  * candidates per cell are density-bounded — the same
  * blocking-then-verify shape as the LSH dedup family, in 2-D.
  *
  * The tables carry no coordinates, so both engines plant them
  * DETERMINISTICALLY from the keys (integer hash → fixed decimal range,
  * the t_pii_scrub trick). Cell ids are computed from the INTEGER hash
  * (integer division), never from floating floor(lat/cell) — a 1-ulp
  * divide drift at a cell boundary would silently bucket an engine's row
  * differently.
  */
object GeoQueries {

  private val radiusKm = 5.0
  // planted coords: lat ∈ [37, 38), lon ∈ [-122.8, -121.8), 1e-5° grid
  private def hLat(k: Column): Column = pmod(k * 2654435761L, lit(100000L))
  private def hLon(k: Column): Column = pmod(k * 97003L + 17L, lit(100000L))
  private def latOf(h: Column): Column = lit(37.0) + h / 100000.0
  private def lonOf(h: Column): Column = lit(-122.8) + h / 100000.0
  private def hLatDuck(k: String) = s"(($k*2654435761) % 100000)"
  private def hLonDuck(k: String) = s"(($k*97003+17) % 100000)"
  // Cell edges are DERIVED from the radius at the tightest exact size,
  // per dimension (r11 hand-fixed 0.1° for both; at a fixed planted
  // domain, density grows linearly with sf, so oversized cells scale the
  // candidate join quadratically — the measured 33× sf0.1→sf1 factor).
  // Exactness bound: a pair within `radiusKm` must sit within ±1 cell in
  // each dimension, so the lat edge needs ≥ radius at the sphere's
  // km/degree, and the lon edge needs ≥ radius at the DOMAIN'S HIGHEST
  // latitude (38°, where a degree of longitude is shortest — the
  // worst-case escape). 2% slack absorbs the spherical-vs-planar
  // approximation; cells stay integer 1e-5° units so bucketing is
  // integer division on both engines, never float floor.
  private val kmPerDegLat = 12742.0176 * math.Pi / 360.0 // = πR/180, R=6371.0088
  private val latCellUnits: Long =
    math.ceil(radiusKm / kmPerDegLat * 100000.0 * 1.02).toLong // 4587 ≈ 0.046°
  private val lonCellUnits: Long =
    math.ceil(radiusKm / (kmPerDegLat * math.cos(math.toRadians(38.0)))
      * 100000.0 * 1.02).toLong // 5821 ≈ 0.058°

  /** Haversine via the native `graft_haversine_km` expression
    * (functions/HaversineExpr.scala): the PortableMath op sequence as one
    * codegen'd static call — bit-identical to the oracle's staged SQL
    * ([[kmCtesSql]]) on any host, and immune to the Column-tree blowup
    * that PushDownPredicates causes for deep staged formulas. */
  private def withHaversineKm(df: DataFrame, lat1: String, lon1: String,
                              lat2: String, lon2: String): DataFrame =
    df.withColumn("km",
      call_function("graft_haversine_km", col(lat1), col(lon1), col(lat2), col(lon2)))

  /** Oracle CTE chain ending in `f` = (c_custkey, s_suppkey, km ≤ radius),
    * km staged through MATERIALIZED CTEs — each
    * stage binds its intermediate so DuckDB's optimizer cannot re-inline
    * the alias chain into one expression (asin's three half-angle steps
    * reference their argument 3× each; inlined, the tree grows ~27×
    * per-halving-compounded and the round-10 run sat >15 CPU-minutes on
    * an sf0.01 oracle). Same op sequence as PortableGeoImpl.haversineKm,
    * which the Spark side runs as the native `graft_haversine_km` call —
    * the two engines differ only in where the textual stage boundaries
    * sit, never in the IEEE op order. Splice after `c`/`s` CTEs; the
    * caller's query then reads FROM f.
    *
    * The candidate generation mirrors the engine's cell blocking instead
    * of a cross join (r11's brute form was 1.5×10⁹ rows at sf1 — the one
    * §2 oracle that didn't scale): the probe side fans to its 3×3 cell
    * neighborhood via two 3-row VALUES joins and candidates equi-join on
    * the cell id. The cell-edge ≥ radius bound makes the blocked pair
    * set ⊇ every true pair, and each (c, s) pair matches on exactly one
    * cell (the supplier's), so after the km filter the result is
    * row-identical to the cross join — the oracle now scales with the
    * engine instead of quadratically. */
  private def kmCtesSql(radius: Double): String = {
    import graft.functions.PortableMath._
    val d2r = "0.017453292519943295"
    s"""cg AS MATERIALIZED (SELECT c_custkey, lat, lon,
       |    (hlat // $latCellUnits) + d1.d AS clat,
       |    (hlon // $lonCellUnits) + d2.d AS clon
       |  FROM c CROSS JOIN (VALUES (-1), (0), (1)) d1(d)
       |         CROSS JOIN (VALUES (-1), (0), (1)) d2(d)),
       |sg AS MATERIALIZED (SELECT s_suppkey, lat, lon,
       |    (hlat // $latCellUnits) AS clat, (hlon // $lonCellUnits) AS clon
       |  FROM s),
       |g0 AS MATERIALIZED (SELECT c.c_custkey, s.s_suppkey,
       |    (((s.lat - c.lat) * $d2r) / 2) AS da,
       |    (((s.lon - c.lon) * $d2r) / 2) AS db,
       |    ((c.lat) * $d2r) AS ra, ((s.lat) * $d2r) AS rb
       |  FROM cg c JOIN sg s ON c.clat = s.clat AND c.clon = s.clon),
       |g1 AS MATERIALIZED (SELECT c_custkey, s_suppkey,
       |    ${sinSql("da")} AS sa, ${sinSql("db")} AS sb,
       |    ${cosSql("ra")} AS ca, ${cosSql("rb")} AS cb FROM g0),
       |g2 AS MATERIALIZED (SELECT c_custkey, s_suppkey,
       |    sqrt((sa * sa) + ((ca * cb) * (sb * sb))) AS z FROM g1),
       |g3 AS MATERIALIZED (SELECT c_custkey, s_suppkey,
       |    least(z, 0.9999999999999999) AS zc FROM g2),
       |g4 AS MATERIALIZED (SELECT c_custkey, s_suppkey,
       |    ((zc) / sqrt(1.0 - (zc) * (zc))) AS w0 FROM g3),
       |g5 AS MATERIALIZED (SELECT c_custkey, s_suppkey, ${atanHalfSql("w0")} AS w1 FROM g4),
       |g6 AS MATERIALIZED (SELECT c_custkey, s_suppkey, ${atanHalfSql("w1")} AS w2 FROM g5),
       |g7 AS MATERIALIZED (SELECT c_custkey, s_suppkey, ${atanHalfSql("w2")} AS w3 FROM g6),
       |f AS MATERIALIZED (SELECT * FROM (
       |    SELECT c_custkey, s_suppkey, 12742.0176 * ${atanTailSql("w3")} AS km FROM g7)
       |  WHERE km <= $radius)""".stripMargin
  }

  /** Shared blocked candidate set for B35/B87: (c_custkey, s_suppkey,
    * km) for every supplier in a customer's 3×3 cell neighborhood that
    * also survives the integer BOUNDING-BOX test. The box (|Δlat| and
    * |Δlon| within one cell edge, in exact 1e-5° integer units) is a
    * superset of the radius circle by the same cell-edge ≥ radius bound
    * that makes the blocking exact — so it can only drop candidates the
    * km filter would drop anyway, but it drops them BEFORE the
    * transcendental haversine chain (~60% of 3×3 candidates; the box is
    * 4r² of the 9r² neighborhood). The sf10 lesson: the planted domain
    * is a fixed 1°×1° square, so density and TRUE pair count grow
    * linearly with sf — pair work is quadratic BY SEMANTICS; the plan's
    * job is to pay transcendentals only on near-box candidates and to
    * never shuffle anything pair-sized (the consumers aggregate or
    * bounded-heap the pairs in the join stage). */
  private def custSide(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      hLat(col("c_custkey")).as("hlat"), hLon(col("c_custkey")).as("hlon"))
      .select(col("c_custkey"), col("hlat"), col("hlon"),
        latOf(col("hlat")).as("lat"), lonOf(col("hlon")).as("lon"),
        (col("hlat") / latCellUnits).cast("long").as("clat"),
        (col("hlon") / lonCellUnits).cast("long").as("clon"))

  private def suppSide(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(col("s_suppkey"),
      hLat(col("s_suppkey")).as("shlat"), hLon(col("s_suppkey")).as("shlon"))
      .select(col("s_suppkey"), col("shlat"), col("shlon"),
        latOf(col("shlat")).as("slat"), lonOf(col("shlon")).as("slon"),
        (col("shlat") / latCellUnits).cast("long").as("clat"),
        (col("shlon") / lonCellUnits).cast("long").as("clon"))

  /** 3×3-neighborhood candidate join for an arbitrary probe subset
    * (columns as [[custSide]]): probe fans out 9×, equi-joins on cell,
    * integer bounding box drops far candidates before the haversine. */
  private def candidatesFor(cust: DataFrame, supp: DataFrame): DataFrame = {
    // NUMBERED repartition before the 9× fan-out: the probe side is tens
    // of MB of keyed rows, so AQE right-sizes (or the single-file scan
    // under-splits) its stage to a few tasks — and the quadratic
    // haversine work downstream then runs on those few cores (the r15
    // q_geo_knn sf10 profile measured 190 task-seconds on 6 of 32 cores
    // before the same pin, 136 s wall → 14 s after). Keyed so the plan
    // stays deterministic; AQE cannot coalesce a numbered repartition.
    val probes = cust
      .repartition(cust.sparkSession.sparkContext.defaultParallelism,
        col("c_custkey"))
      .withColumn("dlat", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dlon", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("c_custkey"), col("hlat"), col("hlon"), col("lat"), col("lon"),
        (col("clat") + col("dlat")).as("clat"), (col("clon") + col("dlon")).as("clon"))
    val boxed = probes.join(supp, Seq("clat", "clon"))
      .filter(abs(col("hlat") - col("shlat")) <= latCellUnits &&
              abs(col("hlon") - col("shlon")) <= lonCellUnits)
    withHaversineKm(boxed, "lat", "lon", "slat", "slon")
      .select(col("c_custkey"), col("s_suppkey"), col("km"))
  }

  private def geoCandidates(s: SparkSession, d: String): DataFrame =
    candidatesFor(custSide(s, d), suppSide(s, d))

  val all: Seq[QueryDef] = Seq(

    // B35 — spatial distance join: per customer, the suppliers within
    // 5 km of its planted location — reported as (count, nearest, km).
    // Both sides run the cell-blocked candidate join (the oracle through
    // materialized CTEs) — provably identical to the cross join by the
    // cell-edge ≥ radius bound, and feasible at every measured scale. Haversine is the one transcendental here, used in VALUES
    // and a threshold/argmin whose hashed coords keep competitors
    // far apart relative to 1-ulp libm drift (SURVEY §4 rationale).
    QueryDef.sql("q_geo_join", {
      s"""WITH c AS (SELECT c_custkey,
         |        ${hLatDuck("c_custkey")} AS hlat, ${hLonDuck("c_custkey")} AS hlon,
         |        37.0 + ${hLatDuck("c_custkey")}/100000.0 AS lat,
         |        -122.8 + ${hLonDuck("c_custkey")}/100000.0 AS lon FROM customer),
         |s AS (SELECT s_suppkey,
         |        ${hLatDuck("s_suppkey")} AS hlat, ${hLonDuck("s_suppkey")} AS hlon,
         |        37.0 + ${hLatDuck("s_suppkey")}/100000.0 AS lat,
         |        -122.8 + ${hLonDuck("s_suppkey")}/100000.0 AS lon FROM supplier),
         |${kmCtesSql(radiusKm)},
         |r AS (SELECT c_custkey AS r_custkey, s_suppkey, km, row_number() OVER
         |        (PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rn FROM f),
         |a AS (SELECT c_custkey, count(*) AS n_near FROM f GROUP BY 1)
         |SELECT a.c_custkey, a.n_near, r.s_suppkey AS nearest_suppkey,
         |       r.km AS nearest_km
         |FROM a JOIN r ON a.c_custkey = r.r_custkey AND r.rn = 1
         |ORDER BY c_custkey""".stripMargin
    }) { (s, d) =>
      // count + nearest are ONE mergeable aggregate (count + min_by):
      // true pairs collapse map-side in the join stage, nothing
      // pair-sized is shuffled or sorted — the old per-customer window
      // moved and sorted every true pair, and the true pair count grows
      // quadratically with sf (see geoCandidates).
      val pairs = geoCandidates(s, d).filter(col("km") <= radiusKm)
      pairs.groupBy("c_custkey")
        .agg(count(lit(1)).as("n_near"),
          min_by(struct(col("s_suppkey"), col("km")),
            struct(col("km"), col("s_suppkey"))).as("nn"))
        .select(col("c_custkey"), col("n_near"),
          col("nn.s_suppkey").as("nearest_suppkey"), col("nn.km").as("nearest_km"))
        .orderBy("c_custkey")
    },

    // B87 — radius-bounded k-nearest (top-3) suppliers per customer: the
    // ranked-list complement of B35's count+nearest (store locators,
    // assignment problems). SAME 3×3 cell-bucketed candidate join — the
    // radius cap is what makes bucketed k-NN exact: every neighbor
    // within 5 km is inside the neighborhood by the cell-edge bound, so
    // the top-3 of the candidates IS the global top-3 (an uncapped k-NN
    // could have its 3rd neighbor outside any fixed neighborhood and
    // would need ring expansion). Oracle runs the same capped ranking
    // over the same cell-blocked candidates; ties break on supplier id.
    QueryDef.sql("q_geo_knn", {
      s"""WITH c AS (SELECT c_custkey,
         |        ${hLatDuck("c_custkey")} AS hlat, ${hLonDuck("c_custkey")} AS hlon,
         |        37.0 + ${hLatDuck("c_custkey")}/100000.0 AS lat,
         |        -122.8 + ${hLonDuck("c_custkey")}/100000.0 AS lon FROM customer),
         |s AS (SELECT s_suppkey,
         |        ${hLatDuck("s_suppkey")} AS hlat, ${hLonDuck("s_suppkey")} AS hlon,
         |        37.0 + ${hLatDuck("s_suppkey")}/100000.0 AS lat,
         |        -122.8 + ${hLonDuck("s_suppkey")}/100000.0 AS lon FROM supplier),
         |${kmCtesSql(radiusKm)},
         |r AS (SELECT c_custkey, s_suppkey, km, row_number() OVER
         |        (PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rank FROM f)
         |SELECT c_custkey, rank, s_suppkey, km
         |FROM r WHERE rank <= 3 ORDER BY c_custkey, rank""".stripMargin
    }) { (s, d) =>
      // Two-phase pre-k bound (r13 verdict item 3): rank the top-3 inside
      // the HOME cell first (1× fan-out), and pay the 9× neighborhood
      // expansion only for customers the home cell cannot settle. A
      // customer is settled when it has 3 home-cell neighbors within the
      // radius AND its 3rd-nearest distance is strictly inside its
      // cell-boundary clearance — any supplier outside the home cell is
      // at least `clear_km` away (the meridional bound is exact on the
      // sphere; the lon bound uses cos(38°), the domain's shortest
      // degree, shrunk 2% for the spherical-vs-planar residue — the
      // mirror of the 1.02 cell-edge slack), so nothing outside can beat
      // the settled top-3, ties included (strict <). Denser data settles
      // MORE customers (the 3rd-nearest distance shrinks with density),
      // so the expansion fraction falls as sf grows — the opposite of
      // the old always-9× plan. Both phases end in the bounded-heap
      // rewrite (row_number()<=k → B10n partial->final), so nothing
      // pair-sized is ever shuffled.
      val kmUnitLat = kmPerDegLat / 100000.0
      val kmUnitLon = kmPerDegLat * math.cos(math.toRadians(38.0)) / 100000.0
      // NUMBERED repartition before the fan-out (the d_jaro_winkler
      // lesson, third appearance): the customer side is ~50 MB of keyed
      // rows, so AQE right-sizes its exchange to a handful of partitions
      // — and then the home-cell join's quadratic haversine work explodes
      // INSIDE those few tasks (r15 sf10 profile: 190 task-seconds of
      // the 3-decade-hot stage on 6 of 32 cores, 136 s wall). A numbered
      // repartition is AQE-coalesce-exempt, pinning the fan-out at
      // cluster parallelism; partitioning by c_custkey also feeds the
      // per-customer window exchange downstream.
      val fan = s.sparkContext.defaultParallelism
      val cust = custSide(s, d).repartition(fan, col("c_custkey"))
      val supp = suppSide(s, d)
      val withClear = cust.withColumn("clear_km",
        least(
          least(col("hlat") - col("clat") * latCellUnits,
            (col("clat") + 1L) * latCellUnits - col("hlat")) * kmUnitLat,
          least(col("hlon") - col("clon") * lonCellUnits,
            (col("clon") + 1L) * lonCellUnits - col("hlon")) * kmUnitLon) * 0.98)
      val w = Window.partitionBy("c_custkey").orderBy(col("km"), col("s_suppkey"))
      val wp = Window.partitionBy("c_custkey")
      val homeTop = withHaversineKm(
          withClear.join(supp, Seq("clat", "clon")), "lat", "lon", "slat", "slon")
        .filter(col("km") <= radiusKm)
        .select(col("c_custkey"), col("s_suppkey"), col("km"), col("clear_km"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .withColumn("n3", count(lit(1)).over(wp))
        .withColumn("km3", max(col("km")).over(wp))
      val settled = homeTop.filter(col("n3") === 3 && col("km3") < col("clear_km"))
        .select(col("c_custkey"), col("rank"), col("s_suppkey"), col("km"))
      val unsettledCust = cust.join(
        settled.select("c_custkey").distinct(), Seq("c_custkey"), "left_anti")
      val expanded = candidatesFor(unsettledCust, supp)
        .filter(col("km") <= radiusKm)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_custkey"), col("rank"), col("s_suppkey"), col("km"))
      settled.unionByName(expanded).orderBy("c_custkey", "rank")
    },

    // B88 — spatial density grid: per-0.1° cell the customer/supplier
    // counts and co-location score (the B70 2-D histogram in geographic
    // space — the audit that sizes B35/B87's per-cell candidate bound).
    // Cells come from INTEGER hash division (never float floor), so both
    // engines bucket identically by construction; one narrow projection
    // + one cell-keyed partial agg per side, full-outer merged on the
    // cell key. Grid is fixed (10×10 over the planted range) ⇒ output
    // report-sized at any corpus scale.
    QueryDef.sql("q_geo_density",
      s"""WITH c AS (SELECT ${hLatDuck("c_custkey")}//10000 AS clat,
         |        ${hLonDuck("c_custkey")}//10000 AS clon,
         |        count(*) AS n_cust FROM customer GROUP BY 1, 2),
         |s AS (SELECT ${hLatDuck("s_suppkey")}//10000 AS clat,
         |        ${hLonDuck("s_suppkey")}//10000 AS clon,
         |        count(*) AS n_supp FROM supplier GROUP BY 1, 2)
         |SELECT coalesce(c.clat, s.clat) AS clat,
         |       coalesce(c.clon, s.clon) AS clon,
         |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp,
         |       coalesce(n_cust, 0) * coalesce(n_supp, 0) AS candidate_pairs
         |FROM c FULL OUTER JOIN s ON c.clat = s.clat AND c.clon = s.clon
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
        .groupBy((hLat(col("c_custkey")) / 10000L).cast("long").as("clat"),
          (hLon(col("c_custkey")) / 10000L).cast("long").as("clon"))
        .agg(count(lit(1)).as("n_cust"))
      val sp = Tables.supplier(s, d)
        .groupBy((hLat(col("s_suppkey")) / 10000L).cast("long").as("sclat"),
          (hLon(col("s_suppkey")) / 10000L).cast("long").as("sclon"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sp, col("clat") === col("sclat") && col("clon") === col("sclon"), "full_outer")
        .select(coalesce(col("clat"), col("sclat")).as("clat"),
          coalesce(col("clon"), col("sclon")).as("clon"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          (coalesce(col("n_cust"), lit(0L)) * coalesce(col("n_supp"), lit(0L)))
            .as("candidate_pairs"))
        .orderBy("clat", "clon")
    }
  )
}
