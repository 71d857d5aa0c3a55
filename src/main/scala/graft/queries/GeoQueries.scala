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
  // cell edge 0.1° (≈11.1 km lat, ≈8.8 km lon at 37.5°N) ≥ radius ⇒ all
  // true pairs fall in the 3×3 neighborhood. Integer division: h/10000.
  private def hLatDuck(k: String) = s"(($k*2654435761) % 100000)"
  private def hLonDuck(k: String) = s"(($k*97003+17) % 100000)"

  private def haversineKm(lat1: Column, lon1: Column,
                          lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    lit(2 * 6371.0088) * asin(sqrt(
      sin(dLat) * sin(dLat) +
        cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)))
  }

  private def haversineDuck(lat1: String, lon1: String,
                            lat2: String, lon2: String): String =
    s"""2*6371.0088*asin(sqrt(
       |  pow(sin(radians($lat2-$lat1)/2),2) +
       |  cos(radians($lat1))*cos(radians($lat2))*pow(sin(radians($lon2-$lon1)/2),2)))""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // B35 — spatial distance join: per customer, the suppliers within
    // 5 km of its planted location — reported as (count, nearest, km).
    // The oracle brute-forces the cross join (fine at oracle scale);
    // the Spark side runs the bucketed candidate join that survives
    // 100 TB. Haversine is the one transcendental here, used in VALUES
    // and a threshold/argmin whose hashed coords keep competitors
    // far apart relative to 1-ulp libm drift (SURVEY §4 rationale).
    QueryDef.sql("q_geo_join", {
      val km = haversineDuck("c.lat", "c.lon", "s.lat", "s.lon")
      s"""WITH c AS (SELECT c_custkey,
         |        37.0 + ${hLatDuck("c_custkey")}/100000.0 AS lat,
         |        -122.8 + ${hLonDuck("c_custkey")}/100000.0 AS lon FROM customer),
         |s AS (SELECT s_suppkey,
         |        37.0 + ${hLatDuck("s_suppkey")}/100000.0 AS lat,
         |        -122.8 + ${hLonDuck("s_suppkey")}/100000.0 AS lon FROM supplier),
         |f AS (SELECT c_custkey, s_suppkey, $km AS km
         |      FROM c CROSS JOIN s WHERE $km <= $radiusKm),
         |r AS (SELECT c_custkey AS r_custkey, s_suppkey, km, row_number() OVER
         |        (PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rn FROM f),
         |a AS (SELECT c_custkey, count(*) AS n_near FROM f GROUP BY 1)
         |SELECT a.c_custkey, a.n_near, r.s_suppkey AS nearest_suppkey,
         |       r.km AS nearest_km
         |FROM a JOIN r ON a.c_custkey = r.r_custkey AND r.rn = 1
         |ORDER BY c_custkey""".stripMargin
    }) { (s, d) =>
      val cust = Tables.customer(s, d).select(col("c_custkey"),
        hLat(col("c_custkey")).as("hlat"), hLon(col("c_custkey")).as("hlon"))
        .select(col("c_custkey"), latOf(col("hlat")).as("lat"), lonOf(col("hlon")).as("lon"),
          (col("hlat") / 10000L).cast("long").as("clat"),
          (col("hlon") / 10000L).cast("long").as("clon"))
      val supp = Tables.supplier(s, d).select(col("s_suppkey"),
        hLat(col("s_suppkey")).as("hlat"), hLon(col("s_suppkey")).as("hlon"))
        .select(col("s_suppkey"), latOf(col("hlat")).as("slat"), lonOf(col("hlon")).as("slon"),
          (col("hlat") / 10000L).cast("long").as("clat"),
          (col("hlon") / 10000L).cast("long").as("clon"))
      // probe side explodes to its 3x3 cell neighborhood; equi-join on cell
      val probes = cust
        .withColumn("dlat", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dlon", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("c_custkey"), col("lat"), col("lon"),
          (col("clat") + col("dlat")).as("clat"), (col("clon") + col("dlon")).as("clon"))
      val pairs = probes.join(supp, Seq("clat", "clon"))
        .withColumn("km", haversineKm(col("lat"), col("lon"), col("slat"), col("slon")))
        .filter(col("km") <= radiusKm)
      val w = Window.partitionBy("c_custkey").orderBy(col("km"), col("s_suppkey"))
      pairs
        .withColumn("rn", row_number().over(w))
        .withColumn("n_near", count(lit(1)).over(Window.partitionBy("c_custkey")))
        .filter(col("rn") === 1)
        .select(col("c_custkey"), col("n_near"),
          col("s_suppkey").as("nearest_suppkey"), col("km").as("nearest_km"))
        .orderBy("c_custkey")
    },

    // B87 — radius-bounded k-nearest (top-3) suppliers per customer: the
    // ranked-list complement of B35's count+nearest (store locators,
    // assignment problems). SAME 3×3 cell-bucketed candidate join — the
    // radius cap is what makes bucketed k-NN exact: every neighbor
    // within 5 km is inside the neighborhood by the cell-edge bound, so
    // the top-3 of the candidates IS the global top-3 (an uncapped k-NN
    // could have its 3rd neighbor outside any fixed neighborhood and
    // would need ring expansion). Oracle brute-forces the same capped
    // ranking; ties break on supplier id.
    QueryDef.sql("q_geo_knn", {
      val km = haversineDuck("c.lat", "c.lon", "s.lat", "s.lon")
      s"""WITH c AS (SELECT c_custkey,
         |        37.0 + ${hLatDuck("c_custkey")}/100000.0 AS lat,
         |        -122.8 + ${hLonDuck("c_custkey")}/100000.0 AS lon FROM customer),
         |s AS (SELECT s_suppkey,
         |        37.0 + ${hLatDuck("s_suppkey")}/100000.0 AS lat,
         |        -122.8 + ${hLonDuck("s_suppkey")}/100000.0 AS lon FROM supplier),
         |f AS (SELECT c_custkey, s_suppkey, $km AS km
         |      FROM c CROSS JOIN s WHERE $km <= $radiusKm),
         |r AS (SELECT c_custkey, s_suppkey, km, row_number() OVER
         |        (PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rank FROM f)
         |SELECT c_custkey, rank, s_suppkey, km
         |FROM r WHERE rank <= 3 ORDER BY c_custkey, rank""".stripMargin
    }) { (s, d) =>
      val cust = Tables.customer(s, d).select(col("c_custkey"),
        hLat(col("c_custkey")).as("hlat"), hLon(col("c_custkey")).as("hlon"))
        .select(col("c_custkey"), latOf(col("hlat")).as("lat"), lonOf(col("hlon")).as("lon"),
          (col("hlat") / 10000L).cast("long").as("clat"),
          (col("hlon") / 10000L).cast("long").as("clon"))
      val supp = Tables.supplier(s, d).select(col("s_suppkey"),
        hLat(col("s_suppkey")).as("hlat"), hLon(col("s_suppkey")).as("hlon"))
        .select(col("s_suppkey"), latOf(col("hlat")).as("slat"), lonOf(col("hlon")).as("slon"),
          (col("hlat") / 10000L).cast("long").as("clat"),
          (col("hlon") / 10000L).cast("long").as("clon"))
      val probes = cust
        .withColumn("dlat", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dlon", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("c_custkey"), col("lat"), col("lon"),
          (col("clat") + col("dlat")).as("clat"), (col("clon") + col("dlon")).as("clon"))
      val w = Window.partitionBy("c_custkey").orderBy(col("km"), col("s_suppkey"))
      probes.join(supp, Seq("clat", "clon"))
        .withColumn("km", haversineKm(col("lat"), col("lon"), col("slat"), col("slon")))
        .filter(col("km") <= radiusKm)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_custkey"), col("rank"), col("s_suppkey"), col("km"))
        .orderBy("c_custkey", "rank")
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
