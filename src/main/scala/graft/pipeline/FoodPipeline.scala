package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.Tables

/** The reference DAG end-to-end (SURVEY §2 A12, G4): Extract → Transform →
  * Load → analyze (airflow.py:826-850 wires t1>>t2>>t3>>t4).
  *
  * Data-model mapping (SURVEY §1): `schedule` feed → `orders` (surrogate-
  * keyed fact), `permit` feed → `customer` (entity feed), Yelp enrichment
  * dim → `nation`. Each output below is the Spark-first re-expression of
  * one pandas table-builder from airflow.py:160-256.
  *
  * Scale notes: the `orders`-side outputs share one partitioning on
  * `o_custkey` (cached once), dims broadcast, every write is columnar
  * parquet (the reference round-trips CSVs through pandas and row-wise
  * INSERTs into Postgres — airflow.py:463-521 — which is the part that
  * cannot survive 100 TB).
  */
object FoodPipeline {

  /** Transform stage: all normalized outputs, keyed by table name. */
  def build(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    buildFrom(Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.nation(spark, sfDir))

  /** Transform stage over already-extracted inputs — the same normalization
    * whether the feeds arrived as parquet tables or through the paged-JSON
    * extract ([[graft.sources.RestExtract]]). */
  def buildFrom(orders: DataFrame, customer: DataFrame,
                nation: DataFrame): Map[String, DataFrame] = {

    // schedule feed with surrogate key (airflow.py:161).
    val schedule = Relational.surrogateKey(orders, "schedule_id", Seq(col("o_orderkey")))

    // details: entity projection deduped by key (airflow.py:176).
    val details = Relational.dedupKeepFirst(customer, Seq("c_custkey"), Seq(col("c_custkey")))
      .select(col("c_custkey").as("permit"), col("c_name").as("applicant"),
        col("c_mktsegment").as("facilitytype"))

    // premitted_biz_details: (schedule_id, key) bridge (airflow.py:182).
    val bridge = schedule.select(col("schedule_id"), col("o_custkey").as("permit"))

    // location: outer merge + dedup-first + notna (airflow.py:191).
    val location = Relational.dedupKeepFirst(
        orders.join(customer, col("o_custkey") === col("c_custkey"), "full_outer"),
        Seq("o_orderkey"), Seq(col("c_custkey")))
      .filter(col("o_orderkey").isNotNull)
      .select("o_orderkey", "o_orderstatus", "c_name", "c_mktsegment")

    // food_type: inner merge deduped by key (airflow.py:206).
    val foodType = Relational.dedupKeepFirst(
        customer.join(orders, col("c_custkey") === col("o_custkey")),
        Seq("c_custkey"), Seq(col("o_orderdate"), col("o_orderkey")))
      .select("c_custkey", "c_name", "o_orderkey", "o_orderpriority")

    // permit_motification_details: date reformat (airflow.py:221).
    val dates = schedule.select(col("schedule_id"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_create"))

    // operating_day / operation_time: plain projections (airflow.py:233-241).
    val operatingDay = schedule.select(col("schedule_id"),
      dayofweek(col("o_orderdate")).as("dayorder"),
      date_format(col("o_orderdate"), "EEEE").as("dayofweekstr"))
    val operationTime = schedule.select("schedule_id", "o_orderpriority", "o_orderstatus")

    // num_permit_per_business: per-key count + dedup (airflow.py:251).
    val numPerBiz = Relational.groupTransformCount(orders, "o_custkey", "n_orders",
        Seq(col("o_orderkey")))
      .select("o_custkey", "n_orders")

    // yelp_info: left enrichment + dropna + distinct (airflow.py:241).
    val enriched = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "left")
      .filter(col("n_name").isNotNull)
      .select(col("c_name"), col("n_name"), col("c_acctbal")).distinct()

    Map(
      "details" -> details, "premitted_biz_details" -> bridge,
      "location" -> location, "food_type" -> foodType,
      "permit_motification_details" -> dates, "operating_day" -> operatingDay,
      "operation_time" -> operationTime, "num_permit_per_business" -> numPerBiz,
      "yelp_info" -> enriched)
  }

  /** The flagship analysis over the normalized outputs — the reference's
    * query1 (airflow.py:655-662). */
  def topBusinesses(tables: Map[String, DataFrame], k: Int = 5): DataFrame =
    Relational.topKByAgg(
      tables("details")
        .join(tables("premitted_biz_details"), "permit", "left")
        .groupBy("applicant")
        .agg(count(col("schedule_id")).as("schedule_count")),
      k, Seq(col("schedule_count").desc, col("applicant")))

  /** The full DAG under [[Orchestrator]] semantics (airflow.py:816-850:
    * Extract >> Transform >> Load >> Spark, `retries=2`): input
    * validation, normalization, columnar export (replaces the
    * reference's row-wise Postgres INSERT, airflow.py:463-521), then the
    * flagship analysis exported as an SVG pie (airflow.py:674-687's
    * matplotlib-to-S3 stage; the Hadoop FS writer takes `s3a://` paths
    * unchanged). Returns per-task status. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          retries: Int = 2,
          scheduleFeed: Option[graft.sources.RestExtract.PageFetcher] = None,
          pageLimit: Int = 1000): Map[String, Orchestrator.Status] = {
    var tables: Map[String, DataFrame] = Map.empty
    var orders: DataFrame = null
    Orchestrator.run(Seq(
      Orchestrator.Task("extract", Nil, retries) { () =>
        // The reference's Extract pages the schedule feed from the Socrata
        // API (airflow.py:71-85); here the feed arrives through the paged
        // ingestion path when a fetcher is supplied — landed raw under
        // outDir, then schema-enforced (FAILFAST) into the orders table.
        // Without a fetcher the feed is the pre-landed parquet table.
        // Either way a malformed/empty feed fails HERE, retryably, not
        // downstream.
        orders = scheduleFeed match {
          case Some(f) =>
            val landed = graft.sources.RestExtract.extract(spark, f,
              s"$outDir/landing/schedule", Tables.schemas("orders"), pageLimit)
            require(landed.count() > 0, "schedule feed landed zero rows")
            landed
          case None => Tables.orders(spark, sfDir)
        }
        Seq("customer", "nation").foreach(Tables.load(spark, sfDir, _).schema)
      },
      Orchestrator.Task("transform", Seq("extract"), retries) { () =>
        tables = buildFrom(orders, Tables.customer(spark, sfDir),
          Tables.nation(spark, sfDir))
      },
      Orchestrator.Task("load", Seq("transform"), retries) { () =>
        // Each export is write-audited in the SAME job (G15,
        // Audit.observed rides the write's tasks — no follow-up
        // validation scan, unlike the reference's post-load SELECT
        // checks at airflow.py:529-551): an empty normalized output
        // fails the load task HERE, retryably, before downstream
        // consumers read a zero-row table.
        tables.foreach { case (name, df) =>
          val audit = graft.operators.Audit.observedAction(
            df, s"load_$name", count(lit(1)).as("n_rows")) { obs =>
            Tables.writeParquet(obs, s"$outDir/$name")
          }
          require(audit.getAs[Long]("n_rows") > 0,
            s"load audit: normalized output '$name' landed zero rows")
        }
      },
      Orchestrator.Task("analyze", Seq("load"), retries) { () =>
        graft.viz.Charts.exportPie(topBusinesses(tables),
          "applicant", "schedule_count",
          "Top 5 businesses by approved schedule share",
          s"$outDir/images/schedule_per_business.svg")
      }))
  }
}
