package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.FoodPipeline

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("pipeline builds all normalized outputs with rows") {
    val tables = FoodPipeline.build(spark, d)
    assert(tables.keySet == Set(
      "details", "premitted_biz_details", "location", "food_type",
      "permit_motification_details", "operating_day", "operation_time",
      "num_permit_per_business", "yelp_info"))
    tables.foreach { case (name, df) => assert(df.count() > 0, name) }
  }

  test("flagship analysis over pipeline outputs returns a full top-5") {
    val top = FoodPipeline.topBusinesses(FoodPipeline.build(spark, d)).collect()
    assert(top.length == 5)
    val counts = top.map(_.getAs[Long]("schedule_count")).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("run() executes the DAG, writes every output, and exports the chart") {
    val out = Files.createTempDirectory("graft_pipe").toString
    val status = FoodPipeline.run(spark, d, out)
    assert(status.keySet == Set("extract", "transform", "load", "analyze"))
    assert(status.values.forall(_.isInstanceOf[graft.pipeline.Orchestrator.Succeeded]),
      status.toString)
    val details = spark.read.parquet(s"$out/details")
    assert(details.count() > 0)
    assert(details.columns.toSet == Set("permit", "applicant", "facilitytype"))
    val svg = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/images/schedule_per_business.svg")), "UTF-8")
    assert(svg.startsWith("<svg") && svg.contains("</svg>"))
    assert(svg.contains("Top 5 businesses"))
  }

  test("FK check counts planted orphans and ignores null keys (A19)") {
    import spark.implicits._
    import graft.operators.Integrity, Integrity.FkEdge
    val child = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("fk") // 9 is the planted orphan; the null is FK-legal
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk") // duplicate pk must not fan out
    val rep = Integrity.checkFk(Map("c" -> child, "p" -> parent),
      Seq(FkEdge("c", "fk", "p", "pk"))).head()
    assert(rep.getAs[Long]("n_child") == 3L)
    assert(rep.getAs[Long]("n_orphans") == 1L)
    // a clean edge reports zero
    val clean = Integrity.checkFk(Map("c" -> child, "p" -> parent ,
        "p2" -> Seq(1L, 2L, 9L).toDF("pk")),
      Seq(FkEdge("c", "fk", "p2", "pk"))).head()
    assert(clean.getAs[Long]("n_orphans") == 0L)
  }

  test("run() extracts the schedule feed through the paged-JSON path (G10)") {
    import graft.sources.RestExtract
    val out = Files.createTempDirectory("graft_pipe_feed").toString
    // the feed serves the same rows the parquet table holds — the DAG's
    // outputs must be identical whichever path the feed arrives through
    val feedRows = graft.sources.Tables.orders(spark, d)
      .orderBy("o_orderkey").toJSON.collect().toIndexedSeq
    val status = FoodPipeline.run(spark, d, out,
      scheduleFeed = Some(RestExtract.RowsFetcher(feedRows)), pageLimit = 300)
    assert(status.values.forall(_.isInstanceOf[graft.pipeline.Orchestrator.Succeeded]),
      status.toString)
    // raw pages landed under outDir (offsets step by pageLimit)
    assert(new java.io.File(s"$out/landing/schedule/page-0.json").isFile)
    assert(new java.io.File(s"$out/landing/schedule/page-300.json").isFile)
    // normalized output matches the parquet-path run row-for-row
    val viaFeed = spark.read.parquet(s"$out/premitted_biz_details").count()
    val viaParquet = FoodPipeline.build(spark, d)("premitted_biz_details").count()
    assert(viaFeed == viaParquet)
  }
}
