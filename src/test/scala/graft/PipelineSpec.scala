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
}
