package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline.FoodPipeline

/** SURVEY §2 A12 — the end-to-end normalization pipeline, exercised through
  * FoodPipeline so the driver's gate covers the composed path, not just the
  * individual operators.
  */
object PipelineQueries {

  val all: Seq[QueryDef] = Seq(

    // A12a — a normalized output table from the pipeline ('details').
    QueryDef.sql("q_normalize_snowflake",
      """SELECT c_custkey AS permit, c_name AS applicant, c_mktsegment AS facilitytype
        |FROM customer ORDER BY permit""".stripMargin) { (s, d) =>
      FoodPipeline.build(s, d)("details").orderBy("permit")
    },

    // A12b — the flagship analysis run over the pipeline's outputs
    // (reference query1 through the normalized schema).
    QueryDef.sql("q_pipeline_topk",
      """SELECT applicant, count(schedule_id) AS schedule_count
        |FROM (SELECT c_custkey AS permit, c_name AS applicant FROM customer) dt
        |LEFT JOIN (SELECT (row_number() OVER (ORDER BY o_orderkey)) - 1 AS schedule_id,
        |                  o_custkey AS permit FROM orders) br USING (permit)
        |GROUP BY applicant
        |ORDER BY schedule_count DESC, applicant LIMIT 5""".stripMargin) { (s, d) =>
      FoodPipeline.topBusinesses(FoodPipeline.build(s, d))
    }
  )
}
