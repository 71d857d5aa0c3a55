package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Relational}

/** Degenerate-input behavior: empty tables and single-row corpora must
  * flow through every operator without throwing — at 100 TB some
  * partition, some day, WILL be empty.
  */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("surrogate key on an empty input is empty with the id column present") {
    val out = Relational.surrogateKey(
      Seq.empty[(Long, String)].toDF("k", "v"), "sid", Seq(col("k")))
    assert(out.columns.contains("sid") && out.count() == 0)
  }

  test("dedup operators on empty and single-doc corpora return no pairs") {
    assert(Dedup.exactDedup(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text", 3, 0.1).count() == 0)
    val one = Seq((1L, "just one single document here")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(one, "doc_id", "text", 3, 0.1).count() == 0)
    val ds = Dedup.hashedDocSets(one, "doc_id", "text", 1)
    assert(Dedup.simHashPairs(Dedup.simHash(ds, 16), 16, 3).count() == 0)
  }

  test("asofJoin with an empty right side preserves left rows with null payload") {
    val left = Seq((1L, 1L, 5), (2L, 1L, 7)).toDF("lid", "k", "t")
    val right = Seq.empty[(Long, Int, String)].toDF("k", "t", "payload")
    val out = Relational.asofJoin(left, right, "k", "t", Seq("payload"))
      .select("lid", "payload").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> None, 2L -> None))
  }

  test("rangeJoinBinned with no intervals yields no pairs") {
    val pts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      .toDF("user_id", "c_ts", "value")
    val ivs = Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("user_id", "start_ts", "end_ts")
    assert(Relational.rangeJoinBinned(pts, ivs, "user_id",
      "c_ts", "start_ts", "end_ts", 3600000L).count() == 0)
  }

  test("documents shorter than the shingle width vanish rather than throw") {
    val docs = Seq((1L, "tiny"), (2L, "a b"), (3L, "one two three four")).toDF("doc_id", "text")
    val sets = Dedup.hashedDocSets(docs, "doc_id", "text", 3)
      .select("doc").as[Long].collect().toSet
    assert(sets == Set(3L)) // only the 4-token doc has trigrams
  }

  test("Orchestrator.run on an empty graph returns an empty status map") {
    assert(graft.pipeline.Orchestrator.run(Nil).isEmpty)
  }

  test("components on empty pairs / self-pairs degrades cleanly") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("a", "b")
    assert(Dedup.components(empty, "a", "b").isEmpty)
    // a self-pair is a 1-node component labeled by itself
    val selfy = Seq((7L, 7L)).toDF("a", "b")
    assert(Dedup.components(selfy, "a", "b").as[(Long, Long)].collect().toSeq ==
      Seq((7L, 7L)))
  }

  test("curation guards reject nonsense parameters") {
    val docs = Seq((1L, "x", "s")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException] {
      graft.operators.Curation.stratifiedSample(docs, "source", "doc_id", 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Curation.weightedMix(docs, "source", "doc_id", Map("s" -> 1.5), 0.1)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Curation.packSequences(docs, "doc_id", lit(1), budget = 0, nBuckets = 4)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Integrity.checkFk(Map.empty, Nil)
    }
  }

  test("pieSvg with no positive values renders the no-data placeholder") {
    val svg = graft.viz.Charts.pieSvg(Seq(("a", 0.0), ("b", -1.0)), "T")
    assert(svg.contains("no data") && svg.contains("</svg>"))
  }
}
