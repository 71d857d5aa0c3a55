package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** SURVEY §2 group H — determinism and structure of the corpus-curation
  * selectors (their value-level correctness is oracle-checked by the
  * driver; these pin the properties the oracles can't see).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")

  test("stratifiedSample returns exactly n per stratum, stably (H1)") {
    val s1 = Curation.stratifiedSample(docs, "source", "doc_id", 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    val counts = s1.groupBy(_._1).map(_._2.size).toSet
    assert(counts == Set(3))
    // re-running (different partitioning) selects the same rows
    val s2 = Curation.stratifiedSample(docs.repartition(7), "source", "doc_id", 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(s1 == s2)
  }

  test("weightedMix is superset-stable as rates decrease (H2)") {
    def mix(r: Double) = Curation.weightedMix(docs, "source", "doc_id",
      Map.empty, defaultRate = r).select("doc_id").as[Long].collect().toSet
    val half = mix(0.5); val tenth = mix(0.1)
    assert(tenth.subsetOf(half), "lowering a rate must only remove rows")
    assert(mix(1.0).size == docs.count())
    // rate roughly honored (hash uniformity; generous bounds)
    val n = docs.count().toDouble
    assert(half.size > n * 0.35 && half.size < n * 0.65)
  }

  test("packSequences lays out a contiguous token stream per bucket (H4)") {
    val packed = Curation.packSequences(docs, "doc_id",
        graft.functions.TextFunctions.tokenCount(col("text")), budget = 256, nBuckets = 4)
      .select("bucket", "pack", "tok_offset", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      // offsets tile the stream exactly: each doc starts where the last ended
      sorted.zip(sorted.scanLeft(0L)((acc, r) => acc + r._4)).foreach {
        case ((_, pack, off, _), expectedOff) =>
          assert(off == expectedOff)
          assert(pack == off / 256, s"pack id must be the 256-token chunk of the start offset")
      }
    }
    // every bucket used on a 500-doc corpus
    assert(packed.map(_._1).distinct.length == 4)
  }

  test("decontaminate flags exactly the docs sharing an n-gram (H3)") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "completely unrelated sentence about spark engines"),
      (3L, "quick brown fox appears here too")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a quick brown fox story")).toDF("doc_id", "text")
    val hits = Curation.decontaminate(train, eval_, "doc_id", "text", 3)
      .select("doc", "n_shared_grams").as[(Long, Long)].collect().toMap
    // "quick brown fox" is the one shared trigram for docs 1 and 3
    assert(hits == Map(1L -> 1L, 3L -> 1L))
  }

  test("hash split is a partition: every key in exactly one split, stable") {
    val keys = spark.range(2000).toDF("vec_id")
    val u = Curation.uniform(col("vec_id"))
    val split = keys.select(col("vec_id"),
      when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split"))
    // exactly one split per key (when-chain is exhaustive and disjoint)
    assert(split.groupBy("vec_id").count().filter(col("count") =!= 1).count() == 0)
    // deterministic: a re-computation assigns identical splits
    val again = keys.select(col("vec_id"),
      when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split2"))
    assert(split.join(again, "vec_id")
      .filter(col("split") =!= col("split2")).count() == 0)
    // rates land near 80/10/10 (md5 is uniform; 2000 keys ⇒ ±3σ ≈ ±2.7%)
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 1600L) < 60)
    assert(math.abs(counts("val") - 200L) < 40)
    assert(math.abs(counts("test") - 200L) < 40)
  }
}
