package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary behavior of the chunker and repetition filters (C11/C12),
  * driven through the REGISTERED queries against a planted documents
  * table — the same path the driver's gate runs, not a private helper.
  */
class ChunkRepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Planted corpus written in the documents schema: token counts chosen
    * around the 64-window/48-stride boundaries. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, "", "en", "planted", 0L),                  // empty → no chunks
      (2L, "only", "en", "planted", 4L),              // 1 token → 1 chunk
      (3L, words(48), "en", "planted", 0L),           // == stride → 1 chunk
      (4L, words(49), "en", "planted", 0L),           // stride+1 → 2 chunks
      (5L, words(64), "en", "planted", 0L),           // == window → 2 chunks (48 reached)
      (6L, words(97), "en", "planted", 0L),           // 3 starts: 0,48,96
      (7L, "dup dup dup dup", "en", "planted", 0L))   // pure repetition
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("chunk starts advance by the stride and clamp at the end") {
    val out = SparkEntry.queries("t_chunk_overlap")(spark, dir)
      .select("doc_id", "chunk_idx", "start_tok", "n_toks")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val expected = Seq(
      (2L, 0L, 0L, 1L),
      (3L, 0L, 0L, 48L),
      (4L, 0L, 0L, 49L), (4L, 1L, 48L, 1L),
      (5L, 0L, 0L, 64L), (5L, 1L, 48L, 16L),
      (6L, 0L, 0L, 64L), (6L, 1L, 48L, 49L), (6L, 2L, 96L, 1L),
      (7L, 0L, 0L, 4L))
    assert(out == expected) // doc 1 (empty) absent
  }

  test("successive chunks overlap by window minus stride tokens") {
    val sigs = SparkEntry.queries("t_chunk_overlap")(spark, dir)
      .filter(col("doc_id") === 6L)
      .orderBy("chunk_idx").select("sig").as[String].collect()
    assert(sigs.distinct.length == 3) // distinct content per chunk
  }

  test("repetition ratios: unique text scores 0, pure repetition scores high") {
    val out = SparkEntry.queries("t_repetition")(spark, dir)
      .select("doc_id", "n_tokens", "dup_token_frac", "top_bigram_n",
        "n_bigrams", "top_bigram_frac")
      .as[(Long, Long, Double, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0L, 0.0, 0L, 0L, 0.0)))    // empty doc
    assert(out(2L) == ((2L, 1L, 0.0, 0L, 0L, 0.0)))    // one token, no bigrams
    assert(out(3L)._3 == 0.0 && out(3L)._6 == 1.0 / 47) // all-unique tokens
    assert(out(7L) == ((7L, 4L, 0.75, 3L, 3L, 1.0)))   // "dup dup dup dup"
    assert(out.size == 7)                               // every doc reported
  }
}
