package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (3L, "completely different words about spark engines here"))
    .toDF("doc_id", "text")

  test("levenshteinPairs finds typo-dups inside a shared prefix block") {
    val out = Dedup.levenshteinPairs(corpus, "doc_id", "text",
        blockPrefix = 10, levPrefix = 100, maxLev = 5, maxBlock = 64)
      .select("doc_a", "doc_b", "lev").as[(Long, Long, Long)].collect().toSet
    // 0≡2 (lev 0) and 0~1 / 1~2 (dog→cat, lev 3); 3 shares no prefix.
    assert(out == Set((0L, 1L, 3L), (0L, 2L, 0L), (1L, 2L, 3L)))
  }

  test("levenshteinPairs drops blocks hotter than maxBlock") {
    val hot = (0L until 10L).map(i => (i, s"same prefix here unique tail $i"))
      .toDF("doc_id", "text")
    val capped = Dedup.levenshteinPairs(hot, "doc_id", "text",
      blockPrefix = 10, levPrefix = 100, maxLev = 100, maxBlock = 5)
    assert(capped.count() == 0) // one 10-doc block, cap 5 ⇒ no candidates
    val uncapped = Dedup.levenshteinPairs(hot, "doc_id", "text",
      blockPrefix = 10, levPrefix = 100, maxLev = 100, maxBlock = 64)
    assert(uncapped.count() == 45) // all 10·9/2 pairs survive a loose cap
  }

  test("levenshteinPairs rejects a block prefix longer than the lev prefix") {
    intercept[IllegalArgumentException] {
      Dedup.levenshteinPairs(corpus, "doc_id", "text",
        blockPrefix = 50, levPrefix = 20)
    }
  }

  test("exactDedup collapses identical texts and keeps the min id") {
    val out = Dedup.exactDedup(corpus, "text", "doc_id")
      .orderBy("keep_id").select("keep_id", "n_copies").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 2L), (1L, 1L), (3L, 1L)))
  }

  test("minhash+LSH surfaces the exact and near duplicates") {
    val docSets = Dedup.hashedDocSets(corpus, "doc_id", "text", 3)
    val cand = Dedup.lshCandidates(Dedup.lshBands(Dedup.minHashSignature(docSets, 8), 4, 2))
    val pairs = Dedup.verifiedJaccard(cand, docSets)
      .filter(col("jaccard") >= 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L))) // exact dup always survives
    val j02 = Dedup.verifiedJaccard(cand, docSets).filter(col("a") === 0 && col("b") === 2)
      .select("jaccard").as[Double].collect()
    assert(j02.toSeq == Seq(1.0))
  }

  test("production xxhash64 signature agrees with oracle signature on dup detection") {
    val docSets = Dedup.hashedDocSetsXx(corpus, "doc_id", "text", 3)
    val sig = Dedup.minHashSignatureXx(docSets, 8)
    val cand = Dedup.lshCandidates(Dedup.lshBandsHashed(sig, 4, 2))
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 2L)))
  }

  test("simhash gives identical signatures to identical token sets") {
    val docSets = Dedup.hashedDocSets(corpus, "doc_id", "text", 1)
    val sims = Dedup.simHash(docSets, 16).orderBy("doc").as[(Long, Long)].collect().toMap
    assert(sims(0L) == sims(2L))
    val pairs = Dedup.simHashPairs(Dedup.simHash(docSets, 16), 16, 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)))
  }

  test("simhash pair emitted once even when several chunk keys match") {
    // docs 0 and 2 are identical ⇒ every block's chunk key matches; the
    // first-match filter must still emit exactly one (0,2) row.
    val docSets = Dedup.hashedDocSets(corpus, "doc_id", "text", 1)
    val rows = Dedup.simHashPairs(Dedup.simHash(docSets, 16), 16, 3)
      .filter(col("a") === 0 && col("b") === 2).collect()
    assert(rows.length == 1 && rows.head.getAs[Int]("hamming") == 0)
  }

  test("simHashPairs drops null signatures and absorbs duplicate (doc, sim) rows") {
    // Contract pinned after the r11 group-by-signature rewrite: a NULL
    // signature carries no similarity information (the old pair-join
    // dropped it via null XOR), and duplicate input rows must not inflate
    // the pair set (the old collect_set semantics).
    import spark.implicits._
    val sims = Seq(
      (1L, Option(5L)), (2L, Option(5L)), (2L, Option(5L)), // dup row for doc 2
      (3L, None), (4L, None)                                // null sims: no pairs
    ).toDF("doc", "sim")
    val pairs = Dedup.simHashPairs(sims, 16, 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the (1,2) same-signature pair, got $pairs")
  }

  test("64-bit simhash (production) finds the dup pair and agrees with the vote aggregate") {
    // binds d_simhash_64 (rows-only) to checked semantics: the compiled
    // 64-bit expression must equal the distributive vote aggregate
    // bit-for-bit, and the planted dup pair must survive 16-bit-chunk
    // blocking exactly once.
    val docSets = Dedup.hashedDocSetsXx(corpus, "doc_id", "text", 1)
    val fast = Dedup.simHash(docSets, 64).orderBy("doc").as[(Long, Long)].collect()
    val slow = Dedup.simHashViaAgg(docSets, 64).orderBy("doc").as[(Long, Long)].collect()
    assert(fast.sameElements(slow))
    val rows = Dedup.simHashPairs(Dedup.simHash(docSets, 64), 64, 3)
      .filter(col("a") === 0 && col("b") === 2).collect()
    assert(rows.length == 1 && rows.head.getAs[Int]("hamming") == 0)
  }

  test("ngram jaccard finds the near-dup pair above threshold") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 2, 0.3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("df-capped blocking is a subset of exact pairs with high recall (sf0.001)") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3, maxDf = 32)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // Capping only removes candidates, never adds: capped ⊆ exact always.
    assert(capped.subsetOf(exact))
    // Near-dup pairs share many LOW-df shingles (their unique content),
    // so dropping the high-df blocking shingles barely dents recall.
    assert(exact.nonEmpty, "sf0.001 corpus should contain near-dup pairs")
    assert(capped.size.toDouble / exact.size >= 0.9,
      s"recall ${capped.size}/${exact.size} below 0.9")
  }

  test("connected components labels transitive clusters by min id (D6)") {
    // two components: {1,2,3,9} via chain 1-2, 2-3, 3-9 (1~9 never paired)
    // and {5,6}; the chain forces >1 propagation round
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 9L), (5L, 6L)).toDF("a", "b")
    val comp = Dedup.components(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("components converges on a long chain within maxIter (D6)") {
    // a 24-node path is the propagation worst case: min label must walk
    // the whole diameter
    val chain = (0L until 23L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Dedup.components(chain, "a", "b").as[(Long, Long)].collect().toMap
    assert(comp.size == 24 && comp.values.forall(_ == 0L))
  }

  test("components with reliable checkpointing matches localCheckpoint round-for-round (D6)") {
    // The cluster-mode switch (reliable = true → FS checkpoint instead of
    // executor-storage localCheckpoint) must change ONLY durability: same
    // round structure, same labels. Run the propagation worst case (a
    // path, which exercises every round) both ways.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val chain = (0L until 23L).map(i => (i, i + 1)).toDF("a", "b")
      val local = Dedup.components(chain, "a", "b").as[(Long, Long)].collect().toMap
      val rel = Dedup.components(chain, "a", "b", reliable = true)
        .as[(Long, Long)].collect().toMap
      assert(rel == local)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
