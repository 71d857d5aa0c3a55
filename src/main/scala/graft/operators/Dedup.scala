package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFunctions

/** Deduplication family (SURVEY §2 D1-D4): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard. All DataFrame-declarative — the only shuffles are the
  * ones the semantics force (group-by-key, candidate equi-joins).
  *
  * Two hashing modes:
  *  - ORACLE mode (these defaults): token/shingle ids come from a
  *    `dense_rank` vocabulary and permutations are affine `(a·id+b) mod p`
  *    — exact integer arithmetic the DuckDB oracle reproduces term by term.
  *  - PRODUCTION mode ([[minHashSignatureXx]]): `xxhash64(shingle, seed)`
  *    directly — no vocabulary build (which needs a global sort/window), no
  *    extra join; this is the 100 TB path. Same algorithm, different hash.
  */
object Dedup {

  val P: Long = 2147483647L // 2^31 − 1 (Mersenne prime)

  /** Partition count for fan-out self-joins. AQE coalesces exchanges by
    * their INPUT bytes; a candidate self-join has tiny inputs (signatures)
    * and a 100×+ multi-match fan-out, so coalescing collapses it onto 1-2
    * threads (measured: load ~1.7 on a local[32] box mid-join). An
    * explicit numbered repartition is exempt from AQE coalescing, pinning
    * the fan-out work at cluster parallelism. */
  private def fanout(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Affine permutation coefficients, deterministic closed form. */
  def perms(k: Int): Seq[(Long, Long)] =
    (0 until k).map(j => (((2L * j + 1) * 1103515245L) % P, ((j + 1) * 12345679L) % P))

  /** D1 — exact dedup by content hash: one shuffle on md5(text). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-grams (shingles) of the token array; empty below n tokens.
    * The `when` guard matters: Spark's `sequence(0, m)` with m<0 would
    * count DOWN — never let it see a negative bound. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Distinct (id, shingle) pairs for a document table.
    *
    * The token array is materialized in its own projection BEFORE the
    * n-gram transform: `wordNgrams` indexes the array once per shingle
    * position, and if the tokenizer expression were inlined there, each
    * `element_at` would re-run the whole regex tokenization (O(tokens²)
    * work per document — measured 10× slowdown at sf0.1). CollapseProject
    * keeps the split because the alias is referenced repeatedly by a
    * non-cheap expression. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("doc"), explode(wordNgrams(col("__toks"), n)).as("g"))
      .distinct()

  /** Shingle vocabulary: dense ids from a global order. Kept for
    * reference/spec use; the oracle queries use [[hashedIds]] instead —
    * the window is a single-partition sort, which is both the scaling
    * bottleneck and a latency cliff even locally. */
  def vocab(sh: DataFrame): DataFrame =
    sh.select("g").distinct()
      .withColumn("gid", dense_rank().over(Window.orderBy("g")).cast("long"))

  /** (doc, gid) pairs via the dense-rank vocabulary. */
  def shingleIds(sh: DataFrame, vb: DataFrame): DataFrame =
    sh.join(vb, "g").select("doc", "gid")

  /** ORACLE-mode shingle ids without a vocabulary: the top 60 bits of
    * md5(shingle) as a long. md5 is computable bit-identically in DuckDB
    * (`CAST('0x' || substr(md5(g),1,15) AS BIGINT)`), so parity holds with
    * no global sort, no distinct, no join-back — a pure projection. A
    * collision merges two shingles in BOTH engines identically, so
    * comparisons still agree exactly. */
  def hashedIds(sh: DataFrame): DataFrame =
    sh.select(col("doc"),
      conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gid"))

  def hashedGidDuck(g: String): String =
    s"CAST('0x' || substr(md5($g), 1, 15) AS BIGINT)"

  /** MinHash signature: k affine permutations, one min-agg pass. gid is
    * reduced mod P before the multiply so a·gid never overflows a long
    * (a < P < 2^31 and gid%P < 2^31 keep the product under 2^62). */
  def minHashSignature(ids: DataFrame, k: Int): DataFrame = {
    val aggs = perms(k).zipWithIndex.map { case ((a, b), j) =>
      min(pmod(lit(a) * pmod(col("gid"), lit(P)) + lit(b), lit(P))).as(s"m$j")
    }
    ids.groupBy("doc").agg(aggs.head, aggs.tail: _*)
  }

  /** PRODUCTION signature — no vocabulary: permutation j hashes the raw
    * shingle with seed j via xxhash64. */
  def minHashSignatureXx(sh: DataFrame, k: Int): DataFrame =
    sh.groupBy("doc")
      .agg(min(xxhash64(lit(0), col("g"))).as("m0"),
        (1 until k).map(j => min(xxhash64(lit(j), col("g"))).as(s"m$j")): _*)

  /** LSH banding: signature → (band, bandKey) rows; docs sharing any band
    * key are candidates. rowsPerBand=2 packs two minhashes (< P = 2^31)
    * into one long key — an equi-join key, never a similarity compare.
    * ORACLE mode only: the arithmetic pack overflows on full-range
    * xxhash64 signatures — production uses [[lshBandsHashed]]. */
  def lshBands(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    require(rowsPerBand == 2, "band key packing implemented for r=2")
    val pairs = (0 until bands).map { t =>
      struct(lit(t).as("band"),
        (col(s"m${2 * t}") * lit(P) + col(s"m${2 * t + 1}")).as("bkey"))
    }
    sig.select(col("doc"), explode(array(pairs: _*)).as("bk"))
      .select(col("doc"), col("bk.band"), col("bk.bkey"))
  }

  /** PRODUCTION banding: band key = xxhash64 over the band's minhashes —
    * overflow-free for any signature domain, same candidate semantics. */
  def lshBandsHashed(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val pairs = (0 until bands).map { t =>
      val cols = (0 until rowsPerBand).map(r => col(s"m${rowsPerBand * t + r}"))
      struct(lit(t).as("band"), xxhash64(cols: _*).as("bkey"))
    }
    sig.select(col("doc"), explode(array(pairs: _*)).as("bk"))
      .select(col("doc"), col("bk.band"), col("bk.bkey"))
  }

  /** Distinct candidate pairs (a < b) sharing at least one band bucket.
    * The band table is self-joined, so it is materialized once
    * (MEMORY_AND_DISK — signatures are k longs per doc, tiny relative to
    * the text; at 100 TB this is the table you'd persist too). */
  def lshCandidates(bandsDf: DataFrame): DataFrame = {
    val b = bandsDf.persist(StorageLevel.MEMORY_AND_DISK)
      .repartition(fanout(bandsDf), col("band"), col("bkey"))
    val x = b.as("x"); val y = b.hint("shuffle_hash").as("y")
    x.join(y, col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"))
      .distinct()
  }

  /** Exact Jaccard over the shingle-id sets, restricted to candidates. */
  def verifiedJaccard(cand: DataFrame, ids: DataFrame): DataFrame = {
    val sizes = ids.groupBy("doc").agg(count(lit(1)).as("n"))
    val idsP = ids.repartition(fanout(ids), col("doc"))
    val inter = cand.repartition(fanout(cand), col("a"))
      .join(idsP.hint("shuffle_hash").as("ia"), col("a") === col("ia.doc"))
      .join(idsP.hint("shuffle_hash").as("ib"),
        col("b") === col("ib.doc") && col("ia.gid") === col("ib.gid"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("a") === col("sa.doc"))
      .join(sizes.as("sb"), col("b") === col("sb.doc"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter")).cast("double")).as("jaccard"))
  }

  /** D2 — all near-dup pairs by n-gram Jaccard ≥ threshold, candidates
    * blocked on sharing ≥1 shingle (the join IS the blocking). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    // Used three times below (both join sides + sizes): tokenize once.
    val sh = shingles(df, idCol, textCol, n).persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n"))
    // Shuffled-hash over sort-merge: both sides are the bounded shingle
    // table, and the join's multi-match fan-out (every doc pair sharing a
    // shingle) dwarfs the input — hashing 256k rows beats sorting them,
    // and the fan-out cost is identical either way. The numbered
    // repartition pins parallelism through the fan-out (see [[fanout]]).
    val shP = sh.repartition(fanout(sh), col("g"))
    val inter = shP.as("x")
      .join(shP.as("y"),
        col("x.g") === col("y.g") && col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("a"), col("y.doc").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("a") === col("sa.doc"))
      .join(sizes.as("sb"), col("b") === col("sb.doc"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa.n") + col("sb.n") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** SimHash bit coefficients. */
  def simPerms(bits: Int): Seq[(Long, Long)] =
    (0 until bits).map(j => (((3L * j + 7) * 2654435761L) % P, ((j + 1) * 97003L) % P))

  /** D4 — b-bit SimHash over the distinct-token set: bit j of token id t is
    * ((c·t+d) mod P) mod 2; the signature bit is the sign of the ±1 vote
    * sum. One group-by pass computes all bits. */
  def simHash(ids: DataFrame, bits: Int): DataFrame = {
    val votes = simPerms(bits).zipWithIndex.map { case ((c, dd), j) =>
      sum(pmod(pmod(lit(c) * pmod(col("gid"), lit(P)) + lit(dd), lit(P)), lit(2L)) * 2L - 1L).as(s"v$j")
    }
    val sig = ids.groupBy("doc").agg(votes.head, votes.tail: _*)
    val sim = (0 until bits).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    sig.select(col("doc"), sim.as("sim"))
  }

  /** D4 — pairs within `maxHamming`, blocked by 4-bit chunks (pigeonhole:
    * hamming ≤ 3 over 16 bits ⇒ some 4-bit chunk is identical, so the
    * blocked equi-join loses nothing vs the quadratic scan). */
  def simHashPairs(sims: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    val chunks = bits / 4
    val chunked = sims.select(col("doc"), col("sim"),
      explode(array((0 until chunks).map(t =>
        struct(lit(t).as("blk"),
          expr(s"shiftright(sim, ${4 * t}) & 15").as("ckey"))): _*)).as("c"))
      .select(col("doc"), col("sim"), col("c.blk"), col("c.ckey"))
      .persist(StorageLevel.MEMORY_AND_DISK) // self-joined below
      .repartition(fanout(sims), col("blk"), col("ckey"))
    chunked.as("x").join(chunked.hint("shuffle_hash").as("y"),
        col("x.blk") === col("y.blk") && col("x.ckey") === col("y.ckey") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"),
        expr("bit_count(x.sim ^ y.sim)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
