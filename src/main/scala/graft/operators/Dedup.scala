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
  * The corpus is tokenized/hashed exactly ONCE into per-document shingle
  * sets ([[hashedDocSets]]) — and since a shingle-id set is a pure
  * function of one document's text, that pass is a PROJECTION (native
  * `graft_shingles` → `graft_gid_set`), not an aggregate: no explode, no
  * collect_set buffers, no wide exchange beyond the parallelism
  * repartition. Signatures likewise ([[minHashSignature]]/[[simHash]] are
  * single compiled passes over the id array via `graft_minhash`/
  * `graft_simhash`). Downstream, candidate generation shuffles only
  * signature-sized rows and verification is two slim joins +
  * `array_intersect` — never a per-shingle fan-out join, and the text
  * never moves after the first pass.
  *
  * Two hashing modes:
  *  - ORACLE mode: shingle ids are the top 60 bits of md5(shingle) and
  *    permutations are affine `(a·id+b) mod p` — exact integer arithmetic
  *    the DuckDB oracle reproduces term by term.
  *  - PRODUCTION mode (the *Xx functions): `xxhash64` throughout — cheaper
  *    hashing, not DuckDB-expressible; this is the 100 TB path.
  *
  * The distributive explode+aggregate formulations are kept as `*ViaAgg`
  * — the reference semantics the sketch expressions are spec'd
  * bit-identical to (SketchExprSpec).
  */
object Dedup {

  val P: Long = graft.functions.SketchExprs.P // 2^31 − 1 (Mersenne prime)

  /** Partition count for fan-out self-joins. AQE coalesces exchanges by
    * their INPUT bytes; a candidate self-join has tiny inputs (signatures)
    * and a 100×+ multi-match fan-out, so coalescing collapses it onto 1-2
    * threads (measured: load ~1.7 on a local[32] box mid-join). An
    * explicit numbered repartition is exempt from AQE coalescing, pinning
    * the fan-out work at cluster parallelism. */
  private def fanout(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Affine permutation coefficients, deterministic closed form
    * (delegates to the expression layer — single source of truth). */
  def perms(k: Int): Seq[(Long, Long)] = graft.functions.SketchExprs.perms(k)

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

  /** (doc, shingle) rows, duplicates included (set semantics are applied
    * by whoever aggregates downstream).
    *
    * The token array is materialized in its own projection BEFORE the
    * n-gram transform: `wordNgrams` indexes the array once per shingle
    * position, and if the tokenizer expression were inlined there, each
    * `element_at` would re-run the whole regex tokenization (O(tokens²)
    * work per document — measured 10× slowdown at sf0.1). CollapseProject
    * keeps the split because the alias is referenced repeatedly by a
    * non-cheap expression. */
  private def explodedShingles(df: DataFrame, idCol: String, textCol: String,
                               n: Int): DataFrame =
    // Repartition the RAW text by doc id before the shingling projection:
    // it is the same hash distribution the downstream groupBy(doc) needs
    // (so that agg becomes exchange-free), moved BEFORE the expensive
    // work — a small-file corpus otherwise tokenizes on however few
    // partitions the scan produced (measured: 1 task for the whole
    // corpus at sf0.1). graft_shingles is the native codegen expression
    // (ShingleExpr) — one compiled byte-scan per doc vs ~20 CPU-s of
    // interpreted HOF evaluation for the same result.
    df.repartition(fanout(df), col(idCol))
      .select(col(idCol).as("doc"),
        explode(call_function("graft_shingles", col(textCol), lit(n))).as("g"))

  /** ORACLE-mode shingle id: the top 60 bits of md5(shingle) as a long.
    * md5 is computable bit-identically in DuckDB ([[hashedGidDuck]]), so
    * parity holds with no vocabulary build — a pure projection. Both
    * sides use SET-OF-GID semantics (Spark: `collect_set(gid)`; oracle:
    * `SELECT DISTINCT doc, gid`), so two shingles colliding to one gid
    * merge identically in both engines. */
  def hashedGid(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")

  def hashedGidDuck(g: String): String =
    s"CAST('0x' || substr(md5($g), 1, 15) AS BIGINT)"

  /** The corpus reduced to per-doc shingle-id sets: `(doc, gs)` — a pure
    * PROJECTION (shingle → hash → distinct, one compiled pass per doc via
    * `graft_gid_set`), so no aggregate and no wide shuffle: the only
    * exchange is the parallelism repartition on doc, which doubles as the
    * partitioning every downstream doc-keyed aggregate/join wants. Docs
    * with fewer than n tokens are dropped (no shingles), matching the
    * oracle's `len(toks) >= n` filter. */
  def hashedDocSets(df: DataFrame, idCol: String, textCol: String, n: Int,
                    respread: Boolean = true): DataFrame = {
    // respread=false when the caller's input is already laid out wide
    // (e.g. StagedTables.docsSpread: defaultParallelism files hashed by
    // doc id) — the repartition would re-shuffle the full text column
    // just to land at the parallelism the scan already has (r16 ADVICE).
    val in = if (respread) df.repartition(fanout(df), col(idCol)) else df
    in.select(col(idCol).as("doc"),
        call_function("graft_gid_set",
          call_function("graft_shingles", col(textCol), lit(n))).as("gs"))
      .filter(size(col("gs")) > 0)
  }

  /** PRODUCTION doc sets: xxhash64 ids, no md5/hex decode. */
  def hashedDocSetsXx(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.repartition(fanout(df), col(idCol))
      .select(col(idCol).as("doc"),
        call_function("graft_gid_set_xx",
          call_function("graft_shingles", col(textCol), lit(n))).as("gs"))
      .filter(size(col("gs")) > 0)

  /** Reference (distributive) formulation of [[hashedDocSets]]: explode +
    * groupBy + collect_set. Spec'd set-identical to the projection form. */
  private[graft] def hashedDocSetsViaAgg(df: DataFrame, idCol: String, textCol: String,
                                         n: Int): DataFrame =
    explodedShingles(df, idCol, textCol, n)
      .groupBy("doc").agg(collect_set(hashedGid(col("g"))).as("gs"))

  private[graft] def hashedDocSetsXxViaAgg(df: DataFrame, idCol: String, textCol: String,
                                           n: Int): DataFrame =
    explodedShingles(df, idCol, textCol, n)
      .groupBy("doc").agg(collect_set(xxhash64(col("g"))).as("gs"))

  /** Re-exploded (doc, gid) view of a doc-set table. Generate preserves
    * the parent's hash partitioning on `doc`, so a following
    * groupBy("doc") aggregates WITHOUT another exchange. */
  def docIds(docSets: DataFrame): DataFrame =
    docSets.select(col("doc"), explode(col("gs")).as("gid"))

  /** MinHash signature: k affine permutations computed in ONE compiled
    * pass over each doc's id array (`graft_minhash`) — a projection, no
    * explode/aggregate. gid is reduced mod P before the multiply so a·gid
    * never overflows a long (a < P < 2^31 and gid%P < 2^31 keep the
    * product under 2^62). Output schema (doc, m0..m{k-1}) unchanged. */
  def minHashSignature(docSets: DataFrame, k: Int): DataFrame =
    docSets.select(col("doc"),
        call_function("graft_minhash", col("gs"), lit(k)).as("__ms"))
      .select(col("doc") +:
        (0 until k).map(j => element_at(col("__ms"), j + 1).as(s"m$j")): _*)

  /** PRODUCTION signature: permutation j re-hashes the shingle id with
    * seed j via xxhash64 — full-range, no modular arithmetic; one
    * compiled pass per doc (`graft_minhash_xx`). */
  def minHashSignatureXx(docSets: DataFrame, k: Int): DataFrame =
    docSets.select(col("doc"),
        call_function("graft_minhash_xx", col("gs"), lit(k)).as("__ms"))
      .select(col("doc") +:
        (0 until k).map(j => element_at(col("__ms"), j + 1).as(s"m$j")): _*)

  /** Reference (distributive) signature formulations — the explode +
    * k-min aggregate shape; spec'd bit-identical to the expression form. */
  private[graft] def minHashSignatureViaAgg(docSets: DataFrame, k: Int): DataFrame = {
    val aggs = perms(k).zipWithIndex.map { case ((a, b), j) =>
      min(pmod(lit(a) * pmod(col("gid"), lit(P)) + lit(b), lit(P))).as(s"m$j")
    }
    docIds(docSets).groupBy("doc").agg(aggs.head, aggs.tail: _*)
  }

  private[graft] def minHashSignatureXxViaAgg(docSets: DataFrame, k: Int): DataFrame =
    docIds(docSets).groupBy("doc")
      .agg(min(xxhash64(lit(0), col("gid"))).as("m0"),
        (1 until k).map(j => min(xxhash64(lit(j), col("gid"))).as(s"m$j")): _*)

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
    *
    * One groupBy materializes each bucket's (sorted) doc list, and the
    * pairs explode from the array — the bands table is scanned ONCE,
    * where a self-join would materialize it twice (and, cold, race both
    * copies concurrently — measured as the dominant cost of the whole
    * query under driver conditions). Per-bucket memory is the doc-id
    * array: LSH buckets are near-duplicate cliques, small by
    * construction; a degenerate corpus (millions of copies of one doc)
    * makes the pair set itself quadratic, which no candidate scheme
    * avoids — exact-dedup first ([[exactDedup]]) is the standard guard. */
  def lshCandidates(bandsDf: DataFrame): DataFrame =
    bandsDf.groupBy("band", "bkey")
      .agg(sort_array(collect_set(col("doc"))).as("docs"))
      .filter(size(col("docs")) > 1)
      .select(col("docs"), posexplode(col("docs")))
      .select(col("col").as("a"), expr("slice(docs, pos + 2, size(docs))").as("rest"))
      .select(col("a"), explode(col("rest")).as("b"))
      .distinct()

  /** Exact Jaccard over the shingle-id sets, restricted to candidates:
    * two joins against the doc-set table (one row per candidate per side
    * — NO per-shingle fan-out) and an `array_intersect` per pair. The
    * per-pair cost is O(|ga|+|gb|), bounded by document length, and the
    * joined payload is the bounded id array — the shape that survives a
    * web-scale corpus. */
  def verifiedJaccard(cand: DataFrame, docSets: DataFrame): DataFrame =
    cand
      .join(docSets.as("sa"), col("a") === col("sa.doc"))
      .join(docSets.as("sb"), col("b") === col("sb.doc"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sa.gs"), col("sb.gs"))).cast("long").as("inter"),
        size(col("sa.gs")).cast("long").as("na"),
        size(col("sb.gs")).cast("long").as("nb"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))

  /** D6 — connected components over a near-dup pair list: every doc in any
    * pair labeled with the MINIMUM doc id reachable through the pair graph.
    * Pairs are what D2-D5 emit, but deduplication needs CLUSTERS — "keep
    * one doc per component" is ill-posed on pairs alone (a~b, b~c must
    * collapse to ONE survivor even when a~c was never emitted).
    *
    * Algorithm: min-label propagation with pointer jumping. Labels start
    * at min(self, neighbors); each round takes (a) the min over
    * neighbors' labels — one edge⋈label join + min-aggregate — and (b) a
    * label-of-label jump (l(v) ← min(l(v), l(l(v))) — labels⋈labels),
    * which doubles how far a min has travelled and makes even a pure
    * path graph converge in O(log n) rounds instead of O(diameter).
    * Every round is checkpointed so the plan stays one round deep
    * (lineage would otherwise grow exponentially and re-execute every
    * prior round per action). The driver loop only coordinates rounds
    * and reads a has-anything-changed flag — all data work is
    * distributed, the standard Spark shape for iterative graph
    * algorithms.
    *
    * `reliable = false` (default) uses `localCheckpoint`: blocks live on
    * executor storage — fast, right for local mode and the harness, but
    * LOSSY under executor failure (a lost executor loses blocks whose
    * lineage was truncated, failing the job). On a cluster where
    * executor loss is routine, pass `reliable = true` to write round
    * checkpoints to the reliable FS set via
    * `SparkContext.setCheckpointDir` (HDFS/S3); rounds then survive any
    * executor loss at the cost of a round-sized write per iteration. */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 25, reliable: Boolean = false): DataFrame = {
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val und = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
    val edges = ckpt(und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
      .distinct())
    var labels = ckpt(edges.groupBy("u").agg(least(min(col("v")), col("u")).as("comp")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val prop = edges
        .join(labels.select(col("u").as("__n"), col("comp").as("__ncomp")),
          col("v") === col("__n"))
        .groupBy("u").agg(min(col("__ncomp")).as("__pcomp"))
      val stepped = labels.join(prop, Seq("u"), "left")
        .select(col("u"),
          least(col("comp"), coalesce(col("__pcomp"), col("comp"))).as("comp"))
      // pointer jump: follow the label's own label (comp is always a node
      // of the symmetric edge list, so it has a labels row)
      val next = ckpt(stepped.as("x")
        .join(stepped.select(col("u").as("__ju"), col("comp").as("__jc")),
          col("x.comp") === col("__ju"), "left")
        .select(col("x.u").as("u"),
          least(col("x.comp"), coalesce(col("__jc"), col("x.comp"))).as("comp")))
      converged = next.select(col("u"), col("comp").as("__new"))
        .join(labels, "u")
        .filter(col("__new") < col("comp")).isEmpty
      labels = next
      iter += 1
    }
    labels.select(col("u").as("doc"), col("comp").as("component"))
  }

  /** D2 — all near-dup pairs by n-gram Jaccard ≥ threshold, candidates
    * blocked on sharing ≥1 shingle (the per-shingle bucket IS the
    * blocking).
    *
    * Shape: one [[hashedDocSets]] pass (the text is hashed to long ids
    * once and never shuffled again), then per-gid doc buckets
    * (groupBy + collect_set), intra-bucket pair explosion, and a count
    * per pair — `inter(a,b)` = number of shared shingle ids. No
    * self-join: the bucket table is scanned once, and all joined/shuffled
    * data is longs. The numbered repartition pins the fan-out stage at
    * cluster parallelism (AQE would coalesce it by its tiny input bytes
    * and run the pair explosion on 1-2 threads).
    *
    * `maxDf` caps the blocking side: shingles appearing in more than
    * `maxDf` docs are dropped from candidate GENERATION (not from the
    * Jaccard sizes). On a web-scale corpus high-df shingles create
    * near-quadratic hot buckets while contributing almost no evidence of
    * duplication — the standard production mitigation. `maxDf <= 0`
    * disables the cap (exact semantics, what the oracle checks). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double, maxDf: Int = 0): DataFrame =
    jaccardFromOverlap(interPairs(df, idCol, textCol, n, maxDf), threshold)

  /** Jaccard closing arithmetic over a precomputed [[setOverlapPairs]]
    * relation — split out so several detectors (D2 Jaccard, D2c
    * containment) can share ONE candidate build instead of each planning
    * its own pass over the corpus (r6 verdict: d_containment re-ran the
    * whole machinery for a different final division). */
  def jaccardFromOverlap(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")

  /** D2c — asymmetric CONTAINMENT pairs over the same candidate machinery:
    * c(a→b) = |A∩B| / |A|. Jaccard misses the doc-inside-doc case (a
    * quote or full inclusion of a small doc in a big one scores low
    * symmetric similarity but ~1.0 containment of the small side) —
    * containment is the standard complement for subset-dedup. Same
    * blocking, same single bucket scan, same `maxDf` hot-bucket cap. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, threshold: Double, maxDf: Int = 0): DataFrame =
    containmentFromOverlap(interPairs(df, idCol, textCol, n, maxDf), threshold)

  /** Containment closing arithmetic over a precomputed
    * [[setOverlapPairs]] relation (see [[jaccardFromOverlap]]). */
  def containmentFromOverlap(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("c_ab", col("inter").cast("double") / col("na").cast("double"))
      .withColumn("c_ba", col("inter").cast("double") / col("nb").cast("double"))
      .filter(greatest(col("c_ab"), col("c_ba")) >= threshold)
      .select("a", "b", "c_ab", "c_ba")

  /** Public face of the shared set-overlap candidate machinery:
    * (a, b, inter, na, nb) for every candidate pair sharing ≥1 shingle.
    * Build it once, close it several ways ([[jaccardFromOverlap]],
    * [[containmentFromOverlap]]). */
  def setOverlapPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, maxDf: Int = 0): DataFrame =
    interPairs(df, idCol, textCol, n, maxDf)

  /** Shared set-overlap candidate machinery (D2/D2x/D2c): per-shingle doc
    * buckets (the blocking), intra-bucket pair explosion, shared-shingle
    * count per pair joined to both set sizes → (a, b, inter, na, nb). */
  private def interPairs(df: DataFrame, idCol: String, textCol: String,
                         n: Int, maxDf: Int): DataFrame = {
    // Eager fill: the sizes and candidate branches below share this
    // cache; left lazy they race to materialize it concurrently
    // (measured: full 32-task waves parked on block locks).
    val docSets = hashedDocSets(df, idCol, textCol, n).persist(StorageLevel.MEMORY_AND_DISK)
    docSets.count()
    val sizes = docSets.select(col("doc"), size(col("gs")).cast("long").as("n"))
    val buckets = docIds(docSets)
      .repartition(fanout(docSets), col("gid"))
      .groupBy("gid").agg(sort_array(collect_set(col("doc"))).as("docs"))
      .filter(size(col("docs")) > 1)
    val capped = if (maxDf > 0) buckets.filter(size(col("docs")) <= maxDf) else buckets
    val inter = capped
      .select(col("docs"), posexplode(col("docs")))
      .select(col("col").as("a"), expr("slice(docs, pos + 2, size(docs))").as("rest"))
      .select(col("a"), explode(col("rest")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("a") === col("sa.doc"))
      .join(sizes.as("sb"), col("b") === col("sb.doc"))
      .select(col("a"), col("b"), col("inter"),
        col("sa.n").as("na"), col("sb.n").as("nb"))
  }

  /** SimHash bit coefficients (closed form; expression-layer source). */
  def simPerms(bits: Int): Seq[(Long, Long)] =
    graft.functions.SketchExprs.simPerms(bits)

  /** D4 — b-bit SimHash over the distinct-token set: bit j of token id t
    * is ((c·t+d) mod P) mod 2; the signature bit is the sign of the ±1
    * vote sum. All `bits` votes in one compiled pass per doc
    * (`graft_simhash`) — a projection, no explode/aggregate. */
  def simHash(docSets: DataFrame, bits: Int): DataFrame =
    docSets.select(col("doc"),
      call_function("graft_simhash", col("gs"), lit(bits)).as("sim"))

  /** Reference (distributive) SimHash — explode + b-vote aggregate. */
  private[graft] def simHashViaAgg(docSets: DataFrame, bits: Int): DataFrame = {
    val votes = simPerms(bits).zipWithIndex.map { case ((c, dd), j) =>
      sum(pmod(pmod(lit(c) * pmod(col("gid"), lit(P)) + lit(dd), lit(P)), lit(2L)) * 2L - 1L).as(s"v$j")
    }
    val sig = docIds(docSets).groupBy("doc").agg(votes.head, votes.tail: _*)
    val sim = (0 until bits).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    sig.select(col("doc"), sim.as("sim"))
  }

  /** D4 — pairs within `maxHamming`, blocked by chunk keys.
    *
    * Pigeonhole with the MINIMAL block count: `maxHamming+1` blocks of
    * `bits/(maxHamming+1)` bits — at most `maxHamming` blocks can differ,
    * so some block is identical and the blocked equi-join loses nothing
    * vs the quadratic scan. Fewer blocks ⇒ wider chunks ⇒ exponentially
    * more key values per block (2^8=256 for 32-bit/hamming-3 vs 2^4=16
    * for 4-bit chunks) ⇒ thinner buckets and a near-linear join.
    *
    * A pair sharing several chunk keys is emitted ONCE, at its first
    * matching block (the filter requires every earlier block to differ) —
    * no distinct() shuffle over the pair fan-out. */
  def simHashPairs(sims: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    val blocks = maxHamming + 1
    require(bits % blocks == 0, s"bits=$bits not divisible into $blocks blocks")
    val cb = bits / blocks
    val mask = (1L << cb) - 1
    // SIGNATURE DEDUP FIRST (the sf1 lesson): corpora concentrate — at
    // sf1 the synthetic vocabulary yields 3.85M identical-signature doc
    // pairs, and every doc of a hot signature lands in the SAME bucket of
    // EVERY block, so blocking alone degrades to doc-count-quadratic
    // bucket scans (>600 s where this form takes seconds). Grouping docs
    // by signature makes the bucket join run over DISTINCT signatures
    // (the only thing hamming depends on); identical-signature pairs are
    // emitted combinatorially from the membership lists with zero join,
    // and each qualifying signature pair expands back to doc pairs by one
    // projection. Work is now quadratic only in DISTINCT signatures per
    // bucket — boilerplate-heavy corpora collapse the distinct count, not
    // the runtime.
    // NULL signatures carry no similarity information — the pre-group
    // form dropped them implicitly (null XOR is null, failing every
    // predicate); keep that contract rather than emitting all null-sim
    // docs as one hamming-0 clique. collect_set (not _list) absorbs
    // duplicate (doc, sim) input rows the same way the old pair join did.
    val groups = sims.filter(col("sim").isNotNull).groupBy("sim")
      .agg(sort_array(collect_set(col("doc"))).as("docs"))
    // hamming = 0: all a < b combinations within one signature's members
    val samePairs = groups.filter(size(col("docs")) > 1)
      .select(posexplode(col("docs")).as(Seq("pos", "a")), col("docs"))
      .select(col("a"),
        explode(expr("slice(docs, pos + 2, size(docs))")).as("b"))
      .select(col("a"), col("b"), lit(0).as("hamming"))
    // hamming >= 1: chunk-key blocking over DISTINCT signatures, each
    // carrying its member list; sort_array on (sim, docs) structs orders
    // buckets by sim, so sa < sb holds by construction and the
    // first-matching-block predicate dedups across blocks.
    val chunked = groups.select(col("sim"), col("docs"),
      explode(array((0 until blocks).map(t =>
        struct(lit(t).as("blk"),
          expr(s"shiftright(sim, ${cb * t}) & $mask").as("ckey"))): _*)).as("c"))
      .select(col("sim"), col("docs"), col("c.blk"), col("c.ckey"))
    val xorC = col("sa").bitwiseXOR(col("y.sim"))
    val firstMatch = (0 until blocks).map { t =>
      val earlierAllDiffer = (0 until t)
        .map(tp => shiftright(xorC, cb * tp).bitwiseAND(lit(mask)) =!= 0)
        .foldLeft(lit(true))(_ && _)
      (col("blk") === t) && earlierAllDiffer
    }.reduce(_ || _)
    val crossPairs = chunked.groupBy("blk", "ckey")
      .agg(sort_array(collect_list(struct(col("sim"), col("docs")))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(col("blk"), col("ds"), posexplode(col("ds")))
      .select(col("blk"), col("col.sim").as("sa"), col("col.docs").as("da"),
        expr("slice(ds, pos + 2, size(ds))").as("rest"))
      .select(col("blk"), col("sa"), col("da"), explode(col("rest")).as("y"))
      .filter(firstMatch)
      .select(col("da"), col("y.docs").as("db"),
        expr("bit_count(sa ^ y.sim)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      // expand the signature pair to doc pairs; groups are disjoint, so
      // least/greatest normalizes each doc pair exactly once
      .select(explode(col("da")).as("x"), col("db"), col("hamming"))
      .select(col("x"), explode(col("db")).as("yd"), col("hamming"))
      .select(least(col("x"), col("yd")).as("a"),
        greatest(col("x"), col("yd")).as("b"), col("hamming"))
    samePairs.unionByName(crossPairs)
  }

  /** D7 — edit-distance near-dup pairs, prefix-blocked: candidates share
    * their first `blockPrefix` characters, and pairs whose first
    * `levPrefix` characters are within `maxLev` edits survive. Spark's
    * `levenshtein` is codegen'd; bounding its input to a fixed prefix
    * bounds the O(n·m) cost per pair.
    *
    * Scale shape: only `(id, prefix)` projections move — never full text —
    * and blocks hotter than `maxBlock` docs are dropped before the
    * self-join (identical boilerplate prefixes on a web corpus would
    * otherwise make one block quadratic; the same cap D2x applies to
    * shingle blocking). The join itself is an equi-join on the block key.
    * Prefix blocking trades recall for that bound: a pair that diverges
    * inside the first `blockPrefix` chars is unseen (MinHash/SimHash are
    * the order-insensitive complements in this family). */
  def levenshteinPairs(docs: DataFrame, idCol: String, textCol: String,
                       blockPrefix: Int = 24, levPrefix: Int = 200,
                       maxLev: Int = 20, maxBlock: Int = 64): DataFrame = {
    require(blockPrefix > 0 && levPrefix >= blockPrefix,
      "need 0 < blockPrefix <= levPrefix")
    val p = docs.select(col(idCol).as("doc"),
      substring(col(textCol), 1, blockPrefix).as("blk"),
      substring(col(textCol), 1, levPrefix).as("p"))
    val capped = p
      .withColumn("bn", count(lit(1)).over(Window.partitionBy("blk")))
      .filter(col("bn") <= maxBlock)
    val a = capped.select(col("doc").as("doc_a"), col("blk"), col("p").as("pa"))
    val b = capped.select(col("doc").as("doc_b"), col("blk"), col("p").as("pb"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("lev"))
      .filter(col("lev") <= maxLev)
  }

  /** D12 — prefix-blocked Jaro-Winkler near-dup pairs (entity-resolution
    * flavor: transposition-tolerant, prefix-weighted — the measure that
    * rates "small ring"/"small rings" 0.98 where edit distance treats a
    * 1-char suffix and a 1-char mid-string flip identically). Same
    * blocking scheme and hot-block cap as [[levenshteinPairs]]; the
    * similarity is the native `graft_jaro_winkler` codegen expression
    * (functions/JaroWinklerExpr.scala), pinned to DuckDB's variant.
    * At corpus scale: candidate pairs are an equi-join on the block key,
    * never all-pairs, and hot blocks are capped. */
  def jaroWinklerPairs(docs: DataFrame, idCol: String, textCol: String,
                       blockPrefix: Int = 12, jwPrefix: Int = 80,
                       minJw: Double = 0.9, maxBlock: Int = 64): DataFrame = {
    require(blockPrefix > 0 && jwPrefix >= blockPrefix,
      "need 0 < blockPrefix <= jwPrefix")
    val p = docs.select(col(idCol).as("doc"),
      substring(col(textCol), 1, blockPrefix).as("blk"),
      substring(col(textCol), 1, jwPrefix).as("p"))
    // The hot-block cap used to be a window count over blk — a full
    // shuffle AND sort of the prefix projection BEFORE the self-join
    // shuffled both sides again (19.3× the baseline at sf1). The cap
    // only needs the SET of oversized block keys, which is tiny by
    // construction (every surviving block has ≤ maxBlock members, so
    // oversized keys number ≤ n/maxBlock): a partial-agg groupBy-count
    // collapses map-side, and the anti-join against the broadcast
    // oversized set prunes without moving `p` at all. The self-join on
    // blk is then the only shuffle the operator pays.
    val oversized = p.groupBy("blk").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBlock).select("blk")
    // Spread surviving blocks BEFORE the pair explosion: the corpus
    // arrives on scan-split partitioning (a single parquet file ⇒ 1-2
    // tasks), AQE broadcasts the tiny other side, and the quadratic JW
    // evaluation would otherwise run inside those 2 map tasks (measured
    // 6.0 of the 6.2 s sf1 wall). Numbered repartition = AQE-coalesce-
    // exempt (the d_ngram_jaccard small-files lesson).
    val capped = p.join(broadcast(oversized), Seq("blk"), "left_anti")
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("blk"))
    val a = capped.select(col("doc").as("doc_a"), col("blk"), col("p").as("pa"))
    val b = capped.select(col("doc").as("doc_b"), col("blk"), col("p").as("pb"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("graft_jaro_winkler(pa, pb)").as("jw"))
      .filter(col("jw") >= minJw)
  }
}
