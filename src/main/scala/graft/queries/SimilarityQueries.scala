package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.sources.Tables

/** SURVEY §2 group E — similarity search over `embeddings`. Probe set =
  * vec_id < 20. Rankings compare bit-identical doubles in both engines
  * (VectorFunctions determinism contract), so top-k sets can't diverge.
  */
object SimilarityQueries {

  val all: Seq[QueryDef] = Seq(

    // E1 — brute-force exact cosine top-5 per probe (the baseline).
    QueryDef.sql("s_ann_bruteforce", {
      val cos = VectorFunctions.cosineDuck("p.embedding", "c.embedding")
      s"""SELECT q, rank, n, cos FROM (
         |  SELECT q, n, cos, row_number() OVER (PARTITION BY q ORDER BY cos DESC, n) AS rank
         |  FROM (SELECT p.vec_id AS q, c.vec_id AS n, $cos AS cos
         |        FROM (SELECT * FROM embeddings WHERE vec_id < 20) p
         |        CROSS JOIN embeddings c WHERE p.vec_id <> c.vec_id))
         |WHERE rank <= 5 ORDER BY q, rank""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20), emb, 5)
        .orderBy("q", "rank")
    },

    // E2 — LSH-bucketed ANN: 8 deterministic hyperplanes → 256 buckets;
    // neighbors searched only inside the probe's bucket (top-3).
    QueryDef.sql("s_ann_lsh", {
      val bkt = VectorFunctions.lshBucketDuck("embedding", 64, 8)
      val cos = VectorFunctions.cosineDuck("p.qv", "c.nv")
      s"""SELECT q, rank, n, cos FROM (
         |  SELECT q, n, cos, row_number() OVER (PARTITION BY q ORDER BY cos DESC, n) AS rank
         |  FROM (SELECT p.q, c.n, $cos AS cos
         |        FROM (SELECT vec_id AS q, embedding AS qv, $bkt AS bucket
         |              FROM embeddings WHERE vec_id < 20) p
         |        JOIN (SELECT vec_id AS n, embedding AS nv, $bkt AS bucket
         |              FROM embeddings) c USING (bucket)
         |        WHERE p.q <> c.n))
         |WHERE rank <= 3 ORDER BY q, rank""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb.filter(col("vec_id") < 20), emb, 3, 64, 8)
        .orderBy("q", "rank")
    },

    // E3 — IVF: 16 KMeans coarse centroids (fixed seed), corpus in
    // inverted lists, probes search their 2 nearest lists (top-3).
    // KMeans is an iterative estimator (not DuckDB-expressible) ⇒
    // rows-only; recall vs E1 is spec'd in SimilaritySpec.
    // The coarse quantizer is memoized per dataset: an IVF index is
    // trained ONCE and served many times — the steady-state cost of this
    // query is list assignment + probe, not retraining (training is
    // deterministic, so the memo never changes a result).
    QueryDef.rowsOnly("s_ann_ivf") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 20), emb, 3,
          centroidsFor(emb, d), nProbe = 2)
        .orderBy("q", "rank")
    },

    // E4 — k-NN classification (the similarity search applied): the F5
    // hash split holds out ~10% of rows, each classified by majority
    // label of its 5 nearest train neighbors (exact cosine; ties break
    // count-desc then label-asc — fully deterministic). Output is the
    // confusion matrix. The neighbor search is E1's brute force here;
    // at scale the identical vote/argmax tail runs over E2/E3 candidate
    // lists instead (swap the first stage, keep the rest).
    QueryDef.sql("s_knn_classify", knnConfusionSql) { (s, d) =>
      // the kNN stage is the staged shared confusion matrix (built once
      // in StagedTables.knnCm from knnSplit→bruteForceTopK→vote; two ML
      // metric queries read the same build)
      StagedTables.knnCm(s, d).orderBy("true_label", "pred_label")
    },

    // E4 production path — the SAME vote/argmax tail over E2's LSH
    // candidate lists instead of the brute-force scan: at corpus scale
    // the neighbor search must be an equi-join on bucket id, not a cross
    // join, and this row is that swap made concrete (r6 verdict: the
    // machinery existed, the surface didn't). A probe whose bucket holds
    // fewer than k train rows votes over what it has — the standard ANN
    // serving behavior. LSH bucketing isn't DuckDB-expressible with the
    // same float semantics ⇒ rows-only; per-probe prediction agreement
    // vs the exact E4 path is spec'd in SimilaritySpec.
    QueryDef.rowsOnly("s_knn_classify_lsh") { (s, d) =>
      val (te, tr) = knnSplit(Tables.embeddings(s, d))
      knnConfusion(knnPredictions(te, tr, Similarity.lshTopK(te, tr, 5, 64, 8)))
    },

    // E7 — nDCG@3 of the LSH ranking against the exact ranking (the
    // standard ANN quality METRIC, complementing the recall specs):
    // exact top-3 defines graded relevance (3,2,1), the LSH list is
    // scored by discounted cumulative gain over its own positions, and
    // IDCG normalizes per probe. Probes missing from an LSH bucket score
    // 0 honestly. Sums are ≤3 doubles per probe — engine-stable well
    // inside the 9-digit gate.
    QueryDef.sql("s_ann_ndcg", {
      val cos = VectorFunctions.cosineDuck("p.embedding", "c.embedding")
      val bkt = VectorFunctions.lshBucketDuck("embedding", 64, 8)
      val cosb = VectorFunctions.cosineDuck("p.qv", "c.nv")
      s"""WITH ex AS (SELECT q, rank, n FROM (
         |  SELECT q, n, row_number() OVER (PARTITION BY q ORDER BY cos DESC, n) AS rank
         |  FROM (SELECT p.vec_id AS q, c.vec_id AS n, $cos AS cos
         |        FROM (SELECT * FROM embeddings WHERE vec_id < 20) p
         |        CROSS JOIN embeddings c WHERE p.vec_id <> c.vec_id)) WHERE rank <= 3),
         |ls AS (SELECT q, rank, n FROM (
         |  SELECT q, n, row_number() OVER (PARTITION BY q ORDER BY cos DESC, n) AS rank
         |  FROM (SELECT p.q, c.n, $cosb AS cos
         |        FROM (SELECT vec_id AS q, embedding AS qv, $bkt AS bucket
         |              FROM embeddings WHERE vec_id < 20) p
         |        JOIN (SELECT vec_id AS n, embedding AS nv, $bkt AS bucket
         |              FROM embeddings) c USING (bucket)
         |        WHERE p.q <> c.n)) WHERE rank <= 3),
         |rel AS (SELECT q, n, CAST(4 - rank AS DOUBLE) AS rel FROM ex),
         |dcg AS (SELECT ls.q, sum(coalesce(rel.rel, 0) / ${graft.functions.PortableMath.log2Sql("(ls.rank + 1)")}) AS dcg
         |        FROM ls LEFT JOIN rel ON ls.q = rel.q AND ls.n = rel.n GROUP BY 1),
         |idcg AS (SELECT q, sum(CAST(4 - rank AS DOUBLE) / ${graft.functions.PortableMath.log2Sql("(rank + 1)")}) AS idcg FROM ex GROUP BY q)
         |SELECT idcg.q, coalesce(dcg.dcg, 0.0) AS dcg, idcg.idcg,
         |  coalesce(dcg.dcg, 0.0) / idcg.idcg AS ndcg
         |FROM idcg LEFT JOIN dcg ON idcg.q = dcg.q
         |ORDER BY idcg.q""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 20)
      val ex = Similarity.bruteForceTopK(probes, emb, 3).select("q", "rank", "n")
      val ls = Similarity.lshTopK(probes, emb, 3, 64, 8).select("q", "rank", "n")
      val rel = ex.select(col("q"), col("n"), (lit(4) - col("rank")).cast("double").as("rel"))
      val dcg = ls.as("l")
        .join(rel.as("r"), col("l.q") === col("r.q") && col("l.n") === col("r.n"), "left")
        .groupBy(col("l.q").as("q"))
        .agg(sum(coalesce(col("rel"), lit(0.0)) /
          graft.functions.PortableMath.pLog2(col("l.rank") + 1)).as("dcg"))
      val idcg = ex.groupBy("q")
        .agg(sum((lit(4) - col("rank")).cast("double") /
          graft.functions.PortableMath.pLog2(col("rank") + 1)).as("idcg"))
      idcg.join(dcg, Seq("q"), "left")
        .select(col("q"), coalesce(col("dcg"), lit(0.0)).as("dcg"), col("idcg"),
          (coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
        .orderBy("q")
    },

    // E5 — int8 scalar quantization of the embedding store (the 4×
    // memory/IO shrink an ANN serving tier runs on): per-dimension
    // min/max (a dim-sized broadcast), q = round((v-min)·255/(max-min)),
    // reported per dim as integer-exact sum_q plus max reconstruction
    // error (max over doubles is order-free, so no decimal laundering is
    // needed — SURVEY §4). Two passes by construction (stats, then
    // apply) — the classic quantizer shape; at 100 TB each pass is a
    // narrow projection + partial agg, and the apply pass is where the
    // quantized vectors would be written out.
    QueryDef.sql("s_quantize_int8",
      """WITH e0 AS (SELECT vec_id, embedding,
        |         unnest(range(0, len(embedding))) AS dim FROM embeddings),
        |ex AS (SELECT vec_id, CAST(dim AS INT) AS dim,
        |         CAST(embedding[dim+1] AS DOUBLE) AS v FROM e0),
        |st AS (SELECT dim, min(v) AS vmin, max(v) AS vmax FROM ex GROUP BY 1),
        |qz AS (SELECT ex.dim, v, vmin, vmax,
        |         CASE WHEN vmax = vmin THEN 0
        |              ELSE CAST(round((v - vmin) * 255.0 / (vmax - vmin)) AS BIGINT)
        |         END AS q
        |       FROM ex JOIN st USING (dim))
        |SELECT dim, count(*) AS n, max(vmin) AS vmin, max(vmax) AS vmax,
        |  CAST(sum(q) AS BIGINT) AS sum_q,
        |  max(abs(v - (vmin + q * (vmax - vmin) / 255.0))) AS max_abs_err
        |FROM qz GROUP BY dim ORDER BY dim""".stripMargin) { (s, d) =>
      val ex = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "vf")))
        .select(col("vec_id"), col("dim"), col("vf").cast("double").as("v"))
      val st = ex.groupBy("dim").agg(min("v").as("vmin"), max("v").as("vmax"))
      ex.join(broadcast(st), "dim")
        .withColumn("q",
          when(col("vmax") === col("vmin"), 0L)
            .otherwise(round((col("v") - col("vmin")) * 255.0 /
              (col("vmax") - col("vmin"))).cast("long")))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), max("vmin").as("vmin"), max("vmax").as("vmax"),
          sum("q").as("sum_q"),
          max(abs(col("v") - (col("vmin") + col("q") * (col("vmax") - col("vmin")) / 255.0)))
            .as("max_abs_err"))
        .orderBy("dim")
    },

    // E6 — per-label embedding centroids (class prototypes): the
    // nearest-class-mean baseline every embedding-space eval starts from,
    // and the labeled-data analog of m_kmeans' learned centroids. One
    // narrow posexplode (×dims on vector-sized rows) + one (label, dim)
    // partial agg — no join, no window; output is labels × dims
    // (dimension-sized at any corpus scale). avg() accumulates FP in
    // engine-specific order — values agree to ~1e-13 relative, well
    // inside the 9-significant-digit gate.
    QueryDef.sql("s_label_centroids",
      """WITH e0 AS (SELECT label, embedding,
        |         unnest(range(0, len(embedding))) AS dim FROM embeddings),
        |ex AS (SELECT label, CAST(dim AS INT) AS dim,
        |         CAST(embedding[dim+1] AS DOUBLE) AS v FROM e0)
        |SELECT label, dim, count(*) AS n, avg(v) AS c
        |FROM ex GROUP BY 1, 2 ORDER BY label, dim""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "vf")))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), avg(col("vf").cast("double")).as("c"))
        .orderBy("label", "dim")
    },

    // E9 — embedding-store quality audit: per-label count, norm
    // statistics, zero-vector count, and dimension constancy — the
    // vector-store intake check before anything indexes or trains on
    // the column (a zero vector poisons cosine; a stray dimension
    // breaks every dot product). One narrow projection (norm + length
    // per row, inside codegen) + one label-keyed partial agg. The norm
    // is the bit-identical VectorFunctions fold, so min/max agree
    // exactly; mean_norm is a same-magnitude double sum (9-digit-gate
    // safe per F15's precedent).
    QueryDef.sql("s_store_audit", {
      val nrm = VectorFunctions.normDuck("embedding")
      s"""SELECT label, count(*) AS n,
         |  sum($nrm) / count(*) AS mean_norm,
         |  min($nrm) AS min_norm, max($nrm) AS max_norm,
         |  CAST(sum(CASE WHEN $nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  CAST(min(len(embedding)) AS BIGINT) AS min_dims,
         |  CAST(max(len(embedding)) AS BIGINT) AS max_dims
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
    }) { (s, d) =>
      val nrm = VectorFunctions.norm(col("embedding"))
      Tables.embeddings(s, d)
        .select(col("label"), nrm.as("nrm"), size(col("embedding")).as("dims"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          (sum("nrm") / count(lit(1))).as("mean_norm"),
          min("nrm").as("min_norm"), max("nrm").as("max_norm"),
          sum(when(col("nrm") === 0, 1).otherwise(0)).cast("long").as("n_zero"),
          min("dims").cast("long").as("min_dims"),
          max("dims").cast("long").as("max_dims"))
        .orderBy("label")
    },

    // E8 — radius (range) search: every corpus vector within cosine ≥ 0.3
    // of each probe — the fixed-threshold sibling of E1's top-k (dedup
    // checks and recall audits want "all within r", not "best k"). Same
    // probe-bounded crossJoin as E1 — the probe set is the SMALL side by
    // contract, so this is a broadcast nested loop over a bounded set,
    // never corpus×corpus; the E2/E3 bucketed paths are the 100 TB
    // candidate generators when the probe side grows. Threshold compare
    // on the bit-identical cosine (VectorFunctions contract) can't
    // diverge cross-engine.
    QueryDef.sql("s_range_search", {
      val cos = VectorFunctions.cosineDuck("p.embedding", "c.embedding")
      s"""SELECT p.vec_id AS q, c.vec_id AS n, $cos AS cos
         |FROM (SELECT * FROM embeddings WHERE vec_id < 20) p
         |CROSS JOIN embeddings c
         |WHERE p.vec_id <> c.vec_id AND $cos >= 0.3
         |ORDER BY q, n""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q"), col("embedding").as("qv"))
        .crossJoin(emb.select(col("vec_id").as("n"), col("embedding").as("nv")))
        .filter(col("q") =!= col("n"))
        .select(col("q"), col("n"),
          VectorFunctions.cosine(col("qv"), col("nv")).as("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy("q", "n")
    },

    // E10 — product quantization audit (IVF-PQ's compression stage,
    // complementing E5's scalar int8): 64 dims → 8 subspaces × 16
    // centroids = 8 4-bit codes (64 B float vector → 4 B, 64×). Output
    // is the per-subspace codebook report — vectors, distortion (mean
    // min-L2², the assignment residual PQ search error is bounded by),
    // codes actually used. Assignment is a per-subspace argmin over
    // LITERAL centroids (m_kmeans' discipline: scoring any corpus size
    // is a narrow projection, no join); codebooks are memoized per
    // dataset like E3's quantizer. KMeans estimator ⇒ rows-only;
    // SimilaritySpec pins the properties that make PQ usable: every
    // subspace's distortion beats the 1-centroid (mean-only) baseline,
    // and assignment is deterministic across runs.
    QueryDef.rowsOnly("s_pq_quantize") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val books = pqCodebooksFor(emb, d)
      val m = books.length
      val dsub = 64 / m
      val best = (0 until m).map { si =>
        val sub = slice(col("embedding"), si * dsub + 1, dsub)
        val scored = books(si).zipWithIndex.map { case (c, i) =>
          struct(VectorFunctions.l2sqFast(sub, typedlit(c.map(_.toDouble))).as("d2"),
            lit(i).as("code"))
        }
        // least == sort_array(...)(0): the minimum under the same struct
        // (d2, code) ordering, without materializing+sorting a 16-struct
        // array per row per subspace (r16: that sort was the residual
        // CPU after the native l2sq landed).
        least(scored.toIndexedSeq: _*).as(s"b$si")
      }
      // The assignment is a pure per-row projection and the downstream
      // per-subspace sums are exact DECIMAL (order-invariant), so the
      // round-robin spread only parallelizes — results are unchanged.
      // (r16 sf10: the single-row-group scan ran the whole 11 s
      // assignment in ONE task.)
      val assigned = emb
        .repartition(s.sparkContext.defaultParallelism)
        .select(best: _*)
      val stacked = assigned.select(posexplode(
        array((0 until m).map(si => col(s"b$si")): _*)).as(Seq("subspace", "b")))
      stacked.groupBy("subspace")
        .agg(count(lit(1)).as("n_vectors"),
          (sum(expr("CAST(b.d2 AS DECIMAL(28,12))")).cast("double") / count(lit(1)))
            .as("distortion"),
          countDistinct(col("b.code")).as("codes_used"))
        .orderBy("subspace")
    },

    // E11 — Matryoshka/truncation recall audit: recall@10 of top-k under
    // the FIRST-16-dims cosine vs the full-64-dims ground truth, per
    // probe. The go/no-go audit before shipping truncated embeddings
    // (MRL-style tiered serving: store full, search truncated): on an
    // MRL-trained store recall stays high; on THIS random store it
    // collapses (~0.1) — which is exactly the report's job. Both
    // rankings run over ONE pair-build (probe-bounded as E1; at scale
    // the E2/E3 bucketed candidates feed the same comparison), and the
    // rank-filter windows compile to the native B10n top-k operator.
    // Ties break on (sim DESC, vec_id) — total order, engine-identical.
    QueryDef.sql("s_mrl_recall", {
      val cosF = VectorFunctions.cosineDuck("q.qe", "e.embedding")
      val cosT = VectorFunctions.cosineDuck("(q.qe[1:16])", "(e.embedding[1:16])")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 10 = 0),
         |pairs AS (
         |  SELECT q.qid, e.vec_id, $cosF AS c_full, $cosT AS c_tr
         |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
         |ft AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY c_full DESC, vec_id) AS rk FROM pairs),
         |tt AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY c_tr DESC, vec_id) AS rk FROM pairs),
         |hits AS (
         |  SELECT ft.qid, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM ft JOIN tt ON ft.qid = tt.qid AND ft.vec_id = tt.vec_id
         |  WHERE ft.rk <= 10 AND tt.rk <= 10 GROUP BY 1)
         |SELECT q.qid, coalesce(n_hit, 0) AS n_hit,
         |       CAST(coalesce(n_hit, 0) AS DOUBLE)/10 AS recall
         |FROM q LEFT JOIN hits ON hits.qid = q.qid ORDER BY q.qid""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val pairs = q
        .crossJoin(emb.select(col("vec_id").as("n"), col("embedding").as("nv")))
        .filter(col("qid") =!= col("n"))
        .select(col("qid"), col("n"),
          VectorFunctions.cosine(col("qe"), col("nv")).as("c_full"),
          VectorFunctions.cosine(slice(col("qe"), 1, 16), slice(col("nv"), 1, 16)).as("c_tr"))
      val wf = org.apache.spark.sql.expressions.Window.partitionBy("qid").orderBy(col("c_full").desc, col("n"))
      val wt = org.apache.spark.sql.expressions.Window.partitionBy("qid").orderBy(col("c_tr").desc, col("n"))
      val ft = pairs.withColumn("rk", row_number().over(wf))
        .filter(col("rk") <= 10).select("qid", "n")
      val tt = pairs.withColumn("rk", row_number().over(wt))
        .filter(col("rk") <= 10).select("qid", "n")
      val hits = ft.join(tt, Seq("qid", "n")).groupBy("qid").agg(count(lit(1)).as("n_hit"))
      q.select("qid").join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / 10).as("recall"))
        .orderBy("qid")
    },

    // E12 — HYBRID retrieval with reciprocal-rank fusion (the modern RAG
    // serving shape: a keyword ranking and a vector ranking fused by
    // rank, not by incomparable scores): per probe doc, (a) an idf-
    // weighted shared-token ranking (each idf term re-enters
    // DECIMAL(28,18) before the per-candidate sum — B84), (b) the exact
    // cosine ranking over the aligned embedding store, (c) RRF
    // score = Σ 1/(60+rank) over the two top-10 lists (≤2 explicitly
    // coalesced terms — fixed order), top-5 per probe with total
    // (rrf DESC, d) tie-break. All three rank filters compile to the
    // native B10n operator. At corpus scale the keyword candidates come
    // from C11's inverted index with the C12/D2x df-cap on hot tokens,
    // and the vector leg from the E2/E3 bucketed candidates — the
    // fusion tail is unchanged.
    QueryDef.sql("s_hybrid_rrf", {
      val toks = graft.functions.TextFunctions.tokensDuck("text")
      val cos = VectorFunctions.cosineDuck("p.qe", "e.embedding")
      s"""WITH tk AS (SELECT doc_id, unnest(list_distinct($toks)) AS tok FROM documents),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tk GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         |pr AS (SELECT doc_id AS q FROM documents WHERE doc_id % 25 = 0),
         |idf AS (SELECT tok,
         |         CAST(round(${graft.functions.PortableMath.lnSql("(CAST(nd AS DOUBLE)/df)")} * 1099511627776.0) AS BIGINT) AS idf_fp
         |       FROM df CROSS JOIN nn),
         |kw AS (SELECT pr.q, t2.doc_id AS d, CAST(sum(idf_fp) AS BIGINT) AS score
         |       FROM pr JOIN tk t1 ON t1.doc_id = pr.q
         |       JOIN tk t2 ON t2.tok = t1.tok AND t2.doc_id <> pr.q
         |       JOIN idf ON idf.tok = t1.tok
         |       GROUP BY 1, 2),
         |kr AS (SELECT q, d, row_number() OVER (PARTITION BY q ORDER BY score DESC, d) AS r
         |       FROM kw QUALIFY r <= 10),
         |vp AS (SELECT p.q, e.vec_id AS d, $cos AS c
         |       FROM (SELECT pr.q, em.embedding AS qe
         |             FROM pr JOIN embeddings em ON em.vec_id = pr.q) p
         |       JOIN embeddings e ON e.vec_id <> p.q),
         |vr AS (SELECT q, d, row_number() OVER (PARTITION BY q ORDER BY c DESC, d) AS r
         |       FROM vp QUALIFY r <= 10),
         |fused AS (
         |  SELECT coalesce(kr.q, vr.q) AS q, coalesce(kr.d, vr.d) AS d,
         |    coalesce(1.0/(60 + kr.r), 0) + coalesce(1.0/(60 + vr.r), 0) AS rrf
         |  FROM kr FULL JOIN vr ON kr.q = vr.q AND kr.d = vr.d)
         |SELECT q, d, rrf, row_number() OVER (PARTITION BY q ORDER BY rrf DESC, d) AS rank
         |FROM fused QUALIFY rank <= 5 ORDER BY q, rank""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      // staged once per dataset (rrfTokens: the 24M-row token fan-out
      // otherwise re-runs per query — and single-threaded on the scan's
      // ONE task without the repartition inside the stage)
      val tk = rrfTokens(s, d)
      val pr = docs.filter(col("doc_id") % 25 === 0).select(col("doc_id").as("q"))
      // BROADCAST the probe-token side: the token key has ~vocabulary
      // cardinality, so an equi-join shuffled on it is maximally skewed
      // (measured: the shuffled form re-planned under the downstream
      // top-k distribution cost 16+ s; this shape runs the whole fan-out
      // map-side). Probe tokens are probe-dim × tokens-per-doc — small by
      // the probe contract, like E1's probe side.
      val ptk = broadcast(pr
        .join(tk.select(col("doc_id").as("q"), col("tok")), Seq("q")))
      // portable ln + FIXED-POINT score (round-10 rule, perf-reworked):
      // the portable pLn runs ONCE per vocabulary entry, quantized to a
      // 2^-40 integer grid (round(idf·2^40) — deterministic in both
      // engines; a 1e-12 score quantum is far below any ranking
      // distinction this corpus can produce). The pair score is then an
      // EXACT BIGINT sum — associative and map-side combinable, so the
      // 10^8-row token fan-out collapses in-place instead of feeding a
      // per-pair double fold (the r10 collect_list fold measured 40+ s;
      // this is the r9 partial-agg shape back, now bit-portable by
      // integer arithmetic instead of a banned double→DECIMAL re-entry).
      // Headroom: idf_fp ≤ ln(nd)·2^40 ≈ 4e13; 2^53 clears ~200 shared
      // tokens per pair — and the sum is rank-only, never exits to
      // DOUBLE. The table itself is staged per dataset (rrfIdf).
      val dfIdf = broadcast(rrfIdf(s, d))
      // r17 (§2.3/§2.4): repartition the doc-token side by d BEFORE the
      // fan. The staged incidence is laid out by (doc, tok) hash, so each
      // (q, d) group's rows were scattered across map partitions and the
      // partial aggregate collapsed nothing — the exchange carried the
      // whole fan (sf1 StageProfile: 10.5 GB written, 309 s at 16 tasks =
      // the scan's file count, half the machine idle). Hash by d
      // co-locates every token of a doc, so (a) the fan runs at cluster
      // parallelism and (b) HashPartitioning(d) satisfies the (q, d)
      // clustering — the score aggregate completes with NO exchange; only
      // the tiny post-aggregate top-k redistributes by q. Rows identical
      // (exact BIGINT sums, order-free; oracle-gated).
      val kw = tk.select(col("doc_id").as("d"), col("tok"))
        .repartition(s.sparkContext.defaultParallelism, col("d"))
        .join(ptk, Seq("tok"))
        .filter(col("d") =!= col("q"))
        .join(dfIdf, "tok")
        .groupBy("q", "d").agg(sum("idf_fp").cast("long").as("score"))
      val kr = kw
        .withColumn("r", row_number().over(
          Window.partitionBy("q").orderBy(col("score").desc, col("d"))))
        .filter(col("r") <= 10).select(col("q"), col("d"), col("r").as("kr"))
      val emb = Tables.embeddings(s, d)
      val vp = pr
        .join(emb.select(col("vec_id").as("q"), col("embedding").as("qe")), "q")
        .crossJoin(emb.select(col("vec_id").as("d"), col("embedding").as("nv")))
        .filter(col("d") =!= col("q"))
        .select(col("q"), col("d"), VectorFunctions.cosine(col("qe"), col("nv")).as("c"))
      val vr = vp
        .withColumn("r", row_number().over(
          Window.partitionBy("q").orderBy(col("c").desc, col("d"))))
        .filter(col("r") <= 10).select(col("q"), col("d"), col("r").as("vr"))
      val fused = kr.join(vr, Seq("q", "d"), "full_outer")
        .select(col("q"), col("d"),
          (coalesce(lit(1.0) / (lit(60) + col("kr")), lit(0.0)) +
           coalesce(lit(1.0) / (lit(60) + col("vr")), lit(0.0))).as("rrf"))
      fused
        .withColumn("rank", row_number().over(
          Window.partitionBy("q").orderBy(col("rrf").desc, col("d"))))
        .filter(col("rank") <= 5)
        .select("q", "d", "rrf", "rank")
        .orderBy("q", "rank")
    },

    // E12 production path (r13 verdict item 4 wired): the SAME RRF fusion
    // tail over SCALE-SAFE candidate legs, in the retrieve-then-rescore
    // shape production keyword engines use. RETRIEVE: per token only the
    // `rrfPostCap` statically-best docs stay in the posting list (static
    // rank = distinct-token count DESC, doc_id — a query-independent
    // impact ordering; with an idf-sum score, the docs sharing the most
    // tokens are the plausible winners for ANY query), so keyword
    // candidates per probe are O(vocab × cap) REGARDLESS of corpus size
    // — the saturated vocabulary that capped the exact E12 at sf10
    // can't grow this leg. RESCORE: the bounded candidate set joins back
    // to the full token lists for its EXACT idf score, so truncation
    // costs recall only for docs absent from every capped posting, never
    // score fidelity on retrieved candidates. The vector leg comes from
    // E2's LSH buckets instead of the exact cross join. Candidate recall
    // changes ⇒ rows-only; top-5 overlap vs the exact E12 path is
    // spec'd in SimilaritySpec. The posting truncation is itself a
    // bounded heap per token (B10n), so nothing posting-list-sized is
    // ever sorted whole.
    QueryDef.rowsOnly("s_hybrid_rrf_capped") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      // All three expensive builds are staged per dataset: tokens (the
      // corpus fan-out), the capped postings, and the fixed-point idf —
      // the query itself is only the candidate join + rescore + fusion
      // (r14 verdict item 6: rebuilding these per run made the capped
      // path slower than exact at sf0.1, inverting its purpose).
      val tkAll = rrfTokens(s, d)
      val postings = rrfPostings(s, d)
      // Bounded probe set: modulus 25 up to rrfProbeBudget probes (every
      // scale through sf10 unchanged), then grows with the corpus so the
      // ptk broadcast below stays probes × tokens-per-doc — a constant
      // w.r.t. corpus size (r14 ADVICE: the 1-in-25 broadcast grew
      // linearly with the corpus, the one unbounded term left here).
      val nd = docs.count()
      val probeMod = math.max(25L, nd / rrfProbeBudget)
      val pr = docs.filter(col("doc_id") % probeMod === 0).select(col("doc_id").as("q"))
      val ptk = broadcast(pr.join(
        tkAll.select(col("doc_id").as("q"), col("tok")), Seq("q")))
      // The candidate fan-out (capped postings × probe tokens) has a TINY
      // input (vocab × cap rows, one parquet file) and a 100×+ fan — the
      // Dedup fanout trap: the scan is ONE task, so the whole fan ran
      // serially (r17 sf10 StageProfile: 10.2 s single-task stage, the
      // query's dominant cost). A numbered repartition by tok (exempt
      // from AQE coalescing) pins the fan at cluster parallelism.
      val fan = s.sparkContext.defaultParallelism
      val cands = postings.repartition(fan, col("tok"))
        .join(ptk.select("tok", "q"), Seq("tok"))
        .filter(col("d") =!= col("q"))
        .select("q", "d").distinct()
      val dfIdf = broadcast(rrfIdf(s, d))
      val kw = cands
        .join(tkAll.select(col("doc_id").as("d"), col("tok")), Seq("d"))
        .join(ptk, Seq("q", "tok"))
        .join(dfIdf, "tok")
        .groupBy("q", "d").agg(sum("idf_fp").cast("long").as("score"))
      val kr = kw
        .withColumn("r", row_number().over(
          Window.partitionBy("q").orderBy(col("score").desc, col("d"))))
        .filter(col("r") <= 10).select(col("q"), col("d"), col("r").as("kr"))
      val emb = Tables.embeddings(s, d)
      val probes = emb.join(pr.withColumnRenamed("q", "vec_id"), Seq("vec_id"))
      val vr = Similarity.lshTopK(probes, emb, 10, 64, 8)
        .select(col("q"), col("n").as("d"), col("rank").as("vr"))
      val fused = kr.join(vr, Seq("q", "d"), "full_outer")
        .select(col("q"), col("d"),
          (coalesce(lit(1.0) / (lit(60) + col("kr")), lit(0.0)) +
           coalesce(lit(1.0) / (lit(60) + col("vr")), lit(0.0))).as("rrf"))
      fused
        .withColumn("rank", row_number().over(
          Window.partitionBy("q").orderBy(col("rrf").desc, col("d"))))
        .filter(col("rank") <= 5)
        .select("q", "d", "rrf", "rank")
        .orderBy("q", "rank")
    }
  )

  /** Truncated-posting cap for the E12 production path: per token only
    * the cap highest-tf docs enter the keyword candidate join. */
  private val rrfPostCap = 64

  /** Probe budget for the capped path: the probe modulus grows with the
    * corpus once `doc_id % 25` would exceed ~20k probes, so the
    * probe-token broadcast is bounded by probes × tokens-per-doc at ANY
    * corpus size (tokens-per-doc is a property of the documents, not of
    * sf) instead of growing linearly with the corpus (r14 ADVICE: the
    * unbounded ptk broadcast was the one scale leak in a query whose
    * whole point is scale safety). At every measured scale through sf10
    * (500k docs) the modulus stays 25, so rows are unchanged there. */
  private val rrfProbeBudget = 20000L

  /** Staged (doc_id, tok) distinct-token fan-out shared by both E12
    * paths — built once per (dataset, JVM) and re-read as parquet (the
    * StagedTables discipline; r14 verdict item 6: the capped path was
    * paying the full tokenize + postings + idf build on every run, which
    * at sf0.1 made it SLOWER than the exact path it exists to beat). The
    * repartition spreads the single-split corpus before the fan-out. */
  private[queries] def rrfTokens(s: org.apache.spark.sql.SparkSession, d: String) =
    // r16: the distinct (doc_id, tok) incidence IS the staged doc_tok_cnt
    // grain — the rrf chain's own tokenize pass (and its separate
    // rrf_tokens staging) collapsed into the corpus-wide tokenize-once
    // artifact. Row-identical: explode(array_distinct(tokens)) per doc
    // == the distinct (doc_id, tok) projection.
    StagedTables.docTok(s, d)

  /** Staged vocabulary-sized fixed-point idf table (tok, idf_fp): the
    * portable ln runs once per vocabulary entry per dataset, not once
    * per query run. Quantization contract documented at the consumer. */
  private[queries] def rrfIdf(s: org.apache.spark.sql.SparkSession, d: String) =
    StagedTables.staged(s, "rrf_idf", d) {
      val tk = rrfTokens(s, d)
      val nn = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
      tk.groupBy("tok").agg(count(lit(1)).as("df"))
        .crossJoin(nn).select(col("tok"),
          round(graft.functions.PortableMath.pLn(col("nd").cast("double") / col("df"))
            * lit(1099511627776.0)).cast("long").as("idf_fp"))
    }

  /** Staged capped posting lists (tok, d): per token the rrfPostCap
    * statically-best docs by distinct-token count — O(vocab × cap) rows
    * regardless of corpus size. The truncation is a bounded heap per
    * token (B10n compiles the rank filter), built once per dataset. */
  private[queries] def rrfPostings(s: org.apache.spark.sql.SparkSession, d: String) =
    StagedTables.staged(s, "rrf_postings", d) {
      import org.apache.spark.sql.expressions.Window
      val tk = rrfTokens(s, d)
      val ntok = tk.groupBy("doc_id").agg(count(lit(1)).as("ntok"))
      tk.join(ntok, "doc_id")
        .withColumn("pr", row_number().over(
          Window.partitionBy("tok").orderBy(col("ntok").desc, col("doc_id"))))
        .filter(col("pr") <= rrfPostCap)
        .select(col("tok"), col("doc_id").as("d"))
    }

  private val pqCodebookCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Array[Float]]]]

  /** Memoized per-dataset PQ codebooks (train once, serve many — the E3
    * quantizer discipline; training is deterministic). */
  def pqCodebooksFor(emb: org.apache.spark.sql.DataFrame, d: String): Array[Array[Array[Float]]] =
    pqCodebookCache.getOrElseUpdate(d,
      Similarity.trainPqCodebooks(emb, "embedding", dims = 64, m = 8, ksub = 16))

  /** E4's oracle CTE chain ending in `cm(true_label, pred_label, n)` —
    * shared by s_knn_classify (which just selects it) and
    * m_confusion_metrics (which derives per-class metrics from it). */
  private[queries] lazy val knnConfusionCte: String = {
    val u = graft.operators.Curation.uniformDuck("vec_id")
    val cos = VectorFunctions.cosineDuck("p.embedding", "c.embedding")
    s"""te AS (SELECT * FROM embeddings WHERE $u < 0.1),
       |tr AS (SELECT * FROM embeddings WHERE $u >= 0.1),
       |nb AS (SELECT q, qlabel, nlabel, row_number() OVER (PARTITION BY q ORDER BY cos DESC, n) AS rank FROM (
       |  SELECT p.vec_id AS q, p.label AS qlabel, c.vec_id AS n, c.label AS nlabel, $cos AS cos
       |  FROM te p CROSS JOIN tr c) t0),
       |vote AS (SELECT q, qlabel, nlabel, count(*) AS c FROM nb WHERE rank <= 5 GROUP BY 1,2,3),
       |pred AS (SELECT q, qlabel, nlabel AS plabel,
       |   row_number() OVER (PARTITION BY q ORDER BY c DESC, nlabel) AS rn FROM vote),
       |cm AS (SELECT qlabel AS true_label, plabel AS pred_label, count(*) AS n
       |       FROM pred WHERE rn = 1 GROUP BY 1,2)""".stripMargin
  }

  private[queries] lazy val knnConfusionSql: String =
    s"""WITH $knnConfusionCte
       |SELECT true_label, pred_label, n FROM cm ORDER BY 1, 2""".stripMargin

  /** The F5 hash split shared by both E4 variants: ~10% held out as the
    * test set, the rest is the train corpus. */
  private[graft] def knnSplit(emb: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val u = graft.operators.Curation.uniform(col("vec_id"))
    (emb.filter(u < 0.1), emb.filter(u >= 0.1))
  }

  /** Majority vote over a candidate list (q, rank, n, cos) → one
    * prediction per probe (q, qlabel, plabel). Ties break count-desc then
    * label-asc — fully deterministic. Shared by the exact and ANN E4
    * paths: swap the candidate stage, keep the tail. */
  private[graft] def knnPredictions(te: org.apache.spark.sql.DataFrame,
                                    tr: org.apache.spark.sql.DataFrame,
                                    nb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labeled = nb
      .join(te.select(col("vec_id").as("q"), col("label").as("qlabel")), "q")
      .join(tr.select(col("vec_id").as("n"), col("label").as("nlabel")), "n")
    val vote = labeled.groupBy("q", "qlabel", "nlabel").agg(count(lit(1)).as("c"))
    val wv = Window.partitionBy("q").orderBy(col("c").desc, col("nlabel"))
    vote.withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1)
      .select(col("q"), col("qlabel"), col("nlabel").as("plabel"))
  }

  /** Predictions → confusion matrix (true_label, pred_label, n). */
  private[graft] def knnConfusion(pred: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    pred
      .groupBy(col("qlabel").as("true_label"), col("plabel").as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")

  private val ivfCentroidCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Float]]]

  /** Shared memoized IVF quantizer for a dataset (also used by the
    * d_embed_neardup_ivf blocking pre-pass — one index, many consumers). */
  def centroidsFor(emb: org.apache.spark.sql.DataFrame, d: String): Array[Array[Float]] =
    ivfCentroidCache.getOrElseUpdate(d,
      Similarity.trainIvfCentroids(emb, "embedding", nLists = 16))
}
