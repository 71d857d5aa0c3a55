package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators (SURVEY §2 group H) — the selection steps a
  * training-data pipeline runs between "know your data" (A18 profiling)
  * and "dedup/clean" (C/D): balanced sampling, weighted source mixing,
  * and benchmark decontamination. The reference's counterpart is its
  * ad-hoc `random`-module sampling for data-quality checks (airflow.py
  * `import random  # data quality testing`); none of that reproduces
  * across engines or retries, so — like A14 — every selector here is
  * HASH-deterministic: the same row set falls out on any cluster, any
  * partitioning, any re-run.
  */
object Curation {

  /** Uniform [0,1) per key: top-60-bit md5 fraction. Exact parity with the
    * DuckDB fragment [[uniformDuck]] — integer hash, one double division. */
  def uniform(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("double")
      / lit(1.152921504606846976e18))

  def uniformDuck(key: String): String =
    s"CAST(CAST('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) / 1152921504606846976.0"

  /** H1 — fixed-size per-stratum sample: the `n` rows of each group that
    * sort first by md5(key). Balanced classes for eval sets / per-source
    * spot checks. Scale shape: rank-limit windows compile to
    * WindowGroupLimit in Spark 4 — each partition keeps a running top-n,
    * nothing materializes a whole stratum (PlanSpec pins this for B10;
    * same operator class). */
  def stratifiedSample(df: DataFrame, groupCol: String, keyCol: String, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** H2 — weighted corpus mixing: keep each row with its group's target
    * rate (LLM pre-training data mixing — Wikipedia at 1.0, CommonCrawl at
    * 0.1, …). Pure narrow filter: no shuffle, no state, embarrassingly
    * parallel at 100 TB, and the kept set is a superset-stable function of
    * the key (lowering a rate only removes rows — reproducible ablations). */
  def weightedMix(df: DataFrame, groupCol: String, keyCol: String,
                  rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1], got $r"))
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(uniform(col(keyCol)) < rate)
  }

  /** H4 — sequence packing (chunked-concat): the layout step between a
    * curated corpus and a trainer — documents are concatenated in a
    * deterministic hash order and the token stream is chunked into
    * fixed-`budget` training sequences; each document is labeled with the
    * sequence its first token lands in and its offset in the stream.
    * Hash-bucketing first (`nBuckets`) bounds every window partition at
    * ~1/nBuckets of the corpus — the cumsum never runs over one global
    * partition — and each bucket packs independently (embarrassingly
    * parallel; nBuckets scales with the cluster). One scan, one window.
    * `nTok` is any token-count column expression (C1's `tokenCount`, or a
    * precomputed column). */
  def packSequences(df: DataFrame, keyCol: String, nTok: Column,
                    budget: Int, nBuckets: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(nBuckets > 0, s"bucket count must be positive, got $nBuckets")
    val h = md5(col(keyCol).cast("string"))
    val bucket = (conv(substring(h, 16, 4), 16, 10).cast("long") % nBuckets).as("bucket")
    val w = Window.partitionBy("bucket").orderBy(col("__h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), nTok.cast("long").as("n_tokens"), h.as("__h"), bucket)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col("bucket"),
        floor((col("__cum") - col("n_tokens")) / budget).cast("long").as("pack"),
        col(keyCol),
        (col("__cum") - col("n_tokens")).as("tok_offset"),
        col("n_tokens"))
  }

  /** H3 — n-gram decontamination: flag training documents that share any
    * word n-gram with an eval/benchmark set (the train-test-overlap check
    * every LLM data pipeline runs before training; n=8..13 in practice —
    * the operator takes any n). Reuses the dedup family's projection-only
    * shingle path: both corpora hash to (doc, gid) pairs, the (small,
    * fixed-size) benchmark side broadcasts, and the report is one
    * aggregation — no text ever moves.
    * Output: (doc, n_shared_grams, n_eval_docs) per contaminated doc. */
  def decontaminate(train: DataFrame, eval_ : DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame =
    decontaminateSets(Dedup.hashedDocSets(train, idCol, textCol, n),
      Dedup.hashedDocSets(eval_, idCol, textCol, n))

  /** [[decontaminate]] from PRE-SHINGLED (doc, gs) frames — the entry a
    * caller holding a staged doc-set table uses (r16: d_decontaminate
    * re-shingled the whole corpus that raw_docsets3 already holds;
    * filtering the staged sets is row-identical to shingling the
    * filtered corpus because hashedDocSets is per-row). */
  def decontaminateSets(trainSets: DataFrame, evalSets: DataFrame): DataFrame = {
    val tr = Dedup.docIds(trainSets)
    val ev = Dedup.docIds(evalSets).withColumnRenamed("doc", "__ev")
    tr.join(broadcast(ev), "gid")
      .groupBy("doc")
      .agg(count_distinct(col("gid")).as("n_shared_grams"),
        count_distinct(col("__ev")).as("n_eval_docs"))
  }
}
