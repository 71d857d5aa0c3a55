package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BloomExprs

/** Pre-shuffle join pruning (SURVEY §2 B33).
  *
  * Reference analog: the warehouse queries join the fact schedule against
  * filtered dimension slices (airflow.py:655-662 joins facilities to the
  * top-permit subset); at reference scale pandas just materializes the
  * intersection. At 100 TB the same join's cost is dominated by shuffling
  * fact rows that match nothing. This operator builds a Bloom filter of
  * the (already filtered) key side — `DataFrameStatFunctions.bloomFilter`
  * aggregates it distributively, only the merged ~hundreds-of-KB sketch
  * lands on the driver, same footprint as any broadcast — and applies it
  * as a scan-side filter via the codegen'd
  * [[graft.functions.BloomContainsExpr]] BEFORE the exact semi-join.
  *
  * Net effect on the plan: the fact-side Exchange carries
  * `matches + fpp·non-matches` rows instead of ALL rows; with fpp=1% the
  * shuffle shrinks to roughly the join's output size. The trailing exact
  * semi-join removes the false positives, so the result is IDENTICAL to
  * the plain semi-join — which is exactly how q_bloom_prune can share the
  * plain join's DuckDB oracle while exercising the pruned plan.
  */
object Prune {

  /** Bloom-filtered left-semi join: `fact ⋉ keys` with the fact scan
    * pre-filtered by a Bloom of `keys[keyCol]`.
    *
    * `expectedKeys` sizes the sketch (overestimate freely: bits are
    * ~10/key at 1% fpp, so even 10⁹ keys is ~1.2 GB — at that point raise
    * fpp or fall back to the plain join; a pruning sketch stops paying
    * for itself when the key side stops being selective).
    *
    * Long keys probe directly; any other type is hashed with xxhash64 on
    * BOTH sides (same engine function, same bits), so the filter admits
    * exactly the keys' hash set either way. */
  def bloomPrunedSemiJoin(fact: DataFrame, factKey: String, keys: DataFrame,
                          keyCol: String, expectedKeys: Long,
                          fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0, s"expectedKeys must be positive, got $expectedKeys")
    // fresh alias so the join resolves even when factKey == keyCol
    val dedupKeys = keys.select(col(keyCol).as("__pk"))
      .filter(col("__pk").isNotNull).distinct()
    val isLong = fact.schema(factKey).dataType ==
      org.apache.spark.sql.types.LongType
    def probeCol(c: Column): Column = if (isLong) c else xxhash64(c)
    val bf = dedupKeys
      .select(probeCol(col("__pk")).as("__k"))
      .stat.bloomFilter("__k", expectedKeys, fpp)
    val probe = call_function("graft_bloom_contains",
      probeCol(fact(factKey)), lit(BloomExprs.serialize(bf)))
    fact.filter(probe)
      .join(dedupKeys, fact(factKey) === col("__pk"), "left_semi")
  }
}
