package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §5). AQE's skew-join split handles sort-merge
  * skew at runtime; salting is the explicit fallback for the cases AQE
  * can't re-plan — a hot key whose rows must still co-locate (e.g. a
  * billion-row null/default key joining a dimension), or shuffled-hash
  * paths. The transformation is semantics-preserving: every salted big row
  * meets every copy of its small-side match exactly once.
  */
object Skew {

  /** Join `big` to `small` on `key`, spreading each hot key over `salts`
    * shuffle partitions: the big side gets a deterministic per-row salt
    * (content hash — no RNG, reruns partition identically), the small side
    * is replicated once per salt value. Small-side growth ×salts is the
    * price; choose salts ≈ (hot-key rows / target partition rows). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)).cast("int"))
    val expandedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(expandedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: aggregate per
    * (key, salt) first, then merge the partials per key. For algebraic
    * aggregates Spark's map-side combine already does this implicitly;
    * the explicit form exists for holistic aggregates (e.g. exact
    * distinct counts via sets) where partial aggregation can't kick in. */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(key)
      // distinct values land in exactly one salt bucket (salt = f(value)),
      // so per-key partials are disjoint and summing them is exact.
      .agg(sum("__partial").as("n_distinct"))
}
