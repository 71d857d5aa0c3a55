package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (SURVEY §2 A21) — the
  * materialized-view refresh pattern.
  *
  * Reference analog: the warehouse tables the reference rebuilds per DAG
  * run (airflow.py:263-460 drop/recreate + full reload). A full rebuild
  * re-reads ALL history every run; at 100 TB that is the difference
  * between an hourly refresh costing one hour of scan and costing one
  * delta's worth. For ADDITIVE aggregates (count / sum — and anything
  * derived from them downstream: avg = sum/count, rates, ratios) the
  * stored aggregate IS a mergeable partial state: aggregate ONLY the new
  * rows, then merge two agg-sized relations.
  *
  * Shape: `delta → partial agg (the only data-scale stage) → union with
  * the stored agg → re-agg`. The merge stages are vocabulary-sized (one
  * row per live key on each side). Min/max are also mergeable (monotone);
  * DISTINCT counts are NOT — maintain those incrementally with the HLL
  * sketch ladder (A13) whose registers merge, never with exact counts.
  */
object Incremental {

  /** Merge a stored additive aggregate with a delta's aggregate over the
    * same schema: `keys ++ addCols` on both sides, summing each addCol.
    * Keys present on either side survive (a key new in the delta appears;
    * an untouched key passes through unchanged). */
  def mergeAdditive(storedAgg: DataFrame, deltaAgg: DataFrame,
                    keys: Seq[String], addCols: Seq[String]): DataFrame = {
    val cols = keys ++ addCols
    storedAgg.select(cols.map(col): _*)
      .unionByName(deltaAgg.select(cols.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(addCols.head -> "sum", addCols.tail.map(_ -> "sum"): _*)
      .select(keys.map(col) ++
        addCols.map(c => col(s"sum($c)").as(c)): _*)
  }

  /** A24 — incremental JOIN-view maintenance (insert-only deltas): the
    * delta of an inner join is the three delta terms
    * `ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB`, so the refreshed view is the stored view
    * unioned with them — the standard IVM identity (set semantics need
    * no retraction handling for inserts; deletes/updates ride the A22
    * CDC diff in front of this).
    *
    * Scale shape: the stored view passes through UNTOUCHED (at 100 TB it
    * is parquet that is appended to, never re-read for the refresh); the
    * three delta terms are each bounded by a delta's size on at least
    * one side, so every term's join broadcasts its delta side — the
    * refresh costs O(Δ), not O(|A⋈B|). A full rebuild is the oracle, so
    * the hash gate proves refresh ≡ rebuild. */
  def refreshJoinView(oldView: DataFrame,
                      oldA: DataFrame, deltaA: DataFrame,
                      oldB: DataFrame, deltaB: DataFrame,
                      keys: Seq[String]): DataFrame = {
    val dAB = broadcast(deltaA).join(oldB, keys)
    val AdB = oldA.join(broadcast(deltaB), keys)
    val dAdB = broadcast(deltaA).join(broadcast(deltaB), keys)
    oldView.unionByName(dAB).unionByName(AdB).unionByName(dAdB)
  }
}
