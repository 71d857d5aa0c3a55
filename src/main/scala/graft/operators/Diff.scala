package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data capture (SURVEY §2 A22).
  *
  * Reference analog: the reference rebuilds its warehouse wholesale every
  * run (airflow.py:463-521 drop/recreate + full reload), so "what changed
  * since last week" is unanswerable there. This operator compares two
  * keyed snapshots and emits the change set — the artifact an incremental
  * loader (A16 upsert, A21 incremental agg) consumes, and the audit trail
  * a warehouse migration diffs against.
  *
  * Shape: ONE full-outer join on the key, null-safe value compare, then a
  * filter to changed keys only. Both sides shuffle once on the key (zero
  * exchanges when both snapshots are stored bucketed on it —
  * [[graft.sources.Tables.writeBucketed]]); the output is CHANGE-sized,
  * not snapshot-sized, so downstream stages never touch unchanged rows.
  * At 100 TB this is the difference between diffing two lakes and
  * shipping a delta.
  */
object Diff {

  /** One row per differing key: `op` ∈ insert / update / delete, with the
    * old and new value of every compared column (null on the absent
    * side). Unchanged keys are dropped. `keys ++ compareCols` must exist
    * in both inputs; comparison is null-safe (`<=>`), so null→value and
    * value→null transitions count as updates. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        lit(1).as("__o"): _*)
    val n = newSnap.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        lit(1).as("__n"): _*)
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    val op = when(col("__o").isNull, lit("insert"))
      .when(col("__n").isNull, lit("delete"))
      .otherwise(lit("update")).as("op")
    o.join(n, keys, "full_outer")
      .filter(col("__o").isNull || col("__n").isNull || changed)
      .select(keys.map(col) ++ Seq(op) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
