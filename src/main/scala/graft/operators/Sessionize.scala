package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (SURVEY §2 B6; streaming version in
  * graft.streaming.Events).
  *
  * Classic two-window formulation: flag rows whose gap from the previous
  * event exceeds the threshold, then a running sum of flags is the session
  * ordinal. Both windows share the same partitioning+ordering, so Spark
  * plans ONE shuffle + one sort for the pair — at 100 TB that is the
  * minimum possible for this semantics (state must be co-located per key).
  */
object Sessionize {

  /** Adds a `session_id` column (1-based per key, ordered by time). */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            gapMillis: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val ms: Column = unix_millis(col(tsCol))
    val prev = lag(ms, 1).over(w)
    val isNew = when(prev.isNull || (ms - prev) > gapMillis, 1).otherwise(0)
    df.withColumn("__is_new", isNew)
      .withColumn("session_id",
        sum(col("__is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__is_new")
  }
}
