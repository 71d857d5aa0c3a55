package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators re-expressing the reference's pandas
  * transforms (SURVEY §2 rows A1-A12, B4, B7, B8) Spark-first.
  *
  * Every function is DataFrame→DataFrame so Catalyst sees through the whole
  * chain (pushdown, pruning, join reorder all still apply downstream).
  */
object Relational {

  /** A1 — surrogate key (reference: `range(0, len(df))`, airflow.py:161).
    *
    * Deterministic variant: `row_number()` over an explicit total order.
    * This is what the reference semantics require (ids follow feed order)
    * and what the oracle checks. Costs a global sort — fine into the TB
    * range with range-partitioned sort, but see [[surrogateKeyUnordered]]
    * for the 100 TB path when ids only need uniqueness, not order.
    */
  def surrogateKey(df: DataFrame, idCol: String, order: Seq[Column]): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(order: _*)).cast("long") - 1)

  /** A1 scale path — unique ids without a total sort: partition id in the
    * high bits, per-partition counter in the low bits. One narrow pass,
    * no shuffle; ids are unique but not dense/ordered. */
  def surrogateKeyUnordered(df: DataFrame, idCol: String): DataFrame =
    df.withColumn(idCol, monotonically_increasing_id())

  /** A3 — row repetition (reference: `np.repeat(values, 2)`,
    * airflow.py:170). `explode` of a literal array: narrow, codegen'd,
    * no shuffle at any scale. */
  def repeatRows(df: DataFrame, times: Int): DataFrame =
    df.withColumn("__rep", explode(array((0 until times).map(lit): _*))).drop("__rep")

  /** A4 — dedup keep-first (reference: `drop_duplicates('permit')` after a
    * sort, airflow.py:176,201). pandas keep='first' made deterministic:
    * explicit tiebreak order, window row_number()=1. Shuffles once on the
    * key — at 100 TB this is a single hash-partition pass, and AQE splits
    * skewed keys. */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** A8 — per-group count attached to every row then deduped (reference:
    * `groupby('applicant').transform('count')`, airflow.py:251-256).
    * Window count + keep-first — exactly one shuffle on the group key. */
  def groupTransformCount(df: DataFrame, key: String, countCol: String,
                          order: Seq[Column]): DataFrame = {
    val counted = df.withColumn(countCol, count(lit(1)).over(Window.partitionBy(col(key))))
    dedupKeepFirst(counted, Seq(key), order)
  }

  /** B7 — pivot with a *known* value set (reference renders per-category
    * charts). Passing the values avoids the extra distinct-collect job
    * Spark otherwise runs before pivoting — at 100 TB that job is a full
    * scan you don't want. */
  def pivotCounts(df: DataFrame, groupCol: Column, groupAlias: String,
                  pivotCol: String, values: Seq[String]): DataFrame =
    df.groupBy(groupCol.as(groupAlias)).pivot(pivotCol, values).count()

  /** A10 — global top-k by aggregate (reference flagship query1,
    * airflow.py:655-662). `orderBy.limit(k)` compiles to TakeOrderedAndProject:
    * per-partition heap + single-reduce merge — no global sort at any scale. */
  def topKByAgg(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** B13 — range (interval) join: pairs every point row with the interval
    * rows of the same key whose [start, end] contains it (inclusive).
    *
    * The naive formulation is an equi-join on the key with a range
    * predicate — a per-key cross product that AQE can't save. Binning
    * makes it an equi-join on (key, time-bin): intervals explode to the
    * bins they overlap, points join only their own bin, so each
    * (point, interval) pair meets exactly once and the blowup is bounded
    * by interval-span / bin width. Pick binMillis near the typical
    * interval length.
    *
    * Column names must be disjoint between the two sides (pre-rename). */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame, key: String,
                      tsCol: String, startCol: String, endCol: String,
                      binMillis: Long): DataFrame = {
    def bin(c: Column): Column = floor(unix_millis(c) / lit(binMillis.toDouble)).cast("long")
    val pb = points.withColumn("__bin", bin(col(tsCol)))
    val ib = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    pb.join(ib, Seq(key, "__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }

  /** B12 — as-of join: for every left row, the payload of the LATEST right
    * row with `right.ts <= left.ts` in the same key (ties at equal ts take
    * the right row — DuckDB ASOF semantics).
    *
    * Spark has no native as-of join; the naive formulation (range join +
    * keep-latest) degenerates to a per-key cross product. This one is a
    * union + last-non-null window carry: ONE shuffle on the key and one
    * per-partition sort, cost O(n log n) regardless of how many right rows
    * precede each left row — the shape that survives 100 TB.
    *
    * `right` must be unique per (key, ts) — dedup first (the right row
    * chosen among same-ts duplicates would otherwise be order-dependent).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payloadCols: Seq[String]): DataFrame = {
    val carryCols = left.columns.filterNot(c => c == key || c == ts)
    val lU = left.withColumn("__side", lit(1))
      .select(Seq(col(key), col(ts), col("__side")) ++
        carryCols.map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val rU = right.withColumn("__side", lit(0))
      .select(Seq(col(key), col(ts), col("__side")) ++
        carryCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(lU.unionByName(rU)) { case (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(Seq(col(key), col(ts)) ++
        carryCols.map(col) ++
        payloadCols.map(c => col(s"__c_$c").as(c)): _*)
  }
}
