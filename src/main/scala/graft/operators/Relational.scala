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
}
