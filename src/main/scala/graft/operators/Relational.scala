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
    * Deterministic dense 0-based ids following an explicit total order —
    * what the reference semantics require (ids follow feed order) and what
    * the oracle checks — WITHOUT the single-partition global window
    * (`row_number() OVER (ORDER BY ...)` moves all data to one task).
    *
    * Shape: range-partition on the order keys, sort within partitions,
    * take the per-partition counter from `monotonically_increasing_id`
    * (pid in the high bits, in-partition position in the low 33), then add
    * per-partition offsets from a tiny count aggregate (one row per
    * partition, broadcast back). When `order` is a total order this equals
    * the global `row_number() - 1` exactly; the data-sized work is one
    * range exchange + local sort — no stage sees more than 1/n of the
    * input at any scale.
    */
  def surrogateKey(df: DataFrame, idCol: String, order: Seq[Column]): DataFrame = {
    val n = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    // monotonically_increasing_id is nondeterministic, so Catalyst never
    // reorders it across the sort below — assignment follows sorted order.
    //
    // `mids` is consumed by TWO subtrees (the offsets aggregate and the
    // id-assignment join). Left lazy, consistency would silently depend on
    // exchange reuse: if the branches planned as separate range Exchanges
    // (exchange.reuse=false, canonicalization drift), RangePartitioner's
    // per-RDD sampling could pick different boundaries per branch and the
    // broadcast offsets would disagree with the actual __mid assignment —
    // duplicated/skipped ids with no error. The eager localCheckpoint pins
    // ONE materialization that both branches provably read, truncates the
    // lineage, and — unlike persist(), which a library operator has no
    // safe point to unpersist — is freed by GC once the returned plan is
    // no longer referenced (no cached copy accumulates across repeated
    // calls in a long-lived session). On a cluster where executor loss
    // matters, a reliable `checkpoint()` is the resilient variant.
    val mids = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .localCheckpoint(true)
    // The offsets table is one row per partition (n rows total) — a
    // single-partition window over it is the POINT, not a hazard. The
    // partition key must be non-foldable (pmod(__pid, 1) ≡ 0) or
    // EliminateWindowPartitions folds it away and WindowExec logs the
    // scary-but-wrong "No Partition Defined" warning for an n-row frame.
    val offW = Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = mids.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(offW), lit(0L)))
      .select("__pid", "__off")
    mids.join(broadcast(offsets), "__pid")
      .withColumn(idCol, col("__off") + (col("__mid") - shiftleft(col("__pid"), 33)))
      .drop("__mid", "__pid", "__off")
  }

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

  /** A16 — keyed upsert (incremental refresh): rows from `updates` win on
    * key collision, unmatched `base` rows pass through, new keys insert.
    * The reference reloads every table wholesale each week
    * (airflow.py:463-521); this is the incremental form — one anti-join
    * shuffle on the key + a union, no wholesale rewrite. Schemas must
    * match (`unionByName`). At scale both sides shuffle once on the key;
    * with `base` stored bucketed on the key ([[graft.sources.Tables
    * .writeBucketed]]) only `updates` moves. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates, keys, "left_anti").unionByName(updates)

  /** A17 — SCD type-2 apply: merge a point-in-time snapshot into a
    * versioned history. Open rows (`validTo` null) compare against the
    * snapshot per key: unchanged rows pass through; changed rows close
    * at `asOf` and a new open version inserts; keys absent from the
    * snapshot close (logical delete); new keys open at `asOf`. Closed
    * history passes through untouched.
    *
    * ONE full-outer join on the key and ONE pass over it — each joined
    * row emits its 1-2 output versions through a struct-array explode
    * (no second scan, no per-case re-join). Validity bounds are
    * `yyyy-MM-dd` strings (null = open) so cross-engine compare is
    * textual. */
  def scd2Apply(history: DataFrame, snapshot: DataFrame, keys: Seq[String],
                attrs: Seq[String], asOf: String,
                validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame = {
    val nullV = lit(null).cast("string")
    val open = history.filter(col(validTo).isNull)
      .select(keys.map(col) ++ attrs.map(a => col(a).as(s"__o_$a")) :+
        col(validFrom).as("__o_vf") :+ lit(1).as("__o"): _*)
    val snap = snapshot.select(keys.map(col) ++ attrs.map(col) :+ lit(1).as("__s"): _*)
    val j = open.join(snap, keys, "full_outer")
    val changed = attrs.map(a => !(col(s"__o_$a") <=> col(a))).reduce(_ || _)
    def ver(vf: Column, vt: Column, fromSnap: Boolean) =
      struct(attrs.map(a => (if (fromSnap) col(a) else col(s"__o_$a")).as(a)) :+
        vf.as(validFrom) :+ vt.as(validTo): _*)
    val versions =
      when(col("__o").isNotNull && col("__s").isNotNull && !changed,
        array(ver(col("__o_vf"), nullV, fromSnap = false)))
      .when(col("__o").isNotNull && col("__s").isNotNull,
        array(ver(col("__o_vf"), lit(asOf), fromSnap = false),
          ver(lit(asOf), nullV, fromSnap = true)))
      .when(col("__o").isNotNull, // deleted: close the open version
        array(ver(col("__o_vf"), lit(asOf), fromSnap = false)))
      .otherwise( // brand-new key
        array(ver(lit(asOf), nullV, fromSnap = true)))
    val applied = j.select(keys.map(col) :+ explode(versions).as("__r"): _*)
      .select(keys.map(col) ++ attrs.map(a => col(s"__r.$a")) :+
        col(s"__r.$validFrom") :+ col(s"__r.$validTo"): _*)
    applied.unionByName(
      history.filter(col(validTo).isNotNull)
        .select((keys ++ attrs :+ validFrom :+ validTo).map(col): _*))
  }

  /** B10 scale path — top-k per group in TWO phases when the group count
    * is small (each group's window otherwise becomes one straggler task
    * at scale): phase 1 takes a per-(group, salt) top-k — `salts`-way
    * parallel per group — leaving ≤ salts·k rows per group; phase 2 runs
    * the exact window over that bounded survivor set. Top-k is mergeable,
    * so the result is IDENTICAL to the single-window form (the driver
    * oracle for q_topk_per_group_2phase is the plain-window SQL).
    * `order` must be a total order (include a tiebreak key). */
  def topKPerGroupTwoPhase(df: DataFrame, groupCol: String, k: Int,
                           order: Seq[Column], salts: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)))
    val w1 = Window.partitionBy(col(groupCol), col("__salt")).orderBy(order: _*)
    val survivors = salted.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k).drop("__rn", "__salt")
    val w2 = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    survivors.withColumn("rnk", row_number().over(w2)).filter(col("rnk") <= k)
  }

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
