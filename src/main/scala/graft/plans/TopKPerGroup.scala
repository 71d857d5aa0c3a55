package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, BoundReference, DenseRank, EqualTo,
  Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression,
  Rank, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

/** SURVEY §2 B10n — top-k-per-group as a FIRST-CLASS operator: logical
  * node + optimizer rule + planner strategy + physical operator, the
  * (c)-path of the engine's custom-operator preference ladder
  * (SparkSessionExtensions: `injectOptimizerRule` + `injectPlannerStrategy`).
  *
  * WHY: the declarative form — `row_number() OVER (PARTITION BY p ORDER BY
  * o) <= k` — plans as a FULL shuffle of every row followed by a per-group
  * SORT of every row, then throws away all but k per group. The mergeable
  * structure of top-k (the same structure partial aggregation exploits)
  * lives nowhere in that plan. This operator restores it:
  *
  *   TopKPerGroupExec(partial)   — per input partition, one bounded heap
  *                                 per group key: at most k rows per
  *                                 (partition, group) survive to the wire
  *   → ShuffleExchange(p)        — inserted by EnsureRequirements from the
  *                                 final's ClusteredDistribution, exactly
  *                                 like partial→final aggregation
  *   TopKPerGroupExec(final)     — re-heap the ≤ k·numInputPartitions
  *                                 survivors per group, emit in rank order
  *                                 with the rank column appended
  *
  * At 100 TB the shuffle carries k·partitions rows per group instead of
  * the whole fact table — the dominant cost of the window form. The
  * partial caps its hash map at [[TopKPerGroupExec.maxPartialGroups]]
  * group keys; overflow rows PASS THROUGH unpruned (correct by
  * construction — partial pruning is an optimization, never required),
  * so high-cardinality grouping degrades to the shuffle the window plan
  * would have done anyway rather than OOMing the map side.
  *
  * The REWRITE is automatic: [[TopKRewriteRule]] matches
  * `Filter(rn <= k | rn < k | rn = 1, Window(single row_number))` and
  * swaps in the native node — the DataFrame/SQL surface stays fully
  * declarative and every existing rank-filter query inherits the plan.
  * Guard: only fires when the window's ORDER BY is over the window's
  * child output (always true for row_number specs Spark accepts) and the
  * window computes EXACTLY one row_number — anything else keeps the
  * stock plan. Tie semantics: like row_number itself, selection among
  * rows EQUAL under the full sort order is arbitrary; every registered
  * query uses a total (tie-broken) order, which both plans then resolve
  * identically — the 200+-oracle hash gate runs against the rewritten
  * plans, which is the end-to-end proof of the rewrite's semantics.
  */
/** Which rank function the filtered window computed — decides both the
  * heap's retention rule and the emitted rank numbering:
  *  - [[RankMode.RowNum]]: exactly k rows per group, ranks 1..k
  *    (selection among full-order ties is arbitrary, like row_number);
  *  - [[RankMode.Ranked]]: every row with < k strictly-better rows;
  *    competition (gapped) numbering, boundary tie classes kept whole;
  *  - [[RankMode.Dense]]: every row of the k best distinct order-value
  *    CLASSES; gapless numbering — the heap advances per class, not per
  *    row, so a hot class retains all its members. */
sealed trait RankMode
object RankMode {
  case object RowNum extends RankMode
  case object Ranked extends RankMode
  case object Dense extends RankMode
}

case class TopKPerGroupNode(
    part: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    mode: RankMode,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Rewrites `Filter(rank-predicate, Window(row_number | rank | dense_rank))`
  * to the native node. Injected via `SparkSessionExtensions.injectOptimizerRule`,
  * so it runs in the user-rules batch after standard optimization.
  *
  * `rank()` filters ([[RankMode.Ranked]]) keep every row TIED at the heap
  * boundary — rank ≤ k retains all rows with fewer than k strictly-better
  * rows, with competition (gapped) rank numbers, matching stock `rank()`.
  * `dense_rank()` filters ([[RankMode.Dense]]) retain the k best distinct
  * order-value classes WHOLE, numbered gaplessly — the heap's advance rule
  * moves per class instead of per row.
  *
  * An EMPTY partitionSpec (`row_number() OVER (ORDER BY x) <= k`, the
  * global-top-k shape) is SUPPORTED, not skipped: the final exec demands
  * AllTuples, so the plan becomes partial per-partition heaps → single-
  * partition exchange of ≤ k·partitions rows → final heap — strictly
  * better than the stock plan's global sort of every row. */
case class TopKRewriteRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      (rankedAlias(w), boundFromCond(cond)) match {
        case (Some((alias, mode)), Some((rankRef, k)))
            if alias.exprId == rankRef.exprId && k >= 1 &&
              w.partitionSpec.forall(_.references.subsetOf(w.child.outputSet)) &&
              w.orderSpec.forall(_.references.subsetOf(w.child.outputSet)) =>
          TopKPerGroupNode(w.partitionSpec, w.orderSpec, k,
            alias.toAttribute, mode, w.child)
        case _ => f
      }
  }

  /** The window's single `row_number()`, `rank()` or `dense_rank()`
    * alias, if that is ALL it computes, with its [[RankMode]]. */
  private def rankedAlias(w: Window): Option[(Alias, RankMode)] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some((a, RankMode.RowNum))
      case Seq(a @ Alias(WindowExpression(_: DenseRank, _), _)) => Some((a, RankMode.Dense))
      case Seq(a @ Alias(WindowExpression(_: Rank, _), _)) => Some((a, RankMode.Ranked))
      case _ => None
    }

  /** `rn <= k` / `rn < k+1` / `rn = 1` with a literal bound. */
  private def boundFromCond(cond: Expression): Option[(AttributeReference, Int)] =
    cond match {
      case LessThanOrEqual(r: AttributeReference, IntegerLiteral(k)) => Some((r, k))
      case LessThan(r: AttributeReference, IntegerLiteral(k)) => Some((r, k - 1))
      case EqualTo(r: AttributeReference, IntegerLiteral(1)) => Some((r, 1))
      case _ => None
    }
}

/** Plans the logical node as partial → (exchange via EnsureRequirements)
  * → final. Injected via `injectPlannerStrategy`. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(part, order, k, rankAttr, mode, child) =>
      val pre = TopKPerGroupExec(part, order, k, rankAttr, mode,
        partial = true, planLater(child))
      TopKPerGroupExec(part, order, k, rankAttr, mode, partial = false, pre) :: Nil
    case _ => Nil
  }
}

object TopKPerGroupExec {
  /** Partial-side group cap: beyond this many distinct keys in one input
    * partition, further new-key rows pass through unpruned (correctness
    * is unaffected; only map-side reduction is lost) — the same pressure
    * valve partial aggregation gets from its fixed hash map. */
  val maxPartialGroups = 1 << 17

  import org.apache.spark.sql.catalyst.expressions.{
    ArrayTransform, CreateNamedStruct, GetStructField, If, IsNull,
    LambdaFunction, Literal, NamedLambdaVariable}
  import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
  import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StructType}

  private def containsFloats(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case st: StructType         => st.fields.exists(f => containsFloats(f.dataType))
    case ArrayType(et, _)       => containsFloats(et)
    case _                      => false
  }

  /** -0.0→0.0 / NaN-bit canonicalization for class-key projections,
    * recursing into structs and arrays — the same closure the optimizer's
    * (private[sql]) NormalizeFloatingNumbers.normalize computes. Types
    * with no float/double anywhere pass through untouched. */
  def normalizeFloats(e: Expression): Expression = e.dataType match {
    case _ if !containsFloats(e.dataType) => e
    case FloatType | DoubleType => NormalizeNaNAndZero(e)
    case st: StructType =>
      val rebuilt = CreateNamedStruct(st.fields.toIndexedSeq.zipWithIndex.flatMap {
        case (f, i) =>
          Seq(Literal(f.name), normalizeFloats(GetStructField(e, i, Some(f.name))))
      })
      if (e.nullable) If(IsNull(e), Literal(null, rebuilt.dataType), rebuilt)
      else rebuilt
    case ArrayType(et, cn) =>
      val lv = NamedLambdaVariable("graft_norm_arg", et, cn)
      ArrayTransform(e, LambdaFunction(normalizeFloats(lv), Seq(lv)))
  }
}

case class TopKPerGroupExec(
    part: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    mode: RankMode,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // empty partitionSpec = global top-k: everything to one partition
    // (legal only because the partial already capped each input partition
    // at ~k rows — the TakeOrderedAndProject shape, not a global sort)
    else if (part.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(part) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    if (mode == RankMode.Dense) doExecuteDense() else doExecuteRowHeap()

  /** dense_rank() <= k: the heap advances per distinct order-value CLASS,
    * not per row — each group retains the k best classes whole (a class's
    * members are unbounded by k, exactly like the stock window's output).
    * Per group: a max-heap of ≤ k class keys (the projected order-by
    * values) + a class→members map; a (k+1)-th strictly-better class
    * evicts the worst class with all its members. The final drains
    * classes best-first and numbers them 1..k gaplessly. */
  private def doExecuteDense(): RDD[InternalRow] = {
    val partExprs = part
    val orderExprs = order
    val childOutput = child.output
    val limit = k
    val isPartial = partial
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      // Class identity is UnsafeRow BINARY equality (HashMap keys / heap
      // membership) while retention compares with classOrd SQL ordering.
      // Stock windows get NormalizeFloatingNumbers applied by the
      // optimizer; this exec builds its own projection, so normalize
      // float/double order keys here too — otherwise -0.0 vs 0.0 (or two
      // NaN bit patterns), which the SQL ordering treats as one tie
      // class, would hash as two distinct classes and split a dense_rank
      // class into two ranks. Recurses into structs/arrays (mirroring the
      // optimizer's NormalizeFloatingNumbers.normalize, which is
      // private[sql]): an ORDER BY on a composite key with NESTED floats
      // needs the same treatment — a top-level-only match left nested
      // -0.0/NaN bit patterns splitting one tie class into two.
      val normalizedOrderKeys =
        orderExprs.map(_.child).map(TopKPerGroupExec.normalizeFloats)
      val classProj = UnsafeProjection.create(normalizedOrderKeys, childOutput)
      val boundOrder = orderExprs.zipWithIndex.map { case (so, i) =>
        SortOrder(BoundReference(i, so.child.dataType, so.child.nullable),
          so.direction, so.nullOrdering, Seq.empty)
      }
      val classOrd = GenerateOrdering.generate(boundOrder, Nil)
      val revClassOrd = classOrd.reverse
      final class Group {
        val classes = new java.util.PriorityQueue[UnsafeRow](limit + 1, revClassOrd)
        val members = new java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]]()
        def add(row: InternalRow, ckey: UnsafeRow): Unit = {
          val lst = members.get(ckey)
          if (lst != null) lst.add(row.copy())
          else if (classes.size() < limit) {
            val ck = ckey.copy()
            classes.add(ck)
            val l = new java.util.ArrayList[InternalRow](); l.add(row.copy())
            members.put(ck, l)
          } else if (classOrd.compare(ckey, classes.peek()) < 0) {
            members.remove(classes.poll()) // worst class out, whole
            val ck = ckey.copy()
            classes.add(ck)
            val l = new java.util.ArrayList[InternalRow](); l.add(row.copy())
            members.put(ck, l)
          } // else: not among the k best classes — drop
        }
      }
      val groups = new java.util.HashMap[UnsafeRow, Group]()
      val passThrough = new java.util.ArrayList[InternalRow]()
      while (iter.hasNext) {
        val row = iter.next()
        val gkey = keyProj(row)
        var g = groups.get(gkey)
        if (g == null) {
          if (isPartial && groups.size() >= TopKPerGroupExec.maxPartialGroups) {
            passThrough.add(row.copy()) // pressure valve: forward unpruned
            g = null
          } else {
            g = new Group
            groups.put(gkey.copy(), g)
          }
        }
        if (g != null) g.add(row, classProj(row))
      }
      if (isPartial) {
        val out = new java.util.ArrayList[InternalRow](passThrough.size())
        groups.values().forEach(g =>
          g.members.values().forEach(l => out.addAll(l)))
        out.addAll(passThrough)
        import scala.jdk.CollectionConverters._
        out.iterator().asScala
      } else {
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        groups.values().forEach { g =>
          val keys = new Array[UnsafeRow](g.classes.size())
          var i = keys.length - 1
          while (i >= 0) { keys(i) = g.classes.poll(); i -= 1 } // worst-first drain
          var ci = 0
          while (ci < keys.length) {
            rankRow.update(0, ci + 1) // gapless: one rank per class
            g.members.get(keys(ci)).forEach { r =>
              out += proj(joined(r, rankRow)).copy()
            }
            ci += 1
          }
        }
        out.iterator
      }
    }
  }

  /** row_number() / rank() <= k: one bounded row heap per group. */
  private def doExecuteRowHeap(): RDD[InternalRow] = {
    val partExprs = part
    val orderExprs = order
    val childOutput = child.output
    val limit = k
    val isPartial = partial
    val keepTies = mode == RankMode.Ranked
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord = GenerateOrdering.generate(orderExprs, childOutput)
      // max-heap on the sort order: peek is the WORST retained row, so a
      // better incoming row evicts it once the heap holds k. With
      // keepTies (rank() semantics) the heap retains every row whose
      // strictly-better count is < k: boundary ties are admitted past the
      // cap, and the whole worst tie class is evicted only once >= k
      // strictly-better rows remain without it.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val passThrough = new java.util.ArrayList[InternalRow]()
      val revOrd = ord.reverse
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (isPartial && heaps.size() >= TopKPerGroupExec.maxPartialGroups) {
            passThrough.add(row.copy()) // pressure valve: forward unpruned
          } else {
            heap = new java.util.PriorityQueue[InternalRow](limit + 1, revOrd)
            heaps.put(key.copy(), heap)
            heap.add(row.copy())
          }
        } else if (heap.size() < limit) {
          heap.add(row.copy())
        } else {
          val c = ord.compare(row, heap.peek())
          if (c < 0) {
            heap.add(row.copy())
            if (!keepTies) heap.poll()
            else {
              // evict worst tie classes whose strictly-better count >= k
              var continue = heap.size() > limit
              while (continue) {
                val cls = new java.util.ArrayList[InternalRow]()
                val w0 = heap.poll()
                cls.add(w0)
                while (heap.peek() != null && ord.compare(heap.peek(), w0) == 0)
                  cls.add(heap.poll())
                if (heap.size() >= limit) continue = heap.size() > limit
                else { heap.addAll(cls); continue = false } // class stays
              }
            }
          } else if (c == 0 && keepTies) {
            heap.add(row.copy()) // boundary tie: rank <= k, must keep
          }
        }
      }
      if (isPartial) {
        val out = new java.util.ArrayList[InternalRow](heaps.size() * limit + passThrough.size())
        heaps.values().forEach(h => h.forEach(r => out.add(r)))
        out.addAll(passThrough)
        import scala.jdk.CollectionConverters._
        out.iterator().asScala
      } else {
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        heaps.values().forEach { h =>
          val rows = new Array[InternalRow](h.size())
          var i = rows.length - 1
          while (i >= 0) { rows(i) = h.poll(); i -= 1 } // drain worst-first
          var idx = 0
          var rk = 1
          while (idx < rows.length) {
            // competition (gapped) rank for ties; row_number heaps hold
            // exactly k rows so idx+1 is the dense rank either way
            if (keepTies && idx > 0 && ord.compare(rows(idx), rows(idx - 1)) != 0)
              rk = idx + 1
            rankRow.update(0, if (keepTies) rk else idx + 1)
            out += proj(joined(rows(idx), rankRow)).copy()
            idx += 1
          }
        }
        out.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
