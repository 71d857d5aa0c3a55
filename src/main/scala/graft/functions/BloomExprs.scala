package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe (SURVEY §2 B18 — pre-shuffle join
  * pruning).
  *
  * The 100 TB problem this serves: a fact⋈dim semi-join whose dim side is
  * selective still SHUFFLES THE ENTIRE FACT TABLE before the join drops
  * the non-matching rows — the dominant cost is moving rows that were
  * never going to match. A Bloom filter of the dim keys, broadcast to the
  * scan side as a filter, drops (1 − fpp) of the non-matching rows BEFORE
  * the exchange, so shuffle volume tracks the match cardinality instead
  * of the fact cardinality. Spark's optimizer injects this same shape on
  * its own behind `spark.sql.optimizer.runtime.bloomFilter.enabled`, but
  * only under size/selectivity heuristics it controls;
  * [[graft.operators.Prune.bloomPrunedSemiJoin]] is the deterministic,
  * caller-controlled form (the heuristics don't see "this dim is known
  * small at deploy time" or "this join repeats hourly").
  *
  * The probe must be CHEAP AND CODEGEN'D or the scan-side filter eats its
  * own win: this expression carries the deserialized
  * `org.apache.spark.util.sketch.BloomFilter` (Spark's public sketch —
  * the same class `DataFrameStatFunctions.bloomFilter` builds
  * distributively) as a codegen reference object and emits one
  * `mightContainLong` call per row inside whole-stage codegen — no UDF,
  * no per-row deserialization, no boxing.
  *
  * Correctness contract: a Bloom filter admits false POSITIVES only, so
  * `filter(probe) ⨝ semi` ≡ `⨝ semi` exactly — the exact join removes
  * the ≤ fpp stragglers. That identity is what lets q_bloom_prune share
  * the plain semi-join's DuckDB oracle.
  */
case class BloomContainsExpr(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  // Key must already be LongType — Prune casts/hashes explicitly (the
  // sketch's putLong/mightContainLong pair; string keys go through
  // xxhash64 on BOTH build and probe sides). ExpectsInputTypes is
  // private[sql] — see CosineF32's note.
  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(k: Any): Any =
    bloom.mightContainLong(k.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The sketch rides the plan's reference array (one object per task
    // binary, shared by every row), NOT the generated source — a 256 KB
    // filter as a code literal would blow the 64 KB method limit and
    // recompile per stage.
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $ref.mightContainLong($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
}

object BloomExprs {

  /** Serialize a built sketch for embedding in a plan (or shipping to a
    * later job — the hourly-join case caches these bytes). */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
