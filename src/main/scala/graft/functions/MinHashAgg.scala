package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_minhash_agg(gid_array, k)` — a native MERGEABLE MinHash
  * aggregate (SURVEY §2 D13): folds every member's gid set into one
  * k-slot signature per GROUP by elementwise permutation-min. The missing
  * rung of the custom-operator ladder made concrete: scalar codegen
  * expressions (SketchExprs) cover per-ROW sketching; this
  * `TypedImperativeAggregate` covers per-GROUP sketching with a real
  * partial/merge contract — update folds rows map-side, `merge` is
  * elementwise min (associative + commutative, so partial aggregation
  * and AQE re-planning are semantically free), and the wire format is
  * the packed long signature.
  *
  * Same affine permutations as the scalar `graft_minhash`
  * (SketchExprs.perms), so a single-member group's aggregate equals the
  * scalar signature — spec'd, along with partitioning-invariance of the
  * merge tree. The A13x/A13y rollup argument applies: per-source (or
  * per-day) signatures are stored once, and any cross-group Jaccard
  * question is signature algebra, never a re-scan of the text.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val gs = child.eval(input)
    if (gs != null) SketchExprs.updateMins(buffer, gs.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    // An untouched buffer (group had only empty/null gid sets) must NOT
    // surface as a real signature: k Long.MaxValue sentinels would make
    // any two degenerate groups compare 100% Jaccard-similar. Mirror the
    // scalar `graft_minhash` contract and emit an empty signature — the
    // D13 intersection arithmetic then scores such groups 0, not 1.
    // Sound because MaxValue is unreachable for any nonempty input:
    // updateMins writes values mod P = 2^31-1 into every slot.
    var i = 0
    while (i < buffer.length && buffer(i) == Long.MaxValue) i += 1
    if (i == buffer.length) new GenericArrayData(Array.empty[Long])
    else new GenericArrayData(buffer)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
