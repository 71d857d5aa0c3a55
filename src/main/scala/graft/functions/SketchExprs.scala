package graft.functions

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document sketch expressions (SURVEY §2 D2-D4 hot path).
  *
  * The round-2 dedup family computed per-doc shingle-id sets and
  * signatures distributively: explode the shingle array to (doc, gid)
  * rows, then `collect_set` / k×`min` / b×`sum` aggregates back to one
  * row per doc. The aggregation was exchange-free (Generate preserves
  * partitioning) but still paid the fan-out: materialized rows per
  * shingle, ObjectHashAggregate buffers per doc, k expression
  * evaluations per exploded row.
  *
  * A shingle-id set, a MinHash signature, and a SimHash signature are
  * all PURE FUNCTIONS of one document's shingle array — no cross-row
  * state. These expressions compute them as single compiled passes
  * inside the projection, so the whole doc→signature path is narrow:
  * scan → shingle → sketch, no aggregate anywhere. The distributive
  * formulations remain in [[graft.operators.Dedup]] (`*ViaAgg`) as the
  * reference semantics; specs assert bit-identity on the real corpus.
  *
  * Both hashing modes of SURVEY §4 rule 6 are covered:
  *  - ORACLE mode: gid = top 60 bits of md5(shingle) — bit-identical to
  *    `conv(substring(md5(g),1,15),16,10)` and the DuckDB oracle's
  *    `CAST('0x'||substr(md5(g),1,15) AS BIGINT)`; permutations are the
  *    affine `(a·(gid mod P) + b) mod P` closed form.
  *  - PRODUCTION mode (`_xx`): xxhash64 end to end, bit-identical to the
  *    built-in `xxhash64(...)` column arithmetic it replaces (seeds
  *    reproduce Spark's chained-child hashing exactly).
  */
object SketchExprs {

  val P: Long = 2147483647L // 2^31 − 1, shared with operators.Dedup

  /** Affine MinHash permutation coefficients (closed form, SURVEY §4).
    * Source of truth for both the Scala operators and the oracle SQL. */
  def perms(k: Int): Seq[(Long, Long)] =
    (0 until k).map(j => (((2L * j + 1) * 1103515245L) % P, ((j + 1) * 12345679L) % P))

  /** SimHash bit-vote coefficients (closed form). */
  def simPerms(bits: Int): Seq[(Long, Long)] =
    (0 until bits).map(j => (((3L * j + 7) * 2654435761L) % P, ((j + 1) * 97003L) % P))

  private val permCache = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private val simPermCache = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private val xxSeedCache = new ConcurrentHashMap[Int, Array[Long]]()

  private def permArrays(k: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(k, { kk =>
      val ps = perms(kk); (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  private def simPermArrays(bits: Int): (Array[Long], Array[Long]) =
    simPermCache.computeIfAbsent(bits, { b =>
      val ps = simPerms(b); (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  /** Per-permutation xxhash64 seeds reproducing the built-in column form
    * `xxhash64(lit(j), gid)`: Spark chains children left to right from
    * seed 42, so permutation j's effective seed is hashInt(j, 42) and the
    * signature value is hashLong(gid, that). */
  private def xxSeeds(k: Int): Array[Long] =
    xxSeedCache.computeIfAbsent(k,
      { kk => Array.tabulate(kk)(j => XXH64.hashInt(j, 42L)) })

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(s) as a non-negative long — the first 15 hex
    * nibbles of the digest, i.e. the big-endian first 8 bytes >>> 4. */
  @inline private def md5Gid(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Distinct long ids of the input strings via `hash`, open-addressed —
    * no boxing, one pass, first-occurrence order (callers are
    * order-insensitive: set intersection / min / sum). */
  private def distinctIds(arr: ArrayData, hash: UTF8String => Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return EMPTY
    var cap = java.lang.Integer.highestOneBit(math.max(4, n * 2) - 1) << 1
    if (cap < 4) cap = 4
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](n)
    var k = 0
    var i = 0
    while (i < n) {
      // Internal producers (graft_shingles) emit containsNull=false, but
      // the functions are SQL-registered — a user array CAN carry nulls.
      // Null elements contribute nothing to a set of shingle ids.
      if (!arr.isNullAt(i)) {
        val id = hash(arr.getUTF8String(i))
        var slot = (java.lang.Long.hashCode(id) & (cap - 1))
        var dup = false
        while (used(slot) && !dup) {
          if (table(slot) == id) dup = true
          else slot = (slot + 1) & (cap - 1)
        }
        if (!dup) {
          used(slot) = true; table(slot) = id
          out(k) = id; k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  def computeGidSetMd5(arr: ArrayData): ArrayData = distinctIds(arr, md5Gid)

  def computeGidSetXx(arr: ArrayData): ArrayData =
    distinctIds(arr, s => XXH64.hashUTF8String(s, 42L))

  /** k affine-permutation mins in ONE pass over the id array. Empty
    * input → empty array (no signature; callers filter empty sets). */
  /** Fold a gid array into an EXISTING k-slot min buffer (the update step
    * of the mergeable [[MinHashAgg]]; same permutations as
    * [[computeMinHash]], so a 1-doc group's aggregate equals the scalar
    * signature). */
  def updateMins(mins: Array[Long], gs: ArrayData): Unit = {
    val n = gs.numElements()
    val k = mins.length
    val (as, bs) = permArrays(k)
    var i = 0
    while (i < n) {
      val x = java.lang.Math.floorMod(gs.getLong(i), P)
      var j = 0
      while (j < k) {
        val h = java.lang.Math.floorMod(as(j) * x + bs(j), P)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
  }

  def computeMinHash(gs: ArrayData, k: Int): ArrayData = {
    val n = gs.numElements()
    if (n == 0 || k <= 0) return EMPTY
    val (as, bs) = permArrays(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = java.lang.Math.floorMod(gs.getLong(i), P)
      var j = 0
      while (j < k) {
        val h = java.lang.Math.floorMod(as(j) * x + bs(j), P)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** k xxhash64-permutation mins in one pass (production mode). */
  def computeMinHashXx(gs: ArrayData, k: Int): ArrayData = {
    val n = gs.numElements()
    if (n == 0 || k <= 0) return EMPTY
    val seeds = xxSeeds(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = gs.getLong(i)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(x, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** All `bits` SimHash votes in one pass; bit j of the result is the
    * sign of the ±1 vote sum for bit function j. Empty input → 0L.
    * `bits` is SQL-reachable (`graft_simhash(gs, b)`), so it gets the
    * same input guard as `computeMinHash`'s k: 1..64 only (a 65th bit
    * position would silently wrap `1L << j`). */
  def computeSimHash(gs: ArrayData, bits: Int): Long = {
    require(bits > 0 && bits <= 64,
      s"graft_simhash: bits must be in 1..64, got $bits")
    val n = gs.numElements()
    val (cs, ds) = simPermArrays(bits)
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val x = java.lang.Math.floorMod(gs.getLong(i), P)
      var j = 0
      while (j < bits) {
        // ((c·x + d) mod P) mod 2 → vote ±1
        votes(j) += (java.lang.Math.floorMod(cs(j) * x + ds(j), P) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sim |= 1L << j
      j += 1
    }
    sim
  }
}

/** `graft_gid_set(shingles)` → distinct md5-top-60-bit ids (oracle mode). */
case class GidSetMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gid_set"
  override def nullSafeEval(a: Any): Any =
    SketchExprs.computeGidSetMd5(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchExprs.computeGidSetMd5($a);")
  override protected def withNewChildInternal(newChild: Expression): GidSetMd5Expr =
    copy(child = newChild)
}

/** `graft_gid_set_xx(shingles)` → distinct xxhash64 ids (production mode). */
case class GidSetXxExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gid_set_xx"
  override def nullSafeEval(a: Any): Any =
    SketchExprs.computeGidSetXx(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchExprs.computeGidSetXx($a);")
  override protected def withNewChildInternal(newChild: Expression): GidSetXxExpr =
    copy(child = newChild)
}

/** `graft_minhash(gids, k)` → the k affine-permutation minima. */
case class MinHashAffineExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullSafeEval(a: Any, k: Any): Any =
    SketchExprs.computeMinHash(a.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.functions.SketchExprs.computeMinHash($a, $k);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashAffineExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_minhash_xx(gids, k)` → the k xxhash64-permutation minima. */
case class MinHashXxExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_xx"
  override def nullSafeEval(a: Any, k: Any): Any =
    SketchExprs.computeMinHashXx(a.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.functions.SketchExprs.computeMinHashXx($a, $k);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashXxExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_simhash(gids, bits)` → the b-bit SimHash signature as a long. */
case class SimHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchExprs.computeSimHash(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SketchExprs.computeSimHash($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashExpr =
    copy(left = newLeft, right = newRight)
}
