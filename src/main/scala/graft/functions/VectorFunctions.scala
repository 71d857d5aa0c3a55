package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2 D5/E1/E2).
  *
  * Determinism contract (SURVEY §4): elements are cast float→double
  * BEFORE any multiply, and sums are explicit left-to-right folds
  * (`aggregate`), so Spark and the DuckDB oracle (`list_reduce` over the
  * same element order) produce bit-identical doubles — rankings computed
  * on these values cannot diverge between engines.
  *
  * All of this is `functions._` higher-order expressions: codegen'd,
  * no UDF, no driver-side math.
  */
object VectorFunctions {

  private def toD(v: Column): Column = v.cast("array<double>")

  /** Left-fold sum of an array<double>. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(toD(a), toD(b), (x, y) => x * y))

  def norm(a: Column): Column = sqrt(foldSum(transform(toD(a), x => x * x)))

  /** Squared L2 distance (PQ codebook assignment metric) — HOF twin of
    * the native codegen form below (VecExprSpec asserts bit-identity). */
  def l2sq(a: Column, b: Column): Column =
    foldSum(zip_with(toD(a), toD(b), (x, y) => (x - y) * (x - y)))

  /** [[l2sq]] via the native codegen expression — same fold, same result
    * bits, a tight primitive loop instead of per-element interpreted
    * lambdas (use on any per-row × per-centroid assignment path). */
  def l2sqFast(a: Column, b: Column): Column =
    call_function("graft_l2sq", toD(a), toD(b))

  /** HOF formulation — kept as the cross-check twin of [[CosineF32]]
    * (the spec asserts bit-identical outputs). HOF lambdas evaluate
    * interpreted, so the hot paths use the codegen expression instead. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy of the vector (doubles). Cosine is invariant to
    * it; k-means is NOT — training on unit vectors makes L2 k-means
    * spherical, so "nearest centroid by cosine" and "centroid that
    * claimed me in training" agree (the IVF assignment consistency).
    *
    * PERF TRAP (r16): `norm(a)` is a full-array fold, and referencing it
    * inside the per-element lambda makes the interpreted HOF machinery
    * re-evaluate the fold for EVERY element — O(d²) interpreted work per
    * row (measured 28.9 s for 32k×64-f rows in the sf10 IVF trainer).
    * Hot paths must stage the norm as a column and call [[unitVia]]. */
  def unit(a: Column): Column = {
    val n = norm(a)
    transform(toD(a), x => x / n)
  }

  /** [[unit]] with the norm already staged as its own column: the same
    * per-element `x / n` IEEE division over the same double images (so
    * results are bit-identical to [[unit]]), but the fold runs once per
    * row instead of once per element. */
  def unitVia(a: Column, n: Column): Column =
    transform(toD(a), x => x / n)

  /** Cosine similarity via the native codegen expression (same arithmetic,
    * same result bits as [[cosineHof]] — see CosineF32's scaladoc).
    * Resolved through the FunctionRegistry name GraftExtensions installs,
    * so sessions must come from GraftSession (all of the engine's do). */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a.cast("array<float>"), b.cast("array<float>"))

  /** DuckDB twins — the identical fold, 1-based list indexing. */
  def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(len($a)), i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE))), (x, y) -> x + y)"

  def normDuck(a: String): String =
    s"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (x, y) -> x + y))"

  def cosineDuck(a: String, b: String): String =
    s"(${dotDuck(a, b)} / (${normDuck(a)} * ${normDuck(b)}))"

  /** Random-hyperplane weight for (plane p, dim i): a deterministic LCG
    * mapped to an integer in [-1000, 1000]. Same closed form in both
    * dialects — no RNG state, no broadcast of a weight matrix needed
    * (at 100 TB the weights are recomputed per row inside codegen, which
    * beats shipping them). */
  def planeWeight(p: Int, dims: Int, i: Column): Column =
    pmod(lit(1103515245L) * (lit(p.toLong * dims) + i) + lit(12345L), lit(2001L)) - lit(1000L)

  def planeWeightDuck(p: Int, dims: Int, i: String): String =
    s"((CAST(1103515245 AS BIGINT) * (${p.toLong * dims} + $i) + 12345) % 2001 - 1000)"

  /** Sign-bit bucket over `nPlanes` hyperplanes → integer bucket id, via
    * the native codegen expression ([[LshBucketF32]] — tight primitive
    * loop). Bit-identical to [[lshBucketHof]]; spec'd in SimilaritySpec. */
  def lshBucket(v: Column, dims: Int, nPlanes: Int): Column =
    call_function("graft_lsh_bucket", v.cast("array<float>"), lit(dims), lit(nPlanes))

  /** HOF formulation — kept as the cross-check twin of [[LshBucketF32]].
    * Single pass per plane: the indexed `transform` overload visits each
    * element once (the earlier `element_at(cast(v), i+1)` form re-cast the
    * whole array per element — O(dims²) work per plane); but each visit
    * still pays the interpreted lambda machinery, which is why the hot
    * path is the native expression. */
  def lshBucketHof(v: Column, dims: Int, nPlanes: Int): Column = {
    val planeDots = (0 until nPlanes).map { p =>
      foldSum(transform(toD(v), (x, i) => planeWeight(p, dims, i).cast("double") * x))
    }
    planeDots.zipWithIndex.map { case (dp, p) =>
      when(dp > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  def lshBucketDuck(v: String, dims: Int, nPlanes: Int): String = {
    val terms = (0 until nPlanes).map { p =>
      val dp = s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range($dims), i -> CAST(${planeWeightDuck(p, dims, "i")} AS DOUBLE) * CAST($v[i+1] AS DOUBLE))), (x, y) -> x + y)"
      s"(CASE WHEN $dp > 0.0 THEN ${1L << p} ELSE 0 END)"
    }
    terms.mkString("(", " + ", ")")
  }
}
