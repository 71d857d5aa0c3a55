package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the layout that makes
  * 2-D box predicates skip files. A 1-D sort clusters one column
  * perfectly and scatters the other across every file; interleaving the
  * two quantized keys bit-by-bit keeps rows close in BOTH dimensions, so
  * a (custkey range × date range) predicate overlaps a small fraction of
  * the z-buckets instead of all of them. This is the write-side
  * complement of parquet min/max skipping: the stats only prune when the
  * layout makes per-file ranges narrow.
  *
  * Everything here is integer arithmetic over broadcast min/max bounds
  * (B18's histogram idiom) — deterministic on any engine, so the bucket
  * assignment itself is DuckDB-oracle-checkable bit for bit.
  */
object ZOrder {

  /** Quantize `c` to `bits` bits via the global [mn, mx] bounds:
    * floor((c − mn) · (2^bits − 1) / (mx − mn)) with the max value
    * clamped in. Double math with one division, then a LONG floor —
    * engine-identical for the magnitudes involved. */
  def quantize(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val levels = (1L << bits) - 1
    // degenerate range (constant column): everything quantizes to 0
    // rather than NaN-poisoning the z-value
    when(mx === mn, lit(0L))
      .otherwise(least(floor((c - mn).cast("double") * levels / (mx - mn).cast("double")),
        lit(levels)).cast("long"))
  }

  /** Interleave the low `bits` bits of a and b: bit i of `a` lands at
    * position 2i+1, bit i of `b` at 2i (a-major). Unrolled shift/mask
    * expression — whole-stage codegen folds it into one projection. */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
      (abit + bbit): Column
    }.reduce(_ + _)

  /** The same interleave as DuckDB SQL over expressions `a` and `b`. */
  def interleaveDuck(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")
}
