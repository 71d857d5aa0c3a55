package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling (SURVEY §2 A18) — the "know your data" operator a
  * training-data pipeline runs before anything else, generalizing the
  * reference's ad-hoc data-quality checks (`countDistinct` airflow.py:57,
  * random-sample validation) into one declarative pass.
  *
  * Shape: every profiled column is melted to a `(col_name, is_null,
  * v_num, v_str)` struct and the stats aggregate per column — ONE scan of
  * the source regardless of how many columns are profiled (a per-column
  * loop of aggregates would be k scans). Numerics (and timestamps, as
  * epoch millis) profile through `v_num`; strings through `v_str`; min/max
  * stay in the native domain (no double→string formatting, which is not
  * cross-engine-deterministic).
  *
  * Exact `n_distinct` forces Spark's multi-distinct Expand (input ×3) and
  * shuffles the distinct (column, value) pairs — the right default at
  * audit time. `approx = true` swaps in HLL `approx_count_distinct`:
  * single-pass partial aggregation, no Expand, constant-size sketch per
  * column — the 100 TB default (same exact→approx ladder as A11→A13).
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    val entries = cols.map { c =>
      // v_num: double view for min/max. long→double rounding is monotone,
      // so min/max computed on the rounded values equal the rounded exact
      // min/max — doubles are safe HERE, but NOT for distinct counts:
      // distinct longs above 2^53 collide in double. Distincts therefore
      // run on v_key, a LOSSLESS string key in the native domain (integral/
      // epoch-millis longs and Spark's shortest-roundtrip double→string
      // are injective).
      val (vNum, vKey, vStr) = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          (col(c).cast("double"), col(c).cast("long").cast("string"),
            lit(null).cast("string"))
        case _: NumericType =>
          (col(c).cast("double"), col(c).cast("string"), lit(null).cast("string"))
        // NTZ appears when parquet stores naive timestamps (the testdata
        // does); under the engine's fixed UTC session the cast to TZ is
        // the identity on the wall clock, so epoch millis agree with the
        // oracle's epoch_ms either way. DateType profiles as epoch millis
        // too (midnight UTC) — one time unit across all temporal columns.
        case TimestampType | TimestampNTZType | DateType =>
          val ms = unix_millis(col(c).cast(TimestampType))
          (ms.cast("double"), ms.cast("string"), lit(null).cast("string"))
        case _ => (lit(null).cast("double"), lit(null).cast("string"),
                    col(c).cast("string"))
      }
      struct(lit(c).as("col_name"),
        when(col(c).isNull, 1L).otherwise(0L).as("is_null"),
        vNum.as("v_num"), vKey.as("v_key"), vStr.as("v_str"))
    }
    def distinctOf(c: String) =
      if (approx) approx_count_distinct(col(c)) else count_distinct(col(c))
    df.select(explode(array(entries: _*)).as("p"))
      .select(col("p.col_name"), col("p.is_null"), col("p.v_num"),
        col("p.v_key"), col("p.v_str"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum("is_null").as("n_null"),
        // exactly one of v_key/v_str is populated per column, so the sum
        // of the two distinct counts is the column's distinct count
        (distinctOf("v_key") + distinctOf("v_str")).as("n_distinct"),
        min("v_num").as("min_num"), max("v_num").as("max_num"),
        min("v_str").as("min_str"), max("v_str").as("max_str"))
  }
}
