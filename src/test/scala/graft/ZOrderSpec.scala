package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZOrder
import graft.sources.Tables

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave is a bijection on the quantized grid") {
    val df = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("a"), (col("id") % 256).as("b"))
    val n = df.select(ZOrder.interleave(col("a"), col("b"), 8).as("z"))
      .distinct().count()
    assert(n == 256L * 256L)
  }

  test("quantize maps a constant column to 0 instead of NaN-poisoning the z-value") {
    val df = Seq(5L, 5L, 5L).toDF("v")
    val out = df.select(ZOrder.quantize(col("v"), lit(5L), lit(5L), 8).as("q"))
      .as[Long].collect()
    assert(out.toSeq == Seq(0L, 0L, 0L))
  }

  test("z-order buckets prune a day-range box a custkey sort cannot") {
    // The layout claim behind q_zorder_layout: a 1-D custkey sort makes
    // every bucket span the FULL day range, so a day predicate prunes
    // nothing; z-order constrains both dimensions per bucket, so the same
    // predicate skips most buckets. Buckets stand in for files; overlap =
    // what parquet min/max stats would fail to prune.
    val ord = Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("dy"))
    val b = ord.agg(min("ck").as("ckmn"), max("ck").as("ckmx"),
      min("dy").as("dmn"), max("dy").as("dmx"))
    val q = ord.crossJoin(broadcast(b))
      .withColumn("qa", ZOrder.quantize(col("ck"), col("ckmn"), col("ckmx"), 8))
      .withColumn("qb", ZOrder.quantize(col("dy"), col("dmn"), col("dmx"), 8))
      .withColumn("zbucket", shiftright(ZOrder.interleave(col("qa"), col("qb"), 8), 11))
      // the 1-D layout: 32 buckets of the custkey sort order
      .withColumn("ckbucket", shiftright(col("qa"), 3))
    def overlapping(bucketCol: String): Long = q
      .groupBy(bucketCol)
      .agg(min("dy").as("dlo"), max("dy").as("dhi"),
        first("dmn").as("dmn"), first("dmx").as("dmx"))
      // day box: the middle 25%-35% slice of observed days, any custkey
      .filter(col("dlo") <= col("dmn") + (col("dmx") - col("dmn")) * 0.35 &&
              col("dhi") >= col("dmn") + (col("dmx") - col("dmn")) * 0.25)
      .count()
    val zOverlap = overlapping("zbucket")
    val ckOverlap = overlapping("ckbucket")
    info(s"day-box overlap: z-order $zOverlap buckets, custkey-sort $ckOverlap of 32")
    assert(ckOverlap >= 30, s"custkey sort should span the day box everywhere, got $ckOverlap")
    assert(zOverlap * 2 <= ckOverlap,
      s"z-order should prune at least half the buckets the 1-D sort cannot ($zOverlap vs $ckOverlap)")
  }
}
