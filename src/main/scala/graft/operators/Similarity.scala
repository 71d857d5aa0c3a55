package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Similarity search over embedding columns (SURVEY §2 E1-E2, D5).
  *
  * E1 brute force is the exactness baseline: probes × corpus cross join.
  * O(|Q|·N) — only sane for small probe sets; it exists to calibrate the
  * approximate paths. E2 buckets both sides by random-hyperplane LSH sign
  * bits so the join becomes an equi-join on bucket id: at 100 TB the
  * cross join disappears and each bucket is a small dense block (AQE
  * handles bucket skew).
  */
object Similarity {

  /** E1 — exact top-k cosine neighbors for each probe row. */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val joined = probes.select(col("vec_id").as("q"), col("embedding").as("qv"))
      .crossJoin(corpus.select(col("vec_id").as("n"), col("embedding").as("nv")))
      .filter(col("q") =!= col("n"))
      .select(col("q"), col("n"),
        VectorFunctions.cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("q").orderBy(col("cos").desc, col("n"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("rank"), col("n"), col("cos"))
  }

  /** E2 — LSH-bucketed top-k: both sides keyed by hyperplane sign bucket,
    * neighbors searched only within the probe's bucket. */
  def lshTopK(probes: DataFrame, corpus: DataFrame, k: Int, dims: Int, nPlanes: Int): DataFrame = {
    val bucket = VectorFunctions.lshBucket(col("embedding"), dims, nPlanes)
    val pb = probes.select(col("vec_id").as("q"), col("embedding").as("qv"), bucket.as("bucket"))
    val cb = corpus.select(col("vec_id").as("n"), col("embedding").as("nv"), bucket.as("bucket"))
    val joined = pb.join(cb, "bucket")
      .filter(col("q") =!= col("n"))
      .select(col("q"), col("n"), VectorFunctions.cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("q").orderBy(col("cos").desc, col("n"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("rank"), col("n"), col("cos"))
  }

  /** D5 — near-duplicate pairs by cosine ≥ threshold, blocked by a
    * coarse partition column (here: the label/cluster id — at scale this
    * is the output of a clustering/LSH pre-pass, so the quadratic blowup
    * is bounded per block). */
  def embeddingNearDupPairs(emb: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val x = emb.select(col("vec_id").as("a"), col("embedding").as("av"), col(blockCol).as("blk"))
    val y = emb.select(col("vec_id").as("b"), col("embedding").as("bv"), col(blockCol).as("blk"))
    x.join(y, "blk")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), VectorFunctions.cosine(col("av"), col("bv")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
