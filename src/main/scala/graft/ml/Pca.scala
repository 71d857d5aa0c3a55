package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Leading principal component via distributed covariance + driver-side
  * power iteration — the classic two-phase shape for spectral methods on
  * tall-skinny data: the DATA-scale work is one pass accumulating a
  * dims×dims Gram matrix per partition (batched imperative accumulation,
  * the same legitimate-mapPartitions case as multimodal codec batching —
  * a dims²-double array per partition, merged pairwise), and the
  * ITERATION runs on the driver over the dims×dims result, which is
  * size-independent of the corpus. 64-dim embeddings → a 32 KB matrix;
  * the power loop is microseconds and exactly reproducible (fixed start,
  * fixed iteration count, fixed arithmetic order).
  */
object Pca {

  /** (eigenvalue, eigenvector) of the covariance's leading component.
    * `vecCol` is an Array[Float] column of constant dimension. */
  def leadingComponent(df: DataFrame, vecCol: String, iters: Int = 5000)
      : (Double, Array[Double]) = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val n = df.count()
    require(n >= 2, s"covariance needs at least 2 rows, got $n")
    // mean vector: one narrow posexplode + dim-key partial agg
    val mean = df.select(posexplode(col(vecCol)).as(Seq("d", "v")))
      .groupBy("d").agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
      .orderBy("d")
      .collect().map(r => r.getDouble(1) / r.getLong(2))
    // per-partition upper-triangle accumulation of Σ (x−μ)(x−μ)ᵀ
    val bMean = df.sparkSession.sparkContext.broadcast(mean)
    val acc = df.select(col(vecCol)).rdd.mapPartitions { it =>
      val mu = bMean.value
      val a = new Array[Double](dim * dim)
      it.foreach { row =>
        val x = row.getSeq[Float](0)
        var i = 0
        while (i < dim) {
          val xi = x(i) - mu(i)
          var j = i
          while (j < dim) { a(i * dim + j) += xi * (x(j) - mu(j)); j += 1 }
          i += 1
        }
      }
      Iterator.single(a)
    }.treeReduce { (a, b) =>
      var k = 0; while (k < a.length) { a(k) += b(k); k += 1 }; a
    }
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      (if (i <= j) acc(i * dim + j) else acc(j * dim + i)) / (n - 1)
    }
    // driver power iteration from a fixed start, normalized each step;
    // early-stops when the iterate is stationary to machine precision —
    // a near-flat noise spectrum (tiny λ1/λ2 gap) converges slowly, and
    // the 64×64 matvec is cheap enough to just keep going
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    var lambda = 0.0
    var it = 0
    var delta = Double.MaxValue
    while (it < iters && delta > 1e-15) {
      val av = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      lambda = math.sqrt(av.map(x => x * x).sum)
      val nv = av.map(_ / lambda)
      delta = (0 until dim).map(i => math.abs(nv(i) - v(i))).max
      v = nv
      it += 1
    }
    // sign convention: first non-zero loading positive (eigenvectors are
    // defined up to sign; pin it so reruns are bit-identical)
    val s = v.find(math.abs(_) > 1e-12).map(x => math.signum(x)).getOrElse(1.0)
    (lambda, v.map(_ * s))
  }
}
