package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Regression
import graft.sources.Tables

class RegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("closed-form OLS agrees with spark.ml LinearRegression (normal solver)") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val exact = Regression.exactOls(li, "l_quantity", "l_extendedprice").head()
    val model = Regression.fitMl(li, Seq("l_quantity"), "l_extendedprice")
    assert(math.abs(exact.getAs[Double]("slope") - model.coefficients(0)) < 1e-6)
    assert(math.abs(exact.getAs[Double]("intercept") - model.intercept) < 1e-4)
  }

  test("exactRmse matches RegressionEvaluator rmse") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val model = Regression.fitMl(li, Seq("l_quantity"), "l_extendedprice")
    val evRmse = Regression.evaluate(model, li, Seq("l_quantity"), "l_extendedprice")
    val exRmse = Regression
      .exactRmse(li, "l_quantity", "l_extendedprice", model.coefficients(0), model.intercept)
      .head().getAs[Double]("rmse")
    assert(math.abs(evRmse - exRmse) / evRmse < 1e-9)
  }

  test("closed-form fit+rmse matches the residual-scan fit then rmse") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val fit = Regression.exactOls(li, "l_quantity", "l_extendedprice").head()
    val twoStep = Regression
      .exactRmse(li, "l_quantity", "l_extendedprice",
        fit.getAs[Double]("slope"), fit.getAs[Double]("intercept"))
      .head().getAs[Double]("rmse")
    val fused = Regression.exactRmseFitted(li, "l_quantity", "l_extendedprice")
      .head().getAs[Double]("rmse")
    // Σr² expanded over the sufficient statistics cancels against Σy² —
    // a few digits of the value, not the metric (both engines share the
    // identical op sequence; this bounds the algebra against the scan)
    assert(math.abs(fused - twoStep) / twoStep < 1e-6)
  }

  test("r2 is within [0, 1] and matches model summary") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val exact = Regression.exactOls(li, "l_quantity", "l_extendedprice").head()
    val model = Regression.fitMl(li, Seq("l_quantity"), "l_extendedprice")
    val r2 = exact.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(r2 - model.summary.r2) < 1e-6)
  }

  test("pca leading component is a unit eigenvector of the covariance (F12)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val (lambda, v) = graft.ml.Pca.leadingComponent(emb, "embedding")
    val dim = v.length
    assert(lambda > 0.0)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    // rebuild the covariance independently (explode-pair formulation —
    // quadratic in dims, fine at spec scale) and check Av ≈ λv
    val rows = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val mu = Array.tabulate(dim)(i => rows.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      rows.map(r => (r(i) - mu(i)) * (r(j) - mu(j))).sum / (n - 1)
    }
    val av = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * v(j)).sum)
    val maxResid = (0 until dim).map(i => math.abs(av(i) - lambda * v(i))).max
    assert(maxResid < 1e-6 * lambda,
      s"residual $maxResid vs eigenvalue $lambda — not converged to an eigenpair")
    // determinism: a second run returns the identical pair (sign pinned)
    val (l2, v2) = graft.ml.Pca.leadingComponent(emb, "embedding")
    assert(l2 == lambda && v2.sameElements(v))
  }

  test("ALS ranks observed interactions decisively above random non-interactions") {
    import org.apache.spark.sql.functions._
    val s = spark
    val inter = graft.queries.MlQueries.alsInteractions(s, TestSpark.sfDir)
      .persist()
    val model = graft.ml.Recommend.alsModel(s, TestSpark.sfDir)
    val obs = model.transform(inter)
      .agg(avg("prediction")).head().getDouble(0)
    // random (user, item) pairs with the observed ones removed: pair each
    // user with a hash-shifted item id from the catalog
    val users = inter.select("user").distinct()
    val items = inter.select("item").distinct()
    val rnd = users.crossJoin(items)
      .filter(pmod(xxhash64(col("user"), col("item")), lit(97)) === 0)
      .join(inter.select("user", "item"), Seq("user", "item"), "left_anti")
    val neg = model.transform(rnd).agg(avg("prediction")).head().getDouble(0)
    inter.unpersist()
    // 1.3× at sf0.001: the 150×500 matrix is ~8% dense, so implicit ALS
    // scores non-interactions well above zero; the margin grows with
    // sparsity (measured 1.77× here)
    assert(obs > neg * 1.3,
      s"observed mean score $obs not decisively above non-interaction mean $neg")
    // served recommendations exist and are well-formed (rows-only gate)
    val recs = graft.queries.MlQueries.all.find(_.name == "m_als").get
      .run(s, TestSpark.sfDir)
    assert(recs.count() > 0 && recs.columns.toSeq == Seq("user", "rank", "item"))
  }
}
