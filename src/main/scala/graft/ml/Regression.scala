package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ML component (airflow.py:20-23 imports VectorAssembler /
  * LinearRegression / RegressionEvaluator; the PDF describes an OLS fit
  * with RMSE/R² evaluation) — SURVEY §2 F2/F3.
  *
  * Two paths:
  *  - [[fitExact]]: single-feature OLS in closed form from *decimal-exact*
  *    aggregates (normal equations). One scan, partial-aggregated,
  *    no iterations — this is both the oracle-comparable path and the
  *    cheapest way to fit 100 TB for one feature: the entire fit is a
  *    6-value aggregate.
  *  - [[fitMl]]: the spark.ml pipeline (VectorAssembler + LinearRegression
  *    with the "normal" solver) for the general multi-feature case.
  */
object Regression {

  final case class Ols(n: Long, slope: Double, intercept: Double, r2: Double)

  /** Exact normal-equation OLS of y on x. The six sufficient statistics
    * (n, Σx, Σy, Σxy, Σx², Σy²) are decimal sums — exact, order-independent
    * — so slope/intercept/R² are bit-deterministic doubles. */
  def exactOlsAggregates(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n"),
      sum(col(xCol).cast("decimal(28,4)")).cast("double").as("sx"),
      sum(col(yCol).cast("decimal(28,4)")).cast("double").as("sy"),
      sum((col(xCol) * col(yCol)).cast("decimal(28,4)")).cast("double").as("sxy"),
      sum((col(xCol) * col(xCol)).cast("decimal(28,4)")).cast("double").as("sxx"),
      sum((col(yCol) * col(yCol)).cast("decimal(38,4)")).cast("double").as("syy"))

  /** slope/intercept/R² computed from the sufficient statistics. */
  def exactOls(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val a = exactOlsAggregates(df, xCol, yCol)
    a.select(
      col("n"),
      ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
      col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
      .select(
        col("n"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"),
        (((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
  }

  /** RMSE of ŷ = intercept + slope·x against y. Per-row squared residuals
    * are cast to decimal before summing (deterministic given identical
    * slope/intercept doubles), so the RMSE is oracle-comparable too. */
  def exactRmse(df: DataFrame, xCol: String, yCol: String,
                slope: Double, intercept: Double): DataFrame = {
    val resid = col(yCol) - (lit(intercept) + lit(slope) * col(xCol))
    df.agg(
      sqrt(sum((resid * resid).cast("decimal(38,8)")).cast("double") / count(lit(1)))
        .as("rmse"),
      count(lit(1)).as("n"))
  }

  /** Fit + RMSE in ONE aggregate pass: Σr² expands algebraically over the
    * six sufficient statistics the fit already computed —
    *   Σr² = Σy² − 2aΣy − 2bΣxy + na² + 2abΣx + b²Σx²
    * — so there is NO residual scan at all (the old fused plan re-read
    * the table to decimal-sum per-row residual squares; worse, that was
    * a computed-DOUBLE→DECIMAL(38,8) re-entry, which DuckDB does not
    * round correctly — the q_anova failure class). Every input is an
    * exact decimal aggregate exiting through a correctly-rounded cast,
    * and the expansion is one fixed double op sequence both engines
    * share. The mild cancellation (Σr² ≪ Σy²) costs a few digits of the
    * VALUE, identically in both engines; RegressionSpec bounds it
    * against the residual-scan form at 1e-6 relative. */
  def exactRmseFitted(df: DataFrame, xCol: String, yCol: String): DataFrame =
    exactOls2(df, xCol, yCol).selectExpr(
      """sqrt((syy - ((2*intercept)*sy) - ((2*slope)*sxy)
        |  + ((CAST(n AS DOUBLE)*intercept)*intercept)
        |  + (((2*intercept)*slope)*sx) + ((slope*slope)*sxx))
        |  / n) AS rmse""".stripMargin,
      "n")

  /** [[exactOls]] plus the raw sufficient statistics (for derived
    * metrics like [[exactRmseFitted]]'s closed-form Σr²). */
  def exactOls2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val a = exactOlsAggregates(df, xCol, yCol)
    a.select(
      col("n"),
      ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
      col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
      .select(col("n"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"),
        col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
  }

  /** spark.ml pipeline: assemble features → LinearRegression (normal
    * solver, no regularization) — the general multi-feature path. */
  def fitMl(df: DataFrame, features: Seq[String], labelCol: String): LinearRegressionModel = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .transform(df)
    new LinearRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setSolver("normal").setRegParam(0.0).setElasticNetParam(0.0)
      .fit(assembled)
  }

  /** RegressionEvaluator wrapper (reference imports it at airflow.py:23). */
  def evaluate(model: LinearRegressionModel, df: DataFrame, features: Seq[String],
               labelCol: String, metric: String = "rmse"): Double = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .transform(df)
    new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol(model.getPredictionCol)
      .setMetricName(metric)
      .evaluate(model.transform(assembled))
  }
}
