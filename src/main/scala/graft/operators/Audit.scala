package graft.operators

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** SURVEY §2 G15 — named WRITE AUDITS over `Dataset.observe`: attach
  * audit metrics (row counts, null-key counts, sums) to a frame and
  * collect them from the SAME action that produces the output, instead
  * of re-running a validation query against what was just written (the
  * reference validates its loads with follow-up SELECTs —
  * airflow.py:529-551 — a second full pass per table).
  *
  * `observe` computes the metrics in accumulators riding the action's
  * own tasks: zero extra scans, zero extra shuffles, constant driver
  * memory — at 100 TB the audit is free, which is the whole point of
  * using it over an audit query. Delivery is asynchronous (a
  * QueryExecutionListener fires after the action commits), so the handle
  * blocks until the metrics row lands and always unregisters its
  * listener.
  */
object Audit {

  /** The metrics of one pending audited action: [[await]] blocks until
    * the listener delivers them (and always unregisters). One-shot — one
    * handle per action. */
  final class PendingMetrics private[Audit] (df: DataFrame, name: String) {
    private val spark = df.sparkSession
    private val latch = new CountDownLatch(1)
    @volatile private var row: Option[Row] = None
    private val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach { r =>
          row = Some(r); latch.countDown()
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    def await(timeoutSec: Int = 120): Row =
      try {
        if (!latch.await(timeoutSec, TimeUnit.SECONDS))
          throw new IllegalStateException(
            s"audit '$name': metrics not delivered within $timeoutSec s — " +
              "was an action actually run on the observed frame?")
        row.get
      } finally spark.listenerManager.unregister(listener)
  }

  /** Instrument `df` with a named audit: returns the frame the caller
    * must act on (write/count/collect) and the pending-metrics handle
    * for that action. Metric expressions follow `observe`'s contract:
    * aggregates over the action's rows (count/sum/min/max/...), no
    * distinct aggregates. */
  def observed(df: DataFrame, name: String,
               metrics: Column*): (DataFrame, PendingMetrics) = {
    require(metrics.nonEmpty, "audit needs at least one metric expression")
    val pending = new PendingMetrics(df, name)
    (df.observe(name, metrics.head, metrics.tail: _*), pending)
  }

  /** The one-shot form: run `action` on the instrumented frame and
    * return the audit row — `observedAction(df, "load", count(lit(1))
    * .as("n_rows")) { _.write.parquet(out) }` writes AND audits in one
    * pass. */
  def observedAction(df: DataFrame, name: String, metrics: Column*)(
      action: DataFrame => Unit): Row = {
    val (obs, pending) = observed(df, name, metrics: _*)
    action(obs)
    pending.await()
  }
}
