package graft

import org.apache.spark.sql.SparkSession

/** Per-query execution guard for the driver-run harness mains (Verify,
  * Bench).
  *
  * Round-4 postmortem: the driver's external `timeout` killed both
  * harness runs (BENCH_r04 rc=124, CORRECTNESS_r04 empty) while the host
  * was in one of its ~100×-degraded CPU phases (SURVEY §7 environment
  * note). One stuck or degraded query must never consume the whole
  * process budget — each query runs inside a Spark job group whose jobs
  * are cancelled after a cap, so the harness records a failure for THAT
  * query and moves on. Streaming queries bound themselves separately via
  * `awaitTermination(timeout)` (their micro-batch jobs run on the stream
  * execution thread under its own job group, out of reach of this
  * cancellation).
  */
object Watchdog {

  /** Per-query cap in seconds (default 120; env-overridable). A normal
    * query at these scale factors is sub-second to a few seconds; the cap
    * only bites in degraded phases, where bounding the damage is the
    * point. Lowered 240 -> 120 after r5: five consecutive capped queries
    * burned 20 minutes of the external budget and ~50 queries behind them
    * were never attempted — at these scales anything past 120 s is a
    * degraded host, not a computing query. */
  def queryCapSec: Int =
    sys.env.getOrElse("SPARK_GRAFT_QUERY_CAP_SEC", "120").toInt

  /** Cap of the attempt currently running under [[runCapped]]. Streaming
    * queries bound themselves via `awaitTermination(timeout)` — their
    * micro-batch jobs are out of cancelJobGroup's reach — and must use
    * the CALLER's per-attempt cap, not the global default: Verify's
    * 60 s pass-1 cap would otherwise be silently tripled by three
    * streams each blocking the full 120 s (r6 advisor find). Harness
    * mains run attempts sequentially on one thread, so a volatile
    * save/restore is sufficient. */
  @volatile private var _attemptCapSec: Int = queryCapSec
  def attemptCapSec: Int = _attemptCapSec

  /** Run `body` under a cancellable job group; returns Left(reason) on
    * failure or cap expiry instead of throwing. */
  def runCapped[T](spark: SparkSession, name: String, capSec: Int)(body: => T): Either[String, T] = {
    val sc = spark.sparkContext
    val group = s"graft-capped-$name"
    sc.setJobGroup(group, name, interruptOnCancel = true)
    @volatile var fired = false
    val timer = new java.util.Timer(s"graft-watchdog-$name", true)
    // REPEATING cancel, not one-shot: a single cancelJobGroup fired
    // between jobs finds nothing to cancel ("Cannot find active jobs")
    // and the query's NEXT job then runs unbounded — the sf10 sweep lost
    // a whole Verify process that way (d_source_sim_est churned 412 s
    // past its 60 s cap until a task OOM killed the SparkContext). Regular
    // re-fires catch jobs as they start; timer.cancel() in the finally
    // stops the loop the moment the body returns.
    timer.scheduleAtFixedRate(new java.util.TimerTask {
      override def run(): Unit = { fired = true; sc.cancelJobGroup(group) }
    }, capSec * 1000L, 5000L)
    val prevCap = _attemptCapSec
    _attemptCapSec = capSec
    try Right(body)
    catch {
      case e: Throwable =>
        Left(if (fired) s"cancelled after ${capSec}s cap" else s"${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally {
      _attemptCapSec = prevCap
      timer.cancel()
      sc.clearJobGroup()
    }
  }
}
