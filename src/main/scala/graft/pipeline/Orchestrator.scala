package graft.pipeline

import scala.collection.mutable

/** Minimal deterministic task-graph runner — the engine-side analog of the
  * reference's Airflow DAG semantics (airflow.py:816-850: `t1>>t2>>t3>>t4`
  * with `default_args={'retries': 2}`): explicit ordering, bounded
  * retries per task, and failure propagation (downstream of a failed task
  * is skipped, independent branches still run).
  *
  * Scheduling (cron, catchup, weekly interval) stays with whatever invokes
  * the pipeline — an engine library should expose the DAG semantics, not
  * own a clock. Execution is single-threaded and topological by
  * declaration order, so runs are reproducible; the parallelism that
  * matters lives INSIDE each task (Spark jobs), not between tasks.
  */
object Orchestrator {

  /** One node: `body` runs after every task in `deps` has succeeded;
    * on exception it reruns up to `retries` more times. */
  final case class Task(id: String, deps: Seq[String] = Nil, retries: Int = 0)(
      val body: () => Unit)

  sealed trait Status { def attempts: Int }
  final case class Succeeded(attempts: Int) extends Status
  final case class Failed(attempts: Int, error: Throwable) extends Status
  final case class Skipped(failedDep: String) extends Status { val attempts = 0 }

  /** Run the graph; returns the status of every task. Throws on unknown
    * or cyclic dependencies (a malformed DAG is a programming error, not
    * a runtime failure to retry). */
  def run(tasks: Seq[Task]): Map[String, Status] = {
    val byId = tasks.map(t => t.id -> t).toMap
    require(byId.size == tasks.size, "duplicate task ids")
    tasks.foreach(t => t.deps.foreach(d =>
      require(byId.contains(d), s"task '${t.id}' depends on unknown '$d'")))

    // Topological order, stable in declaration order (Kahn's algorithm
    // over the declaration sequence).
    val order = mutable.ArrayBuffer.empty[Task]
    val placed = mutable.Set.empty[String]
    var remaining = tasks
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.deps.forall(placed))
      require(ready.nonEmpty,
        s"dependency cycle among: ${remaining.map(_.id).mkString(", ")}")
      ready.foreach { t => order += t; placed += t.id }
      remaining = blocked
    }

    val status = mutable.Map.empty[String, Status]
    order.foreach { t =>
      t.deps.collectFirst {
        case d if !status(d).isInstanceOf[Succeeded] => d
      } match {
        case Some(dep) => status(t.id) = Skipped(dep)
        case None =>
          var attempt = 0
          var done: Option[Status] = None
          while (done.isEmpty) {
            attempt += 1
            try { t.body(); done = Some(Succeeded(attempt)) }
            catch {
              case e: Exception if attempt <= t.retries => () // retry
              case e: Exception => done = Some(Failed(attempt, e))
            }
          }
          status(t.id) = done.get
      }
    }
    status.toMap
  }
}
