package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-integrity validation on load (SURVEY §2 A19) — the declarative form
  * of the PK/FK graph the reference's Load stage declares as Postgres DDL
  * (airflow.py:263-460: 11 tables, `PRIMARY KEY`/`REFERENCES` per edge).
  * A columnar warehouse has no enforcing engine underneath, so the load
  * step must CHECK what the DDL would have enforced: this operator reports,
  * per FK edge, how many child keys dangle.
  *
  * Shape per edge: project child to its (non-null — SQL FK semantics admit
  * null keys) fk column, left-join the DISTINCT parent keys, count rows
  * and parent misses in ONE aggregate — the anti-join and the denominator
  * share a single pass. Distinct-ing the parent first keeps the join
  * fan-out-free regardless of parent key duplication; dim-sized parents
  * broadcast under the session threshold, fact-sized parents shuffle on
  * the key — exactly the plan a 100 TB load check needs (no collect, no
  * per-row driver work, k edges = k independent joins unioned into one
  * report).
  */
object Integrity {

  /** One FK edge: `child.fkCol` must reference `parent.pkCol`. */
  final case class FkEdge(child: String, fkCol: String, parent: String, pkCol: String)

  /** Violation report over `tables`: one row per edge —
    * (child_table, fk_col, parent_table, pk_col, n_child, n_orphans).
    * `n_child` counts non-null child keys, `n_orphans` those without a
    * parent. A clean load is `n_orphans = 0` on every row. */
  def checkFk(tables: Map[String, DataFrame], edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty, "no FK edges to check")
    edges.map { e =>
      val ch = tables(e.child).select(col(e.fkCol).as("__k")).filter(col("__k").isNotNull)
      val par = tables(e.parent).select(col(e.pkCol).as("__pk")).distinct()
      ch.join(par, col("__k") === col("__pk"), "left")
        .agg(count(lit(1)).as("n_child"),
          (count(lit(1)) - count(col("__pk"))).as("n_orphans"))
        .select(lit(e.child).as("child_table"), lit(e.fkCol).as("fk_col"),
          lit(e.parent).as("parent_table"), lit(e.pkCol).as("pk_col"),
          col("n_child"), col("n_orphans"))
    }.reduce(_ unionAll _)
  }
}
