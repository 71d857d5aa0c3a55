package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle string the driver
  * hash-compares against (SURVEY §4 determinism rules apply to both sides).
  *
  * CACHE CONTRACT: a query may `persist()` an intermediate it consumes
  * more than once (always dimension/vocabulary-bounded frames). Queries
  * return their DataFrame lazily, so they cannot unpersist after their
  * own final action — instead BOTH harness mains clear the catalog cache
  * after every query (Verify per attempt, Bench per timed run), which is
  * what keeps cached blocks from accumulating across a full suite run. A
  * caller embedding a single query in a long-lived session owns the same
  * duty: `spark.catalog.clearCache()` (or targeted unpersist) once the
  * result is consumed. */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
