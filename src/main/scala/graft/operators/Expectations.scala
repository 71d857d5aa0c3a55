package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (SURVEY §2 A23) — the
  * rule-suite generalization of the reference's ad-hoc checks
  * (`countDistinct` airflow.py:57, random-sample eyeballing): a named
  * list of row-level predicates plus key-uniqueness, evaluated as ONE
  * aggregate report the pipeline can gate on.
  *
  * Shape: every row-level rule compiles to `sum(case when violated)`
  * inside a single aggregation — k rules cost ONE scan, not k
  * (Profiling's melt discipline applied to validation); uniqueness rides
  * the same aggregate as `count(*) - count(distinct key)`. Output is
  * rule-sized (one row per rule), so the report is a free broadcast to
  * whatever decides pass/fail. Referential rules are NOT row-local —
  * they're [[Integrity.checkFk]]'s per-edge anti-join, kept separate by
  * design.
  */
object Expectations {

  /** `rules` are (name, predicate) where the predicate is TRUE for rows
    * that PASS. Returns one row per rule ordered by name:
    * (rule, n_rows, n_violations, pass). Null predicate results count as
    * violations (a rule that can't evaluate did not pass). */
  def check(df: DataFrame, rules: Seq[(String, Column)],
            uniqueKeys: Seq[String] = Nil): DataFrame = {
    val ruleAggs = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$name")
    }
    val uniqAggs = uniqueKeys.map { k =>
      (count(lit(1)) - count_distinct(col(k))).as(s"__v_unique_$k")
    }
    val agg = df.agg(count(lit(1)).as("__n"),
      (ruleAggs ++ uniqAggs): _*)
    val names = rules.map(_._1) ++ uniqueKeys.map(k => s"unique_$k")
    val entries = names.map { name =>
      struct(lit(name).as("rule"), col(s"__v_$name").as("n_violations"))
    }
    agg.select(col("__n"), explode(array(entries: _*)).as("e"))
      .select(col("e.rule").as("rule"), col("__n").as("n_rows"),
        col("e.n_violations").as("n_violations"),
        (col("e.n_violations") === 0L).as("pass"))
      .orderBy("rule")
  }
}
