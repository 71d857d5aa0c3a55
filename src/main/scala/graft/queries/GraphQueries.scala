package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** SURVEY §2 group B (graph) — iterative graph analytics on the
  * aggregate-then-iterate pattern.
  *
  * The 100 TB shape: derive the edge list from the event log with ONE
  * windowed pass + ONE aggregation (the only stages that touch data-scale
  * input), then iterate on the aggregated graph — which is
  * vocabulary-sized (distinct node pairs), not event-sized. Iterations
  * are tiny broadcast joins; the data-scale work never repeats.
  * d_components (DedupQueries) is the same pattern with a different
  * fixpoint; PageRank adds weighted mass propagation.
  */
object GraphQueries {

  private val damp = 0.85
  private val iters = 10

  val all: Seq[QueryDef] = Seq(

    // B34 — PageRank over the event-type transition graph: nodes are
    // event types, edge weights are observed transition counts per user
    // session stream (same windowed extraction as q_transition_matrix),
    // damping 0.85, 10 fixed iterations from a uniform start. Every node
    // in this graph has in- and out-edges (the transition matrix is
    // dense), so no dangling-mass term is needed — documented semantics:
    // nodes = distinct sources. Both engines run the identical
    // fixed-iteration recurrence; sums are a handful of doubles per node,
    // within the driver's 9-significant-digit float compare.
    QueryDef.sql("q_pagerank",
      s"""WITH RECURSIVE
         |seq AS (SELECT event_type AS src,
         |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM events),
         |edges AS (SELECT src, dst, count(*) AS w FROM seq
         |          WHERE dst IS NOT NULL GROUP BY 1, 2),
         |outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
         |ep AS (SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.ow AS p
         |       FROM edges e JOIN outw o USING (src)),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |pr AS (
         |  SELECT 0 AS iter, node, 1.0 / (SELECT n FROM nn) AS r FROM nodes
         |  UNION ALL
         |  SELECT pr.iter + 1, ep.dst AS node,
         |    ${1 - damp} / (SELECT n FROM nn) + $damp * sum(pr.r * ep.p) AS r
         |  FROM pr JOIN ep ON pr.node = ep.src
         |  WHERE pr.iter < $iters
         |  GROUP BY pr.iter, ep.dst)
         |SELECT node, r AS pagerank FROM pr WHERE iter = $iters
         |ORDER BY node""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val edges = Tables.events(s, d)
        .select(col("event_type").as("src"), lead("event_type", 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val outw = edges.groupBy("src").agg(sum("w").as("ow"))
      // edge probabilities: a k²-row table for k event types. Persisting
      // would be overkill; it IS re-derived per iteration lazily, so pin
      // it once — the graph is the loop invariant.
      val ep = edges.join(outw, "src")
        .select(col("src"), col("dst"), (col("w").cast("double") / col("ow")).as("p"))
        .localCheckpoint(true)
      val nd = broadcast(ep.select(col("src").as("node")).distinct()
        .agg(count(lit(1)).as("n")))
      var pr = ep.select(col("src").as("node")).distinct()
        .crossJoin(nd).select(col("node"), (lit(1.0) / col("n")).as("r"))
      for (_ <- 1 to iters)
        pr = ep.join(pr, ep("src") === pr("node"))
          .groupBy(col("dst"))
          .agg(sum(col("r") * col("p")).as("contrib"))
          .crossJoin(nd)
          .select(col("dst").as("node"),
            (lit(1 - damp) / col("n") + lit(damp) * col("contrib")).as("r"))
      pr.select(col("node"), col("r").as("pagerank")).orderBy("node")
    }
  )
}
