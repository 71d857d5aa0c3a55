package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (B85): repeatedly remove
  * nodes of degree < k until none remain; the surviving subgraph is the
  * k-core. The result is UNIQUE regardless of peel order (removing any
  * sub-k node never raises another node's degree), so parallel whole-graph
  * peeling converges to the same core a sequential algorithm finds —
  * PropertySpec checks exactly that against a brute-force sequential peel.
  *
  * Scale shape (the D6 components discipline): each round is one degree
  * aggregate + two semi-joins on the directed edge list, checkpointed to
  * cut the growing lineage; rounds are bounded by `maxIter` (each round
  * removes ≥1 node or terminates, and real graphs peel in a handful of
  * rounds — the peel count equals the graph's "degeneracy depth", ~5-20
  * even on web graphs). At 100 TB the edge list shuffles by node id each
  * round; nothing is ever collected to the driver.
  */
object KCore {

  /** `edges` = unique undirected pairs (u, v). Returns the k-core nodes
    * with their WITHIN-CORE degree. `reliable` swaps localCheckpoint for
    * a fault-tolerant checkpoint (cluster deployments; see D6).
    *
    * Throws `IllegalStateException` if the peel has not converged after
    * `maxIter` rounds: the survivors would then be a SUPERSET of the
    * k-core (sub-k nodes still present), and a silently-wrong core is
    * worse than a loud failure. Callers on pathological graphs raise
    * maxIter (peel depth = degeneracy depth, ~5-20 even on web graphs). */
  def kcore(edges: DataFrame, k: Int, maxIter: Int = 30,
            reliable: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val und = edges.select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
    // r17 (§2.3/§2.4): DEGREE-MAINTENANCE peel. The r16 shape re-derived
    // the full degree aggregate over the surviving 2|E|-row edge list and
    // re-materialized that edge list (two semi-joins + localCheckpoint +
    // count) EVERY round — at sf10 each round moved the whole graph to
    // remove a handful of nodes. Invariant instead: deg(u) = degree of u
    // within the survivor-induced subgraph. Each round removes the
    // deg < k nodes and DECREMENTS survivors by their edges into the
    // removed set — one pass over the immutable directed edge list
    // (joined against the node-dim removal set, which AQE broadcasts
    // while it fits) plus node-dim bookkeeping; the edge list itself is
    // materialized once and never rewritten. Removing a sub-k node never
    // raises another node's degree, so the peel is order-independent and
    // the maintained degrees equal a from-scratch recount by induction
    // (PropertySpec pins equality with a sequential brute-force peel).
    val cur = ckpt(und.unionAll(und.select(col("v").as("u"), col("u").as("v"))))
    var deg = ckpt(cur.groupBy("u").agg(count(lit(1)).as("dg")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val removed = ckpt(deg.filter(col("dg") < k).select("u"))
      if (removed.isEmpty) converged = true
      else {
        // per-survivor count of edges whose OTHER endpoint is removed:
        // the directed list carries (u,v) and (v,u), so one semi-join on
        // the target side counts every lost edge exactly once per owner
        val lost = cur
          .join(removed.select(col("u").as("v")), Seq("v"), "left_semi")
          .groupBy("u").agg(count(lit(1)).as("dec"))
        deg = ckpt(deg.filter(col("dg") >= k)
          .join(lost, Seq("u"), "left")
          .select(col("u"),
            (col("dg") - coalesce(col("dec"), lit(0L))).as("dg")))
      }
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"k-core peel did not converge in $maxIter rounds (k=$k); " +
          "result would contain sub-k nodes — raise maxIter")
    deg.select(col("u").as("node"), col("dg").as("core_degree"))
  }
}
