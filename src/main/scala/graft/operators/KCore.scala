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
    var cur = ckpt(und.unionAll(und.select(col("v").as("u"), col("u").as("v"))))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val keep = cur.groupBy("u").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select("u")
      val next = ckpt(cur
        .join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi"))
      converged = next.count() == cur.count()
      cur = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"k-core peel did not converge in $maxIter rounds (k=$k); " +
          "result would contain sub-k nodes — raise maxIter")
    cur.groupBy("u").agg(count(lit(1)).as("core_degree"))
      .select(col("u").as("node"), col("core_degree"))
  }
}
