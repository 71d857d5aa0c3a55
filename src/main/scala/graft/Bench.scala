package graft

/** Driver-run benchmark: times every registered query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A warm-up run of the
  * flagship first absorbs session/codegen start-up so per-query numbers
  * measure the queries, not JVM warm-up. Optional args restrict to the
  * named queries (local iteration). Queries are timed in sorted-name
  * order (deterministic across runs).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only: Set[String] = args.toSet
    val spark = GraftSession.local("graft-bench", cpus)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () } // warm-up
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // Queries may persist reused intermediates; drop them so later
        // queries aren't timed against a polluted executor heap. Spark
        // reclaims shuffle/broadcast state via GC-triggered weak refs
        // (ContextCleaner), so force a GC or heavy queries' garbage is
        // paid for by whoever runs next.
        spark.catalog.clearCache()
        System.gc()
        name -> dt
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
