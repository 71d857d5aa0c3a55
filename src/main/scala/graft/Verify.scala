package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after round 4, where the driver's external timeout killed the
  * run during a degraded-CPU phase and the round recorded ZERO
  * correctness: (1) `oracle_sql.json` is written FIRST — it depends only
  * on `SparkEntry.oracleSql`, so a later kill still leaves every
  * already-dumped query comparable; (2) each query runs under
  * `Watchdog.runCapped`, so one stuck/degraded query costs at most the
  * cap, not the whole process budget.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // Optional extra args = restrict to these query names (local iteration).
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val spark = GraftSession.local("graft-verify", cpus)
    val cap = Watchdog.queryCapSec
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val res = Watchdog.runCapped(spark, name, cap) {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        res match {
          case Right(_)  => System.err.println(f"[verify] $name ok ($dt%.1f s)")
          case Left(why) => System.err.println(f"[verify] $name FAILED after $dt%.1f s: $why")
        }
        spark.catalog.clearCache() // per-query persists end here
      }
    spark.stop()
  }
}
