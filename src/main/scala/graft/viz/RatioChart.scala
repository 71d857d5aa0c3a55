package graft.viz

/** Writes the engine-vs-baseline scale curve (artifacts/ratio_vs_scale.svg)
  * — the one-glance summary of the architecture's thesis: the ratio falls
  * below 1.0 as data grows because shuffle-parallel plans amortize where a
  * single-node engine cannot.
  *
  * Usage: runMain graft.viz.RatioChart <out.svg> <sf> <ratio> [<sf> <ratio> ...]
  * e.g.   runMain graft.viz.RatioChart artifacts/ratio_vs_scale.svg \
  *          0.1 0.93 1 0.45 10 0.30
  * The (sf, ratio) pairs come from the committed BENCH / baseline artifact
  * pairs (matched-subset totals); pass them explicitly so the chart is a
  * pure function of reviewed numbers, not of whatever files lie around.
  */
object RatioChart {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3 && args.length % 2 == 1,
      "usage: RatioChart <out.svg> <sf> <ratio> [<sf> <ratio> ...]")
    val pts = args.drop(1).grouped(2).map(p => (p(0).toDouble, p(1).toDouble)).toSeq
    val svg = Charts.lineSvgLogX(
      Seq(("spark suite total / duckdb suite total", pts)),
      "graft vs DuckDB: matched-subset suite ratio by scale factor",
      "scale factor (log scale)", "ratio (<1.0 = graft faster)",
      guideY = Some(1.0))
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      svg.getBytes("UTF-8"))
    println(s"[ratio-chart] wrote ${args(0)} (${pts.size} points)")
  }
}
