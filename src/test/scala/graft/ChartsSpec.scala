package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.viz.Charts

class ChartsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pieSvg renders one slice per positive value with percent labels") {
    val svg = Charts.pieSvg(Seq(("a", 50.0), ("b", 30.0), ("c", 20.0)), "T")
    assert(svg.count(_ == '%') >= 3) // in-slice pcts + legend pcts
    assert(Seq("a — 50.0%", "b — 30.0%", "c — 20.0%").forall(svg.contains))
    assert(svg.sliding(5).count(_ == "<path") == 3)
    // deterministic: same input, same bytes
    assert(svg == Charts.pieSvg(Seq(("a", 50.0), ("b", 30.0), ("c", 20.0)), "T"))
  }

  test("pieSvg handles a single 100% slice and escapes markup in labels") {
    val svg = Charts.pieSvg(Seq(("<all&only>", 7.0)), "Tt")
    assert(svg.contains("&lt;all&amp;only&gt; — 100.0%"))
    assert(svg.sliding(5).count(_ == "<path") == 1)
  }

  test("exportPie collects a top-k result and writes SVG via the Hadoop FS API") {
    val out = Files.createTempDirectory("graft_chart").toString + "/pie.svg"
    val df = Seq(("x", 3L), ("y", 1L)).toDF("who", "n")
    Charts.exportPie(df, "who", "n", "Shares", out)
    val svg = new String(Files.readAllBytes(Paths.get(out)), "UTF-8")
    assert(svg.startsWith("<svg") && svg.contains("Shares") && svg.contains("x — 75.0%"))
  }

  test("lineSvgLogX draws the scale-ratio curve with markers, labels and the crossover guide") {
    val pts = Seq(("spark/duckdb", Seq((0.1, 0.93), (1.0, 0.45), (10.0, 0.2))))
    val svg = Charts.lineSvgLogX(pts, "Suite ratio vs scale factor",
      "scale factor (log)", "ratio", guideY = Some(1.0))
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    assert(svg.contains("polyline") && svg.sliding(7).count(_ == "<circle") == 3)
    assert(Seq("0.93", "0.45", "0.20").forall(svg.contains)) // point labels
    assert(svg.contains("stroke-dasharray"))                  // guide line
    assert(svg == Charts.lineSvgLogX(pts, "Suite ratio vs scale factor",
      "scale factor (log)", "ratio", guideY = Some(1.0)))     // deterministic
    // log spacing: x(0.1)->x(1) distance equals x(1)->x(10)
    val xs = """cx="([0-9.]+)"""".r.findAllMatchIn(svg).map(_.group(1).toDouble).toSeq
    assert(math.abs((xs(1) - xs(0)) - (xs(2) - xs(1))) < 0.5, s"not log-spaced: $xs")
  }

  test("exportPie refuses an unaggregated (too large) input") {
    val big = spark.range(100).selectExpr("cast(id as string) as who", "id as n")
    intercept[IllegalArgumentException] {
      Charts.exportPie(big, "who", "n", "nope", "/tmp/graft_chart_refuse.svg")
    }
  }
}
