package graft.viz

import java.util.Locale

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Chart export (reference airflow.py:674-690: pie of the flagship top-5
  * with percent labels, shipped to object storage).
  *
  * Spark-first analog: the chart INPUT is always a top-k aggregate — a
  * handful of rows by construction — so collecting it to the driver is
  * the correct move (the heavy aggregation already ran distributed). The
  * renderer is dependency-free deterministic SVG (no plotting library in
  * the container, and SVG is resolution-independent), and the writer goes
  * through the Hadoop FileSystem API, so the same call targets `file:/`
  * locally and `s3a://bucket/key` on a cluster — the reference's S3
  * upload with no boto-style client code.
  *
  * Colors are a fixed-order colorblind-validated categorical palette
  * (adjacent-pair CVD ΔE ≥ 8 under protan/deutan simulation); slice
  * identity is never color-alone — every slice carries a legend row and
  * an in-slice percent label in ink color.
  */
object Charts {

  /** Fixed categorical order; never cycled — >8 categories must be
    * folded into "Other" by the caller (a top-k input already is). */
  private val palette = Vector(
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948")

  private def fmt(d: Double): String = "%.2f".formatLocal(Locale.ROOT, d)

  /** Render (label, value) slices as an SVG pie with a side legend.
    * Deterministic: same input → same bytes. Non-positive values are
    * dropped (a share chart has no meaning for them). */
  def pieSvg(rows: Seq[(String, Double)], title: String, size: Int = 420): String = {
    val slices = rows.filter(_._2 > 0)
    require(slices.size <= palette.size, s"fold >${palette.size} categories into 'Other' first")
    val total = slices.map(_._2).sum
    val cx = size / 2.0
    val cy = size / 2.0 + 16
    val r = size / 2.0 - 40
    val sb = new StringBuilder
    val legendW = 320
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${size + legendW}" height="${size + 32}" font-family="sans-serif">"""
    sb ++= s"""<rect width="${size + legendW}" height="${size + 32}" fill="#fcfcfb"/>"""
    sb ++= s"""<text x="${(size + legendW) / 2}" y="22" text-anchor="middle" font-size="15" fill="#0b0b0b">${escape(title)}</text>"""
    if (total <= 0) {
      sb ++= s"""<text x="$cx" y="$cy" text-anchor="middle" font-size="13" fill="#52514e">no data</text></svg>"""
      return sb.toString
    }
    var angle = -math.Pi / 2 // 12 o'clock, clockwise
    slices.zipWithIndex.foreach { case ((label, v), i) =>
      val frac = v / total
      val a2 = angle + frac * 2 * math.Pi
      val (x1, y1) = (cx + r * math.cos(angle), cy + r * math.sin(angle))
      val (x2, y2) = (cx + r * math.cos(a2), cy + r * math.sin(a2))
      val large = if (frac > 0.5) 1 else 0
      // 2px surface-color stroke = the spacer gap between adjacent fills.
      val d =
        if (frac >= 0.999999) // single slice: the arc path degenerates
          s"M ${fmt(cx - r)} ${fmt(cy)} A ${fmt(r)} ${fmt(r)} 0 1 1 ${fmt(cx + r)} ${fmt(cy)} A ${fmt(r)} ${fmt(r)} 0 1 1 ${fmt(cx - r)} ${fmt(cy)} Z"
        else
          s"M ${fmt(cx)} ${fmt(cy)} L ${fmt(x1)} ${fmt(y1)} A ${fmt(r)} ${fmt(r)} 0 $large 1 ${fmt(x2)} ${fmt(y2)} Z"
      sb ++= s"""<path d="$d" fill="${palette(i)}" stroke="#fcfcfb" stroke-width="2"/>"""
      // In-slice percent (reference autopct='%.0f%%'), ink on white chip
      // for contrast relief; only when the slice is wide enough to hold it.
      if (frac >= 0.05) {
        val mid = angle + frac * math.Pi
        val (tx, ty) = (cx + r * 0.62 * math.cos(mid), cy + r * 0.62 * math.sin(mid))
        val pct = math.round(frac * 100)
        sb ++= s"""<text x="${fmt(tx)}" y="${fmt(ty)}" text-anchor="middle" font-size="12" fill="#0b0b0b" stroke="#fcfcfb" stroke-width="3" paint-order="stroke">$pct%</text>"""
      }
      angle = a2
    }
    // Legend: chip + label + exact percent, text in ink (never series color).
    slices.zipWithIndex.foreach { case ((label, v), i) =>
      val y = 48 + i * 24
      val pct = "%.1f".formatLocal(Locale.ROOT, v / total * 100)
      sb ++= s"""<rect x="${size + 8}" y="${y - 11}" width="12" height="12" rx="2" fill="${palette(i)}"/>"""
      sb ++= s"""<text x="${size + 26}" y="$y" font-size="12" fill="#0b0b0b">${escape(label)} — $pct%</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Collect a (small, top-k) two-column result and export it as an SVG
    * pie to any Hadoop-supported filesystem (`file:/`, `hdfs:/`,
    * `s3a://...` — the reference's S3 target). The caller is responsible
    * for `df` being a bounded aggregate; `maxRows` guards against
    * accidentally exporting an unaggregated table. */
  def exportPie(df: DataFrame, labelCol: String, valueCol: String,
                title: String, path: String, maxRows: Int = 8): Unit = {
    val rows = df.select(labelCol, valueCol).limit(maxRows + 1).collect()
    require(rows.length <= maxRows, s"chart input exceeds $maxRows rows — aggregate first")
    val slices = rows.map(r => (String.valueOf(r.get(0)), toDouble(r.get(1)))).toSeq
    writeString(df.sparkSession, pieSvg(slices, title), path)
  }

  /** Render one or more (x, y) series as an SVG line chart with a log₁₀
    * x-axis — the shape of a scale sweep (sf on x, suite ratio on y).
    * Deterministic: same input → same bytes. Points are marked and
    * value-labelled; an optional horizontal guide line (e.g. ratio = 1,
    * the engine-equals-baseline crossover) draws dashed in ink. */
  def lineSvgLogX(series: Seq[(String, Seq[(Double, Double)])], title: String,
                  xLabel: String, yLabel: String, guideY: Option[Double] = None,
                  w: Int = 640, h: Int = 400): String = {
    require(series.nonEmpty && series.forall(_._2.nonEmpty), "empty chart input")
    require(series.size <= palette.size, s"fold >${palette.size} series first")
    val pts = series.flatMap(_._2)
    require(pts.forall(_._1 > 0), "log x-axis needs positive x")
    val (x0, x1) = (math.log10(pts.map(_._1).min), math.log10(pts.map(_._1).max))
    val yMax = math.max(pts.map(_._2).max, guideY.getOrElse(0.0)) * 1.15
    val (mL, mR, mT, mB) = (56, 16, 40, 48)
    val (pw, ph) = (w - mL - mR, h - mT - mB)
    def px(x: Double) =
      mL + (if (x1 > x0) (math.log10(x) - x0) / (x1 - x0) else 0.5) * pw
    def py(y: Double) = mT + (1.0 - y / yMax) * ph
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" font-family="sans-serif">"""
    sb ++= s"""<rect width="$w" height="$h" fill="#fcfcfb"/>"""
    sb ++= s"""<text x="${w / 2}" y="22" text-anchor="middle" font-size="15" fill="#0b0b0b">${escape(title)}</text>"""
    // axes
    sb ++= s"""<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + ph}" stroke="#b5b4b0"/>"""
    sb ++= s"""<line x1="$mL" y1="${mT + ph}" x2="${mL + pw}" y2="${mT + ph}" stroke="#b5b4b0"/>"""
    sb ++= s"""<text x="${mL + pw / 2}" y="${h - 10}" text-anchor="middle" font-size="12" fill="#52514e">${escape(xLabel)}</text>"""
    sb ++= s"""<text x="16" y="${mT + ph / 2}" text-anchor="middle" font-size="12" fill="#52514e" transform="rotate(-90 16 ${mT + ph / 2})">${escape(yLabel)}</text>"""
    // x ticks at each distinct data x; y ticks at quarters
    pts.map(_._1).distinct.sorted.foreach { x =>
      sb ++= s"""<line x1="${fmt(px(x))}" y1="${mT + ph}" x2="${fmt(px(x))}" y2="${mT + ph + 4}" stroke="#b5b4b0"/>"""
      sb ++= s"""<text x="${fmt(px(x))}" y="${mT + ph + 18}" text-anchor="middle" font-size="11" fill="#52514e">${fmt(x)}</text>"""
    }
    (0 to 4).foreach { i =>
      val y = yMax * i / 4
      sb ++= s"""<text x="${mL - 6}" y="${fmt(py(y) + 4)}" text-anchor="end" font-size="11" fill="#52514e">${fmt(y)}</text>"""
      if (i > 0) sb ++= s"""<line x1="$mL" y1="${fmt(py(y))}" x2="${mL + pw}" y2="${fmt(py(y))}" stroke="#eceae6"/>"""
    }
    guideY.foreach { g =>
      sb ++= s"""<line x1="$mL" y1="${fmt(py(g))}" x2="${mL + pw}" y2="${fmt(py(g))}" stroke="#52514e" stroke-dasharray="5,4"/>"""
      sb ++= s"""<text x="${mL + pw - 4}" y="${fmt(py(g) - 6)}" text-anchor="end" font-size="11" fill="#52514e">${fmt(g)}</text>"""
    }
    series.zipWithIndex.foreach { case ((label, sPts), i) =>
      val sorted = sPts.sortBy(_._1)
      val path = sorted.map { case (x, y) => s"${fmt(px(x))},${fmt(py(y))}" }.mkString(" ")
      sb ++= s"""<polyline points="$path" fill="none" stroke="${palette(i)}" stroke-width="2"/>"""
      sorted.foreach { case (x, y) =>
        sb ++= s"""<circle cx="${fmt(px(x))}" cy="${fmt(py(y))}" r="3.5" fill="${palette(i)}"/>"""
        sb ++= s"""<text x="${fmt(px(x))}" y="${fmt(py(y) - 10)}" text-anchor="middle" font-size="11" fill="#0b0b0b" stroke="#fcfcfb" stroke-width="3" paint-order="stroke">${fmt(y)}</text>"""
      }
      sb ++= s"""<rect x="${mL + 10 + i * 150}" y="${mT - 12}" width="12" height="3" fill="${palette(i)}"/>"""
      sb ++= s"""<text x="${mL + 26 + i * 150}" y="${mT - 6}" font-size="11" fill="#0b0b0b">${escape(label)}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  private def toDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case other     => throw new IllegalArgumentException(s"non-numeric chart value: $other")
  }

  /** Write a small string artifact through the Hadoop FileSystem API —
    * the scheme in `path` picks the backend, exactly like a DataFrame
    * writer target. */
  def writeString(spark: org.apache.spark.sql.SparkSession, content: String,
                  path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}
