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
