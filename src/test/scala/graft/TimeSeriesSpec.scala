package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dateSpine covers the bounds inclusively with no gaps") {
    val df = Seq(ts("2024-03-05 10:00:00"), ts("2024-03-01 03:00:00"),
      ts("2024-03-03 23:59:59")).toDF("ts")
    val days = TimeSeries.dateSpine(df, to_date(col("ts")))
      .orderBy("day").as[Date].collect().map(_.toString)
    assert(days.toSeq == Seq("2024-03-01", "2024-03-02", "2024-03-03",
      "2024-03-04", "2024-03-05"))
  }

  test("gapFill zero-fills counts and carries the last value forward") {
    val spine = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
      .toDF("d").select(col("d").cast("date").as("day"))
    val daily = Seq(("2024-01-02", 3L, 7.5), ("2024-01-04", 1L, 2.0))
      .toDF("d", "n", "v").select(col("d").cast("date").as("day"), col("n"), col("v"))
    val out = TimeSeries.gapFill(spine, daily, "n", "v")
      .orderBy("day").as[(Date, Long, Double)].collect()
      .map { case (d, n, v) => (d.toString, n, v) }
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 0.0),  // before first datum: zero, not null
      ("2024-01-02", 3L, 7.5),
      ("2024-01-03", 0L, 7.5),  // gap carries last value
      ("2024-01-04", 1L, 2.0)))
  }

  test("funnel honors stage order and the conversion window") {
    val ev = Seq(
      // u1 converts fully in order and in window
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      // u2 clicks BEFORE first view: click doesn't count
      (2L, "click", "2024-01-01 00:00:00"),
      (2L, "view", "2024-01-01 01:00:00"),
      // u3 clicks outside the 2h window
      (3L, "view", "2024-01-01 00:00:00"),
      (3L, "click", "2024-01-01 05:00:00"),
      // u4 purchases without clicking: stalls at view
      (4L, "view", "2024-01-01 00:00:00"),
      (4L, "purchase", "2024-01-01 00:30:00"))
      .toDF("user_id", "event_type", "t")
      .select(col("user_id"), col("event_type"), col("t").cast("timestamp").as("ts"))
    val out = TimeSeries.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), withinHours = 2)
      .orderBy("stage_idx").as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("view", 0L, 4L), ("click", 1L, 1L), ("purchase", 2L, 1L)))
  }

  test("funnel uses the earliest qualifying prior-stage event, not any") {
    // First view at 00:00; a later view at 10:00 must NOT re-open the
    // window for the 11:00 click.
    val ev = Seq(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"))
      .toDF("user_id", "event_type", "t")
      .select(col("user_id"), col("event_type"), col("t").cast("timestamp").as("ts"))
    val out = TimeSeries.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click"), withinHours = 2)
      .orderBy("stage_idx").as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("view", 0L, 1L), ("click", 1L, 0L)))
  }

  test("retention buckets by Monday week of first event") {
    val ev = Seq(
      // u1 first seen Tue Jan 2 (cohort Mon Jan 1), active again Jan 10 (week 1)
      (1L, "2024-01-02 09:00:00"),
      (1L, "2024-01-10 09:00:00"),
      // u2 first seen Jan 9 (cohort Mon Jan 8), never again
      (2L, "2024-01-09 12:00:00"))
      .toDF("user_id", "t")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"))
    val out = TimeSeries.retention(ev, "user_id", "ts")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(out == Set(
      ("2024-01-01", 0L, 1L, 1.0),
      ("2024-01-01", 1L, 1L, 1.0),
      ("2024-01-08", 0L, 1L, 1.0)))
  }

  test("rolling WAU credits a user for exactly 7 trailing days") {
    // One user active on Jan 1 only; another on Jan 10 keeps the range
    // open through Jan 10. User 1 must count toward Jan 1-7 and no later.
    val ev = Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-10 10:00:00"))
      .toDF("user_id", "t").select(col("user_id"), col("t").cast("timestamp").as("ts"))
    val ud = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val mx = ud.agg(max("day").as("mx"))
    val wau = ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("tday"))
      .crossJoin(broadcast(mx)).filter(col("tday") <= col("mx"))
      .groupBy(date_format(col("tday"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .as[(String, Long)].collect().toMap
    (1 to 7).foreach(i => assert(wau(f"2024-01-$i%02d") == 1L, s"day $i"))
    assert(!wau.contains("2024-01-08")) // nobody active, day absent
    assert(wau("2024-01-10") == 1L)
  }

  test("attribution credits the nearest preceding non-purchase touch") {
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (1L, 2L, "purchase", "2024-01-01 01:00:00"),  // → view
      (1L, 3L, "purchase", "2024-01-01 02:00:00"),  // still → view
      (2L, 4L, "purchase", "2024-01-01 00:00:00"),  // no touch → none
      (2L, 5L, "click", "2024-01-01 01:00:00"),
      (2L, 6L, "purchase", "2024-01-01 02:00:00"))  // → click
      .toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("t").cast("timestamp").as("ts"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = ev.select(col("event_type"),
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w).as("channel"))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("purchases"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("view" -> 2L, "none" -> 1L, "click" -> 1L))
  }

  test("transition matrix rows are proper distributions") {
    // Per source event type, outgoing probabilities must sum to 1 and
    // pair counts must equal the row total used for normalization.
    val out = SparkEntry.queries("q_transition_matrix")(spark, TestSpark.sfDir)
    import org.apache.spark.sql.functions.{sum => fsum}
    val rows = out.groupBy("src")
      .agg(fsum("prob").as("p"), fsum("n").as("n"))
      .as[(String, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, p, _) =>
      assert(math.abs(p - 1.0) < 1e-9, s"row $src sums to $p")
    }
  }

  test("funnel rejects an empty stage list and bad window") {
    val ev = Seq((1L, "view", ts("2024-01-01 00:00:00"))).toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      TimeSeries.funnel(ev, "user_id", "ts", "event_type", Nil, 1)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.funnel(ev, "user_id", "ts", "event_type", Seq("view"), 0)
    }
  }

  test("interpFill: interior gaps take the line, edges extend, single point fills flat") {
    import java.sql.Date
    val spine = (1 to 7).map(d => Date.valueOf(f"2024-01-$d%02d")).toDF("day")
    // known: day2=10, day5=40 → day3=20, day4=30; edges day1=10, day6=day7=40
    val daily = Seq((Date.valueOf("2024-01-02"), 10.0), (Date.valueOf("2024-01-05"), 40.0))
      .toDF("day", "v")
    val out = TimeSeries.interpFill(spine, daily, "v")
      .orderBy("day").as[(Date, Double)].collect().map(_._2).toSeq
    assert(out == Seq(10.0, 10.0, 20.0, 30.0, 40.0, 40.0, 40.0))
    // single known point: flat fill everywhere
    val one = Seq((Date.valueOf("2024-01-03"), 7.0)).toDF("day", "v")
    val flat = TimeSeries.interpFill(spine, one, "v")
      .as[(Date, Double)].collect().map(_._2).toSet
    assert(flat == Set(7.0))
  }
}
