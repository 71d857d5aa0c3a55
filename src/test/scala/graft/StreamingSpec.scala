package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Events
import graft.streaming.Events.Event

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling counts match the batch equivalent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = Events.tumblingCounts(input.toDF(), "1 day", "1 hour")
    val q = agg.writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 01:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 02:00:00"), 1, "click", 2.0),
        Event(3, ts("2024-01-02 01:00:00"), 2, "view", 3.0))
      q.processAllAvailable()
      val out = spark.table("tumbling_test")
        .selectExpr("event_type", "n_events", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(out == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("stream-stream join pairs clicks with in-window purchases (F1c)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val joined = Events.clicksAfterPurchases(input.toDF())
    val q = joined.writeStream.format("memory").queryName("ss_join_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "purchase", 50.0),
        Event(2, ts("2024-01-01 10:30:00"), 1, "click", 1.0),    // in window
        Event(3, ts("2024-01-01 11:30:00"), 1, "click", 1.0),    // past 1h
        Event(4, ts("2024-01-01 10:30:00"), 2, "click", 1.0))    // other user
      q.processAllAvailable()
      val out = spark.table("ss_join_test")
        .selectExpr("click_id", "purchase_value")
        .as[(Long, Double)].collect().toSet
      assert(out == Set((2L, 50.0)))
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence per key with watermark-bounded state (F1d)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = Events.dedupStream(input.toDF(), Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0), // same-batch dup
        Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0), // cross-batch dup
        Event(3, ts("2024-01-01 10:06:00"), 3, "click", 3.0))
      q.processAllAvailable()
      val out = spark.table("dedup_test").select("event_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("parquet streaming sink appends with checkpointing (G6 sink)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[Event]
    val q = Events.writeParquetStream(
      input.toDF().filter($"event_type" === "click"),
      s"$dir/out", s"$dir/ckpt").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
      assert(out.count() == 1 && out.select("event_id").as[Long].head() == 1L)
    } finally q.stop()
  }

  test("streaming sessionize closes sessions after the gap (event-time timeout)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Events.sessionize(input.toDS(), gapMillis = 1800000L)
    val q = sessions.writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // Second batch: an event far past the first session's gap+watermark
      // closes session 1 (either by gap-split or by event-time timeout).
      input.addData(Event(3, ts("2024-01-01 06:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(4, ts("2024-01-01 12:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("session_test")
        .selectExpr("user_id", "n_events").as[(Long, Long)].collect().toSet
      assert(out.contains((1L, 2L))) // the first two events formed one session
    } finally q.stop()
  }
}
