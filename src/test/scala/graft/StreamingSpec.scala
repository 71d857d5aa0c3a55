package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, lit, min}
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

  test("streaming tumbling agg agrees with the oracled batch query on real events") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tumb_eq").toString
    val batchEvents = graft.sources.Tables.events(spark, TestSpark.sfDir)
    batchEvents.coalesce(1).write.parquet(s"$dir/events")
    val expected = SparkEntry.queries("q_events_tumbling")(spark, TestSpark.sfDir)
      .as[(String, String, Long, Double)].collect().toSet
    val counts = Events.tumblingCounts(
      spark.readStream.schema(Events.schema).parquet(s"$dir/events"))
    val q = counts.writeStream.format("memory").queryName("tumb_eq_test")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("tumb_eq_test")
        .select(
          org.apache.spark.sql.functions.date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n_events"), col("total_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(streamed == expected)
    } finally q.stop()
  }

  test("streaming sessionize agrees with the oracled batch sessionizer on real events") {
    import spark.implicits._
    // Stream the sf0.001 events table through the stateful sessionizer
    // and compare against the batch operator that q_sessionize's DuckDB
    // oracle verifies. The stream only EMITS a session once the
    // watermark passes its end+gap, so open tail sessions are expected
    // to be absent — every emitted session must match a batch session
    // exactly, and most batch sessions must have been emitted.
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_eq").toString
    val batchEvents = graft.sources.Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    batchEvents.coalesce(1).write.parquet(s"$dir/events")
    val gap = 1800000L
    val batchSessions = graft.operators.Sessionize
      .byGap(batchEvents.withColumn("props", lit("{}")), "user_id", "ts", "event_id", gap)
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val input = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Events.schema.filterNot(_.name == "props")))
      .parquet(s"$dir/events")
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
    val q = Events.sessionize(input, gap)
      .writeStream.format("memory").queryName("sess_eq_test")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("sess_eq_test")
        .select("user_id", "session_start", "n_events")
        .as[(Long, java.sql.Timestamp, Long)].collect().toSet
      assert(streamed.nonEmpty, "stream emitted no closed sessions")
      assert(streamed.subsetOf(batchSessions),
        s"streamed sessions not in batch: ${(streamed -- batchSessions).take(3)}")
      // the only batch sessions the stream may miss are unclosed tails:
      // at most one per user
      val users = batchSessions.map(_._1)
      assert((batchSessions -- streamed).size <= users.size)
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

  test("streaming foreachBatch MERGE composes to batch latest-per-user (F1h)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = TestSpark.sfDir
    val out = SparkEntry.queries("f_stream_upsert")(spark, d)
      .selectExpr("user_id", "last_ts", "last_type", "last_value")
      .collect()
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val expected = sources.Tables.events(spark, d)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .selectExpr("user_id", "ts AS last_ts", "event_type AS last_type", "value AS last_value")
      .orderBy("user_id").collect()
    assert(out.toSeq == expected.toSeq,
      "three incremental MERGEs must equal the one-shot window reduction")
  }
}
