package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2 F1): the `events` table as an
  * unbounded stream. Batch equivalents of both aggregations are the
  * oracle-checked queries B5 (`q_events_tumbling`) and B6 (`q_sessionize`);
  * the streaming versions are spec-tested with MemoryStream.
  */
object Events {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  /** Per-user session state: (startMicros, endMicros, eventCount). A plain
    * tuple keeps the state encoder codegen-friendly. MICROsecond
    * precision: the batch twin (and its DuckDB oracle) carries parquet
    * µs timestamps, and the streaming operator must agree exactly —
    * `Timestamp.getTime` alone would truncate to ms and shift session
    * boundaries/starts by up to 999 µs. */
  private type SessionState = (Long, Long, Long)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** File-source stream over a directory of event parquet files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** File-source stream paced to `filesPerTrigger` files per micro-batch
    * (oldest modification time first). Multi-batch replay is what gives a
    * bounded run real WATERMARK SEMANTICS: the watermark only advances
    * between batches, so data arriving in a later batch can actually be
    * late relative to it — with the default single-batch drain nothing
    * ever is (Trigger.AvailableNow honors maxFilesPerTrigger). */
  def readEventStreamPaced(spark: SparkSession, dir: String,
                           filesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(dir)

  /** F1a — watermarked tumbling-window aggregation; the streaming twin of
    * q_events_tumbling. Append-mode emits a window only once its watermark
    * passes — at scale this is a partial-aggregated stateful op whose state
    * is bounded by (windows in flight × event types). */
  def tumblingCounts(events: DataFrame, window_ : String = "1 day",
                     watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** F1i — SLIDING (hopping) window aggregation: each event lands in
    * windowDuration/slideDuration overlapping windows (4 at the 1 day /
    * 6 h default). State is windows-in-flight × types, like tumbling but
    * ×overlap — the fan-out happens inside the window() expression, no
    * explode in the plan. */
  def slidingCounts(events: DataFrame, window_ : String = "1 day",
                    slide: String = "6 hours",
                    watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** F1e — declarative gap sessionization with the built-in
    * `session_window` (vs [[sessionize]]'s explicit
    * flatMapGroupsWithState): per (user, merged-gap-window) event count.
    * Append mode emits a session only once the watermark passes its end —
    * a session is CLOSED by silence, so the very last session per user
    * can only flush when later event-time arrives (the caller plants a
    * flush sentinel past end-of-stream for bounded replays; a live feed
    * just keeps its tail session in state, which is the correct online
    * behavior). State per user is the open sessions only — watermark
    * bounds it exactly like the tumbling case. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "0 seconds"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))

  /** F1b — gap-based sessionization with explicit state
    * (flatMapGroupsWithState + event-time timeout): the streaming twin of
    * q_sessionize. A session closes when the watermark passes its end+gap;
    * state per user is one (start, end, count) triple. */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val (start, end, n) = state.get
            state.remove()
            Iterator.single(Session(userId, fromMicros(start), fromMicros(end), n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some((start, end, n)) if t - end <= gapMillis * 1000L =>
                  cur = Some((start, math.max(end, t), n + 1))
                case Some((start, end, n)) =>
                  closed ::= Session(userId, fromMicros(start), fromMicros(end), n)
                  cur = Some((t, t, 1L))
                case None =>
                  cur = Some((t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s._2 / 1000L + gapMillis)
            }
            closed.reverseIterator
          }
      }
  }

  /** F1c — stream-stream join: each click joined to the same user's
    * purchases within the preceding hour. Both sides watermarked so the
    * join state is bounded: Spark drops click state older than the
    * watermark and purchase state older than watermark + range. */
  def clicksAfterPurchases(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select("click_id", "user_id", "click_ts", "purchase_ts", "purchase_value")
  }

  /** F1d — streaming exact dedup: keep the first occurrence of each key,
    * with state bounded by the watermark (`dropDuplicatesWithinWatermark`
    * evicts a key's state once the watermark passes it — without that,
    * dedup state on an unbounded stream grows forever). This is the
    * streaming twin of D1/A4: an ingest pipeline dedups events by id at
    * the door, before anything stateful downstream pays for duplicates. */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming sink helper: append to parquet with checkpointing. */
  def writeParquetStream(df: DataFrame, path: String, checkpoint: String) =
    df.writeStream.outputMode(OutputMode.Append())
      .format("parquet").option("path", path)
      .option("checkpointLocation", checkpoint)
}
