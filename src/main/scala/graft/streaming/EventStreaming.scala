package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream processing (SURVEY §2.10 extension point): the reference's
  * only stream is the per-transaction WebSocket status feed; here the same
  * event model gets the full Structured Streaming treatment — watermarked
  * tumbling-window aggregation and stateful gap sessionization — plus batch
  * twins of both so results are DuckDB-verifiable.
  */
object EventStreaming {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  final case class SessionState(startTs: Timestamp, lastTs: Timestamp, cnt: Long)

  // ------------------------------------------------------------- streaming

  /** Watermarked tumbling-window count/sum per event type. */
  def windowedAgg(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Watermarked SLIDING-window count/sum per event type: each event lands
    * in size/slide overlapping windows (Spark expands the assignment inside
    * the aggregation — no self-union). State is one row per open (window,
    * type), evicted by the watermark.
    */
  def slidingAgg(events: DataFrame, size: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Batch twin of [[slidingAgg]] — identical window assignment (epoch-
    * aligned starts every `slide`, each event in size/slide windows).
    */
  def slidingAggBatch(events: DataFrame, size: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events.groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Stateful gap-based sessionization via flatMapGroupsWithState: state =
    * (start, last, count) per user; an EVENT-time timeout (watermark-driven,
    * so batches are data-paced — a processing-time timeout would have the
    * engine spinning wall-clock wake-up batches) flushes idle sessions.
    * Within-batch events are sorted in the group — Structured Streaming
    * hands each trigger's rows unordered.
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event],
      gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val gapUs = gapMinutes * 60000000L
    // MICROSECOND-precision epoch (Timestamp.getTime is millis and would
    // merge sessions whose gap exceeds the threshold only by a sub-milli
    // fraction) — must match sessionizeBatch's unix_micros arithmetic
    def epochUs(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => SessionOut(userId, s.startTs, s.lastTs, s.cnt))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => epochUs(e.ts))
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if epochUs(e.ts) - epochUs(s.lastTs) <= gapUs =>
                  cur = Some(SessionState(s.startTs, e.ts, s.cnt + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.startTs, s.lastTs, s.cnt)
                  cur = Some(SessionState(e.ts, e.ts, 1L))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1L))
              }
            }
            cur.foreach(state.update)
            state.setTimeoutTimestamp(cur.map(_.lastTs.getTime + gapMs)
              .getOrElse(System.currentTimeMillis() + gapMs))
            closed.result().iterator
          }
        })
  }

  // ----------------------------------------------------------- batch twins

  /** Batch sessionization: lag + running sum of new-session flags — one
    * shuffle on user_id; window functions do the rest in-partition.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    // gap arithmetic at MICROSECOND precision on both sides (unix_micros in
    // Spark, epoch_ns // 1000 in DuckDB — both floor nanos to micros): full
    // timestamp precision is kept, so a real gap exceeding the threshold by
    // any sub-second fraction (e.g. 1800.8s vs a 30-min gap) splits the
    // session identically in both engines. The double cast handles
    // TIMESTAMP_NTZ (refuses a direct unix_micros); session tz is UTC, so
    // NTZ wall-clock → epoch matches DuckDB's naive-as-UTC epoch.
    val us = unix_micros(col("ts").cast("timestamp"))
    val flagged = events
      .withColumn("prev_us", lag(us, 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          us - col("prev_us") > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Batch tumbling-hour aggregation (twin of windowedAgg). */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  // ------------------------------------------------------ exactly-once dedup

  /** Streaming exact dedup: collapse at-least-once redelivery to
    * exactly-once by id, with state bounded by the watermark
    * (dropDuplicatesWithinWatermark — duplicates arriving within the
    * watermark horizon are dropped, state older than it is evicted, so
    * memory is O(ids per watermark window) instead of O(all ids ever)).
    * The ingestion-side twin of the corpus dedup family.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Batch twin: one hash-aggregate dedup by id. Redelivered rows are exact
    * copies, so any survivor is THE row — no precombine needed.
    */
  def dedupBatch(events: DataFrame, idCols: Seq[String]): DataFrame =
    events.dropDuplicates(idCols)

  // ------------------------------------------------- stream-stream join

  /** Watermarked stream-stream inner join — the attribution/conversion
    * shape: each left event pairs with the same user's right events from
    * the preceding `windowMinutes`. Both sides carry watermarks AND the
    * join condition bounds right-ts to a closed interval around left-ts, so
    * the state store provably evicts rows older than watermark + window
    * (without the time bound Spark would have to keep every row forever).
    * Physically: one hash shuffle of both streams on user_id, the interval
    * check runs inside the joiner — same plan family as the batch twin.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      windowMinutes: Int, watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("r_id"), col("user_id").as("__ruid"),
        col("ts").as("r_ts"))
    l.join(r,
        col("user_id") === col("__ruid") &&
          col("r_ts") <= col("l_ts") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select("l_id", "user_id", "l_ts", "r_id", "r_ts")
  }

  /** Batch twin: identical condition, no watermarks. The equi-key keeps it
    * a hash/sort-merge join on user_id (the interval is a join filter, not
    * the key) — never a nested loop over the cross product.
    */
  def intervalJoinBatch(left: DataFrame, right: DataFrame,
      windowMinutes: Int): DataFrame = {
    val l = left.select(col("event_id").as("l_id"), col("user_id"),
      col("ts").as("l_ts"))
    val r = right.select(col("event_id").as("r_id"), col("user_id").as("__ruid"),
      col("ts").as("r_ts"))
    l.join(r,
        col("user_id") === col("__ruid") &&
          col("r_ts") <= col("l_ts") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select("l_id", "user_id", "l_ts", "r_id", "r_ts")
  }
}
