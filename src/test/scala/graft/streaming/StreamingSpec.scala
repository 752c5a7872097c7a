package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.EventStreaming.Event

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fixture = Seq(
    Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
    Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
    Event(3, ts("2024-01-01 11:30:00"), 1, "view", 3.0), // > 30 min gap → new session
    Event(4, ts("2024-01-01 10:05:00"), 2, "click", 4.0))

  test("streaming windowed agg over a memory stream matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(fixture)
    val q = EventStreaming.windowedAgg(stream.toDF(), "1 hour", "10 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("win_out")
      .select(date_format(col("window.start"), "HH:mm").as("h"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("10:00", "click", 3L), ("11:00", "view", 1L)))
  }

  test("stateful streaming sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(fixture)
    val q = EventStreaming.sessionizeStream(spark, stream.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    q.stop()
    // user 1's first session (10:00-10:10) closes when the 11:30 event
    // arrives; the watermark then advances to 11:00, timing out user 2's
    // idle session (last event 10:05 + 30 min < watermark). User 1's second
    // session (11:30) stays open in state.
    val closed = spark.table("sess_out").as[EventStreaming.SessionOut].collect()
      .map(s => (s.user_id, s.n_events)).toSet
    assert(closed === Set((1L, 2L), (2L, 1L)))
  }

  test("streaming dedup collapses redelivered events to exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(fixture ++ fixture.take(2)) // redelivery of events 1,2
    val q = EventStreaming.dedupStream(stream.toDF(), Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 3L, 4L))
    // batch twin agrees
    val batch = EventStreaming.dedupBatch((fixture ++ fixture.take(2)).toDF(), Seq("event_id"))
    assert(batch.count() === 4)
  }

  test("batch sessionization matches hand-computed sessions") {
    val out = EventStreaming.sessionizeBatch(fixture.toDF(), gapMinutes = 30)
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq === Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("sliding-window agg: each event in two windows, streaming matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(fixture)
    val q = EventStreaming.slidingAgg(stream.toDF(), "1 hour", "30 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("slide_out").start()
    q.processAllAvailable()
    q.stop()
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val streamed = norm(spark.table("slide_out"))
    val batch = norm(EventStreaming.slidingAggBatch(fixture.toDF(), "1 hour", "30 minutes"))
    assert(streamed === batch)
    // all three clicks (10:00, 10:05, 10:10) land in BOTH covering windows
    assert(batch.contains(("09:30", "click", 3L)) && batch.contains(("10:00", "click", 3L)))
    assert(batch.contains(("11:00", "view", 1L)) && batch.contains(("11:30", "view", 1L)))
  }

  test("stream-stream interval join matches the batch twin on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = Seq(
      Event(10, ts("2024-01-01 10:30:00"), 1, "purchase", 0.0),
      Event(11, ts("2024-01-01 12:00:00"), 1, "purchase", 0.0),
      Event(12, ts("2024-01-01 10:30:00"), 2, "purchase", 0.0))
    val views = Seq(
      Event(20, ts("2024-01-01 10:10:00"), 1, "view", 0.0), // within 30 min of 10
      Event(21, ts("2024-01-01 09:30:00"), 1, "view", 0.0), // too early for 10
      Event(22, ts("2024-01-01 10:30:00"), 1, "view", 0.0), // simultaneous → matches 10
      Event(23, ts("2024-01-01 10:20:00"), 3, "view", 0.0)) // other user
    val ls = MemoryStream[Event]; val rs = MemoryStream[Event]
    ls.addData(purchases); rs.addData(views)
    val q = EventStreaming.intervalJoinStream(ls.toDF(), rs.toDF(), windowMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssj_out").select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === Set((10L, 20L), (10L, 22L)))
    val batch = EventStreaming.intervalJoinBatch(purchases.toDF(), views.toDF(), 30)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === streamed)
  }
}
