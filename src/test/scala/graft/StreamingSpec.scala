package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured-Streaming coverage through MemoryStream: watermarked
  * windowed aggregation (append mode — only finalized windows emit) and
  * mapGroupsWithState sessionization (update mode). */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts finalizes windows once the watermark passes") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    // windowedCounts speaks the events-table schema (event_type)
    val q = StreamOps.toMemorySink(
      StreamOps.windowedCounts(
        ms.toDF().withColumnRenamed("eventType", "event_type"),
        "10 minutes", "20 minutes"), "win_test")
    try {
      ms.addData(
        Event(1, ts("2024-01-01 00:01:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 00:04:00"), 2, "view", 2.0),
        Event(3, ts("2024-01-01 00:12:00"), 1, "click", 5.0))
      q.processAllAvailable()
      // nothing final yet — watermark has not passed the first window
      // (append mode holds windows open until watermark > window end)
      ms.addData(Event(9, ts("2024-01-01 01:00:00"), 3, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("win_test")
        .orderBy("w_start", "event_type").collect()
      assert(rows.length >= 2)
      val first = rows(0)
      assert(first.getTimestamp(0) == ts("2024-01-01 00:00:00"))
      assert(first.getString(1) == "view")
      assert(first.getLong(2) == 2L)
      assert(first.getDouble(3) == 3.0)
    } finally q.stop()
  }

  test("sessionizeStream adapts the raw events-table schema") {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val raw = ms.toDF()
      .withColumnRenamed("eventId", "event_id")
      .withColumnRenamed("userId", "user_id")
      .withColumnRenamed("eventType", "event_type")
    val q = StreamOps.toMemorySink(
      StreamOps.sessionizeStream(raw, gapMs = 60000L).toDF(), "sess_stream_test",
      OutputMode.Update())
    try {
      ms.addData(Event(1, ts("2024-01-01 00:00:10"), 9, "view", 2.0))
      q.processAllAvailable()
      val snap = spark.table("sess_stream_test").collect()
      assert(snap.length == 1 && snap(0).getLong(0) == 9L && snap(0).getLong(1) == 1L)
    } finally q.stop()
  }

  test("sessionize tracks per-user counters via mapGroupsWithState") {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    // event-time timeouts require a watermark on the input
    val q = StreamOps.toMemorySink(
      StreamOps.sessionize(ms.toDS().withWatermark("ts", "1 minute"), gapMs = 60000L).toDF(),
      "sess_test", OutputMode.Update())
    try {
      ms.addData(
        Event(1, ts("2024-01-01 00:00:10"), 7, "view", 1.5),
        Event(2, ts("2024-01-01 00:00:40"), 7, "click", 2.5),
        Event(3, ts("2024-01-01 00:00:20"), 8, "view", 1.0))
      q.processAllAvailable()
      val snap = spark.table("sess_test").orderBy("userId").collect()
      val u7 = snap.find(_.getLong(0) == 7L).get
      assert(u7.getLong(1) == 2L)          // nEvents
      assert(u7.getDouble(2) == 4.0)       // totalValue
      assert(u7.getTimestamp(3) == ts("2024-01-01 00:00:10"))
      assert(u7.getTimestamp(4) == ts("2024-01-01 00:00:40"))
      assert(snap.exists(_.getLong(0) == 8L))
    } finally q.stop()
  }
}
