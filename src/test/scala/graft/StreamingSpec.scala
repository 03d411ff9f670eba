package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming end-to-end: MemoryStream source -> the same plan
  * builders the batch oracle checks -> memory sink.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  "tumbling" should "aggregate a stream with watermark into windows" in {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    src.addData(
      Event(ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(ts("2024-01-01 10:20:00"), 1, "click", 2.0),
      Event(ts("2024-01-01 11:10:00"), 2, "view", 3.0))
    val q = EventStreams.tumbling(src.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("tumbling_out")
      .select(date_format(col("w.start"), "HH:mm").as("w"), col("event_type"), col("cnt"), col("cents"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    rows shouldBe Set(("10:00", "click", 2L, 300L), ("11:00", "view", 1L, 300L))
  }

  "sessions" should "close a session after the gap and open a new one" in {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    src.addData(
      Event(ts("2024-01-01 09:00:00"), 7, "click", 1.0),
      Event(ts("2024-01-01 09:10:00"), 7, "click", 1.0), // same session
      Event(ts("2024-01-01 10:00:00"), 7, "click", 1.0)) // > 30 min later
    val q = EventStreams.sessions(src.toDF(), "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("sessions_out")
      .select(col("user_id"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    rows shouldBe Seq((7L, 1L), (7L, 2L))
  }

  "dedupWithinWatermark" should "drop duplicate keys inside the watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    src.addData(
      Event(ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(ts("2024-01-01 10:00:30"), 1, "click", 9.9), // dup key (user,type)
      Event(ts("2024-01-01 10:01:00"), 2, "view", 2.0))
    val q = EventStreams.dedupWithinWatermark(src.toDF(),
        Seq("user_id", "event_type"), "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    spark.table("dedup_out").count() shouldBe 2
  }

  "runningCounts" should "keep per-user state across batches" in {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.runningCounts(src.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode("update").start()
    src.addData(Event(ts("2024-01-01 10:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    src.addData(Event(ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(ts("2024-01-01 10:06:00"), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("running_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    last(1L) shouldBe 2L // state carried across the two batches
    last(2L) shouldBe 1L
  }

  "batch and streaming" should "agree on the tumbling aggregate" in {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(ts("2024-01-01 10:05:00"), 1, "click", 1.5),
      Event(ts("2024-01-01 10:45:00"), 2, "click", 2.5),
      Event(ts("2024-01-01 11:05:00"), 1, "view", 3.5))
    val batch = EventStreams.tumbling(events.toDF(), "1 hour", "1 hour")
      .select(col("w.start"), col("event_type"), col("cnt"), col("cents"))
      .collect().map(_.toSeq).toSet
    val src = MemoryStream[Event]
    src.addData(events: _*)
    val q = EventStreams.tumbling(src.toDF(), "1 hour", "1 hour")
      .writeStream.format("memory").queryName("agree_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("agree_out")
      .select(col("w.start"), col("event_type"), col("cnt"), col("cents"))
      .collect().map(_.toSeq).toSet
    streamed shouldBe batch
  }
}
