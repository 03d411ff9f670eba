package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming surface of the engine (absent in the reference —
  * SURVEY §2.6/§7.6 extension). Every builder here works identically on a
  * batch DataFrame (withWatermark is a no-op in batch), so the driver's
  * batch oracle checks the exact plan the stream runs.
  */
object EventStreams {

  final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  /** Streaming read of an events directory (parquet); schema must be
    * supplied explicitly for streaming sources.
    */
  def fileStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window counts/sums with a watermark for state eviction. */
  def tumbling(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))

  /** Sliding windows (each event lands in windowLen/slide windows). */
  def sliding(events: DataFrame, windowLen: String, slide: String,
              watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))

  /** Session windows per user (gap-based; session end = last event + gap). */
  def sessions(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))

  /** Stateful streaming dedup bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Custom stateful op: running per-user event count via
    * mapGroupsWithState (the KeyValueGroupedDataset state API).
    */
  def runningCounts(events: Dataset[Event]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          (user, n)
      }
  }

  /** Format a window-aggregate result for stable cross-engine comparison. */
  def formatted(agg: DataFrame, keyCol: String): DataFrame =
    agg.select(
      date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
      col(keyCol),
      col(if (agg.columns.contains("cnt")) "cnt" else "n_events"),
      (col("cents") / 100.0).as("sum_value"))
}
