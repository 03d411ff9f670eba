package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-log analytics beyond the windowed aggregates: the
  * operators that need ORDER within a user's history, expressed as
  * window functions over one (user, time) partitioning so the whole
  * pipeline costs a single shuffle.
  */
object EventOps {

  /** Gap-based sessionization with ORDINAL session ids — the classic
    * lag + running-sum shape (a new session starts when the time since
    * the user's previous event exceeds `gapMinutes`), emitting one row
    * per (user, session) with exact integer stats. This complements the
    * engine's `session_window` gate: merged windows answer "when was
    * the user active"; ordinal ids are the JOIN KEY form downstream
    * attribution/funnel queries need ("the 3rd session", "events of the
    * session that converted").
    *
    * Determinism: event times compare in epoch MICROS (long), ties
    * break on event_id, and every output column is integer arithmetic —
    * a SQL oracle replays the recursion exactly. Scale shape: the lag
    * and the running sum share one (user_id; us, event_id) window
    * partitioning — ONE shuffle — and the per-session rollup is a
    * map-side-combined aggregate on top.
    *
    * Output: (user_id, session_no, n_events, start_us, end_us, dur_us),
    * session_no 1-based per user in time order.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    require(gapMinutes >= 1, "need gapMinutes >= 1")
    val gapUs = gapMinutes * 60L * 1000000L
    val e = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    val prev = lag(col("us"), 1).over(w)
    val withBrk = e.withColumn("brk",
      when(prev.isNull || col("us") - prev > gapUs, 1L).otherwise(0L))
    val sess = withBrk.withColumn("session_no",
      sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
  }
}
