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

  /** Ordered funnel progression per user: the earliest time each stage
    * completes STRICTLY AFTER the previous stage's completion (first
    * `stages(0)`, then the first `stages(1)` after it, ...). Set-valued
    * min recursion — no tie-breaking, so a SQL oracle replays it
    * exactly. Output: (user_id, t_1..t_n nullable epoch-micros, stage =
    * number of stages reached). Scale shape: one filtered min-aggregate
    * per stage (map-side combined) + one |users|-sized equi-join per
    * level — the event log streams once per stage, nothing larger than
    * the user set ever shuffles.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    var acc = e.where(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("us")).as("t_1"))
    for (k <- 2 to stages.length) {
      val prev = s"t_${k - 1}"
      val next = e.where(col("event_type") === stages(k - 1))
        .join(acc.select(col("user_id"), col(prev)), Seq("user_id"))
        .where(col("us") > col(prev))
        .groupBy("user_id").agg(min(col("us")).as(s"t_$k"))
      acc = acc.join(next.select(col("user_id"), col(s"t_$k")),
        Seq("user_id"), "left")
    }
    val stageCnt = (1 to stages.length)
      .map(k => when(col(s"t_$k").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("stage", stageCnt)
  }

  /** Weekly cohort retention: each user's cohort is the epoch-week of
    * their FIRST event; the cell (cohort_w, week) counts distinct
    * cohort users active that week. Weeks are integer epoch-micros
    * divisions (7·86400·10⁶), so both engines bucket identically.
    * Two aggregates + one |users|-sized join.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val e = events.select(col("user_id"),
      (unix_micros(col("ts")) / weekUs).cast("long").as("week"))
    val cohort = e.groupBy("user_id").agg(min(col("week")).as("cohort_w"))
    e.distinct().join(cohort, Seq("user_id"))
      .groupBy(col("cohort_w"), col("week"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
