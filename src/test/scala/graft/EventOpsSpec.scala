package graft

import graft.ops.EventOps
import org.apache.spark.sql.functions._

/** Sessionization, funnel, and cohort analytics on crafted event logs
  * with known expected outputs.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "usec", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("usec")).as("ts"),
        col("user_id"), col("event_type"))

  private val M = 60L * 1000000L // one minute in micros

  "sessionize" should "split on gaps and number sessions per user in time order" in {
    val e = ev(
      (1L, 0L, 7L, "view"), (2L, 5 * M, 7L, "click"),   // session 1
      (3L, 60 * M, 7L, "view"),                          // session 2 (gap 55m)
      (4L, 0L, 8L, "view"))                              // other user
    val got = EventOps.sessionize(e, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    got((7L, 1L)) shouldBe ((2L, 0L, 5 * M, 5 * M))
    got((7L, 2L)) shouldBe ((1L, 60 * M, 60 * M, 0L))
    got((8L, 1L)) shouldBe ((1L, 0L, 0L, 0L))
    got.size shouldBe 3
  }

  it should "treat a gap of exactly the threshold as the same session" in {
    val e = ev((1L, 0L, 7L, "a"), (2L, 30 * M, 7L, "a"), (3L, 61 * M, 7L, "a"))
    val got = EventOps.sessionize(e, gapMinutes = 30)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    got shouldBe Map(1L -> 2L, 2L -> 1L) // 30m stays; 31m breaks
  }

  "funnel" should "require each stage strictly after the previous one" in {
    val e = ev(
      // user 1: full ordered funnel
      (1L, 0L, 1L, "view"), (2L, M, 1L, "click"), (3L, 2 * M, 1L, "purchase"),
      // user 2: purchase BEFORE the click -> stage 2 only
      (4L, 0L, 2L, "view"), (5L, 2 * M, 2L, "click"), (6L, M, 2L, "purchase"),
      // user 3: never clicks
      (7L, 0L, 3L, "view"), (8L, M, 3L, "purchase"),
      // user 4: no view at all -> absent
      (9L, 0L, 4L, "click"))
    val got = EventOps.funnel(e, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("stage")).toMap
    got shouldBe Map(1L -> 3, 2L -> 2, 3L -> 1)
  }

  "cohortRetention" should "bucket users by first-seen week and count active weeks" in {
    val W = 7L * 86400L * 1000000L
    val e = ev(
      (1L, 0L, 1L, "a"), (2L, W + M, 1L, "a"),      // cohort 0, active w0+w1
      (3L, W, 2L, "a"),                              // cohort 1, active w1
      (4L, W, 3L, "a"), (5L, 3 * W, 3L, "a"))        // cohort 1, w1+w3
    val got = EventOps.cohortRetention(e)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe Map((0L, 0L) -> 1L, (0L, 1L) -> 1L,
      (1L, 1L) -> 2L, (1L, 3L) -> 1L)
  }
}
