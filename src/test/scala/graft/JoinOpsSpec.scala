package graft

import graft.ops.JoinOps
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:05"), 101.0),
    (2L, ts("2024-01-01 10:00:03"), 50.0)
  ).toDF("user_id", "q_ts", "price")

  lazy val trades = Seq(
    (10L, 1L, ts("2024-01-01 10:00:04")), // after 10:00:00 quote
    (11L, 1L, ts("2024-01-01 10:00:05")), // equal ts -> inclusive match
    (12L, 2L, ts("2024-01-01 10:00:01")), // before any quote for user 2
    (13L, 3L, ts("2024-01-01 10:00:09"))  // no quotes for user 3
  ).toDF("trade_id", "user_id", "t_ts")

  "asofJoin" should "pick the latest right row at or before the left time" in {
    val j = JoinOps.asofJoin(trades, quotes, Seq("user_id"),
      leftTime = "t_ts", rightTime = "q_ts",
      rightPayload = Seq("price", "q_ts"), how = "inner")
    val m = j.collect().map(r => r.getAs[Long]("trade_id") -> r.getAs[Double]("price")).toMap
    m(10L) shouldBe 100.0 // latest quote <= 10:00:04
    m(11L) shouldBe 101.0 // equal timestamp is inclusive
    m.keySet should not contain 12L // quote after trade -> no match
    m.keySet should not contain 13L // no quotes at all
  }

  it should "keep unmatched left rows with null payload when how=left" in {
    val j = JoinOps.asofJoin(trades, quotes, Seq("user_id"),
      "t_ts", "q_ts", Seq("price", "q_ts"), how = "left")
    j.count() shouldBe 4
    val row13 = j.where(col("trade_id") === 13L).head()
    row13.isNullAt(row13.fieldIndex("price")) shouldBe true
  }

  "rangeJoin" should "assign facts to their interval and broadcast the dim" in {
    val facts = Seq((1L, 5.0), (2L, 15.0), (3L, 100.0)).toDF("id", "v")
    val dims = Seq((0, 9, "low"), (10, 19, "high")).toDF("lo", "hi", "b")
    val j = JoinOps.rangeJoin(facts, dims, col("v"), col("lo"), col("hi"))
    val m = j.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("b")).toMap
    m shouldBe Map(1L -> "low", 2L -> "high") // 100.0 falls outside all
    j.queryExecution.executedPlan.toString should include("BroadcastNestedLoopJoin")
  }
}
