package graft

import org.apache.spark.sql.functions._

/** Sketch/approximate aggregates — no cross-engine oracle (algorithm-
  * specific), so accuracy is asserted here against exact counts.
  */
class AggSpec extends SparkSpec {

  "approx_count_distinct" should "stay within 5% of exact on testdata" in {
    val rows = SparkEntry.approxDistinct(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      math.abs(approx - exact) / exact should be < 0.05
    }
  }

  it should "be deterministic across runs" in {
    val a = SparkEntry.approxDistinct(spark, sfDir).collect().toSeq
    val b = SparkEntry.approxDistinct(spark, sfDir).collect().toSeq
    a shouldBe b
  }

  "percentile_approx" should "bracket the exact median" in {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val approx = o.agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val exact = o.select("o_totalprice").as[Double].collect().sorted
    val lo = exact((exact.length * 0.45).toInt)
    val hi = exact((exact.length * 0.55).toInt)
    approx should (be >= lo and be <= hi)
  }
}
