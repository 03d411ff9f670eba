package graft

import graft.ops.SkewOps
import org.apache.spark.sql.functions._

/** Scale mechanics: salting produces identical results to plain joins/
  * aggregations while splitting hot keys; bucketed tables co-locate join
  * keys so the join plans without a shuffle.
  */
class SkewAndBucketSpec extends SparkSpec {
  import spark.implicits._

  "saltedJoin" should "equal the plain join on skewed data" in {
    // hot key: 90% of rows share key 1
    val big = (1L to 1000L).map(i => (if (i <= 900) 1L else i, i)).toDF("k", "payload")
    val small = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(big, small, Seq("k"), saltBy = col("payload"), salts = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    salted shouldBe plain
    plain.size shouldBe 901
  }

  "saltedAgg" should "equal the plain aggregation" in {
    val df = (1L to 1000L).map(i => (if (i <= 900) "hot" else s"k$i", i)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedAgg(df, Seq("k"), saltBy = col("v"), salts = 8)(
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      fin = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(_.toSeq).toSet
    salted shouldBe plain
  }

  "bucketed tables" should "join without a shuffle on the bucket key" in {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    // clean catalog AND location: the warehouse dir survives across JVMs
    // while the Derby metastore may not
    Seq("b_orders", "b_cust").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"target/spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    o.write.mode("overwrite").bucketBy(8, "o_custkey").saveAsTable("b_orders")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").saveAsTable("b_cust")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("b_orders")
        .join(spark.table("b_cust"), col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      // both sides bucketed on the join key with equal bucket counts:
      // Catalyst plans the sort-merge join with NO exchange
      plan should not include "Exchange hashpartitioning"
      j.count() shouldBe o.join(c, col("o_custkey") === col("c_custkey")).count()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
