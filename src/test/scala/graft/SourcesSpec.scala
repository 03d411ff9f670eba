package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Source/sink formats beyond parquet (CSV, JSON, streaming file source):
  * write to target/, read back, verify content fidelity.
  */
class SourcesSpec extends SparkSpec {

  lazy val orders = Tables.orders(spark, sfDir)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  "csv" should "round-trip with header and schema inference" in {
    val dir = "target/tmp-csv"
    orders.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    back.count() shouldBe orders.count()
    val a = orders.select(sum(col("o_orderkey")), sum(round(col("o_totalprice") * 100, 0).cast("long"))).head()
    val b = back.select(sum(col("o_orderkey")), sum(round(col("o_totalprice") * 100, 0).cast("long"))).head()
    b shouldBe a
  }

  "json" should "round-trip lines with full fidelity" in {
    val dir = "target/tmp-json"
    orders.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    back.count() shouldBe orders.count()
    back.select(countDistinct("o_orderstatus")).head().getLong(0) shouldBe
      orders.select(countDistinct("o_orderstatus")).head().getLong(0)
  }

  "orc" should "round-trip with schema and predicate pushdown" in {
    val dir = "target/tmp-orc"
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    back.schema shouldBe orders.schema
    back.count() shouldBe orders.count()
    val filtered = back.where(col("o_orderstatus") === "F")
    // ORC scans expose pushed filters like parquet
    filtered.queryExecution.executedPlan.toString should include("PushedFilters")
    filtered.count() shouldBe orders.where(col("o_orderstatus") === "F").count()
  }

  "partitioned sink" should "prune partitions on read" in {
    val dir = "target/tmp-part"
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val one = spark.read.parquet(dir).where(col("o_orderstatus") === "F")
    one.queryExecution.executedPlan.toString should
      include regex "PartitionFilters: \\[[^\\]]*o_orderstatus"
    one.count() shouldBe orders.where(col("o_orderstatus") === "F").count()
  }

  "file stream source" should "produce the same windowed aggregate as batch" in {
    val dir = "target/tmp-stream-src"
    val ev = Tables.events(spark, sfDir).select("ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(dir)
    val batch = EventStreams.tumbling(ev, "1 hour", "1 hour")
      .select(col("w.start"), col("event_type"), col("cnt"), col("cents"))
      .collect().map(_.toSeq).toSet

    val stream = EventStreams.fileStream(spark, dir, ev.schema)
    val q = EventStreams.tumbling(stream, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("filestream_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("filestream_out")
      .select(col("w.start"), col("event_type"), col("cnt"), col("cents"))
      .collect().map(_.toSeq).toSet
    streamed shouldBe batch
  }
}
