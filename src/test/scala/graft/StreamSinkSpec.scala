package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming file sink with checkpointing: output committed exactly once,
  * restart resumes from the checkpoint and processes only new input.
  */
class StreamSinkSpec extends SparkSpec {

  "file sink + checkpoint" should "resume without duplicating output" in {
    val base = "target/tmp-sink"
    val src = s"$base/src"
    val out = s"$base/out"
    val chk = s"$base/chk"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(base))

    val ev = Tables.events(spark, sfDir).select("ts", "user_id", "event_type", "value")
    val half = ev.count() / 2
    ev.limit(half.toInt).write.mode("overwrite").parquet(src)

    def runOnce(): Unit = {
      val q = EventStreams.fileStream(spark, src, ev.schema)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    val afterFirst = spark.read.parquet(out).count()
    afterFirst shouldBe half

    // second batch of input files, then RESTART from the same checkpoint
    ev.write.mode("overwrite").parquet(s"$base/all")
    val more = spark.read.parquet(s"$base/all").exceptAll(spark.read.parquet(src))
    more.write.mode("append").parquet(src)
    runOnce()
    val afterSecond = spark.read.parquet(out).count()
    afterSecond shouldBe ev.count() // everything exactly once, no dups
  }
}
