package graft

import graft.ops.{TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Chunking, redaction, and centroid operators on hand-built inputs with
  * known expected outputs.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  "chunks" should "produce overlapping fixed-size windows" in {
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6 w7")).toDF("doc_id", "text")
    val rows = TextOps.chunks(docs, chunkSize = 4, overlap = 2)
      .orderBy("chunk_no")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq
    // step 2: starts 0, 2, 4, 6
    rows shouldBe Seq(
      (0, "w1 w2 w3 w4", 4),
      (1, "w3 w4 w5 w6", 4),
      (2, "w5 w6 w7", 3),
      (3, "w7", 1))
  }

  it should "emit a single chunk for short documents" in {
    val docs = Seq((1L, "only three words")).toDF("doc_id", "text")
    TextOps.chunks(docs, chunkSize = 32, overlap = 8).count() shouldBe 1L
  }

  "redact" should "mask emails, urls and long digit runs" in {
    val docs = Seq(
      (1L, "contact me at bob@example.com or https://ex.org/x?id=1 ref 123456 ok 123")
    ).toDF("doc_id", "text")
    val r = docs.select(
      TextOps.redact(col("text")).as("red"),
      TextOps.redactionCount(col("text")).as("n")).head()
    r.getString(0) shouldBe "contact me at <EMAIL> or <URL> ref <NUM> ok 123"
    r.getInt(1) shouldBe 3 // short digit run not counted
  }

  "dimCentroids" should "compute exact per-dimension means" in {
    val emb = Seq(
      (0L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, 4.0f)), // same bucket (mod 2)
      (1L, Seq(10.0f, 20.0f))
    ).toDF("vec_id", "embedding")
    val m = VectorOps.dimCentroids(emb, col("vec_id") % 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    m((0L, 1)) shouldBe 2.0 // (1+3)/2
    m((0L, 2)) shouldBe 3.0 // (2+4)/2
    m((1L, 1)) shouldBe 10.0
    m((1L, 2)) shouldBe 20.0
  }
}
