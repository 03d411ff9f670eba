package graft

import graft.ops.{MediaFile, MediaOps, TextOps}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payloads, typed Dataset, batched
  * per-partition decode (stubbed codec), shuffle-free plan.
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "hello world"),
    (2L, "a" * 100), // > BatchSize chars, still one row
    (3L, "")
  ).toDF("doc_id", "text")

  "documentsAsMedia" should "carry text bytes as binary with typed metadata" in {
    val ds = MediaOps.documentsAsMedia(spark, docs)
    val m = ds.collect().map(f => f.media_id -> f).toMap
    m(1L).bytes shouldBe "hello world".getBytes("UTF-8")
    m(1L).kind shouldBe "text"
    m(3L).bytes.length shouldBe 0
  }

  "extractMeta" should "decode deterministically and preserve counts" in {
    val ds = MediaOps.documentsAsMedia(spark, docs)
    val meta = MediaOps.extractMeta(ds).collect().map(x => x.media_id -> x).toMap
    meta.size shouldBe 3
    meta(1L).byte_len shouldBe 11
    // stub dimensions are in [16, 256) and reproducible
    val again = MediaOps.extractMeta(ds).collect().map(x => x.media_id -> x).toMap
    meta(1L).width shouldBe again(1L).width
    meta(1L).height shouldBe again(1L).height
    all(meta.values.map(_.width)) should (be >= 16 and be < 256)
  }

  it should "match the SQL-side polynomial checksum for ASCII payloads" in {
    val ds = MediaOps.documentsAsMedia(spark, docs)
    val fromTyped = MediaOps.extractMeta(ds).select("media_id", "checksum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromSql = docs.select(col("doc_id"), TextOps.polyHash(col("text")).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fromTyped shouldBe fromSql
  }

  it should "read REAL dimensions from genuine PNG payloads via imageio" in {
    // independent decode of the fixture bytes proves the pipeline path
    // reports what the actual image decoder sees, not the stub
    for (f <- MediaOps.pngFixtures) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.bytes))
      img should not be null
    }
    val meta = MediaOps.extractMeta(spark.createDataset(MediaOps.pngFixtures))
      .collect().map(m => m.media_id -> m).toMap
    meta(-1L).kind shouldBe "png"
    (meta(-1L).width, meta(-1L).height) shouldBe ((3, 2))
    (meta(-2L).width, meta(-2L).height) shouldBe ((5, 7))
    meta(-1L).byte_len shouldBe 73
    meta(-1L).checksum shouldBe 3971401771L
    meta(-2L).checksum shouldBe 3482111590L
    // the stub would have derived different (checksum-based) dimensions
    MediaOps.decodeStub(MediaOps.pngFixtures.head.bytes) should not be ((3, 2))
  }

  it should "read REAL rate/channels/bits/frames from genuine WAV payloads" in {
    val meta = MediaOps.extractAudioMeta(spark.createDataset(MediaOps.wavFixtures))
      .collect().map(m => m.media_id -> m).toMap
    meta(-3L).kind shouldBe "wav"
    (meta(-3L).sample_rate, meta(-3L).channels, meta(-3L).bits,
      meta(-3L).n_frames) shouldBe ((8000, 1, 16, 16L))
    meta(-3L).duration_ms shouldBe 2L
    // the second fixture hides its data chunk behind a LIST chunk — the
    // real RIFF walk must skip it (a stub could not know these values)
    (meta(-4L).sample_rate, meta(-4L).channels, meta(-4L).bits,
      meta(-4L).n_frames) shouldBe ((44100, 2, 8, 100L))
    MediaOps.audioStub(meta(-4L).checksum, 256)._1 should not be 44100
  }

  it should "fall back to the deterministic stub for non-WAV payloads" in {
    val m = MediaFile(7L, "audio", "not a wav at all, just bytes".getBytes)
    val got = MediaOps.extractAudioMeta(spark.createDataset(Seq(m)))
      .collect().head
    got.kind shouldBe "audio"
    val cs = MediaOps.byteChecksum(m.bytes)
    (got.sample_rate, got.channels, got.bits, got.n_frames) shouldBe {
      val (r, c, b, f) = MediaOps.audioStub(cs, m.bytes.length)
      (r, c, b, f)
    }
  }

  "MediaOps.thumbnails" should "decode, scale, re-encode, and round-trip real PNGs" in {
    val got = MediaOps.thumbnails(
        spark.createDataset(MediaOps.pngFixtures), maxDim = 16)
      .collect().sortBy(_.media_id)
    got.map(t => (t.media_id, t.w, t.h, t.tw, t.th)) shouldBe
      Array((-2L, 5, 7, 11, 16), (-1L, 3, 2, 16, 11))
    // the artifact is a genuine PNG and decodes back to the target dims
    got.foreach { t =>
      t.thumb_is_png shouldBe true
      (t.rt_w, t.rt_h) shouldBe (t.tw, t.th)
      t.thumb_bytes should be > 0
    }
    // nearest-neighbor + fixed encoder settings: bit-stable across runs
    val again = MediaOps.thumbnails(
        spark.createDataset(MediaOps.pngFixtures), maxDim = 16)
      .collect().sortBy(_.media_id)
    again.map(_.thumb_bytes) shouldBe got.map(_.thumb_bytes)
  }

  it should "drop non-image payloads instead of faking a transform" in {
    val mixed = MediaOps.pngFixtures :+
      MediaFile(9L, "text", "not an image".getBytes)
    MediaOps.thumbnails(spark.createDataset(mixed), maxDim = 8)
      .collect().map(_.media_id).sorted shouldBe Array(-2L, -1L)
  }

  "extractVideoMeta" should "read brand, timescale, duration, and the track census through the real box walk" in {
    val metas = MediaOps.extractVideoMeta(
        spark.createDataset(MediaOps.mp4Fixtures))
      .collect().map(m => m.media_id -> m).toMap
    println(s"MP4FIX a: len=${metas(-5L).byte_len} cs=${metas(-5L).checksum}")
    println(s"MP4FIX b: len=${metas(-6L).byte_len} cs=${metas(-6L).checksum}")
    val a = metas(-5L)
    a.kind shouldBe "mp4"
    a.brand shouldBe "isom"
    a.timescale shouldBe 1000
    a.duration_ms shouldBe 5000L
    (a.n_tracks, a.n_video, a.n_audio) shouldBe ((1, 1, 0))
    val b = metas(-6L)
    b.brand shouldBe "mp42"
    b.timescale shouldBe 600
    b.duration_ms shouldBe 2500L // v1 64-bit duration layout
    (b.n_tracks, b.n_video, b.n_audio) shouldBe ((2, 1, 1))
  }

  it should "fall back to the deterministic stub for non-MP4 payloads" in {
    val t = MediaFile(9L, "text", "not a video".getBytes)
    val m = MediaOps.extractVideoMeta(spark.createDataset(Seq(t, t)))
      .collect()
    m(0) shouldBe m(1) // deterministic
    m(0).kind shouldBe "text"
    m(0).timescale should be >= 600
  }

  it should "process in batches without shuffling" in {
    val many = (1L to 100L).map(i => MediaFile(i, "text", s"payload-$i".getBytes))
    val ds = spark.createDataset(many).repartition(4)
    val meta = MediaOps.extractMeta(ds)
    // mapPartitions adds NO exchange beyond the test's own repartition
    val plan = meta.queryExecution.executedPlan.toString
    plan.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
    meta.rdd.getNumPartitions shouldBe 4
    meta.count() shouldBe 100
  }
}
