package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media object: opaque bytes + typed metadata. Images/audio/video ride
  * through Spark as `binary` columns; decode/feature-extract runs batched
  * per partition so a real codec amortizes model/codec init per batch, not
  * per row (same batch shape as an Arrow/`mapInPandas` pipeline).
  */
final case class MediaFile(media_id: Long, kind: String, bytes: Array[Byte])

final case class MediaMeta(media_id: Long, kind: String, byte_len: Int,
                           width: Int, height: Int, checksum: Long)

/** Multimodal-column plumbing. The DECODE STEP IS A STUB: this environment
  * has no image/audio codecs, so `decodeStub` derives deterministic fake
  * dimensions from the bytes (clearly marked below). Everything around it —
  * binary schema, typed Dataset, per-partition batching, feature columns —
  * is real, tested, and shuffle-free.
  */
object MediaOps {

  val BatchSize = 32

  /** Rolling checksum over raw bytes: (h*31 + b) mod 2^32 — byte-level twin
    * of TextOps.polyHash (identical for ASCII payloads), so the oracle can
    * recompute it in SQL.
    */
  def byteChecksum(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xffL)) & 0xffffffffL
      i += 1
    }
    h
  }

  /** ??? REAL CODEC GOES HERE ??? — deterministic FAKE decode standing in
    * for an image decoder: "dimensions" are derived from the checksum. A
    * production build swaps this body for e.g. javax.imageio / ffmpeg and
    * keeps the exact signature and batching.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val h = byteChecksum(bytes)
    ((16 + (h % 240)).toInt, (16 + ((h >> 8) % 240)).toInt)
  }

  /** Batched per-partition decode + feature extraction. No shuffle: this
    * pipelines directly over the scan, and a real decoder would be
    * initialized once per batch (grouped iterator), not per row.
    */
  def extractMeta(ds: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // batch boundary = codec init boundary in a real pipeline
        batch.iterator.map { m =>
          val (w, h) = decodeStub(m.bytes)
          MediaMeta(m.media_id, m.kind, m.bytes.length, w, h, byteChecksum(m.bytes))
        }
      }
    }
  }

  /** Documents rendered as media files (text bytes as the opaque payload —
    * the driver testdata has no true image column, so text bytes stand in).
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaFile]
  }
}
