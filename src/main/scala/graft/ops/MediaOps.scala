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

/** Multimodal-column plumbing. PNG/JPEG payloads take a REAL decode
  * (`javax.imageio`, JDK-only — no new dependencies); any other payload
  * falls back to `decodeStub`, the deterministic fake that stands in for
  * audio/video codecs this environment lacks. Everything around the codec
  * — binary schema, typed Dataset, per-partition batching, feature
  * columns — is real, tested, and shuffle-free.
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

  /** ??? NON-IMAGE CODECS GO HERE ??? — deterministic FAKE decode standing
    * in for the audio/video codecs this container lacks: "dimensions" are
    * derived from the checksum. PNG/JPEG do NOT route here — they get the
    * real `javax.imageio` decode below. A production build swaps this body
    * for ffmpeg etc. and keeps the exact signature and batching.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val h = byteChecksum(bytes)
    ((16 + (h % 240)).toInt, (16 + ((h >> 8) % 240)).toInt)
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** Decode one payload: REAL `javax.imageio` for PNG/JPEG (magic-number
    * sniff; kind is normalized to the detected format), the deterministic
    * fake for everything else. Returns (kind, width, height).
    */
  def decode(kind: String, bytes: Array[Byte]): (String, Int, Int) = {
    val image = isPng(bytes) || isJpeg(bytes)
    val decoded =
      if (!image) None
      else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    decoded match {
      case Some(img) =>
        (if (isPng(bytes)) "png" else "jpeg", img.getWidth, img.getHeight)
      case None =>
        val (w, h) = decodeStub(bytes)
        (kind, w, h)
    }
  }

  /** Batched per-partition decode + feature extraction. No shuffle: this
    * pipelines directly over the scan; the decoder's disk cache is off so
    * executor tasks never touch temp files (pure in-memory decode).
    */
  def extractMeta(ds: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(BatchSize).flatMap { batch =>
        // batch boundary = codec init boundary in a real pipeline
        batch.iterator.map { m =>
          val (kind, w, h) = decode(m.kind, m.bytes)
          MediaMeta(m.media_id, kind, m.bytes.length, w, h, byteChecksum(m.bytes))
        }
      }
    }
  }

  /** Two GENUINE binary image fixtures: hand-crafted minimal PNGs
    * (8-bit grayscale, fixed bytes, so byte length and checksum are
    * constants the oracle pins) whose dimensions the pipeline must read
    * through the real decoder — 3x2 and 5x7.
    */
  def pngFixtures: Seq[MediaFile] = {
    val b64 = java.util.Base64.getDecoder
    Seq(
      MediaFile(-1L, "image", b64.decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAMAAAACCAAAAAC4HznGAAAAEElEQVR42mNgUPVi4DYI" +
          "BQADLgEAzSyr6AAAAABJRU5ErkJggg==")),
      MediaFile(-2L, "image", b64.decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAUAAAAHCAAAAADlzNgyAAAAM0lEQVR42mNgUPXKn8LA" +
          "bRBaNZ9BzDqhdRWDolv2hK0MOoFlsw8wmMc0LjvN4JTes/EaAAU4DqIpBDQXAAAAAElF" +
          "TkSuQmCC")))
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
