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

final case class AudioMeta(media_id: Long, kind: String, byte_len: Int,
                           sample_rate: Int, channels: Int, bits: Int,
                           n_frames: Long, duration_ms: Long, checksum: Long)

final case class MediaThumb(media_id: Long, w: Int, h: Int,
                            tw: Int, th: Int, thumb_bytes: Int,
                            thumb_is_png: Boolean, rt_w: Int, rt_h: Int)

final case class VideoMeta(media_id: Long, kind: String, byte_len: Int,
                           brand: String, timescale: Int, duration_ms: Long,
                           n_tracks: Int, n_video: Int, n_audio: Int,
                           checksum: Long)

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

  /** REAL image transform pass, JDK-only end to end: decode
    * (`javax.imageio`) → scale to fit `maxDim` (nearest-neighbor — an
    * integer source-pixel mapping, deterministic across JVMs, unlike
    * area-averaging filters) → re-encode PNG → decode the artifact AGAIN
    * to verify it round-trips. Non-image payloads drop out (a thumbnail
    * of a stub is undefined). Same per-partition, shuffle-free batch
    * boundary as `extractMeta`; target dims are the exact arithmetic
    * `round(dim · maxDim / max(w, h))` an oracle can pin.
    */
  def thumbnails(ds: Dataset[MediaFile], maxDim: Int): Dataset[MediaThumb] = {
    import ds.sparkSession.implicits._
    require(maxDim >= 1, "need maxDim >= 1")
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val decoded =
          if (!isPng(m.bytes) && !isJpeg(m.bytes)) None
          else Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.bytes)))
        decoded.map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val s = maxDim.toDouble / math.max(w, h)
          val tw = math.max(1, math.round(w * s).toInt)
          val th = math.max(1, math.round(h * s).toInt)
          val out = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, tw, th, null)
          g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          val tb = baos.toByteArray
          val rt = Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(tb)))
          MediaThumb(m.media_id, w, h, tw, th, tb.length, isPng(tb),
            rt.map(_.getWidth).getOrElse(-1), rt.map(_.getHeight).getOrElse(-1))
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

  // ---------- Audio (WAV/RIFF — a REAL header parse, pure JDK) ----------

  private def isWav(b: Array[Byte]): Boolean =
    b.length > 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Parse a PCM WAV's RIFF chunks: (sampleRate, channels, bitsPerSample,
    * nFrames). Walks the chunk list (fmt may not directly precede data —
    * LIST/INFO chunks are common), so this is the real container walk a
    * production decoder performs before handing samples to a codec.
    */
  def parseWavMeta(b: Array[Byte]): (Int, Int, Int, Long) = {
    var i = 12
    var rate = 0; var channels = 0; var bits = 0; var blockAlign = 1
    var frames = 0L
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val sz = le32(b, i + 4)
      if (id == "fmt ") {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        blockAlign = math.max(le16(b, i + 20), 1)
        bits = le16(b, i + 22)
      } else if (id == "data") frames = sz / blockAlign
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    (rate, channels, bits, frames)
  }

  /** Deterministic FAKE audio header for non-WAV payloads (the container
    * has no mp3/flac codecs) — all integer arithmetic off the checksum,
    * so the SQL oracle replays it exactly. A production build swaps this
    * for the real codec and keeps the signature.
    */
  def audioStub(checksum: Long, byteLen: Int): (Int, Int, Int, Long) =
    ((8000 + (checksum % 36000)).toInt, (1 + ((checksum >> 8) % 2)).toInt,
      (8 * (1 + ((checksum >> 16) % 2))).toInt, byteLen.toLong)

  /** Batched per-partition audio metadata: WAV payloads get the REAL
    * RIFF parse, anything else the deterministic fake. duration_ms floors
    * (frames·1000)/rate in integer space (engine-portable).
    */
  def extractAudioMeta(ds: Dataset[MediaFile]): Dataset[AudioMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val cs = byteChecksum(m.bytes)
          val wav = isWav(m.bytes)
          val (rate, ch, bits, frames) =
            if (wav) parseWavMeta(m.bytes) else audioStub(cs, m.bytes.length)
          AudioMeta(m.media_id, if (wav) "wav" else m.kind, m.bytes.length,
            rate, ch, bits, frames,
            if (rate == 0) 0L else frames * 1000L / rate, cs)
        }
      }
    }
  }

  /** Two GENUINE PCM WAV fixtures (fixed bytes → pinned length/checksum;
    * the pipeline must read rate/channels/bits/frames through the real
    * RIFF walk): 8 kHz mono 16-bit with 16 ramp frames, and 44.1 kHz
    * stereo 8-bit with 100 frames behind a LIST chunk (exercises the
    * chunk skip).
    */
  def wavFixtures: Seq[MediaFile] = {
    def wav(rate: Int, channels: Int, bits: Int, nFrames: Int,
            extraChunk: Boolean): Array[Byte] = {
      val bytesPerSample = bits / 8
      val blockAlign = channels * bytesPerSample
      val dataLen = nFrames * blockAlign
      val listLen = if (extraChunk) 12 else 0 // "LIST" + size + 4-byte body
      val riffLen = 4 + 24 + listLen + 8 + dataLen
      val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort).putShort(channels.toShort).putInt(rate)
        .putInt(rate * blockAlign).putShort(blockAlign.toShort)
        .putShort(bits.toShort)
      if (extraChunk)
        bb.put("LIST".getBytes("US-ASCII")).putInt(4)
          .put("INFO".getBytes("US-ASCII"))
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < dataLen) { bb.put((i % 251).toByte); i += 1 }
      bb.array()
    }
    Seq(
      MediaFile(-3L, "audio", wav(8000, 1, 16, 16, extraChunk = false)),
      MediaFile(-4L, "audio", wav(44100, 2, 8, 100, extraChunk = true)))
  }

  // ------- Video (MP4 / ISO-BMFF — a REAL box walk, pure JDK) -------

  private def isMp4(b: Array[Byte]): Boolean =
    b.length > 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** Parse the MP4 container boxes a production pipeline reads before
    * touching any codec: ftyp's major brand, moov/mvhd's timescale and
    * duration (v0 32-bit and v1 64-bit layouts), and the trak census via
    * each mdia/hdlr handler type (`vide`/`soun`). The walk is
    * size-driven (64-bit largesize honored), so unknown boxes skip
    * cleanly. Returns (brand, timescale, durationMs, nTracks, nVideo,
    * nAudio).
    */
  def parseMp4Meta(b: Array[Byte]): (String, Int, Long, Int, Int, Int) = {
    var brand = ""
    var timescale = 0
    var duration = 0L
    var nTracks = 0; var nVideo = 0; var nAudio = 0
    def walk(from: Int, to: Int, depth: List[String]): Unit = {
      var i = from
      while (i + 8 <= to) {
        val sz0 = be32(b, i)
        val tp = new String(b, i + 4, 4, "US-ASCII")
        val (sz, hdr) =
          if (sz0 == 1L && i + 16 <= to) (be64(b, i + 8), 16)
          else if (sz0 == 0L) ((to - i).toLong, 8)
          else (sz0, 8)
        if (sz < hdr) return // malformed size: stop the walk
        val end = math.min(to.toLong, i + sz).toInt
        tp match {
          case "ftyp" if i + 12 <= to =>
            brand = new String(b, i + 8, 4, "US-ASCII")
          case "moov" => walk(i + hdr, end, "moov" :: depth)
          case "trak" => nTracks += 1; walk(i + hdr, end, "trak" :: depth)
          case "mdia" => walk(i + hdr, end, "mdia" :: depth)
          case "mvhd" if depth.headOption.contains("moov") =>
            val v = b(i + hdr) & 0xff
            if (v == 1) {
              timescale = be32(b, i + hdr + 4 + 16).toInt
              duration = be64(b, i + hdr + 4 + 20)
            } else {
              timescale = be32(b, i + hdr + 4 + 8).toInt
              duration = be32(b, i + hdr + 4 + 12)
            }
          case "hdlr" if depth.headOption.contains("mdia") =>
            val ht = new String(b, i + hdr + 8, 4, "US-ASCII")
            if (ht == "vide") nVideo += 1
            else if (ht == "soun") nAudio += 1
          case _ => ()
        }
        i = end
      }
    }
    walk(0, b.length, Nil)
    val durMs = if (timescale == 0) 0L else duration * 1000L / timescale
    (brand, timescale, durMs, nTracks, nVideo, nAudio)
  }

  /** Deterministic FAKE video header for non-MP4 payloads (no real video
    * codec in this container) — integer arithmetic off the checksum, so
    * the SQL oracle replays it. A production build swaps this for
    * ffprobe-style parsing and keeps the signature.
    */
  def videoStub(checksum: Long, byteLen: Int): (String, Int, Long, Int, Int, Int) = {
    val ts = (600 + (checksum % 59400)).toInt
    val tracks = (1 + ((checksum >> 8) % 3)).toInt
    ((if (checksum % 2 == 0) "fake" else "stub"), ts,
      byteLen.toLong * 1000L / ts, tracks,
      ((checksum >> 16) % 2).toInt, ((checksum >> 24) % 2).toInt)
  }

  /** Batched per-partition video metadata: MP4 payloads get the REAL
    * ISO-BMFF box walk, anything else the deterministic fake. Same
    * shuffle-free batch boundary as the image/audio extractors.
    */
  def extractVideoMeta(ds: Dataset[MediaFile]): Dataset[VideoMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val cs = byteChecksum(m.bytes)
          val mp4 = isMp4(m.bytes)
          val (brand, ts, durMs, tracks, nv, na) =
            if (mp4) parseMp4Meta(m.bytes) else videoStub(cs, m.bytes.length)
          VideoMeta(m.media_id, if (mp4) "mp4" else m.kind, m.bytes.length,
            brand, ts, durMs, tracks, nv, na, cs)
        }
      }
    }
  }

  /** Two GENUINE minimal MP4 fixtures (fixed bytes → pinned length and
    * checksum; the pipeline must read brand/timescale/duration/tracks
    * through the real box walk): an `isom` v0-mvhd file with one video
    * track, and an `mp42` v1-mvhd (64-bit duration layout) file with a
    * video and an audio track.
    */
  def mp4Fixtures: Seq[MediaFile] = {
    def box(tp: String, body: Array[Byte]*): Array[Byte] = {
      val len = 8 + body.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len) // big-endian by default
      bb.putInt(len).put(tp.getBytes("US-ASCII"))
      body.foreach(bb.put)
      bb.array()
    }
    def full(version: Int, payload: Array[Byte]): Array[Byte] =
      Array[Byte](version.toByte, 0, 0, 0) ++ payload
    def mvhd0(timescale: Int, duration: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(96)
      bb.putInt(0).putInt(0).putInt(timescale).putInt(duration)
      bb.putInt(0x00010000).putShort(0x0100.toShort) // rate, volume
      // reserved + matrix + pre_defined + next_track_id stay zero
      box("mvhd", full(0, bb.array()))
    }
    def mvhd1(timescale: Int, duration: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(108)
      bb.putLong(0L).putLong(0L).putInt(timescale).putLong(duration)
      bb.putInt(0x00010000).putShort(0x0100.toShort)
      box("mvhd", full(1, bb.array()))
    }
    def hdlr(ht: String): Array[Byte] =
      box("hdlr", full(0, Array[Byte](0, 0, 0, 0) ++
        ht.getBytes("US-ASCII") ++ new Array[Byte](13)))
    def trak(ht: String): Array[Byte] = box("trak", box("mdia", hdlr(ht)))
    def ftyp(brand: String): Array[Byte] =
      box("ftyp", brand.getBytes("US-ASCII") ++
        Array[Byte](0, 0, 2, 0) ++ brand.getBytes("US-ASCII"))
    val a = ftyp("isom") ++
      box("moov", mvhd0(1000, 5000), trak("vide")) ++
      box("mdat", Array.tabulate[Byte](24)(i => (i * 7 % 251).toByte))
    val bf = ftyp("mp42") ++
      box("moov", mvhd1(600, 1500L), trak("vide"), trak("soun")) ++
      box("mdat", Array.tabulate[Byte](40)(i => (i * 11 % 251).toByte))
    Seq(MediaFile(-5L, "video", a), MediaFile(-6L, "video", bf))
  }
}
