package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (extension layer, SURVEY.md §7.3): image/audio/
 * video payloads are opaque `binary` columns with typed metadata beside
 * them. The Spark-side mechanics — schema, partition-parallel batch
 * processing via `mapPartitions`, bounded memory per task — are real and
 * tested. Codecs: IMAGE decode/resize and WAV-audio decode are REAL,
 * built on the JDK's own codecs (`javax.imageio`: PNG/JPEG/GIF/BMP;
 * `javax.sound.sampled`: WAV); AUDIO container metadata additionally
 * covers FLAC (STREAMINFO walk) and MP3 (MPEG frame-header walk), and
 * VIDEO metadata is a REAL MP4/ISO-BMFF box walk (all pure JVM — no
 * external libraries needed). Payloads none of those parse (synthetic
 * test bytes, corrupt files) fall back to the clearly-marked
 * deterministic stub with `decode_ok = false`, so the pipeline shape
 * still runs end-to-end on any input and every fallback is auditable.
 */
object Multimodal {

  /** Canonical multimodal record: payload + sidecar metadata. */
  final case class MediaRecord(
      doc_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      declared_w: Int, // metadata as declared upstream (may be 0/unknown)
      declared_h: Int)

  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      byte_len: Long,
      feature: Array[Float], // decoded feature vector
      decode_ok: Boolean) // false = stub fallback (auditable, never silent)

  /** Resize output: the record plus an explicit real-codec/stub marker. */
  final case class ResizedMedia(
      doc_id: Long,
      modality: String,
      payload: Array[Byte],
      declared_w: Int,
      declared_h: Int,
      decode_ok: Boolean) // false = stub fallback (auditable, never silent)

  /** Video container metadata from the MP4/ISO-BMFF box walk. */
  final case class VideoMeta(
      major_brand: String,
      timescale: Long,
      duration_sec: Double,
      width: Int, // largest track's presentation size (0 = no visual track)
      height: Int,
      tracks: Int)

  /** Synthesize a multimodal table from `documents` (texts as fake
    * payloads) — deterministic, schema-faithful stand-in for a real
    * binary-column table. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      (col("doc_id") % 640 + 1).cast("int").as("declared_w"),
      (col("doc_id") % 480 + 1).cast("int").as("declared_h"))

  /** Pure-column metadata extraction over the binary payload: length,
    * content digest, magic-prefix — pushdown/codegen friendly, no UDF. */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("modality"),
      length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("digest"),
      lower(hex(substring(col("payload"), 1, 4))).as("magic_hex"))

  /**
   * REAL image decode via the JDK codec (`javax.imageio` — PNG/JPEG/GIF/
   * BMP). 8-dim feature: normalized width/height, aspect ratio, global
   * mean gray, and a 2×2 grid of quadrant mean grays (subsampled to
   * ≤16×16 probes per quadrant so cost is O(1) per image regardless of
   * resolution). None when the payload is not a decodable image.
   */
  def decodeImage(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Float](8)
        out(0) = w / 4096.0f
        out(1) = h / 4096.0f
        out(2) = w.toFloat / h.toFloat
        def meanGray(x0: Int, y0: Int, x1: Int, y1: Int): Float = {
          val sx = math.max(1, (x1 - x0) / 16)
          val sy = math.max(1, (y1 - y0) / 16)
          var sum = 0.0
          var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              n += 1
              x += sx
            }
            y += sy
          }
          if (n == 0) 0.0f else (sum / n / 255.0).toFloat
        }
        out(3) = meanGray(0, 0, w, h)
        out(4) = meanGray(0, 0, w / 2, h / 2)
        out(5) = meanGray(w / 2, 0, w, h / 2)
        out(6) = meanGray(0, h / 2, w / 2, h)
        out(7) = meanGray(w / 2, h / 2, w, h)
        Some(out)
      }
    } catch { case _: Exception => None }

  /** REAL WAV-audio decode via `javax.sound.sampled` (ships with the
    * JDK): sample rate, channels, sample width, frame count → features.
    * None for payloads that are not parseable WAV. */
  def decodeWav(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val durationSec =
          if (fmt.getFrameRate > 0) frames / fmt.getFrameRate else 0.0f
        Some(Array(
          fmt.getSampleRate / 48000.0f,
          fmt.getChannels.toFloat,
          fmt.getSampleSizeInBits / 32.0f,
          frames / 1e6f,
          durationSec / 3600.0f,
          0.0f, 0.0f, 0.0f))
      } finally in.close()
    } catch { case _: Exception => None }

  // ---- FLAC / MP3 metadata (pure-JVM header walks over the public
  // container layouts — the same treatment MP4 gets below: the JDK
  // decodes neither, but a curation pass needs container metadata, not
  // samples) --------------------------------------------------------------

  /** Audio container metadata — the WAV/FLAC/MP3 counterpart of
    * [[VideoMeta]]. `frames` is total sample frames (FLAC/WAV) or MPEG
    * frames (MP3); `bits_per_sample` is 0 where the codec has none. */
  final case class AudioMeta(
      codec: String, // "wav" | "flac" | "mp3"
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      frames: Long,
      duration_sec: Double)

  /**
   * REAL FLAC metadata: `fLaC` magic, then the mandatory STREAMINFO
   * metadata block (type 0, ≥34 bytes) whose bytes 10-17 pack
   * 20-bit sample rate, 3-bit channels-1, 5-bit bits-per-sample-1 and a
   * 36-bit total-sample count (FLAC format spec / RFC 9639). Bounds-
   * checked; malformed input yields None.
   */
  def parseFlacMeta(p: Array[Byte]): Option[AudioMeta] =
    try {
      if (p.length < 42 || fourcc(p, 0) != "fLaC") return None
      var off = 4
      var out: Option[AudioMeta] = None
      var done = false
      while (!done && off + 4 <= p.length) {
        val hdr = p(off) & 0xff
        val last = (hdr & 0x80) != 0
        val btype = hdr & 0x7f
        val blen = ((p(off + 1) & 0xff) << 16) |
          ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
        val body = off + 4
        if (btype == 0 && blen >= 34 && body + 34 <= p.length) {
          val b10 = p(body + 10) & 0xffL
          val b11 = p(body + 11) & 0xffL
          val b12 = p(body + 12) & 0xffL
          val b13 = p(body + 13) & 0xffL
          val rate = ((b10 << 12) | (b11 << 4) | (b12 >> 4)).toInt
          val channels = (((b12 >> 1) & 0x7) + 1).toInt
          val bps = ((((b12 & 0x1) << 4) | (b13 >> 4)) + 1).toInt
          val total = ((b13 & 0x0fL) << 32) | ((p(body + 14) & 0xffL) << 24) |
            ((p(body + 15) & 0xffL) << 16) | ((p(body + 16) & 0xffL) << 8) |
            (p(body + 17) & 0xffL)
          if (rate > 0)
            out = Some(AudioMeta("flac", rate, channels, bps, total,
              total.toDouble / rate))
          done = true
        } else {
          done = last
          off = body + blen
        }
      }
      out
    } catch { case _: Exception => None }

  /**
   * REAL MP3 metadata: skips an ID3v2 tag (syncsafe size), then walks
   * Layer-III MPEG frame headers (11-bit sync, version/bitrate/
   * samplerate fields per the public MPEG-1/2 audio layout), summing
   * frame lengths (`samplesPerFrame/8 · bitrate / rate + padding`) for
   * an exact frame count and duration on CBR and VBR alike. Requires at
   * least one valid frame; trailing junk (e.g. an ID3v1 tag) ends the
   * walk without invalidating what was parsed.
   */
  def parseMp3Meta(p: Array[Byte]): Option[AudioMeta] =
    try {
      var off = 0
      if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
        off = 10 + (((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
          ((p(8) & 0x7f) << 7) | (p(9) & 0x7f))
        // ID3v2.4 footer flag (header byte 5, bit 4): the syncsafe size
        // covers neither the 10-byte header nor the 10-byte footer, so a
        // footered tag needs 10 more bytes skipped before frame sync
        if ((p(5) & 0x10) != 0) off += 10
      }
      val brMpeg1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320, 0)
      val brMpeg2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
        128, 144, 160, 0)
      var frames = 0L
      var samples = 0L
      var rate = 0
      var channels = 0
      var done = false
      while (!done && off + 4 <= p.length) {
        val b1 = p(off + 1) & 0xff
        val verBits = (b1 >> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        val layerBits = (b1 >> 1) & 0x3 // 1 = Layer III
        val b2 = p(off + 2) & 0xff
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        if ((p(off) & 0xff) != 0xff || (b1 & 0xe0) != 0xe0 ||
          layerBits != 1 || verBits == 1 || srIdx == 3 ||
          brIdx == 0 || brIdx == 15) {
          done = true // junk or free-format/reserved: stop the walk
        } else {
          val mpeg1 = verBits == 3
          val sr = (if (mpeg1) Array(44100, 48000, 32000)
                    else if (verBits == 2) Array(22050, 24000, 16000)
                    else Array(11025, 12000, 8000))(srIdx)
          val br = (if (mpeg1) brMpeg1 else brMpeg2)(brIdx) * 1000
          val spf = if (mpeg1) 1152 else 576
          val flen = spf / 8 * br / sr + ((b2 >> 1) & 0x1)
          channels = if (((p(off + 3) & 0xff) >> 6) == 3) 1 else 2
          rate = sr
          frames += 1
          samples += spf
          off += flen
        }
      }
      if (frames == 0 || rate == 0) None
      else Some(AudioMeta("mp3", rate, channels, 0, frames,
        samples.toDouble / rate))
    } catch { case _: Exception => None }

  /** WAV metadata through the JDK parser, in the shared [[AudioMeta]]
    * shape. */
  def parseWavMeta(p: Array[Byte]): Option[AudioMeta] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleRate <= 0) None
        else Some(AudioMeta("wav", fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, in.getFrameLength,
          in.getFrameLength / fmt.getFrameRate.toDouble))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Audio metadata dispatch: WAV (JDK), then FLAC, then MP3. */
  def parseAudioMeta(p: Array[Byte]): Option[AudioMeta] =
    parseWavMeta(p).orElse(parseFlacMeta(p)).orElse(parseMp3Meta(p))

  /** Row shape of [[extractAudioMeta]]. */
  final case class AudioMetaRow(
      doc_id: Long,
      codec: String,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      frames: Long,
      duration_sec: Double,
      decode_ok: Boolean)

  /** Column-level audio metadata over audio-modality rows — the
    * [[extractVideoMeta]] counterpart for WAV/FLAC/MP3. `decode_ok =
    * false` rows carry zeros — auditable, never silent. */
  def extractAudioMeta(media: DataFrame): Dataset[AudioMetaRow] = {
    implicit val enc = Encoders.product[AudioMetaRow]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.filter(col("modality") === "audio").as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          parseAudioMeta(r.payload) match {
            case Some(m) => AudioMetaRow(r.doc_id, m.codec, m.sample_rate,
              m.channels, m.bits_per_sample, m.frames, m.duration_sec,
              decode_ok = true)
            case None => AudioMetaRow(r.doc_id, "", 0, 0, 0, 0L, 0.0,
              decode_ok = false)
          }
        }
      }
  }

  /** FLAC/MP3 metadata → the 8-dim feature shape shared by all
    * modalities (same layout as the WAV path). */
  def decodeAudioMeta(payload: Array[Byte]): Option[Array[Float]] =
    parseFlacMeta(payload).orElse(parseMp3Meta(payload)).map { m =>
      Array(
        m.sample_rate / 48000.0f,
        m.channels.toFloat,
        m.bits_per_sample / 32.0f,
        m.frames / 1e6f,
        (m.duration_sec / 3600.0).toFloat,
        0.0f, 0.0f, 0.0f)
    }

  // ---- MP4 / ISO-BMFF metadata (pure-JVM box walk over the public
  // ISO/IEC 14496-12 layout; the JDK has no video codec, but container
  // metadata needs none) -------------------------------------------------

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /**
   * REAL video metadata via an MP4/ISO-BMFF box walk: `ftyp` (major
   * brand) + `moov`→`mvhd` (timescale, duration) + `trak`→`tkhd`
   * (presentation width/height, 16.16 fixed point). Handles 32/64-bit
   * box sizes and version-0/1 full boxes; every read is bounds-checked,
   * malformed input yields None. No frame decode — container metadata
   * only, which is what a 100 TB curation pass actually needs (duration/
   * dimension filters) before any GPU-side decode.
   */
  def parseMp4Meta(p: Array[Byte]): Option[VideoMeta] =
    try {
      if (p.length < 16) return None
      var brand: String = null
      var timescale = 0L
      var duration = -1L
      var w = 0
      var h = 0
      var tracks = 0
      def scan(start: Long, end: Long, depth: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          var size = be32(p, off.toInt)
          val typ = fourcc(p, off.toInt + 4)
          var hdr = 8L
          if (size == 1L && off + 16 <= end) {
            size = be64(p, off.toInt + 8); hdr = 16
          } else if (size == 0L) size = end - off
          if (size < hdr || off + size > end) return // malformed: stop
          val body = (off + hdr).toInt
          val blen = (size - hdr).toInt
          typ match {
            case "ftyp" if depth == 0 && blen >= 4 =>
              brand = fourcc(p, body)
            case "moov" | "trak" | "mdia" =>
              if (typ == "trak") tracks += 1
              scan(body, off + size, depth + 1)
            case "mvhd" if blen >= 20 =>
              val v = p(body) & 0xff
              if (v == 1 && blen >= 32) {
                timescale = be32(p, body + 20)
                duration = be64(p, body + 24)
              } else if (v == 0) {
                timescale = be32(p, body + 12)
                duration = be32(p, body + 16)
              }
            case "tkhd" =>
              val v = p(body) & 0xff
              val dimOff = 4 + (if (v == 1) 32 else 20) + 52
              if (blen >= dimOff + 8) {
                val tw = (be32(p, body + dimOff) >> 16).toInt
                val th = (be32(p, body + dimOff + 4) >> 16).toInt
                // compare as Long: 16.16 dims reach 65535 each, so the
                // Int product of a malformed track overflows and could
                // silently win the largest-track selection
                if (tw.toLong * th > w.toLong * h) { w = tw; h = th }
              }
            case _ => ()
          }
          off += size
        }
      }
      scan(0L, p.length.toLong, 0)
      if (brand == null || timescale <= 0 || duration < 0) None
      else Some(VideoMeta(brand, timescale,
        duration.toDouble / timescale, w, h, tracks))
    } catch { case _: Exception => None }

  /** Row shape of [[extractVideoMeta]]. */
  final case class VideoMetaRow(
      doc_id: Long,
      major_brand: String,
      timescale: Long,
      duration_sec: Double,
      width: Int,
      height: Int,
      tracks: Int,
      decode_ok: Boolean)

  /** Column-level video metadata over video-modality rows: the
    * `extractMeta`-style table for the MP4 path (brand, timescale,
    * duration, track dimensions), `decode_ok = false` rows carry zeros —
    * auditable, never silent. Partition-parallel, constant memory. */
  def extractVideoMeta(media: DataFrame): Dataset[VideoMetaRow] = {
    implicit val enc = Encoders.product[VideoMetaRow]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.filter(col("modality") === "video").as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          parseMp4Meta(r.payload) match {
            case Some(m) => VideoMetaRow(r.doc_id, m.major_brand, m.timescale,
              m.duration_sec, m.width, m.height, m.tracks, decode_ok = true)
            case None => VideoMetaRow(r.doc_id, "", 0L, 0.0, 0, 0, 0,
              decode_ok = false)
          }
        }
      }
  }

  /** MP4 metadata → the 8-dim feature shape shared by all modalities. */
  def decodeMp4(payload: Array[Byte]): Option[Array[Float]] =
    parseMp4Meta(payload).map { m =>
      Array(
        m.width / 4096.0f,
        m.height / 4096.0f,
        if (m.height > 0) m.width.toFloat / m.height else 0.0f,
        (m.duration_sec / 3600.0).toFloat,
        m.timescale / 1e6f,
        m.tracks.toFloat,
        0.0f, 0.0f)
    }

  /**
   * ===== STUB DECODE (fallback) =====
   * Deterministic fake for payloads the JDK codecs cannot decode (video —
   * no JDK codec exists — and synthetic test bytes): maps the first 8
   * payload bytes to a feature vector in [0,1). Clearly marked; the
   * real paths are [[decodeImage]]/[[decodeWav]] above.
   */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < 8) {
      out(i) = (if (i < payload.length) (payload(i) & 0xff) else 0) / 256.0f
      i += 1
    }
    out
  }

  /** Partition-parallel decode: `mapPartitions` so per-partition codec
    * setup is amortized; input stays an iterator (constant memory).
    * Dispatch: image → ImageIO, audio → WAV parser, video → MP4 box
    * walk; anything not decodable → the deterministic stub with
    * `decode_ok = false`, so fallbacks are countable at scale
    * (`filter(!$"decode_ok")`), never silent. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val real = r.modality match {
          case "image" => decodeImage(r.payload)
          case "audio" => decodeWav(r.payload)
            .orElse(decodeAudioMeta(r.payload)) // FLAC/MP3 header walk
          case "video" => decodeMp4(r.payload)
          case _ => None
        }
        MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong,
          real.getOrElse(decodeStub(r.payload)), real.isDefined)
      }
    }
  }

  /**
   * REAL image resize via the JDK: decode (ImageIO), scale into the
   * (targetW, targetH) bounding box preserving aspect ratio (bilinear,
   * never upscales), re-encode as PNG. Returns the new payload + actual
   * dimensions, or None when the payload is not a decodable image.
   */
  def resizeImageBytes(payload: Array[Byte], targetW: Int, targetH: Int)
      : Option[(Array[Byte], Int, Int)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val s = math.min(1.0,
          math.min(targetW.toDouble / w, targetH.toDouble / h))
        val nw = math.max(1, math.round(w * s).toInt)
        val nh = math.max(1, math.round(h * s).toInt)
        val dst = new java.awt.image.BufferedImage(nw, nh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        Some((bos.toByteArray, nw, nh))
      }
    } catch { case _: Exception => None }

  /**
   * ===== STUB RESIZE (fallback) =====
   * Deterministic fake "resize" for payloads ImageIO cannot decode: keeps
   * every `stride`-th byte where stride preserves the target/declared
   * pixel ratio — schema and batch mechanics are real. The real path is
   * [[resizeImageBytes]] above.
   */
  def resizeStub(payload: Array[Byte], declaredW: Int, declaredH: Int,
                 targetW: Int, targetH: Int): Array[Byte] = {
    val declared = math.max(declaredW * declaredH, 1).toLong
    val target = math.max(targetW * targetH, 1).toLong
    if (target >= declared || payload.isEmpty) return payload
    val keep = math.max((payload.length * target / declared).toInt, 1)
    val out = new Array[Byte](keep)
    var i = 0
    while (i < keep) {
      out(i) = payload((i.toLong * payload.length / keep).toInt)
      i += 1
    }
    out
  }

  /** Partition-parallel resize of image-modality rows to a bounding box;
    * non-image rows pass through untouched (`decode_ok = true` — nothing
    * to decode). Decodable images go through the real JDK
    * scale-and-reencode; everything else falls back to the deterministic
    * stub with `decode_ok = false`, so fallbacks are auditable at scale. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        if (r.modality != "image")
          ResizedMedia(r.doc_id, r.modality, r.payload,
            r.declared_w, r.declared_h, decode_ok = true)
        else resizeImageBytes(r.payload, targetW, targetH) match {
          case Some((bytes, nw, nh)) =>
            ResizedMedia(r.doc_id, r.modality, bytes, nw, nh, decode_ok = true)
          case None =>
            ResizedMedia(r.doc_id, r.modality,
              resizeStub(r.payload, r.declared_w, r.declared_h, targetW, targetH),
              math.min(r.declared_w, targetW), math.min(r.declared_h, targetH),
              decode_ok = false)
        }
      }
    }
  }

  /** Frame sampling for video-like payloads: split the payload into
    * `frames` fixed-size chunks, one output row per chunk — pure column
    * algebra (posexplode over substrings), fully distributed. */
  def frameSample(media: DataFrame, frames: Int): DataFrame = {
    val chunk = ceil(length(col("payload")).cast("double") / frames).cast("int")
    media
      .select(col("doc_id"), col("modality"), col("payload"), chunk.as("chunk"))
      .filter(col("chunk") > 0)
      .select(col("doc_id"), col("modality"),
        posexplode(expr(s"transform(sequence(0, $frames - 1)," +
          " f -> substring(payload, f * chunk + 1, chunk))")))
      .toDF("doc_id", "modality", "frame_no", "frame_bytes")
      .filter(length(col("frame_bytes")) > 0)
  }
}
