package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column surface (EXT north-star).
  *
  * Media are opaque `binary` columns plus typed metadata — the layout a
  * 100 TB training-data lake uses (content-addressed blobs inline or as
  * object-store pointers, metadata columns for pruning). The decode
  * kernel is REAL for images: `javax.imageio` (in the JDK, fully
  * offline) decodes PNG/JPEG/BMP/GIF to pixels and featurizes an exact
  * integer luminance histogram. Bytes no reader accepts (corrupt blobs,
  * non-image media) degrade to a deterministic byte-arithmetic
  * stand-in rather than failing the job — the same
  * degrade-not-throw contract as the office parsers, flagged per row in
  * the `decoded` column so a pipeline can quarantine the failures.
  */
object MultimodalOps {

  /** Typed metadata extracted without decoding: cheap, prunable. */
  def withMetadata(df: DataFrame, binCol: String, nameCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(binCol)).cast("long").as("n_bytes"),
      lower(regexp_extract(col(nameCol), "\\.([a-zA-Z0-9]+)$", 1)).as("format"),
      sha2(col(binCol), 256).as("content_id")))

  /** Integer luminance of a packed sRGB pixel, 0..255 — BT.601 integer
    * weights (299/587/114 over 1000), exact for gray pixels. */
  private def luminance(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
    (r * 299 + g * 587 + b * 114) / 1000
  }

  /** Decode one image via ImageIO; None when no registered reader
    * accepts the bytes (corrupt input, or not an image at all). */
  private[operators] def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic PNG bytes for a solid-color image — the fixture
    * generator for decode tests and the synthetic-decode query (the
    * corpus has no real media; PNG is lossless so the decoded pixels are
    * bit-exact). JDK-only, offline. */
  def encodeSolidPng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, width, height) }
    finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode + featurize kernel: real `ImageIO` decode to pixels
    * (PNG/JPEG/BMP/GIF — every JDK-bundled reader), with width/height
    * from the decoded raster and an 8-bucket luminance histogram
    * normalized by pixel count (exact integer counts, one IEEE
    * division). Rows whose bytes no reader accepts keep the pipeline
    * alive with `decoded=false` and a deterministic byte-arithmetic
    * stand-in (first-byte dims + byte histogram ÷ n) — decode failure
    * must not kill a 100 TB ingest, and the flag lets downstream
    * quarantine instead of silently training on garbage.
    *
    * One kernel instance per partition (ImageIO's disk cache is
    * disabled once per JVM — executors must not thrash temp files),
    * rows processed in `batchSize` groups — the shape a vectorized
    * decoder wants; scanning pixels row-by-row bounds the working set
    * at O(width), not O(width·height). */
  def decodeAndFeaturize(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("decoded", BooleanType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false) // in-memory streams only, no temp files
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val (width, height, decoded, features) = decodeImage(bytes) match {
            case Some(img) =>
              val w = img.getWidth; val h = img.getHeight
              val hist = Array.fill(8)(0L)
              val rowBuf = new Array[Int](w)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, rowBuf, 0, w)
                var x = 0
                while (x < w) { hist(luminance(rowBuf(x)) / 32) += 1; x += 1 }
                y += 1
              }
              val nPix = w.toLong * h
              (w, h, true, hist.map(c => c.toDouble / math.max(nPix, 1L).toDouble))
            case None =>
              // degrade: deterministic stand-in from the raw bytes
              val n = bytes.length
              val w = 16 + (math.abs(bytes.headOption.getOrElse(0.toByte).toInt) % 64)
              val h = 16 + (n % 64)
              val hist = Array.fill(8)(0L)
              bytes.foreach(b => hist((b & 0xFF) / 32) += 1)
              (w, h, false, hist.map(c => c.toDouble / math.max(n, 1).toDouble))
          }
          Row.fromSeq(r.toSeq ++ Seq(width, height, decoded, features.toSeq))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame/sample selection on metadata only — no decode, prunable. */
  def sampleByContentId(df: DataFrame, keepOneIn: Int): DataFrame =
    df.filter(
      conv(substring(col("media_meta.content_id"), 1, 4), 16, 10).cast("long")
        % keepOneIn === 0)

  // ---- audio (WAV/RIFF PCM) ----------------------------------------------

  /** Decoded mono-collapsed PCM: rate + 16-bit samples (multi-channel
    * input keeps channel 0 — the feature extractor's view). */
  private[operators] final case class Wav(sampleRate: Int, samples: Array[Short])

  /** Parse WAV (RIFF) PCM-16 bytes: the "RIFF…WAVE" container, a chunk
    * walk to `fmt ` (must be format 1 = integer PCM, 16-bit) and
    * `data`. Pure byte arithmetic — JDK-only, same class of decoder as
    * the CFB/zip/Flate walkers. None on anything else (compressed
    * formats, truncated chunks, non-RIFF bytes). */
  private[operators] def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourCC(0) != "RIFF" || fourCC(8) != "WAVE") return None
    var off = 12
    var rate = 0; var channels = 0; var bits = 0
    var data: Option[(Int, Int)] = None // (offset, len)
    while (off + 8 <= bytes.length && (rate == 0 || data.isEmpty)) {
      val id = fourCC(off)
      val len = bb.getInt(off + 4)
      // long arithmetic: a length near Int.MaxValue must not wrap the
      // bounds check negative (→ multi-GB allocation or OOB read)
      if (len < 0 || off.toLong + 8L + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (len < 16 || bb.getShort(off + 8) != 1) return None // PCM only
          channels = bb.getShort(off + 10)
          rate = bb.getInt(off + 12)
          bits = bb.getShort(off + 22)
        case "data" => data = Some((off + 8, len))
        case _ => () // LIST/INFO/fact chunks skipped
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    data match {
      case Some((dOff, dLen)) if rate > 0 && channels > 0 && bits == 16 =>
        val frame = 2 * channels
        val n = dLen / frame
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = bb.getShort(dOff + i * frame); i += 1 } // channel 0
        Some(Wav(rate, out))
      case _ => None
    }
  }

  /** The q_multimodal_audio_quality fixture family, shared by the
    * query and the streaming-gate spec so the two can never drift:
    * `k = id%50` samples of digital silence, then a ±a square wave of
    * period `2 + id%14`, where `a = min(32767, 32000 + (id%10)·100)` —
    * docs with `id % 10 ∈ {8, 9}` clamp to 32767, i.e. CLIP. Total
    * `n = 800 + id%200` samples at 8 kHz. */
  def wavQualityFixture(id: Long): Array[Byte] = {
    val k = (id % 50).toInt
    val p = 2 + (id % 14).toInt
    val a = math.min(32767, 32000 + (id % 10).toInt * 100)
    val n = (800 + id % 200).toInt
    val samples = Array.tabulate[Short](n)(i =>
      if (i < k) 0
      else { val j = i - k; (if ((j / p) % 2 == 0) a else -a).toShort })
    encodeWavPcm16(8000, samples)
  }

  /** Deterministic WAV PCM-16 bytes — the fixture generator for audio
    * decode tests and the synthetic-decode query (PCM is lossless:
    * decoded samples are bit-exact). JDK-only, offline. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  // ---- animation (GIF) structural metadata — no LZW decode ---------------

  /** GIF structural metadata: frame count, NETSCAPE loop count, first
    * graphic-control delay. */
  private[operators] final case class GifMeta(
      width: Int, height: Int, nFrames: Int, loopCount: Int, firstDelayCs: Int)

  /** Walk a GIF87a/89a byte stream WITHOUT decoding LZW — header +
    * logical screen descriptor (skipping the global color table),
    * then blocks: extensions (0x21; the NETSCAPE application
    * extension carries the loop count, the graphic-control extension
    * the per-frame delay) and image descriptors (0x2C; local color
    * table + LZW sub-block chain skipped structurally) until the
    * 0x3B trailer. The animation-ledger walk a media lake runs before
    * deciding what to decode — same class as the MP4 box walk. None
    * on malformed structure (truncated sub-block chains, missing
    * trailer bounds). */
  private[operators] def gifMeta(bytes: Array[Byte]): Option[GifMeta] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8) // little-endian
    if (bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = u16(6); val h = u16(8)
    val packed = u8(10)
    var off = 13
    if ((packed & 0x80) != 0) off += 3 * (1 << ((packed & 0x07) + 1)) // global color table
    var frames = 0; var loop = -1; var firstDelay = -1
    /** Skip a 0-terminated sub-block chain; -1 on truncation. */
    def skipSubBlocks(start: Int): Int = {
      var o = start
      while (o < bytes.length && u8(o) != 0) o += 1 + u8(o)
      if (o >= bytes.length) -1 else o + 1
    }
    while (off < bytes.length && u8(off) != 0x3B) {
      u8(off) match {
        case 0x21 => // extension: label + sub-blocks
          if (off + 2 >= bytes.length) return None
          val label = u8(off + 1)
          if (label == 0xF9 && firstDelay < 0 && off + 5 < bytes.length)
            firstDelay = u16(off + 4) // GCE: delay in centiseconds
          // layout: 0x21 0xFF size=11 "NETSCAPE2.0" | subSize=3 id=1 lo hi | 0
          if (label == 0xFF && off + 17 < bytes.length &&
              new String(bytes, off + 3, 11,
                java.nio.charset.StandardCharsets.US_ASCII) == "NETSCAPE2.0" &&
              u8(off + 14) == 3 && u8(off + 15) == 1)
            loop = u16(off + 16)
          off = skipSubBlocks(off + 2) match { case -1 => return None; case o => o }
        case 0x2C => // image descriptor
          if (off + 10 >= bytes.length) return None
          val p = u8(off + 9)
          var o = off + 10
          if ((p & 0x80) != 0) o += 3 * (1 << ((p & 0x07) + 1)) // local color table
          if (o >= bytes.length) return None
          o += 1 // LZW minimum code size
          frames += 1
          off = skipSubBlocks(o) match { case -1 => return None; case x => x }
        case _ => return None // unknown block type: malformed
      }
    }
    if (off >= bytes.length) return None // no trailer
    Some(GifMeta(w, h, frames, loop, firstDelay))
  }

  /** Deterministic multi-frame GIF fixture: valid BLOCK STRUCTURE
    * (header, NETSCAPE loop extension, per-frame GCE + image
    * descriptor + sub-block chains) with placeholder LZW payloads —
    * the structural walker's input space, no pixel decode implied. */
  def encodeGifMeta(width: Int, height: Int, nFrames: Int, loopCount: Int,
      delayCs: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(width); le16(height)
    out.write(0x00); out.write(0); out.write(0) // no global color table
    // NETSCAPE application extension (loop count)
    out.write(0x21); out.write(0xFF); out.write(11)
    out.write("NETSCAPE2.0".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(3); out.write(1); le16(loopCount); out.write(0)
    for (f <- 0 until nFrames) {
      out.write(0x21); out.write(0xF9); out.write(4) // GCE
      out.write(0); le16(delayCs); out.write(0); out.write(0)
      out.write(0x2C) // image descriptor
      le16(0); le16(0); le16(width); le16(height); out.write(0)
      out.write(2) // LZW min code size
      out.write(3); out.write(f & 0xFF); out.write(0x44); out.write(0x01) // one 3-byte sub-block
      out.write(0) // chain terminator
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** GIF metadata kernel over a binary column — same batch shape and
    * degrade contract as every decoder here. */
  def gifMetadata(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("loop_count", IntegerType),
      StructField("first_delay_cs", IntegerType),
      StructField("parsed", BooleanType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val fields =
            (try gifMeta(bytes) catch { case scala.util.control.NonFatal(_) => None }) match {
              case Some(m) =>
                Seq(m.width, m.height, m.nFrames, m.loopCount, m.firstDelayCs, true)
              case None => Seq(0, 0, 0, -1, -1, false)
            }
          Row.fromSeq(r.toSeq ++ fields)
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- video (MP4/ISO-BMFF) metadata — no decode ------------------------

  /** Container-level video metadata. */
  private[operators] final case class Mp4Meta(
      timescale: Int, duration: Long, width: Int, height: Int)

  /** Walk an ISO-BMFF (MP4) box tree for `moov>mvhd` (timescale,
    * duration) and `moov>trak>tkhd` (presentation width/height, 16.16
    * fixed point). METADATA ONLY — no codec is touched; this is the
    * box-walk a 100 TB video lake runs to build prunable columns
    * before any frame is ever decoded. Version-0 and version-1 header
    * boxes both handled. None on anything that isn't BMFF or lacks the
    * boxes. */
  private[operators] def mp4Meta(bytes: Array[Byte]): Option[Mp4Meta] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    // (type, payloadOff, payloadEnd) children of [start, end)
    def boxes(start: Int, end: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var off = start
      while (off + 8 <= end) {
        val size = bb.getInt(off)
        val tpe = new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        // long arithmetic: a size near Int.MaxValue must not wrap the
        // bounds check negative and walk past the buffer
        if (size < 8 || off.toLong + size > end) return out.result() // corrupt tail: stop
        out += ((tpe, off + 8, off + size))
        off += size
      }
      out.result()
    }
    // every payload read below is bounds-guarded: a header box whose
    // payload is shorter than its version demands is corrupt → None
    if (bytes.length < 8) return None
    val top = boxes(0, bytes.length)
    if (!top.exists(_._1 == "ftyp")) return None
    top.find(_._1 == "moov").flatMap { case (_, mOff, mEnd) =>
      val kids = boxes(mOff, mEnd)
      val mvhd = kids.find(_._1 == "mvhd").flatMap { case (_, o, e) =>
        if (o >= e) None
        else {
          val v = bytes(o) & 0xFF
          if (v == 1 && o + 32 <= e) Some((bb.getInt(o + 20), bb.getLong(o + 24)))
          else if (v == 0 && o + 20 <= e)
            Some((bb.getInt(o + 12), bb.getInt(o + 16).toLong & 0xFFFFFFFFL))
          else None
        }
      }
      val tkhd = kids.find(_._1 == "trak").flatMap { case (_, tOff, tEnd) =>
        boxes(tOff, tEnd).find(_._1 == "tkhd").flatMap { case (_, o, e) =>
          if (o >= e) None
          else {
            val dimOff = if ((bytes(o) & 0xFF) == 1) o + 88 else o + 76 // 16.16 fixed w, h
            if (dimOff + 8 <= e) Some((bb.getInt(dimOff) >>> 16, bb.getInt(dimOff + 4) >>> 16))
            else None
          }
        }
      }
      (mvhd, tkhd) match {
        case (Some((ts, dur)), Some((w, h))) if ts > 0 => Some(Mp4Meta(ts, dur, w, h))
        case _ => None
      }
    }
  }

  /** Minimal valid BMFF fixture: ftyp + moov(mvhd + trak(tkhd)) —
    * exactly the boxes [[mp4Meta]] reads, version-0 headers. */
  def encodeMp4Meta(timescale: Int, duration: Int, width: Int, height: Int): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(8 + payload.length); bb.put(tpe.getBytes); bb.put(payload)
      bb.array()
    }
    val mvhd = java.nio.ByteBuffer.allocate(100).order(java.nio.ByteOrder.BIG_ENDIAN)
    mvhd.putInt(12, timescale); mvhd.putInt(16, duration)
    val tkhd = java.nio.ByteBuffer.allocate(84).order(java.nio.ByteOrder.BIG_ENDIAN)
    tkhd.putInt(76, width << 16); tkhd.putInt(80, height << 16)
    val ftyp = box("ftyp", "isom\u0000\u0000\u0002\u0000isom".getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1))
    val moov = box("moov", box("mvhd", mvhd.array()) ++
      box("trak", box("tkhd", tkhd.array())))
    ftyp ++ moov
  }

  /** Video metadata extraction kernel: [[mp4Meta]] per row, emitting
    * timescale/duration (+ exact-integer µs duration) and pixel
    * dimensions as prunable columns; non-BMFF bytes degrade with
    * `parsed=false` — the same keep-the-ingest-alive contract as the
    * decode kernels, with no codec dependency at all. */
  def extractVideoMeta(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("timescale", IntegerType),
      StructField("duration", LongType),
      StructField("duration_us", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("parsed", BooleanType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          // belt-and-braces: the walk is bounds-guarded, but a parse of
          // adversarial bytes must NEVER kill the ingest
          val meta =
            try mp4Meta(bytes) catch { case scala.util.control.NonFatal(_) => None }
          val fields = meta match {
            case Some(m) =>
              Seq(m.timescale, m.duration, m.duration * 1000000L / m.timescale,
                m.width, m.height, true)
            case None => Seq(0, 0L, 0L, 0, 0, false)
          }
          Row.fromSeq(r.toSeq ++ fields)
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- video frame/keyframe sampling (MP4 sample tables) -----------------

  /** The decode seek table recovered from `moov>trak>mdia`: media
    * timescale (mdhd), time-to-sample runs (stts) and 1-based sync
    * sample numbers (stss; None = every sample is a sync sample, per
    * ISO 14496-12 §8.6.2). */
  private[operators] final case class Mp4Frames(
      mediaTimescale: Int, stts: Array[(Int, Int)], stss: Option[Array[Int]])

  /** Walk `moov>trak>mdia>{mdhd, minf>stbl>{stts, stss}}` — still METADATA
    * ONLY (no codec): this is how a video lake plans frame-decode jobs,
    * by reading the sample tables to pick keyframe seek points before
    * any decoder runs. Bounds-guarded like [[mp4Meta]]; None on
    * anything malformed. Entry counts are capped against the box size
    * so a corrupt count cannot allocate unbounded arrays. */
  private[operators] def mp4FrameTable(bytes: Array[Byte]): Option[Mp4Frames] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    def boxes(start: Int, end: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var off = start
      while (off + 8 <= end) {
        val size = bb.getInt(off)
        val tpe = new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (size < 8 || off.toLong + size > end) return out.result()
        out += ((tpe, off + 8, off + size))
        off += size
      }
      out.result()
    }
    def child(parent: Option[(Int, Int)], tpe: String): Option[(Int, Int)] =
      parent.flatMap { case (o, e) => boxes(o, e).find(_._1 == tpe).map(b => (b._2, b._3)) }
    if (bytes.length < 8) return None
    val top = boxes(0, bytes.length)
    if (!top.exists(_._1 == "ftyp")) return None
    val moov = top.find(_._1 == "moov").map(b => (b._2, b._3))
    val mdia = child(child(moov, "trak"), "mdia")
    val stbl = child(child(mdia, "minf"), "stbl")
    val timescale = child(mdia, "mdhd").flatMap { case (o, e) =>
      if (o >= e) None
      else {
        val v = bytes(o) & 0xFF
        if (v == 1 && o + 24 <= e) Some(bb.getInt(o + 20))
        else if (v == 0 && o + 16 <= e) Some(bb.getInt(o + 12))
        else None
      }
    }
    val stts = child(stbl, "stts").flatMap { case (o, e) =>
      if (o + 8 > e) None
      else {
        val n = bb.getInt(o + 4)
        if (n < 0 || o + 8 + n.toLong * 8 > e) None
        else Some(Array.tabulate(n)(i =>
          (bb.getInt(o + 8 + i * 8), bb.getInt(o + 12 + i * 8))))
      }
    }
    // ABSENT stss = every sample is sync (valid per spec) — but a
    // PRESENT-yet-corrupt stss must fail the parse, not silently
    // reinterpret the file as all-keyframes
    val stss: Option[Option[Array[Int]]] = child(stbl, "stss") match {
      case None => Some(None)
      case Some((o, e)) =>
        if (o + 8 > e) None
        else {
          val n = bb.getInt(o + 4)
          if (n < 0 || o + 8 + n.toLong * 4 > e) None
          else Some(Some(Array.tabulate(n)(i => bb.getInt(o + 8 + i * 4))))
        }
    }
    (timescale, stts, stss) match {
      case (Some(ts), Some(entries), Some(syncs)) if ts > 0 &&
          entries.forall { case (c, dl) => c >= 0 && dl >= 0 } =>
        Some(Mp4Frames(ts, entries, syncs))
      case _ => None
    }
  }

  /** BMFF fixture with REAL sample tables: ftyp + moov(mvhd +
    * trak(tkhd + mdia(mdhd + minf(stbl(stts + stss))))) — uniform
    * `delta` ticks per frame, a sync sample every `keyframeGap` frames
    * starting at sample 1. Exactly the boxes [[mp4FrameTable]] reads. */
  def encodeMp4Frames(timescale: Int, nFrames: Int, delta: Int, keyframeGap: Int): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(8 + payload.length); bb.put(tpe.getBytes); bb.put(payload)
      bb.array()
    }
    val mvhd = java.nio.ByteBuffer.allocate(100).order(java.nio.ByteOrder.BIG_ENDIAN)
    mvhd.putInt(12, timescale); mvhd.putInt(16, nFrames * delta)
    val tkhd = java.nio.ByteBuffer.allocate(84).order(java.nio.ByteOrder.BIG_ENDIAN)
    tkhd.putInt(76, 320 << 16); tkhd.putInt(80, 240 << 16)
    val mdhd = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.BIG_ENDIAN)
    mdhd.putInt(12, timescale); mdhd.putInt(16, nFrames * delta)
    val stts = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.BIG_ENDIAN)
    stts.putInt(4, 1); stts.putInt(8, nFrames); stts.putInt(12, delta)
    val kfs = 1.to(nFrames, keyframeGap).toArray
    val stss = java.nio.ByteBuffer.allocate(8 + 4 * kfs.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    stss.putInt(4, kfs.length)
    kfs.zipWithIndex.foreach { case (s, i) => stss.putInt(8 + 4 * i, s) }
    val ftyp = box("ftyp", "isom\u0000\u0000\u0002\u0000isom".getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1))
    val stbl = box("stbl", box("stts", stts.array()) ++ box("stss", stss.array()))
    val mdia = box("mdia", box("mdhd", mdhd.array()) ++ box("minf", stbl))
    ftyp ++ box("moov", box("mvhd", mvhd.array()) ++
      box("trak", box("tkhd", tkhd.array()) ++ mdia))
  }

  /** Frame-sampling kernel: [[mp4FrameTable]] per row, emitting the
    * decode-planning columns — total frames, keyframe count, exact-µs
    * media duration, and the first `maxKeyframes` keyframe timestamps
    * (µs, comma-joined) as the seek list a downstream frame-decode job
    * consumes. All integer arithmetic (tick sums → µs by long
    * division), so a SQL oracle reproduces it bit-for-bit. Malformed
    * bytes degrade with `parsed=false` — never kill the ingest. */
  def sampleFrames(df: DataFrame, binCol: String, maxKeyframes: Int = 5,
      batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("media_timescale", IntegerType),
      StructField("n_frames", LongType),
      StructField("n_keyframes", LongType),
      StructField("duration_us", LongType),
      StructField("kf_sample_us", StringType),
      StructField("parsed", BooleanType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val table =
            try mp4FrameTable(bytes) catch { case scala.util.control.NonFatal(_) => None }
          val fields = table match {
            case Some(t) =>
              val nFrames = t.stts.map(_._1.toLong).sum
              val totalTicks = t.stts.map { case (c, dl) => c.toLong * dl }.sum
              // tick time of 1-based sample s under the stts runs
              def ticksBefore(s: Long): Long = {
                var remaining = s - 1; var ticks = 0L
                var i = 0
                while (i < t.stts.length && remaining > 0) {
                  val (c, dl) = t.stts(i)
                  val take = math.min(remaining, c.toLong)
                  ticks += take * dl; remaining -= take
                  i += 1
                }
                ticks
              }
              // (count, first-maxK samples) — never materialize nFrames
              // entries: a corrupt stts count must not allocate memory
              val (nKf, seekSamples) = t.stss match {
                case Some(syncs) =>
                  val v = syncs.toSeq.map(_.toLong).filter(s => s >= 1 && s <= nFrames)
                  (v.length.toLong, v.take(maxKeyframes))
                case None => // no stss: every sample is a sync sample
                  (nFrames, (1L to math.min(nFrames, maxKeyframes.toLong)).toSeq)
              }
              val seekUs = seekSamples
                .map(s => ticksBefore(s) * 1000000L / t.mediaTimescale)
              Seq(t.mediaTimescale, nFrames, nKf,
                totalTicks * 1000000L / t.mediaTimescale,
                seekUs.mkString(","), true)
            case None => Seq(0, 0L, 0L, 0L, "", false)
          }
          Row.fromSeq(r.toSeq ++ fields)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Audio decode + featurize kernel, the WAV sibling of
    * [[decodeAndFeaturize]]: real RIFF-PCM parse to samples, then
    * exact-integer features — sample count, µs duration, peak |ampl|,
    * sign crossings, Σ sample² — chosen so a DuckDB oracle can
    * reproduce them without any float summation. Undecodable bytes
    * degrade (`decoded=false`, zeroed features, byte count as
    * n_samples) instead of failing the ingest — same contract as the
    * image kernel. */
  def decodeAudioFeatures(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("duration_us", LongType),
      StructField("peak", IntegerType),
      StructField("zero_crossings", LongType),
      StructField("energy_sq", LongType),
      StructField("decoded", BooleanType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          // same degrade-not-throw belt-and-braces as the image kernel
          val wav =
            try decodeWav(bytes) catch { case scala.util.control.NonFatal(_) => None }
          val fields = wav match {
            case Some(w) =>
              var peak = 0; var zc = 0L; var energy = 0L
              var i = 0
              while (i < w.samples.length) {
                val s = w.samples(i).toInt
                val a = math.abs(s)
                if (a > peak) peak = a
                if (i > 0 && (s < 0) != (w.samples(i - 1).toInt < 0)) zc += 1
                energy += s.toLong * s
                i += 1
              }
              val durUs = w.samples.length.toLong * 1000000L / w.sampleRate
              Seq(w.sampleRate, w.samples.length.toLong, durUs, peak, zc, energy, true)
            case None =>
              Seq(0, bytes.length.toLong, 0L, 0, 0L, 0L, false)
          }
          Row.fromSeq(r.toSeq ++ fields)
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- image perceptual hash (dHash) -------------------------------------

  /** 64-bit difference hash (dHash) of a decoded image: luminance is
    * average-pooled onto a 9×8 grid with EXACT integer cell means
    * (floor boundaries `c·w/9`, `r·h/8`; sum ÷ count — no float
    * resampling, so the hash is bit-reproducible across JVMs and
    * expressible in a SQL oracle), then bit `r·8+c` is set iff
    * cell(r, c+1) > cell(r, c). Images smaller than the grid clamp each
    * cell to at least one pixel (cells overlap — still deterministic).
    *
    * This is the standard near-duplicate IMAGE signature for training
    * corpora: near-identical images (recompressed, slightly cropped)
    * collide or land within a small hamming distance, so exact
    * `groupBy(phash)` finds perceptual-dup clusters with one shuffle
    * and hamming-band blocking (16-bit sub-keys, as in the SimHash
    * text path) finds near-pairs without an all-pairs join. */
  /** Exact integer box-average downscale of the image's LUMINANCE to
    * an `outW`×`outH` grid (row-major): output cell (X, Y) is the
    * floor mean of its source block (floor boundaries `X·w/outW`,
    * `Y·h/outH`; sub-grid images clamp each block to ≥1 pixel, blocks
    * overlapping). No float resampling anywhere, so the result is
    * bit-reproducible across JVMs and closed-form for a SQL oracle.
    * Row-raster reads bound memory at O(w). */
  private[operators] def boxResizeGray(img: BufferedImage, outW: Int, outH: Int): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](outW * outH)
    val rowBuf = new Array[Int](w)
    var r = 0
    while (r < outH) {
      val y0 = r * h / outH
      val y1 = math.min(h, math.max(y0 + 1, (r + 1) * h / outH))
      val sums = new Array[Long](outW); val counts = new Array[Long](outW)
      var y = y0
      while (y < y1) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var c = 0
        while (c < outW) {
          val x0 = c * w / outW
          val x1 = math.min(w, math.max(x0 + 1, (c + 1) * w / outW))
          var x = x0
          while (x < x1) { sums(c) += luminance(rowBuf(x)); x += 1 }
          counts(c) += x1 - x0
          c += 1
        }
        y += 1
      }
      var c = 0
      while (c < outW) {
        out(r * outW + c) = (sums(c) / math.max(counts(c), 1L)).toInt
        c += 1
      }
      r += 1
    }
    out
  }

  private[operators] def dHash64(img: BufferedImage): Long = {
    // dHash = difference bits over the 9×8 box-average grid
    val cells = boxResizeGray(img, 9, 8)
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c + 1) > cells(r * 9 + c)) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Resize kernel — the model-input-prep operator (thumbnails, fixed
    * input rasters): real decode, [[boxResizeGray]] to the target
    * grid, then a lossless grayscale PNG re-encode of the resized
    * raster plus an exact luminance checksum (`sum_lum` = Σ of resized
    * cell values — the integer a SQL oracle can reproduce; the PNG
    * bytes are for downstream consumers and verified by decode in the
    * spec). Undecodable bytes degrade (`decoded=false`, null bytes,
    * zero checksum) — same contract as every kernel here. */
  def resizeImages(df: DataFrame, binCol: String, outW: Int, outH: Int,
      batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("out_width", IntegerType, nullable = false),
      StructField("out_height", IntegerType, nullable = false),
      StructField("resized_png", BinaryType),
      StructField("sum_lum", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val fields = decodeImage(bytes) match {
            case Some(img) =>
              val grid = boxResizeGray(img, outW, outH)
              val small = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
              var i = 0
              while (i < grid.length) {
                val g = grid(i)
                small.setRGB(i % outW, i / outW, (g << 16) | (g << 8) | g)
                i += 1
              }
              val png = new ByteArrayOutputStream()
              ImageIO.write(small, "png", png)
              var sum = 0L
              i = 0
              while (i < grid.length) { sum += grid(i); i += 1 }
              Seq(outW, outH, png.toByteArray, sum, true)
            case None =>
              Seq(outW, outH, null, 0L, false)
          }
          Row.fromSeq(r.toSeq ++ fields)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** FNV-1a 64-bit over raw bytes — the deterministic degrade signature
    * for bytes no image reader accepts. */
  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xFFL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Perceptual-hash kernel: real `ImageIO` decode → [[dHash64]], same
    * mapPartitions batch shape and degrade contract as
    * [[decodeAndFeaturize]] (undecodable bytes keep the pipeline alive
    * with `decoded=false` and an FNV-1a byte hash, so corrupt media
    * still dedup exactly among themselves without poisoning the
    * perceptual clusters). */
  def perceptualHash(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("decoded", BooleanType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val fields = decodeImage(bytes) match {
            case Some(img) => Seq(img.getWidth, img.getHeight, true, dHash64(img))
            case None      => Seq(0, 0, false, fnv64(bytes))
          }
          Row.fromSeq(r.toSeq ++ fields)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic vertical-stripe PNG — the fixture generator for the
    * perceptual-hash query: column `x` is the solid gray
    * `(base + x·31) mod 256`, so every pooled cell mean (and therefore
    * the dHash) has a closed form a SQL oracle can reproduce. */
  def encodeStripePng(width: Int, height: Int, base: Int): Array[Byte] =
    encodeBandedStripePng(width, height, Array(base))

  /** Multi-band stripe PNG: the image is split into `bases.length`
    * equal horizontal bands, band `i` a stripe gradient from
    * `bases(i)` — gives the dHash DISTINCT row bytes per band, so
    * hamming distances between fixtures are non-trivial while staying
    * closed-form. `step` is the per-column gray increment; a NEGATIVE
    * step reverses the gradient (the "corrupted media" fixture for the
    * consistency screen — ascending and descending stripes can never
    * share a difference byte unless flat). */
  def encodeBandedStripePng(width: Int, height: Int, bases: Array[Int],
      step: Int = 31): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    // images shorter than the band count degenerate to 1-row bands
    // (the min() below then clamps to the last base) instead of
    // dividing by zero
    val bandH = math.max(1, height / bases.length)
    var y = 0
    while (y < height) {
      val base = bases(math.min(y / bandH, bases.length - 1))
      var x = 0
      while (x < width) {
        val g = ((base + x * step) % 256 + 256) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---- EXIF orientation (JPEG APP1 / TIFF IFD walk) ----------------------

  /** Extract the EXIF Orientation tag (274) from JPEG bytes: walk the
    * JPEG marker segments to APP1 `Exif\0\0`, then parse the embedded
    * TIFF header (either byte order) and scan IFD0's 12-byte entries.
    * METADATA ONLY — no pixel decode; this is the pass a training
    * pipeline runs before batching images, because a mis-rotated photo
    * is silent label noise. None when there is no APP1/orientation
    * (most PNGs, stripped JPEGs) or the bytes aren't a JPEG; every
    * read is bounds-guarded so truncated EXIF degrades to None, never
    * an exception. */
  private[operators] def exifOrientation(bytes: Array[Byte]): Option[Int] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16be(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u16be(0) != 0xFFD8) return None // not a JPEG
    var off = 2
    while (off + 4 <= bytes.length && u8(off) == 0xFF) {
      val marker = u8(off + 1)
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / scan start
      val len = u16be(off + 2) // includes the 2 length bytes
      if (len < 2 || off + 2 + len > bytes.length) return None
      if (marker == 0xE1 && len >= 10 &&
          u8(off + 4) == 'E' && u8(off + 5) == 'x' && u8(off + 6) == 'i' &&
          u8(off + 7) == 'f' && u8(off + 8) == 0 && u8(off + 9) == 0) {
        val tiff = off + 10 // TIFF header base (offsets are relative to it)
        if (tiff + 8 > bytes.length) return None
        val little = u8(tiff) == 'I' && u8(tiff + 1) == 'I'
        val big = u8(tiff) == 'M' && u8(tiff + 1) == 'M'
        if (!little && !big) return None
        def u16(i: Int) = if (little) u8(i) | (u8(i + 1) << 8) else u16be(i)
        def u32(i: Int): Long =
          if (little) (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24))
          else ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3))
        if (u16(tiff + 2) != 42) return None
        val ifd0 = u32(tiff + 4)
        if (ifd0 < 0 || tiff + ifd0 + 2 > bytes.length) return None
        val entryBase = tiff + ifd0.toInt
        val n = u16(entryBase)
        var e = 0
        while (e < n) {
          val at = entryBase + 2 + e * 12
          if (at + 12 > bytes.length) return None
          if (u16(at) == 0x0112 && u16(at + 2) == 3 && u32(at + 4) == 1L) {
            val v = u16(at + 8) // SHORT value lives in the value field's first 2 bytes
            return if (v >= 1 && v <= 8) Some(v) else None
          }
          e += 1
        }
        return None // APP1 present, no orientation tag
      }
      off += 2 + len
    }
    None
  }

  /** Raster dimensions from the image HEADER only: the matching
    * `ImageReader` parses width/height without decoding a single
    * pixel block — the metadata-cheap sibling of [[decodeImage]].
    * None when no reader accepts the bytes. */
  private[operators] def headerDims(bytes: Array[Byte]): Option[(Int, Int)] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            Some((reader.getWidth(0), reader.getHeight(0)))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** EXIF-orientation kernel: [[exifOrientation]] per row plus the
    * derived columns a batching pipeline actually consumes — the
    * rotation to apply, whether the image is mirrored, and the
    * DISPLAY dimensions (decoded raster dims, swapped for the four
    * transposed orientations). Missing/unparseable EXIF normalizes to
    * orientation 1 (`has_exif=false`) — upright is the only safe
    * default. */
  def exifOrientations(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("orientation", IntegerType, nullable = false),
      StructField("has_exif", BooleanType, nullable = false),
      StructField("rotate_deg", IntegerType, nullable = false),
      StructField("mirrored", BooleanType, nullable = false),
      StructField("out_width", IntegerType),
      StructField("out_height", IntegerType),
      StructField("decoded", BooleanType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val exif =
            try exifOrientation(bytes) catch { case scala.util.control.NonFatal(_) => None }
          val o = exif.getOrElse(1)
          val rotate = o match {
            case 3 | 4 => 180
            case 5 | 6 => 90
            case 7 | 8 => 270
            case _ => 0
          }
          val mirrored = o == 2 || o == 4 || o == 5 || o == 7
          // dims come from the image HEADER only (ImageReader.getWidth/
          // getHeight) — this pass must stay metadata-cheap; a full
          // pixel decode here would cost as much as the decode stage
          // this report exists to precede
          val (wOut, hOut, decoded) = headerDims(bytes) match {
            case Some((w, h)) => if (o >= 5) (h, w, true) else (w, h, true)
            case None => (0, 0, false)
          }
          Row.fromSeq(r.toSeq ++ Seq(o, exif.isDefined, rotate, mirrored, wOut, hOut, decoded))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic JPEG-with-EXIF fixture: a real `ImageIO` JPEG of the
    * given gray, with an APP1/Exif segment (chosen byte order, IFD0
    * holding exactly the orientation tag) spliced after SOI — the same
    * layout cameras emit, so the parser is exercised on the real
    * segment/TIFF structure in BOTH endiannesses. */
  def encodeJpegWithExif(width: Int, height: Int, gray: Int,
      orientation: Int, littleEndian: Boolean): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try { g2.setColor(new java.awt.Color(gray, gray, gray)); g2.fillRect(0, 0, width, height) }
    finally g2.dispose()
    val jpegOut = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", jpegOut)
    val jpeg = jpegOut.toByteArray
    // TIFF block: header (8) + IFD0 (2 + 12 + 4)
    val tiff = new Array[Byte](8 + 2 + 12 + 4)
    def put16(i: Int, v: Int): Unit =
      if (littleEndian) { tiff(i) = v.toByte; tiff(i + 1) = (v >> 8).toByte }
      else { tiff(i) = (v >> 8).toByte; tiff(i + 1) = v.toByte }
    def put32(i: Int, v: Int): Unit =
      if (littleEndian) { put16(i, v & 0xFFFF); put16(i + 2, v >>> 16) }
      else { put16(i, v >>> 16); put16(i + 2, v & 0xFFFF) }
    val bom: Byte = if (littleEndian) 'I' else 'M'
    tiff(0) = bom; tiff(1) = bom
    put16(2, 42); put32(4, 8) // IFD0 directly after the header
    put16(8, 1) // one entry
    put16(10, 0x0112); put16(12, 3); put32(14, 1); put16(18, orientation)
    put32(22, 0) // no next IFD
    val payload = "Exif".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](0, 0) ++ tiff
    val app1 = Array[Byte](0xFF.toByte, 0xE1.toByte,
      (((payload.length + 2) >> 8) & 0xFF).toByte, ((payload.length + 2) & 0xFF).toByte) ++ payload
    // splice after SOI (first two bytes)
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  // ---- audio quality metrics ---------------------------------------------

  /** Audio QUALITY kernel — the gating sibling of
    * [[decodeAudioFeatures]]: real RIFF-PCM parse to samples, then the
    * exact-integer counters a training-data audio filter gates on:
    * clipped samples (|s| ≥ 32760 — digital clipping ruins ASR
    * targets), silent samples (|s| ≤ 3 — near-digital-zero), the
    * LEADING silent run (untrimmed capture padding), and peak |ampl|.
    * All integers end to end, so the DuckDB oracle needs no float
    * tolerance. Undecodable bytes degrade (`decoded=false`, zeroed
    * counters, byte count as n_samples) — same contract as every
    * kernel in this file. */
  def audioQuality(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("n_clipped", LongType),
      StructField("n_silent", LongType),
      StructField("lead_silence", LongType),
      StructField("peak", IntegerType),
      StructField("decoded", BooleanType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val wav =
            try decodeWav(bytes) catch { case scala.util.control.NonFatal(_) => None }
          val fields = wav match {
            case Some(w) =>
              var clipped = 0L; var silent = 0L; var lead = 0L
              var leading = true; var peak = 0
              var i = 0
              while (i < w.samples.length) {
                val a = math.abs(w.samples(i).toInt)
                if (a >= 32760) clipped += 1
                if (a <= 3) { silent += 1; if (leading) lead += 1 }
                else leading = false
                if (a > peak) peak = a
                i += 1
              }
              Seq(w.sampleRate, w.samples.length.toLong, clipped, silent, lead, peak, true)
            case None =>
              Seq(0, bytes.length.toLong, 0L, 0L, 0L, 0, false)
          }
          Row.fromSeq(r.toSeq ++ fields)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Audio DECIMATION — the sample-rate-reduction twin of
    * [[resizeImages]] (ASR model-input prep: 16 kHz corpora fed to an
    * 8 kHz model, or bandwidth-bounded archives): each output sample
    * is the boxcar mean of `factor` consecutive input samples
    * (`Math.floorDiv` — floor like SQL `//`, NOT Java truncation, so
    * a relational oracle reproduces negative-window means exactly),
    * the tail partial window is dropped, and the result is re-encoded
    * as a real WAV at rate/factor plus an order-sensitive exact
    * checksum Σ(i+1)·out(i) the oracle can recompute. Undecodable
    * bytes degrade (`decoded=false`, null bytes) — the standard
    * kernel contract. */
  def resampleAudio(df: DataFrame, binCol: String, factor: Int,
      batchSize: Int = 32): DataFrame = {
    require(factor >= 2)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("out_rate", IntegerType),
      StructField("n_out", LongType),
      StructField("resampled_wav", BinaryType),
      StructField("checksum", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val wav =
            try decodeWav(bytes) catch { case scala.util.control.NonFatal(_) => None }
          val fields = wav match {
            case Some(w) =>
              val nOut = w.samples.length / factor
              val out = new Array[Short](nOut)
              var i = 0
              while (i < nOut) {
                var s = 0L
                var j = 0
                while (j < factor) { s += w.samples(i * factor + j); j += 1 }
                out(i) = Math.floorDiv(s, factor).toShort
                i += 1
              }
              var ck = 0L
              i = 0
              while (i < nOut) { ck += (i + 1L) * out(i); i += 1 }
              Seq(w.sampleRate / factor, nOut.toLong,
                encodeWavPcm16(w.sampleRate / factor, out), ck, true)
            case None =>
              Seq(0, 0L, null, 0L, false)
          }
          Row.fromSeq(r.toSeq ++ fields)
        }
      }
    }(Encoders.row(outSchema))
  }
}
