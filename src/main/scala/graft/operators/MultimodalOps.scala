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
}
