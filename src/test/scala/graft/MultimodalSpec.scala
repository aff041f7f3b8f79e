package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Tables(spark, sf, "documents")
    .select(col("doc_id"), col("text").cast("binary").as("blob"),
      concat(lit("m_"), col("doc_id"), lit(".png")).as("name"))

  test("metadata extraction is decode-free and deterministic") {
    val m = MultimodalOps.withMetadata(media, "blob", "name")
    val r = m.filter(col("doc_id") === 1).select("media_meta.*").head()
    assert(r.getAs[String]("format") == "png")
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[String]("content_id").length == 64)
  }

  test("non-image bytes degrade to the deterministic stand-in, flagged decoded=false") {
    val f = MultimodalOps.decodeAndFeaturize(media.limit(40), "blob", batchSize = 16)
    val rows = f.select(col("width"), col("height"), col("decoded"),
      size(col("features")).as("nf")).collect()
    assert(rows.length == 40)
    assert(rows.forall(_.getAs[Int]("nf") == 8))
    assert(rows.forall(!_.getAs[Boolean]("decoded")), "text bytes are not an image")
    assert(rows.forall(r => r.getAs[Int]("width") >= 16 && r.getAs[Int]("height") >= 16))
    // deterministic across runs
    val again = MultimodalOps.decodeAndFeaturize(media.limit(40), "blob", batchSize = 16)
      .select("doc_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    f.select("doc_id", "features").collect().foreach { r =>
      assert(again(r.getLong(0)) == r.getSeq[Double](1))
    }
  }

  test("real ImageIO decode: width/height/histogram come from actual pixels") {
    import spark.implicits._
    // black (lum 0 → bucket 0), mid gray 128 (→ bucket 4), white 255
    // (→ bucket 7), and a 2-color image splitting buckets 0 and 7
    val black = MultimodalOps.encodeSolidPng(5, 3, 0x000000)
    val gray = MultimodalOps.encodeSolidPng(7, 7, 0x808080)
    val white = MultimodalOps.encodeSolidPng(2, 9, 0xFFFFFF)
    val half = {
      val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 2)
        img.setRGB(x, y, if (x < 2) 0x000000 else 0xFFFFFF)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq((1L, black), (2L, gray), (3L, white), (4L, half)).toDF("id", "blob")
    val got = MultimodalOps.decodeAndFeaturize(df, "blob", batchSize = 2)
      .select("id", "width", "height", "decoded", "features")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3), r.getSeq[Double](4)))).toMap
    assert(got(1L) == ((5, 3, true, Seq(1.0, 0, 0, 0, 0, 0, 0, 0))))
    assert(got(2L) == ((7, 7, true, Seq(0, 0, 0, 0, 1.0, 0, 0, 0))))
    assert(got(3L) == ((2, 9, true, Seq(0, 0, 0, 0, 0, 0, 0, 1.0))))
    assert(got(4L) == ((4, 2, true, Seq(0.5, 0, 0, 0, 0, 0, 0, 0.5))))
  }

  test("corrupt image bytes degrade instead of failing the job") {
    import spark.implicits._
    val truncated = MultimodalOps.encodeSolidPng(8, 8, 0x123456).take(20)
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val df = Seq((1L, truncated), (2L, garbage), (3L, Array.empty[Byte])).toDF("id", "blob")
    val got = MultimodalOps.decodeAndFeaturize(df, "blob")
      .select("id", "decoded", "width").collect()
    assert(got.length == 3)
    assert(got.forall(!_.getAs[Boolean]("decoded")))
    assert(got.forall(_.getAs[Int]("width") >= 16), "stand-in dims, not a crash")
  }

  test("real WAV decode: exact-integer features from actual PCM samples") {
    import spark.implicits._
    // [100, -100, 50, 0, -1]: peak 100; sign runs + - + + - → 3
    // crossings (0 counts nonnegative); energy 10000+10000+2500+0+1
    val wav = MultimodalOps.encodeWavPcm16(8000,
      Array[Short](100, -100, 50, 0, -1))
    // stereo WAV crafted by hand: channel 0 = [5, -5], channel 1 = noise
    // — the kernel must read channel 0 only
    val stereo = {
      val bb = java.nio.ByteBuffer.allocate(44 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + 8); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(2) // PCM, stereo
      bb.putInt(4000); bb.putInt(4000 * 4)
      bb.putShort(4); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(8)
      bb.putShort(5); bb.putShort(9999); bb.putShort(-5); bb.putShort(-9999)
      bb.array()
    }
    val df = Seq((1L, wav), (2L, stereo)).toDF("id", "blob")
    val got = MultimodalOps.decodeAudioFeatures(df, "blob")
      .select("id", "sample_rate", "n_samples", "duration_us", "peak",
        "zero_crossings", "energy_sq", "decoded")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got(1L) == Seq(8000, 5L, 625L, 100, 3L, 22501L, true))
    assert(got(2L) == Seq(4000, 2L, 500L, 5, 1L, 50L, true))
  }

  test("non-WAV and malformed RIFF bytes degrade instead of failing") {
    import spark.implicits._
    val good = MultimodalOps.encodeWavPcm16(8000, Array[Short](1, 2, 3))
    val truncated = good.take(30)
    val nonPcm = good.clone() // format code 1 → 3 (IEEE float, unsupported)
    nonPcm(20) = 3
    val badLen = good.clone() // data chunk claims more bytes than exist
    badLen(43) = 0x7F
    // data length near Int.MaxValue: the bounds check must not WRAP
    // (would attempt a ~2 GB sample allocation before failing)
    val hugeLen = good.clone()
    hugeLen(40) = 0xF0.toByte; hugeLen(41) = 0xFF.toByte
    hugeLen(42) = 0xFF.toByte; hugeLen(43) = 0x7F.toByte
    val df = Seq((1L, "not riff at all".getBytes), (2L, truncated),
      (3L, nonPcm), (4L, badLen), (5L, hugeLen)).toDF("id", "blob")
    val got = MultimodalOps.decodeAudioFeatures(df, "blob")
      .select("id", "decoded").collect()
    assert(got.length == 5 && got.forall(!_.getBoolean(1)))
  }

  test("mp4 box walk recovers timescale/duration/dimensions; v1 headers and garbage handled") {
    import spark.implicits._
    val v0 = MultimodalOps.encodeMp4Meta(90000, 450000, 1920, 1080)
    // version-1 mvhd/tkhd crafted by hand: 64-bit times, shifted offsets
    val v1 = {
      def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        bb.putInt(8 + payload.length); bb.put(tpe.getBytes); bb.put(payload)
        bb.array()
      }
      val mvhd = java.nio.ByteBuffer.allocate(112).order(java.nio.ByteOrder.BIG_ENDIAN)
      mvhd.put(0, 1.toByte); mvhd.putInt(20, 600); mvhd.putLong(24, 1200L)
      val tkhd = java.nio.ByteBuffer.allocate(96).order(java.nio.ByteOrder.BIG_ENDIAN)
      tkhd.put(0, 1.toByte); tkhd.putInt(88, 640 << 16); tkhd.putInt(92, 360 << 16)
      box("ftyp", "isom".getBytes) ++
        box("moov", box("mvhd", mvhd.array()) ++ box("trak", box("tkhd", tkhd.array())))
    }
    // box size near Int.MaxValue must not wrap the bounds check and
    // walk past the buffer
    val hugeBox = v0.clone()
    val moovOff = v0.indexOfSlice("moov".getBytes) - 4
    hugeBox(moovOff) = 0x7F.toByte; hugeBox(moovOff + 1) = 0xFF.toByte
    hugeBox(moovOff + 2) = 0xFF.toByte; hugeBox(moovOff + 3) = 0xF8.toByte
    // an mvhd whose payload is shorter than its version demands
    val shortMvhd = {
      def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        bb.putInt(8 + payload.length); bb.put(tpe.getBytes); bb.put(payload)
        bb.array()
      }
      box("ftyp", "isom".getBytes) ++ box("moov", box("mvhd", Array[Byte](0, 0, 0)))
    }
    val df = Seq((1L, v0), (2L, v1), (3L, "no boxes here".getBytes),
      (4L, v0.take(20)), (5L, hugeBox), (6L, shortMvhd)).toDF("id", "blob")
    val got = MultimodalOps.extractVideoMeta(df, "blob")
      .select("id", "timescale", "duration", "duration_us", "width", "height", "parsed")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got(1L) == Seq(90000, 450000L, 5000000L, 1920, 1080, true))
    assert(got(2L) == Seq(600, 1200L, 2000000L, 640, 360, true))
    assert(got(3L).last == false && got(4L).last == false)
    assert(got(5L).last == false && got(6L).last == false)
  }

  test("mp4 frame sampling: stts runs, stss seek list, no-stss fallback, corrupt degrade") {
    import spark.implicits._
    // 30 frames at 100 ticks in a 600-tick timescale, keyframe every 7
    val fix = MultimodalOps.encodeMp4Frames(600, 30, 100, 7)
    // multi-run stts (10×100-tick then 5×200-tick) + no stss at all:
    // every sample is sync (ISO 14496-12 §8.6.2), seek list caps at maxK
    val multiRun = {
      def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        bb.putInt(8 + payload.length); bb.put(tpe.getBytes); bb.put(payload)
        bb.array()
      }
      val mdhd = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.BIG_ENDIAN)
      mdhd.putInt(12, 1000); mdhd.putInt(16, 2000)
      val stts = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.BIG_ENDIAN)
      stts.putInt(4, 2)
      stts.putInt(8, 10); stts.putInt(12, 100)
      stts.putInt(16, 5); stts.putInt(20, 200)
      box("ftyp", "isom".getBytes) ++ box("moov",
        box("trak", box("mdia", box("mdhd", mdhd.array()) ++
          box("minf", box("stbl", box("stts", stts.array()))))))
    }
    // corrupt stss entry count far past the box end: must degrade, not allocate
    val corrupt = {
      val c = fix.clone()
      val off = c.indexOfSlice("stss".getBytes) + 8
      c(off) = 0x7F.toByte; c(off + 1) = 0xFF.toByte
      c
    }
    val df = Seq((1L, fix), (2L, multiRun), (3L, corrupt)).toDF("id", "blob")
    val got = MultimodalOps.sampleFrames(df, "blob", maxKeyframes = 5)
      .select("id", "media_timescale", "n_frames", "n_keyframes",
        "duration_us", "kf_sample_us", "parsed")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // keyframes 1,8,15,22,29 → ticks 0,700,1400,2100,2800 → µs ×1e6/600
    assert(got(1L) == Seq(600, 30L, 5L, 5000000L,
      "0,1166666,2333333,3500000,4666666", true))
    // 15 frames, all sync; first 5 seek points follow the 100-tick run
    assert(got(2L) == Seq(1000, 15L, 15L, 2000000L,
      "0,100000,200000,300000,400000", true))
    assert(got(3L) == Seq(0, 0L, 0L, 0L, "", false))
  }

  test("content-id sampling prunes without decoding") {
    val m = MultimodalOps.withMetadata(media, "blob", "name")
    val sampled = MultimodalOps.sampleByContentId(m, keepOneIn = 4).count()
    assert(sampled > 0 && sampled < media.count())
  }

  test("dHash packs per-row difference bits byte-per-row, hand-computed") {
    import spark.implicits._
    def png(f: (Int, Int) => Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val g = f(x, y); img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // 9×8: one pixel per grid cell. Ascending-everywhere → all 64 bits.
    val asc = png((x, y) => x * 16 + y * 8, 9, 8)
    // Even pixel-rows ascend (row byte 0xff), odd rows descend (0x00):
    // bytes alternate → 0x00ff00ff00ff00ff (byte r of the long = row r).
    val alt = png((x, y) => if (y % 2 == 0) x * 10 else (8 - x) * 10, 9, 8)
    // Solid image: no cell differs → hash 0.
    val flat = MultimodalOps.encodeSolidPng(9, 8, 0x808080)
    val got = MultimodalOps.perceptualHash(
      Seq((1L, asc), (2L, alt), (3L, flat)).toDF("id", "blob"), "blob")
      .select("id", "decoded", "phash").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(got(1L) == ((true, -1L)), f"asc: got ${got(1L)._2}%016x")
    assert(got(2L) == ((true, 0x00ff00ff00ff00ffL)), f"alt: got ${got(2L)._2}%016x")
    assert(got(3L) == ((true, 0L)))
  }

  test("dHash pools exact integer cell means and survives sub-grid images") {
    import spark.implicits._
    // 18×16: every cell is a 2×2 block; stripe pattern is y-constant so
    // the hash equals the stripe closed form the oracle uses
    val stripe = MultimodalOps.encodeStripePng(18, 16, 42)
    // 3×2 image is smaller than the 9×8 grid: cells clamp to ≥1 pixel —
    // must decode and produce SOME deterministic hash, not crash
    val tiny = MultimodalOps.encodeSolidPng(3, 2, 0x123456)
    val got = MultimodalOps.perceptualHash(
      Seq((1L, stripe), (2L, tiny)).toDF("id", "blob"), "blob")
      .select("id", "decoded", "phash").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    // closed form: bw=2, L(x) = (42 + 31x) % 256; cell c = floor mean of
    // columns {2c, 2c+1}; bit c set iff cell(c+1) > cell(c); all rows equal
    val L = (x: Int) => (42 + 31 * x) % 256
    val cell = (c: Int) => (L(2 * c) + L(2 * c + 1)) / 2
    val rowByte = (0 until 8).map(c => if (cell(c + 1) > cell(c)) 1L << c else 0L).sum
    val want = (0 until 8).map(r => rowByte << (8 * r)).reduce(_ | _)
    assert(got(1L) == ((true, want)), f"stripe: got ${got(1L)._2}%016x want $want%016x")
    assert(got(2L)._1, "tiny image must still decode")
    val again = MultimodalOps.perceptualHash(
      Seq((2L, tiny)).toDF("id", "blob"), "blob").select("phash").head.getLong(0)
    assert(again == got(2L)._2, "sub-grid hash must be deterministic")
  }

  test("non-image bytes get the FNV degrade hash; corrupt bytes never fail the job") {
    import spark.implicits._
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val truncated = MultimodalOps.encodeSolidPng(8, 8, 0x123456).take(20)
    val got = MultimodalOps.perceptualHash(
      Seq((1L, garbage), (2L, garbage.clone()), (3L, truncated)).toDF("id", "blob"), "blob")
      .select("id", "decoded", "phash").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(!got(1L)._1 && !got(2L)._1 && !got(3L)._1)
    assert(got(1L)._2 == got(2L)._2, "identical corrupt bytes dedup among themselves")
    assert(got(1L)._2 != got(3L)._2, "different corrupt bytes stay distinct")
  }

  test("EXIF orientation parses both TIFF byte orders; missing EXIF defaults upright") {
    import spark.implicits._
    val le = MultimodalOps.encodeJpegWithExif(20, 10, 100, 6, littleEndian = true)
    val be = MultimodalOps.encodeJpegWithExif(20, 10, 100, 8, littleEndian = false)
    val mirrored = MultimodalOps.encodeJpegWithExif(20, 10, 100, 2, littleEndian = true)
    val noExif = { // plain JPEG straight from ImageIO: no APP1/Exif
      val img = new java.awt.image.BufferedImage(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val png = MultimodalOps.encodeSolidPng(4, 3, 0x808080) // not a JPEG at all
    val garbage = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    val got = MultimodalOps.exifOrientations(
      Seq((1L, le), (2L, be), (3L, mirrored), (4L, noExif), (5L, png), (6L, garbage))
        .toDF("id", "blob"), "blob")
      .select("id", "orientation", "has_exif", "rotate_deg", "mirrored",
        "out_width", "out_height", "decoded")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // orientation 6 = rotate 90, transposed → display dims swap to 10×20
    assert(got(1L) == Seq(6, true, 90, false, 10, 20, true), s"got ${got(1L)}")
    // big-endian TIFF, orientation 8 = rotate 270
    assert(got(2L) == Seq(8, true, 270, false, 10, 20, true), s"got ${got(2L)}")
    // orientation 2 = mirrored, no rotation, dims unswapped
    assert(got(3L) == Seq(2, true, 0, true, 20, 10, true), s"got ${got(3L)}")
    // EXIF-less JPEG and non-JPEG both normalize to upright, still decode
    assert(got(4L) == Seq(1, false, 0, false, 7, 5, true), s"got ${got(4L)}")
    assert(got(5L) == Seq(1, false, 0, false, 4, 3, true), s"got ${got(5L)}")
    // garbage: no EXIF, no decode — flagged, not thrown
    assert(got(6L) == Seq(1, false, 0, false, 0, 0, false), s"got ${got(6L)}")
  }

  test("resize kernel: lossless PNG of the exact box-average raster; degrade flagged") {
    import spark.implicits._
    // 18×16 stripe → 9×8: every cell is a 2×2 block with a closed form
    val stripe = MultimodalOps.encodeStripePng(18, 16, 42)
    val garbage = Array.tabulate[Byte](48)(i => (i * 13).toByte)
    val got = MultimodalOps.resizeImages(
      Seq((1L, stripe), (2L, garbage)).toDF("id", "blob"), "blob", 9, 8)
      .select("id", "out_width", "out_height", "resized_png", "sum_lum", "decoded")
      .collect().map(r => r.getLong(0) -> r).toMap
    val L = (x: Int) => (42 + 31 * x) % 256
    val cell = (c: Int) => (L(2 * c) + L(2 * c + 1)) / 2
    val wantSum = 8L * (0 until 9).map(cell).sum
    assert(got(1L).getAs[Boolean]("decoded") && got(1L).getAs[Long]("sum_lum") == wantSum)
    // the emitted PNG must decode back to EXACTLY the pooled raster
    val png = got(1L).getAs[Array[Byte]]("resized_png")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(back.getWidth == 9 && back.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 9)
      assert((back.getRGB(x, y) & 0xFF) == cell(x),
        s"pixel ($x,$y): ${back.getRGB(x, y) & 0xFF} != ${cell(x)}")
    assert(!got(2L).getAs[Boolean]("decoded") && got(2L).getAs[Long]("sum_lum") == 0L)
    assert(got(2L).isNullAt(got(2L).fieldIndex("resized_png")))
  }

  test("audio quality counters are exact on hand-computed PCM") {
    import spark.implicits._
    val samples = Array[Short](0, 0, 0, 0, 32767, -32767, 100, -2, 32760, 5)
    val wav = MultimodalOps.encodeWavPcm16(8000, samples)
    val garbage = "not audio".getBytes
    val got = MultimodalOps.audioQuality(
      Seq((1L, wav), (2L, garbage)).toDF("id", "blob"), "blob")
      .select("id", "sample_rate", "n_samples", "n_clipped", "n_silent",
        "lead_silence", "peak", "decoded")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // |32767|×2 and |32760| clip; {0,0,0,0,-2} are silent, 4 leading;
    // 5 is NOT silent (>3) and 100 breaks the leading run earlier anyway
    assert(got(1L) == Seq(8000, 10L, 3L, 5L, 4L, 32767, true), s"got ${got(1L)}")
    assert(got(2L) == Seq(0, garbage.length.toLong, 0L, 0L, 0L, 0, false))
  }

  test("audio decimation: emitted WAV decodes to the floor-div window means; corrupt degrades") {
    import graft.operators.MultimodalOps
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // period-3 square wave: windows straddle sign flips, means go negative
    val n = 25
    val samples = Array.tabulate[Short](n)(i => (if ((i / 3) % 2 == 0) 900 else -900).toShort)
    val wav = MultimodalOps.encodeWavPcm16(8000, samples)
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2, 3))).toDF("id", "blob")
    val out = MultimodalOps.resampleAudio(df, "blob", 4)
      .select("id", "out_rate", "n_out", "resampled_wav", "checksum", "decoded")
      .collect().sortBy(_.getLong(0))

    val good = out(0)
    assert(good.getBoolean(5) && good.getInt(1) == 2000 && good.getLong(2) == 6)
    // direct decimation with FLOOR division (Math.floorDiv, not Java /)
    val want = Array.tabulate(6) { i =>
      Math.floorDiv((0 until 4).map(j => samples(i * 4 + j).toInt).sum, 4)
    }
    assert(good.getLong(4) ==
      want.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum)
    // the emitted WAV is a REAL wav: the public decode kernel agrees
    val re = MultimodalOps.decodeAudioFeatures(
      Seq(Tuple1(good.getAs[Array[Byte]](3))).toDF("blob"), "blob")
      .select("sample_rate", "n_samples", "decoded").head
    assert(re.getInt(0) == 2000 && re.getLong(1) == 6 && re.getBoolean(2))

    val bad = out(1)
    assert(!bad.getBoolean(5) && bad.isNullAt(3) && bad.getLong(4) == 0L)
  }

  test("GIF walk counts frames without LZW decode; truncation and junk degrade") {
    import graft.operators.MultimodalOps
    import spark.implicits._
    val good = MultimodalOps.encodeGifMeta(64, 24, 4, 2, 7)
    // a REAL ImageIO-written GIF also parses (single frame, no NETSCAPE)
    val img = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", buf)
    val real = buf.toByteArray
    val truncated = good.take(good.length - 3) // loses the trailer + chain end
    val junk = Array[Byte](1, 2, 3, 4)
    val df = Seq((1L, good), (2L, real), (3L, truncated), (4L, junk)).toDF("id", "blob")
    val out = MultimodalOps.gifMetadata(df, "blob")
      .select("id", "width", "n_frames", "loop_count", "first_delay_cs", "parsed")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getBoolean(5))).sortBy(_._1)
    assert(out(0) == ((1L, 64, 4, 2, 7, true)))
    val (_, rw, rf, _, _, rp) = out(1)
    assert(rp && rw == 5 && rf == 1, s"ImageIO GIF should walk: ${out(1)}")
    assert(!out(2)._6, "truncated structure must degrade, not mis-count")
    assert(!out(3)._6, "non-GIF bytes must degrade")
  }
}
