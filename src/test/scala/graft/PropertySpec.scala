package graft

import java.nio.charset.StandardCharsets

import graft.operators.{BpeOps, Tiktoken}
import graft.sources.OfficeParsers
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the pure (driver-side) kernels: the
  * two BPE faces, the rank-file codec, and the office-format fixture
  * writers against their parsers. These are the pieces whose input
  * space is too big for goldens — fuzzing them guards the exact
  * contracts the golden specs sample: tokenization is a partition of
  * the input (nothing dropped, nothing invented), codecs round-trip,
  * and parse(make(x)) == x for every writer/reader pair.
  */
class PropertySpec extends AnyFunSuite {

  /** Fixed seed: a failure here must reproduce on re-run (same
    * determinism bar as the cross-engine oracle queries). */
  private def check(name: String, min: Int = 100)(prop: Prop): Unit =
    test(name) {
      val params = SCTest.Parameters.default
        .withMinSuccessfulTests(min)
        .withInitialSeed(Seed(0xA11CE5EEDL))
      val res = SCTest.check(params, prop)
      assert(res.passed, res.status.toString)
    }

  // ---- generators --------------------------------------------------------

  /** Well-formed unicode text: pieces (never lone surrogates) spanning
    * the cl100k pre-tokenizer's branch space — letters, digits,
    * contractions, ASCII + unicode whitespace, punctuation runs,
    * latin-extended, CJK, and supplementary-plane emoji. */
  private val genTextPiece: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    3 -> Gen.oneOf(" ", "\t", "\n", "\r\n", " ", " ", "  "),
    3 -> Gen.oneOf("!", "?", ".", ",", "'s", "'t", "n't", "--", "\"", "(", ")", "/", "@", "#"),
    2 -> Gen.choose('À', 'ɏ').map(_.toString),
    1 -> Gen.oneOf("日", "本", "ε", "Ж", "😀", "🚀"),
  )
  private val genText: Gen[String] = Gen.listOf(genTextPiece).map(_.mkString)

  private def latin1(b: Int): String = new String(Array(b.toByte), StandardCharsets.ISO_8859_1)

  private val byteSingletons: Map[String, Int] = (0 until 256).map(b => latin1(b) -> b).toMap

  /** A structurally valid tiktoken rank table: the 256 byte singletons
    * plus merges, each the concatenation of two earlier tokens (the
    * invariant real BPE vocabularies have by construction). */
  private val genRankTable: Gen[Map[String, Int]] =
    Gen.listOf(Gen.zip(Gen.choose(0, 4095), Gen.choose(0, 4095))).map { picks =>
      val toks = scala.collection.mutable.ArrayBuffer.from((0 until 256).map(latin1))
      val ranks = scala.collection.mutable.Map.from(byteSingletons)
      picks.foreach { case (i, j) =>
        val t = toks(i % toks.length) + toks(j % toks.length)
        if (!ranks.contains(t)) { ranks(t) = ranks.size; toks += t }
      }
      ranks.toMap
    }

  private val genBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  // ---- tiktoken serving face ---------------------------------------------

  check("pretokenize is a partition: pieces concatenate back to the input") {
    Prop.forAll(genText) { s => Tiktoken.pretokenize(s).mkString == s }
  }

  check("byte_pair_merge preserves bytes; every merged part is in-vocabulary") {
    Prop.forAll(genBytes, genRankTable) { (bytes, ranks) =>
      val parts = Tiktoken.encode(bytes, ranks)
      val rejoined = parts.mkString.getBytes(StandardCharsets.ISO_8859_1)
      java.util.Arrays.equals(rejoined, bytes) &&
        parts.forall(p => p.length == 1 || ranks.contains(p))
    }
  }

  check("singleton-only vocabulary tokenizes to exactly the UTF-8 byte count") {
    Prop.forAll(genText) { s =>
      Tiktoken.countTokens(s, byteSingletons) == s.getBytes(StandardCharsets.UTF_8).length
    }
  }

  check("merges never increase the token count") {
    Prop.forAll(genText, genRankTable) { (s, ranks) =>
      Tiktoken.countTokens(s, ranks) <= s.getBytes(StandardCharsets.UTF_8).length
    }
  }

  check("rank-file format round-trips arbitrary byte-token tables") {
    val genToken = Gen.nonEmptyListOf(Gen.choose(0, 255)).map(_.map(latin1).mkString)
    val genTable = Gen.mapOf(Gen.zip(genToken, Gen.choose(0, Int.MaxValue)))
    Prop.forAll(genTable) { m =>
      Tiktoken.parseRanks(Tiktoken.formatRanks(m).linesIterator) == m
    }
  }

  // ---- trained-BPE face --------------------------------------------------

  private val genWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString).map(_.take(12))

  check("greedy encode preserves the word under any merge table") {
    val genPairs = Gen.listOf(Gen.zip(genWord, genWord))
      .map(_.zipWithIndex.toMap)
    Prop.forAll(genWord, genPairs) { (w, rank) =>
      BpeOps.encode(w, rank).mkString == w
    }
  }

  check("training to exhaustion on one word compresses it to one token") {
    Prop.forAll(genWord) { w =>
      val rank = BpeOps.trainMerges(Seq(w -> 1L), w.length).zipWithIndex.toMap
      BpeOps.encode(w, rank) == Vector(w)
    }
  }

  check("merge selection is invariant to uniform frequency scaling") {
    val genCounts = Gen.nonEmptyListOf(Gen.zip(genWord, Gen.choose(1L, 50L)))
    Prop.forAll(genCounts, Gen.choose(2L, 1000L)) { (wc, k) =>
      BpeOps.trainMerges(wc, 6) == BpeOps.trainMerges(wc.map { case (w, c) => (w, c * k) }, 6)
    }
  }

  // ---- office fixture writers vs parsers ---------------------------------

  private val genPrintable: Gen[String] = Gen.nonEmptyListOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '&', '<', '>', '"', '\'', ';', ','),
    2 -> Gen.choose('À', 'ɏ'),
    1 -> Gen.oneOf('日', 'Ж'),
  )).map(_.mkString)

  check("docx writer/parser round-trip is exact", min = 50) {
    Prop.forAll(genPrintable) { t =>
      OfficeParsers.docxText(OfficeParsers.makeDocx(t)) == t
    }
  }

  check("pptx writer/parser round-trip is exact", min = 50) {
    Prop.forAll(genPrintable.map(_.trim).suchThat(_.nonEmpty)) { t =>
      OfficeParsers.pptxText(OfficeParsers.makePptx(t)) == t
    }
  }

  check("eml base64 multipart round-trip is exact, incl. MIME-wrapped bodies", min = 50) {
    // long multi-line unicode bodies force the 76-char base64 line wrap
    val genBody = Gen.zip(genText, Gen.choose(1, 4)).map { case (s, n) => (s + "\n") * n + s }
    Prop.forAll(genBody) { t =>
      OfficeParsers.emlText(OfficeParsers.makeEml(t)) == t
    }
  }

  check("pdf Flate writer/parser round-trip is exact", min = 50) {
    val genPdfText = Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '(', ')', '\\', '<', '>', '[', ']', '/'),
      1 -> Gen.choose('¡', 'ÿ'),
    )).map(_.mkString)
    Prop.forAll(genPdfText) { t =>
      OfficeParsers.pdfText(OfficeParsers.makePdf(t)) == t
    }
  }

  check("pdf xref-stream/ObjStm writer/parser round-trip is exact", min = 50) {
    // the post-2005 layout: page objects compressed in an ObjStm, the
    // cross-reference a /Type /XRef stream — decoded by the object
    // model, not the file-order scan (the binary xref rows would trip
    // a keyword search); the predictor variant adds Flate + PNG Up
    // row filtering on the xref stream itself
    val genPdfText = Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '(', ')', '\\', '<', '>', '[', ']', '/'),
      1 -> Gen.choose('¡', 'ÿ'),
    )).map(_.mkString)
    Prop.forAll(genPdfText, Gen.oneOf(false, true)) { (t, pred) =>
      OfficeParsers.pdfText(OfficeParsers.makePdfXrefStream(t, pred)) == t
    }
  }

  check("xlsx shared-strings round-trip preserves ragged string rows", min = 50) {
    val genRows = Gen.nonEmptyListOf(Gen.nonEmptyListOf(genPrintable).map(_.take(5))).map(_.take(8))
    Prop.forAll(genRows) { rows =>
      OfficeParsers.xlsxRows(OfficeParsers.makeXlsx(rows)) == rows
    }
  }

  check("msg CFB mini-stream round-trip is exact", min = 50) {
    val genShort = genPrintable.map(_.take(300))
    Prop.forAll(genShort, genShort) { (subj, body) =>
      OfficeParsers.msgText(OfficeParsers.makeMsg(subj, body)) == s"Subject: $subj\n\n$body"
    }
  }

  check("msg attachments round-trip: names, bytes and ORDER survive, subject/body untouched", min = 30) {
    // payload sizes straddle the 4096-byte ministream cutoff, so the
    // fuzz exercises both stream tiers and multi-sector directories
    val genAtt: Gen[(String, Array[Byte])] = for {
      name <- genPrintable.map(_.take(20))
      ext <- Gen.oneOf(".txt", ".pdf", ".bin")
      n <- Gen.frequency(4 -> Gen.choose(0, 300), 1 -> Gen.choose(4000, 9000))
      seed <- Gen.choose(0, 255)
    } yield (name + ext, Array.tabulate[Byte](n)(i => ((i * 31 + seed) % 251).toByte))
    val genShort = genPrintable.map(_.take(120))
    Prop.forAll(genShort, genShort, Gen.listOf(genAtt).map(_.take(6))) { (subj, body, atts) =>
      val msg = OfficeParsers.makeMsg(subj, body, atts)
      val back = OfficeParsers.msgAttachments(msg)
      OfficeParsers.msgText(msg) == s"Subject: $subj\n\n$body" &&
        back.map(_._1) == atts.map(_._1) &&
        back.zip(atts).forall { case ((_, b), (_, a)) => java.util.Arrays.equals(b, a) }
    }
  }

  // ---- unicode normalization kernel --------------------------------------

  /** Text biased toward normalization-sensitive sequences: combining
    * marks after base letters, singleton-mapped chars, compatibility
    * chars, plus plain ASCII (the fast path). */
  private val genNormPiece: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("é", "Å", "ñ", "ô", "ü"),
    1 -> Gen.oneOf("Å", "Ω", "Å", "é"), // singletons + precomposed
    1 -> Gen.oneOf("ﬁ", "０", "²", "　"), // NFKC-only material
    1 -> Gen.oneOf(" ", "😀", "日"),
  )
  private val genNormText: Gen[String] = Gen.listOf(genNormPiece).map(_.mkString)

  check("normalize kernel ≡ java.text.Normalizer for every form; idempotent") {
    import graft.expressions.NormalizeText.kernel
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val forms = java.text.Normalizer.Form.values.toSeq
    Prop.forAll(genNormText) { t =>
      forms.forall { f =>
        val once = kernel(u8(t), f).toString
        once == java.text.Normalizer.normalize(t, f) &&
          kernel(u8(once), f).toString == once // idempotence (UAX #15)
      }
    }
  }

  // ---- avro container codec ----------------------------------------------

  check("avro schema mapping + container codec round-trip arbitrary rows, deterministically", min = 50) {
    import graft.sources.AvroIo
    import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
    // the same record schema, null-union encode, and Utf8/ByteBuffer
    // decode conventions AvroIo.write/read use, exercised at the
    // avro-core level so the fuzz needs no SparkSession
    val sparkSchema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("b", BinaryType)))
    val genRow: Gen[(Long, Option[String], Option[Array[Byte]])] = for {
      id <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      s <- Gen.option(Gen.listOf(Gen.oneOf(
        Gen.choose('\u0000', 'ÿ'), Gen.choose('Ā', '휀'))).map(_.mkString))
      n <- Gen.choose(0, 300)
      seed <- Gen.choose(0, 255)
      b <- Gen.option(Gen.const(Array.tabulate[Byte](n)(i => ((i * 131 + seed) % 256).toByte)))
    } yield (id, s, b)
    def encode(rows: List[(Long, Option[String], Option[Array[Byte]])]): Array[Byte] = {
      val schema = AvroIo.avroSchema(sparkSchema)
      val out = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out, Array.fill[Byte](16)(7))
      rows.foreach { case (id, s, b) =>
        val rec = new GenericData.Record(schema)
        rec.put(0, id)
        rec.put(1, s.orNull)
        rec.put(2, b.map(java.nio.ByteBuffer.wrap).orNull)
        w.append(rec)
      }
      w.close()
      out.toByteArray
    }
    Prop.forAll(Gen.listOf(genRow)) { rows =>
      val bytes = encode(rows)
      val r = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
      val back = Iterator.continually(r).takeWhile(_.hasNext).map(_.next()).map { rec =>
        (rec.get("id").asInstanceOf[Long],
          Option(rec.get("s")).map(_.toString),
          Option(rec.get("b")).map { v =>
            val bb = v.asInstanceOf[java.nio.ByteBuffer]
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          })
      }.toList
      r.close()
      back.size == rows.size &&
        back.zip(rows).forall { case ((gi, gs, gb), (wi, ws, wb)) =>
          gi == wi && gs == ws &&
            ((gb, wb) match {
              case (None, None) => true
              case (Some(x), Some(y)) => java.util.Arrays.equals(x, y)
              case _ => false
            })
        } &&
        java.util.Arrays.equals(bytes, encode(rows)) // pinned sync ⇒ byte-stable
    }
  }

  // ---- tar shard codec ---------------------------------------------------

  check("tar writer/parser round-trips arbitrary entry lists exactly, deterministically", min = 50) {
    import graft.sources.TarShards
    // names within the 100-byte ustar field (UTF-8!), payload sizes
    // biased toward the 512-byte block boundary where padding bugs live
    val genEntry: Gen[(String, Array[Byte])] = for {
      name <- genPrintable.map(s => s.filter(_ != 0.toChar))
        .suchThat(s => s.nonEmpty && s.getBytes(StandardCharsets.UTF_8).length <= 100)
      n <- Gen.frequency(
        3 -> Gen.choose(0, 600),
        2 -> Gen.oneOf(511, 512, 513, 1023, 1024, 1025),
        1 -> Gen.choose(2000, 5000))
      seed <- Gen.choose(0, 255)
    } yield (name, Array.tabulate[Byte](n)(i => ((i * 131 + seed) % 256).toByte))
    Prop.forAll(Gen.listOf(genEntry)) { entries =>
      val tar = TarShards.writeTar(entries.iterator)
      val back = TarShards.parseTar(tar)
      tar.length % 512 == 0 &&
        back.map(_._1) == entries.map(_._1) &&
        back.zip(entries).forall { case ((_, got), (_, want)) =>
          java.util.Arrays.equals(got, want)
        } &&
        java.util.Arrays.equals(tar, TarShards.writeTar(entries.iterator))
    }
  }

  check("interval-bin rewrite: every qualifying point's bin is listed exactly once") {
    // the arithmetic at the heart of RangeJoinOps.binnedPointInterval,
    // in the exact double-floor form the Catalyst expressions use:
    // p ∈ [s, e) ⟹ bin(p) ∈ [bin(s), bin(e−1)], bins distinct — so the
    // bin equi-join finds every qualifying pair on exactly one key
    val gen = for {
      s <- Gen.chooseNum(-100000L, 100000L)
      span <- Gen.chooseNum(0L, 5000L)
      p <- Gen.chooseNum(-105000L, 105000L)
      w <- Gen.chooseNum(1L, 512L)
    } yield (s, s + span, p, w)
    Prop.forAll(gen) { case (s, e, p, w) =>
      def bin(x: Long): Long = math.floor(x.toDouble / w).toLong
      val bins = if (e <= s) Seq.empty[Long] else bin(s) to bin(e - 1)
      val qualifies = p >= s && p < e
      (!qualifies || bins.contains(bin(p))) &&
        bins.distinct == bins &&
        bins.size <= (e - s) / w + 2 // the ≤⌈span/w⌉+1 duplication bound
    }
  }

  check("delta DV codec: z85 round-trips arbitrary bytes through the padded form") {
    import graft.sources.DeltaDv
    Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      val raw = bs.toArray
      val back = DeltaDv.z85DecodeN(DeltaDv.z85Encode(raw), raw.length)
      back.toSeq == raw.toSeq
    }
  }

  check("delta DV codec: RoaringBitmapArray round-trips any position set sorted-distinct") {
    import graft.sources.DeltaDv
    // positions span several 32-bit keys, including the boundary rows a
    // naive int cast would mangle (0xFFFFFFFF, key transitions)
    val posGen = Gen.oneOf(
      Gen.choose(0L, 5000L),
      Gen.choose((1L << 32) - 3L, (1L << 32) + 3L),
      Gen.choose(5L << 32, (5L << 32) + 100000L))
    Prop.forAll(Gen.listOf(posGen)) { ps =>
      DeltaDv.deserialize(DeltaDv.serialize(ps)).toSeq == ps.distinct.sorted
    }
  }

  check("bloom write/probe symmetry: the packed filter NEVER false-negatives") {
    import graft.operators.BloomOps
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Prop.forAll(Gen.listOf(Gen.choose(0L, 1000000L))) { keys =>
      val agg = new BloomOps.BloomAggregator(65536, 4)
      val bits = keys.foldLeft(agg.zero) { (b, k) => agg.reduce(b, md5hex(k.toString)) }
      val bitSeq = bits.toSeq
      // every inserted key admitted (the guarantee file skipping rests on)
      keys.forall(k => BloomOps.admits(bitSeq, k.toString, 65536, 4)) && {
        // and the filter is not degenerate: absent keys mostly rejected
        val absent = (2000000L until 2000200L)
        val fp = absent.count(k => BloomOps.admits(bitSeq, k.toString, 65536, 4))
        keys.size > 5000 || fp < 60 // 8 KB / 4 hashes: fp stays low at test sizes
      }
    }
  }
}
