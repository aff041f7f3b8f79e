package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.operators.Tiktoken
import org.apache.spark.sql.functions._

/** tiktoken-compatibility: pre-tokenizer goldens, the byte_pair_merge
  * loop against hand-computed merges, rank-file round-trip, and the
  * broadcast Column face.
  */
class TiktokenSpec extends SparkSpec {

  // 256 byte singletons ranked 0-255, then multi-byte merges — the
  // shape every real .tiktoken vocabulary has
  private val ranks: Map[String, Int] =
    (0 until 256).map(b => new String(Array(b.toByte), StandardCharsets.ISO_8859_1) -> b).toMap ++
      Map("he" -> 256, "ll" -> 257, "hell" -> 258, " w" -> 259, "or" -> 260)

  test("pretokenize follows the published cl100k pattern") {
    assert(Tiktoken.pretokenize("I'm fine") == Vector("I", "'m", " fine"))
    assert(Tiktoken.pretokenize("abc 1234!") == Vector("abc", " ", "123", "4", "!"))
    assert(Tiktoken.pretokenize("x\n\ny") == Vector("x", "\n\n", "y"))
    assert(Tiktoken.pretokenize("don't stop") == Vector("don", "'t", " stop"))
    // Unicode whitespace must take the \s branches, not the
    // punctuation branch (UNICODE_CHARACTER_CLASS regression guard:
    // without the flag Java's ascii \s lets [^\s\p{L}\p{N}]+ swallow
    // the NBSP run together with the '!')
    assert(Tiktoken.pretokenize("a  !") == Vector("a", " ", " ", "!"))
    // single NBSP before a letter rides the optional one-char prefix,
    // same as the original engine
    assert(Tiktoken.pretokenize("a b") == Vector("a", " b"))
  }

  test("byte_pair_merge merges lowest-ranked concatenations first") {
    def enc(s: String) = Tiktoken.encode(s.getBytes(StandardCharsets.UTF_8), ranks)
    // hello: he+llo → he,ll,o → hell? no ("he"+"ll"="hell" rank 258) → hell,o
    assert(enc("hello") == Vector("hell", "o"))
    // world: " w" needs the leading space pretoken; bare word merges "or"
    assert(enc("world") == Vector("w", "or", "l", "d"))
    assert(enc(" world") == Vector(" w", "or", "l", "d"))
    // unknown-but-single-byte input stays singletons
    assert(enc("xyz") == Vector("x", "y", "z"))
  }

  test("countTokens composes pretokenizer and encoder") {
    // "hello world" → pretokens ["hello", " world"] → [hell,o] + [ w,or,l,d]
    assert(Tiktoken.countTokens("hello world", ranks) == 6L)
  }

  test("rank file round-trips byte-exactly, including non-ascii bytes") {
    val withHighBytes = ranks + (new String(Array(0xC3.toByte, 0xA9.toByte),
      StandardCharsets.ISO_8859_1) -> 261) // utf-8 'é'
    val f = Files.createTempFile("vocab", ".tiktoken")
    Files.writeString(f, Tiktoken.formatRanks(withHighBytes))
    val loaded = Tiktoken.loadRanks(f.toString)
    assert(loaded == withHighBytes)
    // é encodes to its merged 2-byte token under the loaded table
    assert(Tiktoken.countTokens("é", loaded) == 1L)
  }

  test("Column face matches the driver-side count") {
    import spark.implicits._
    val texts = Seq("hello world", "I'm fine", "don't stop hello")
    val df = texts.toDF("t")
      .withColumn("n", Tiktoken.tokenCountCol(spark, ranks)(col("t")))
    val got = df.select("t", "n").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach(t => assert(got(t) == Tiktoken.countTokens(t, ranks), s"mismatch for '$t'"))
  }
}
