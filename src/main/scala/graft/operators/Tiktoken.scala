package graft.operators

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** tiktoken-COMPATIBLE byte-level BPE: the reference counts tokens with
  * tiktoken's `cl100k_base` (/root/reference/llmcore/cms/
  * sharepointutils.py:364,379; parsers.py:206-208). The merge DATA
  * cannot ship into a zero-egress build (SURVEY §7.4), but every part
  * of the MECHANISM is public and implemented exactly here:
  *
  *   - [[loadRanks]] reads the published `.tiktoken` file format
  *     (`base64(token) rank` per line) — point it at the public
  *     cl100k_base.tiktoken and token counts match tiktoken's exactly;
  *   - [[pretokenize]] applies the published cl100k_base
  *     pre-tokenization regex (contractions / letter runs / 1-3 digit
  *     groups / punctuation+newlines / whitespace);
  *   - [[encode]] is the byte_pair_merge loop: repeatedly merge the
  *     adjacent part pair whose CONCATENATION has the lowest rank,
  *     until no concatenation is in the vocabulary.
  *
  * Tokens are byte strings, carried as latin-1 Strings (byte-exact,
  * hashable). [[graft.operators.BpeOps]] stays the TRAINING face (pair
  * -merge tables learned from the corpus); this is the SERVING face
  * for externally-published rank vocabularies.
  *
  * Scale: the rank table is tokenizer-sized (bounded, NOT corpus-
  * growing) — broadcasting it is the legitimate case; counting is a
  * narrow per-row pass (documented UDF exception, SURVEY §7.3).
  */
object Tiktoken {

  /** The published cl100k_base pre-tokenization pattern.
    * UNICODE_CHARACTER_CLASS makes Java's \s match Unicode whitespace
    * (NBSP, line/paragraph separators) the way the original regex
    * engine does — without it, Java's ASCII-only \s shunts U+00A0 into
    * the punctuation branch and the counts diverge from tiktoken's. */
  val Cl100kPattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    """(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  def pretokenize(text: String): Vector[String] = {
    val m = Cl100kPattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Parse `.tiktoken` lines (`base64(token) rank`). Blank lines are
    * skipped; byte tokens become latin-1 strings. */
  def parseRanks(lines: Iterator[String]): Map[String, Int] =
    lines.map(_.trim).filter(_.nonEmpty).map { line =>
      val Array(b64, rank) = line.split("\\s+", 2)
      new String(Base64.getDecoder.decode(b64), StandardCharsets.ISO_8859_1) -> rank.trim.toInt
    }.toMap

  def loadRanks(path: String): Map[String, Int] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseRanks(src.getLines()) finally src.close()
  }

  /** Render a rank table back to the file format (rank order) — the
    * round-trip partner of [[parseRanks]], used to serialize corpus-
    * trained vocabularies for external tools. */
  def formatRanks(ranks: Map[String, Int]): String =
    ranks.toSeq.sortBy(_._2).map { case (tok, rank) =>
      s"${Base64.getEncoder.encodeToString(tok.getBytes(StandardCharsets.ISO_8859_1))} $rank"
    }.mkString("\n")

  /** byte_pair_merge: merge the lowest-ranked adjacent concatenation
    * until none is in the vocabulary; ties (impossible in a well-formed
    * rank table, where ranks are unique) break leftmost. */
  def encode(piece: Array[Byte], ranks: Map[String, Int]): Vector[String] = {
    var parts = piece.map(b => new String(Array(b), StandardCharsets.ISO_8859_1)).toVector
    var done = parts.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        ranks.get(parts(i) + parts(i + 1)).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        parts = (parts.take(bestIdx) :+ (parts(bestIdx) + parts(bestIdx + 1))) ++
          parts.drop(bestIdx + 2)
        done = parts.length < 2
      }
    }
    parts
  }

  def countTokens(text: String, ranks: Map[String, Int]): Long =
    pretokenize(text).iterator
      .map(p => encode(p.getBytes(StandardCharsets.UTF_8), ranks).length.toLong)
      .sum

  /** Column face: per-row token count with the rank table broadcast. */
  def tokenCountCol(spark: SparkSession, ranks: Map[String, Int]): Column => Column = {
    val b = spark.sparkContext.broadcast(ranks)
    val f = udf((s: String) => if (s == null) 0L else countTokens(s, b.value))
    c => f(c)
  }
}
