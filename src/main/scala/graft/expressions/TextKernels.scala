package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused F5 cleaner: the composed three-regex chain
  *
  *   trim(regexp_replace(regexp_replace(regexp_replace(x,
  *     "[\n\r\t]", " "), "[^\x20-\x7E]", ""), "\s+", " "))
  *
  * evaluated as ONE byte scan, no intermediate strings. The composed
  * form walks the document four times through java.util.regex and
  * allocates three full copies per row; on the chunk pipeline (clean →
  * chunk → count per chunk) that is the single largest per-row cost.
  *
  * Semantics are EXACTLY the chain's, argued step by step:
  *   1. \n \r \t (0x09 0x0A 0x0D) become spaces;
  *   2. every other byte outside printable ASCII [0x20, 0x7E] is
  *      dropped — all remaining control chars, DEL, and every byte of
  *      every non-ASCII UTF-8 sequence (each such byte is ≥ 0x80, i.e.
  *      negative as a signed Byte, so one range test covers the
  *      multi-byte encodings the regex removes per code point);
  *   3. after step 2 the only whitespace left is 0x20, so "\s+" → " "
  *      reduces to collapsing space runs;
  *   4. trim strips leading/trailing spaces — the kernel never emits a
  *      leading space (nothing written yet ⇒ no pending separator) and
  *      never flushes a pending separator at end-of-input.
  * Bit-equality with the composed chain is property-tested in
  * TextKernelsSpec (adversarial fixtures + seeded random unicode).
  */
case class CleanText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_clean_text"

  override protected def nullSafeEval(input: Any): Any =
    CleanText.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CleanText.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CleanText {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val out = new Array[Byte](bytes.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      var b = bytes(i)
      if (b == 0x09 || b == 0x0A || b == 0x0D) b = 0x20
      if (b == 0x20) {
        if (n > 0) pendingSpace = true // leading spaces: trimmed
      } else if (b > 0x20 && b <= 0x7E) {
        if (pendingSpace) { out(n) = 0x20; n += 1; pendingSpace = false }
        out(n) = b
        n += 1
      } // else: dropped (control byte, DEL, or any non-ASCII byte)
      i += 1
    }
    // pendingSpace never flushed at end-of-input: trailing trim
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}

/** Fused match counter: `size(regexp_extract_all(x, p, 0))` without the
  * array — the text queries only ever take the SIZE of the extracted
  * array (word/BPE/punctuation/stopword/marker counts), so the composed
  * form allocates one UTF8String per match per row just to count them
  * and throw them away. This kernel runs the SAME java.util.regex
  * `Matcher.find()` loop Spark's RegExpExtractAll runs (same engine,
  * same pattern, same non-overlapping advance — including the zero-width
  * rules) and returns the count directly, so the value is equal by
  * construction; TextKernelsSpec pins it anyway.
  *
  * `size(split(x, p, -1))` rewrites to `CountMatches(x, p) + 1`: for a
  * never-zero-width pattern, Pattern.split with a negative limit yields
  * exactly (number of separator matches) + 1 pieces — leading match ⇒
  * leading empty piece, trailing match ⇒ kept trailing empty piece, no
  * match ⇒ the whole string as one piece.
  */
case class CountMatches(child: Expression, regex: String)
    extends UnaryExpression {

  @transient private lazy val pattern: Pattern = Pattern.compile(regex)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_count_matches"

  override protected def nullSafeEval(input: Any): Any =
    CountMatches.kernel(input.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countMatchesPattern", pattern,
      classOf[Pattern].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CountMatches.kernel($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountMatches {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(text: UTF8String, pattern: Pattern): Int = {
    val m = pattern.matcher(text.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }
}
