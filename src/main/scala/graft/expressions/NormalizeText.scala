package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — the pre-tokenization canonicalization step of a text
  * pipeline (é as one codepoint vs e+combining-acute must dedup, hash,
  * and tokenize identically).
  *
  * Spark has no built-in for this; the JDK's `java.text.Normalizer`
  * implements UAX #15 exactly, so the kernel is a thin wrapper kept
  * OUT of the interpreter: `doGenCode` emits a static call, and the
  * already-normalized fast path (`Normalizer.isNormalized`, a scan
  * with no allocation) makes the common case — clean corpus text —
  * a cheap verification pass. At 100 TB nearly every row takes the
  * fast path; only rows carrying decomposed sequences pay for the
  * rebuild.
  *
  * Cross-engine contract: NFC output is hash-checked against DuckDB's
  * `nfc_normalize` (`q_doc_nfc`); both implement the same Unicode
  * tables, so md5-of-normalized-bytes agrees byte-for-byte.
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  private val normForm = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.kernel(input.asInstanceOf[UTF8String], normForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.expressions.NormalizeText.kernel($c, java.text.Normalizer.Form.$form)""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(text: UTF8String, form: Normalizer.Form): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, form)) text
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }
}
