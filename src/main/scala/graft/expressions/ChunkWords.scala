package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused G2 chunker: fixed-size word chunks with overlap
  * (/root/reference/llmcore/cms/parsers.py:40-68 semantics), one pass.
  *
  * The composed Catalyst form in [[graft.functions.Chunkers]] evaluates
  * `transform(sequence(...), i -> array_join(slice(words, ...)))` — per
  * chunk it materializes a slice copy and walks the lambda interpreter.
  * This kernel splits once and emits the chunk strings directly, with
  * EXACTLY the composed form's semantics (same `\s+`→" " collapse, same
  * single-space split keeping empty leading token, chunk i covering
  * words [max(i·size − overlap, 0), i·size + size)) — bit-identical
  * output asserted against the composed form in ChunkersSpec.
  */
case class ChunkWords(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_chunk_words"

  override protected def nullSafeEval(input: Any): Any =
    ChunkWords.kernel(input.asInstanceOf[UTF8String], chunkSize, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ChunkWords.kernel($c, $chunkSize, $overlap)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkWords {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(text: UTF8String, chunkSize: Int, overlap: Int): ArrayData = {
    val words = text.toString.replaceAll("\\s+", " ").split(" ", -1)
    val n = words.length
    val nChunks = ((n + chunkSize - 1) / chunkSize).max(1) // = ceil(n/size); n ≥ 1 after split
    val out = new Array[Any](nChunks)
    var i = 0
    while (i < nChunks) {
      val start = math.max(i * chunkSize - overlap, 0)
      val end = math.min(i * chunkSize + chunkSize, n)
      val sb = new java.lang.StringBuilder
      var w = start
      while (w < end) {
        if (w > start) sb.append(' ')
        sb.append(words(w))
        w += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
