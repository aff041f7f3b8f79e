package graft.sources

import graft.functions.HtmlFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** File-parsing dispatch (SURVEY.md §2.1 S6/S7, §2.2 P7).
  *
  * The reference dispatches on extension to per-format parsers
  * (`prepare_weaviate_data_chunks` /root/reference/llmcore/cms/
  * sharepointutils.py:311-322; parser map parsers.py:247-263). The
  * DISPATCH, the supported-type predicate, the text/html decode paths,
  * and EVERY binary decoder are real and JDK-only ([[OfficeParsers]]:
  * docx/pptx/xlsx are zip+XML, eml is MIME, pdf is content-stream
  * operator extraction, msg is an MS-CFB sector walk). A corrupt or
  * undecodable file degrades to the deterministic byte-length stub
  * instead of failing the job — the reference's per-row try/except has
  * the same contract; the only stub kernel left is S8's tabula-style
  * PDF TABLE extraction below.
  *
  * The office decoders run as Scala UDFs: a multi-entry zip walk +
  * XML pull-parse is inherently block-box row code (same shape as the
  * reference's loader calls), not expressible as a codegen Expression;
  * the surrounding dispatch stays in Catalyst so only matched rows pay
  * the UDF call.
  */
object ParseOps {

  val SupportedTypes: Seq[String] = Seq("txt", "html", "csv", "md", "pdf", "docx", "pptx", "msg", "eml")

  /** P7: supported-filetype predicate. */
  def isSupported(fileType: Column): Column = fileType.isin(SupportedTypes: _*)

  /** S8: PDF table extraction (REF `process_pdf_table`
    * /root/reference/llmcore/cms/parsers.py:127-137: tabula reads every
    * table, each rendered as a pipe-separated CSV block,
    * `to_csv(sep='|')`). REAL for digitally-authored PDFs:
    * [[OfficeParsers.pdfTableText]] reconstructs the table from the
    * text-matrix geometry of the content streams (the same page
    * geometry tabula's stream mode clusters) — rows by line-origin y,
    * columns by x, pipe-joined, newline-terminated. Bytes that aren't a
    * positioned-text PDF degrade to the deterministic byte-statistics
    * table in the SAME pipe shape, keeping the reference's per-row
    * try/except contract. */
  def extractPdfTables(content: Column): Column = pdfTablesUdf(content)

  private val pdfTablesUdf = udf((b: Array[Byte]) =>
    if (b == null) null
    else try OfficeParsers.pdfTableText(b) catch {
      case scala.util.control.NonFatal(_) =>
        val first = if (b.isEmpty) 0 else b(0) & 0xFF
        s"col|value\nn_bytes|${b.length}\nfirst|$first\n"
    })

  /** Decoder UDF: real extraction, stub-string fallback on any
    * undecodable input (so fake/corrupt bytes degrade deterministically
    * — asserted against the DuckDB oracle in q_parse_dispatch). */
  private def decoderUdf(tpe: String, f: Array[Byte] => String) =
    udf((b: Array[Byte]) =>
      if (b == null) null
      else try f(b) catch {
        case scala.util.control.NonFatal(_) => s"[$tpe:${b.length} bytes]"
      })

  private val docxUdf = decoderUdf("docx", OfficeParsers.docxText)
  private val pptxUdf = decoderUdf("pptx", OfficeParsers.pptxText)
  private val emlUdf  = decoderUdf("eml", OfficeParsers.emlText)
  private val pdfUdf  = decoderUdf("pdf", OfficeParsers.pdfText)
  private val msgUdf  = decoderUdf("msg", OfficeParsers.msgText)

  private val xlsxUdf = udf((b: Array[Byte]) =>
    if (b == null) null
    else try OfficeParsers.xlsxRows(b)
    catch { case scala.util.control.NonFatal(_) => null })

  private val msgAttachmentsUdf = udf((b: Array[Byte]) =>
    if (b == null) null
    else try OfficeParsers.msgAttachments(b)
    catch { case scala.util.control.NonFatal(_) => Seq.empty[(String, Array[Byte])] })

  /** MSG attachment extraction (REF `save_email_attachments`
    * parsers.py:103-109): `array<struct<_1:name, _2:bytes>>` per
    * message, empty on non-CFB/attachment-free bytes (degrade, not
    * throw). Explode + [[parseText]] over the extension replaces the
    * reference's save-to-disk-then-reparse loop with child rows:
    *
    * {{{
    * df.select($"id", explode(ParseOps.msgAttachments($"raw")).as("att"))
    *   .select($"id", $"att._1".as("name"),
    *     ParseOps.parseText(TextFunctions.ext($"att._1"), $"att._2"))
    * }}} */
  def msgAttachments(content: Column): Column = msgAttachmentsUdf(content)

  /** S5: XLSX scan → positional rows (`array<array<string>>`), the
    * service-catalog source shape (REF openpyxl `iter_rows` positional
    * access, cmfunctions.py:446-453; header skipping is the caller's
    * slice exactly as `min_row=2` is there). Real zip+XML decode
    * ([[OfficeParsers.xlsxRows]]); null on undecodable bytes. */
  def xlsxCells(content: Column): Column = xlsxUdf(content)

  /** S6/S7: parse(file_type, content_bytes) → text.
    *   txt/csv/md → UTF-8 decode;
    *   html       → UTF-8 decode + F9 html_to_text;
    *   docx/pptx/eml/pdf/msg → real JDK-only decode ([[OfficeParsers]]),
    *                   stub fallback on undecodable bytes (for pdf that
    *                   includes scanned/image-only files — no text
    *                   operators to extract);
    *   unsupported → null (caller filters with [[isSupported]]). */
  def parseText(fileType: Column, content: Column): Column = {
    val decoded = decode(content, "UTF-8")
    when(fileType.isin("txt", "csv", "md"), decoded)
      .when(fileType === "html", HtmlFunctions.html_to_text(decoded))
      .when(fileType === "docx", docxUdf(content))
      .when(fileType === "pptx", pptxUdf(content))
      .when(fileType === "eml", emlUdf(content))
      .when(fileType === "pdf", pdfUdf(content))
      .when(fileType === "msg", msgUdf(content))
      .otherwise(lit(null).cast("string"))
  }
}
