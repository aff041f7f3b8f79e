package graft.sources

import graft.functions.HtmlFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** File-parsing dispatch (SURVEY.md §2.1 S6/S7, §2.2 P7).
  *
  * The reference dispatches on extension to per-format parsers
  * (`prepare_weaviate_data_chunks` /root/reference/llmcore/cms/
  * sharepointutils.py:311-322; parser map parsers.py:247-263). The
  * format-specific binary decoders (PyPDF, python-docx, …) are not
  * available in a zero-egress JVM, so: the DISPATCH, the supported-type
  * predicate, and the text/html decode paths are real; the binary
  * office-format decoders are deterministic stubs that surface the
  * binary length (the Spark-side plumbing — binaryFile-shaped schema,
  * per-type routing, downstream chunking — is what the engine owns).
  */
object ParseOps {

  val SupportedTypes: Seq[String] = Seq("txt", "html", "csv", "md", "pdf", "docx", "pptx", "msg", "eml")

  /** P7: supported-filetype predicate. */
  def isSupported(fileType: Column): Column = fileType.isin(SupportedTypes: _*)

  /** S8: PDF table extraction (REF `process_pdf_table`
    * /root/reference/llmcore/cms/parsers.py:127-137: tabula reads every
    * table, each rendered as a pipe-separated CSV block). The tabula
    * decode is unavailable offline, so the extraction kernel is a
    * deterministic stub that renders ONE table of byte statistics in
    * the exact pipe-joined shape the reference emits (`to_csv(sep='|')`
    * — header row, then value rows, newline-terminated); the dispatch,
    * shape, and downstream chunking contract are the real surface. */
  def extractPdfTables(content: Column): Column =
    concat(
      lit("col|value\n"),
      lit("n_bytes|"), length(content).cast("string"), lit("\n"),
      lit("first|"), coalesce(conv(substring(hex(content), 1, 2), 16, 10), lit("0")), lit("\n"))

  /** S6/S7: parse(file_type, content_bytes) → text.
    *   txt/csv/md → UTF-8 decode;
    *   html       → UTF-8 decode + F9 html_to_text;
    *   binary office formats → deterministic stub "[<type>:<n_bytes> bytes]"
    *                           (decoder unavailable offline);
    *   unsupported → null (caller filters with [[isSupported]]). */
  def parseText(fileType: Column, content: Column): Column = {
    val decoded = decode(content, "UTF-8")
    when(fileType.isin("txt", "csv", "md"), decoded)
      .when(fileType === "html", HtmlFunctions.html_to_text(decoded))
      .when(fileType.isin("pdf", "docx", "pptx", "msg", "eml"),
        concat(lit("["), fileType, lit(":"), length(content).cast("string"), lit(" bytes]")))
      .otherwise(lit(null).cast("string"))
  }
}
