package graft.queries

import graft.functions.{TextFunctions => TF}
import graft.sources.ParseOps
import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** KB-article / parser-dispatch inventory (SURVEY.md §2.9 G5/G6, §2.1
  * S6/S7, §3.3). The synthetic corpus has no HTML column, so each query
  * SYNTHESIZES the HTML/binary inputs from `documents` inside the query;
  * the oracle constructs the expected output analytically with the same
  * string algebra — which is exactly how the reference's KB pipeline is
  * specified (string assembly, cmfunctions.py:379-421).
  */
object KbQueries {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  private val Base = "https://example.com/"

  /** G5/F9: synthesized KB article (paragraph + relative anchor) through
    * html_to_text, plus the reference's "Short Description :" prefix and
    * url synthesis (cmfunctions.py:414-421). */
  val qKbHtml: QueryDef = QueryDef.sql(
    "q_kb_html",
    s"""SELECT doc_id,
       |  'Short Description : doc_' || CAST(doc_id AS VARCHAR) || ' Full Article: ' ||
       |    ${TF.cleanTextSql("text")} || ' More (${Base}kb/' || CAST(doc_id AS VARCHAR) || ')'
       |    AS extracted,
       |  '${Base}kb?id=' || CAST(doc_id AS VARCHAR) AS url
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val html = concat(
      lit("<style>p{color:red}</style><p>"), TF.cleanText(col("text")),
      lit("</p><a href=\"kb/"), col("doc_id").cast("string"), lit("\">More</a>"))
    docs(s, d)
      .select(col("doc_id"),
        concat(lit("Short Description : doc_"), col("doc_id").cast("string"),
          lit(" Full Article: "),
          graft.functions.HtmlFunctions.html_to_text(html)).as("extracted"),
        concat(lit(s"${Base}kb?id="), col("doc_id").cast("string")).as("url"))
      .orderBy("doc_id")
  }

  /** F9 table semantics: a synthesized 2×2 HTML table renders as the
    * reference's "Table: " pipe-joined block (cmfunctions.py:280-288). */
  val qKbTable: QueryDef = QueryDef.sql(
    "q_kb_table",
    """SELECT doc_id,
      |  'Table: ' || chr(10) || 'h1 | h2' || chr(10) ||
      |    source || ' | ' || lang || chr(10) || ' Table ends here' AS table_text
      |FROM documents
      |WHERE doc_id < 50
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val html = concat(
      lit("<table><tr><th>h1</th><th>h2</th></tr><tr><td>"), col("source"),
      lit("</td><td>"), col("lang"), lit("</td></tr></table>"))
    docs(s, d).filter(col("doc_id") < 50)
      .select(col("doc_id"),
        graft.functions.HtmlFunctions.html_to_text(html).as("table_text"))
      .orderBy("doc_id")
  }

  /** S6/S7/P7: extension extract (F1) + supported-type dispatch over
    * synthesized binary content. The non-txt rows carry deliberately
    * fake bytes (plain text under a .pdf/.docx name), so this query
    * pins the DEGRADE path: real decoders throw on them and fall back
    * to the deterministic byte-length stub the oracle computes. The
    * happy path over genuine bytes is [[qParseOffice]]. */
  val qParseDispatch: QueryDef = QueryDef.sql(
    "q_parse_dispatch",
    s"""WITH files AS (
       |  SELECT doc_id,
       |    'doc_' || CAST(doc_id AS VARCHAR) ||
       |      CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN '.txt' WHEN 1 THEN '.pdf'
       |                                   WHEN 2 THEN '.docx' ELSE '.xyz' END AS name,
       |    text
       |  FROM documents
       |), typed AS (
       |  SELECT doc_id, name, text,
       |    ${TF.extExtractSql("name")} AS file_type
       |  FROM files
       |)
       |SELECT doc_id, name, file_type,
       |  CASE WHEN file_type = 'txt' THEN text
       |       ELSE '[' || file_type || ':' || CAST(octet_length(CAST(text AS BLOB)) AS VARCHAR) || ' bytes]'
       |  END AS parsed
       |FROM typed
       |WHERE file_type IN ('${ParseOps.SupportedTypes.mkString("','")}')
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val files = docs(s, d).select(
      col("doc_id"),
      concat(lit("doc_"), col("doc_id").cast("string"),
        element_at(array(lit(".txt"), lit(".pdf"), lit(".docx"), lit(".xyz")),
          (col("doc_id") % 4).cast("int") + 1)).as("name"),
      col("text"))
    files
      .withColumn("file_type", TF.extExtract(col("name")))
      .filter(ParseOps.isSupported(col("file_type")))
      .withColumn("parsed",
        ParseOps.parseText(col("file_type"), col("text").cast("binary")))
      .select("doc_id", "name", "file_type", "parsed")
      .orderBy("doc_id")
  }

  /** G6 — service-catalog markdown assembly (REF `process_service_catalog`
    * /root/reference/llmcore/cms/cmfunctions.py:444-486): a "**Title**: "
    * section always, then "**Short Description**: ", "**Long
    * Description**: " (HTML → text) and "**Metadata**: " sections ONLY
    * when their field is non-blank, each prefixed "\n\n**name**: ";
    * plus the per-row token count of the assembled text (tiktoken in
    * the reference → the pinned F6 word-count approximation here).
    * Fields are synthesized from `documents` so both conditional
    * branches of every section are exercised (doc_id mod 3 blanks the
    * short description, doc_id mod 2 blanks the long description). */
  val qCatalogMarkdown: QueryDef = {
    val nl2 = "chr(10) || chr(10)"
    val mdSql =
      s"""$nl2 || '**Title**: doc_' || CAST(doc_id AS VARCHAR)
         | || CASE WHEN CAST(doc_id % 3 AS INT) = 0 THEN ''
         |         ELSE $nl2 || '**Short Description**: about ' || source END
         | || CASE WHEN CAST(doc_id % 2 AS INT) = 0
         |         THEN $nl2 || '**Long Description**: ' || ${TF.cleanTextSql("text")}
         |         ELSE '' END
         | || CASE WHEN lang <> '' THEN $nl2 || '**Metadata**: ' || lang ELSE '' END"""
        .stripMargin.replaceAll("\n", " ")
    QueryDef.sql(
      "q_catalog_markdown",
      s"""SELECT doc_id,
         |  $mdSql AS extracted,
         |  '${Base}cat?id=' || CAST(doc_id AS VARCHAR) AS url,
         |  ${TF.wordCountSql(s"($mdSql)")} AS n_tokens
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val title = concat(lit("doc_"), col("doc_id").cast("string"))
      val short = when(col("doc_id") % 3 === 0, lit(""))
        .otherwise(concat(lit("about "), col("source")))
      val descHtml = when(col("doc_id") % 2 === 0,
        concat(lit("<p>"), TF.cleanText(col("text")), lit("</p>"))).otherwise(lit(""))
      val md = concat(
        lit("\n\n**Title**: "), title,
        when(short =!= "", concat(lit("\n\n**Short Description**: "), short)).otherwise(lit("")),
        when(descHtml =!= "",
          concat(lit("\n\n**Long Description**: "),
            graft.functions.HtmlFunctions.html_to_text(descHtml))).otherwise(lit("")),
        when(col("lang") =!= "", concat(lit("\n\n**Metadata**: "), col("lang"))).otherwise(lit("")))
      docs(s, d)
        .select(col("doc_id"), md.as("extracted"),
          concat(lit(s"${Base}cat?id="), col("doc_id").cast("string")).as("url"),
          TF.wordCount(md).as("n_tokens"))
        .orderBy("doc_id")
    }
  }

  /** S8 — the DEGRADE path of PDF table extraction: these "pdf" bytes
    * are document text, not a PDF, so the real geometric kernel throws
    * and the deterministic byte-stat table (same pipe shape,
    * parsers.py:127-137) is emitted; oracle reproduces that string
    * algebra over the blob. The happy path is [[qPdfTablesReal]]. */
  val qPdfTables: QueryDef = {
    def hx(c: String) = s"(ascii($c) - CASE WHEN ascii($c) >= 97 THEN 87 ELSE 48 END)"
    QueryDef.sql(
      "q_pdf_tables",
      s"""SELECT doc_id,
         |  'col|value' || chr(10) ||
         |  'n_bytes|' || CAST(octet_length(CAST(text AS BLOB)) AS VARCHAR) || chr(10) ||
         |  'first|' || CAST(${hx("substr(lower(hex(CAST(text AS BLOB))), 1, 1)")} * 16 +
         |              ${hx("substr(lower(hex(CAST(text AS BLOB))), 2, 1)")} AS VARCHAR) || chr(10)
         |    AS table_text
         |FROM documents
         |WHERE CAST(doc_id % 4 AS INT) = 1
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      docs(s, d).filter(col("doc_id") % 4 === 1)
        .select(col("doc_id"),
          ParseOps.extractPdfTables(col("text").cast("binary")).as("table_text"))
        .orderBy("doc_id")
    }
  }

  /** S8 happy path — REAL table extraction: each document's first six
    * words are laid out as a genuine 2×3 positioned-text PDF lattice
    * (Flate-compressed `Tm … Tj` cells) by [[OfficeParsers
    * .makePdfTable]], then reconstructed by the geometric kernel in
    * [[OfficeParsers.pdfTableText]] through the full
    * [[ParseOps.extractPdfTables]] dispatch. The oracle is pure string
    * algebra on the words — any drift in matrix tracking (Tm/Td/T*),
    * row clustering, column ordering, or the pipe/newline rendering
    * breaks the hash. Per-row narrow work. */
  val qPdfTablesReal: QueryDef = QueryDef.sql(
    "q_pdf_tables_real",
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
      |  WHERE doc_id < 200
      |)
      |SELECT doc_id,
      |  parts[1] || '|' || parts[2] || '|' || parts[3] || chr(10) ||
      |  parts[4] || '|' || parts[5] || '|' || parts[6] || chr(10) AS table_text
      |FROM w
      |WHERE len(parts) >= 6
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val mkTable = udf((ws: Seq[String]) =>
      graft.sources.OfficeParsers.makePdfTable(Seq(ws.slice(0, 3), ws.slice(3, 6))))
    docs(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), split(col("text"), " ").as("parts"))
      .filter(size(col("parts")) >= 6)
      .select(col("doc_id"),
        ParseOps.extractPdfTables(mkTable(col("parts"))).as("table_text"))
      .orderBy("doc_id")
  }

  /** S6/S7 end-to-end proof of the REAL binary decoders
    * ([[graft.sources.OfficeParsers]]): each document's text is written
    * into genuine DOCX (zip + word/document.xml), PPTX (zip +
    * slide1.xml), multipart-MIME EML, Flate-compressed PDF, and
    * MS-CFB MSG bytes by the fixture writers, then recovered through
    * the full [[ParseOps.parseText]] dispatch. The decode is exact, so
    * the oracle is pure string algebra on the text — any drift in zip
    * walking, XML text assembly, entity escaping, MIME boundary
    * parsing, base64/charset handling, deflate, PDF string escapes, or
    * CFB sector arithmetic breaks the hash. Per-row narrow work; no
    * shuffle but the output ORDER BY. */
  val qParseOffice: QueryDef = QueryDef.sql(
    "q_parse_office",
    """SELECT doc_id, text AS docx_text, text AS pptx_text,
      |  text AS eml_text, text AS pdf_text, text AS pdfx_text,
      |  'Subject: doc_' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text AS msg_text
      |FROM documents
      |WHERE doc_id < 200
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val mkDocx = udf((t: String) => graft.sources.OfficeParsers.makeDocx(t))
    val mkPptx = udf((t: String) => graft.sources.OfficeParsers.makePptx(t))
    val mkEml = udf((t: String) => graft.sources.OfficeParsers.makeEml(t))
    val mkPdf = udf((t: String) => graft.sources.OfficeParsers.makePdf(t))
    // post-2005 layout: ObjStm-compressed page objects + an xref
    // stream, PNG-predictor-filtered for every even doc — exercises
    // the PdfModel tier on half the corpus each way
    val mkPdfX = udf((id: Long, t: String) =>
      graft.sources.OfficeParsers.makePdfXrefStream(t, predictor = id % 2 == 0))
    val mkMsg = udf((id: Long, t: String) => graft.sources.OfficeParsers.makeMsg(s"doc_$id", t))
    docs(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"),
        ParseOps.parseText(lit("docx"), mkDocx(col("text"))).as("docx_text"),
        ParseOps.parseText(lit("pptx"), mkPptx(col("text"))).as("pptx_text"),
        ParseOps.parseText(lit("eml"), mkEml(col("text"))).as("eml_text"),
        ParseOps.parseText(lit("pdf"), mkPdf(col("text"))).as("pdf_text"),
        ParseOps.parseText(lit("pdf"), mkPdfX(col("doc_id"), col("text"))).as("pdfx_text"),
        ParseOps.parseText(lit("msg"), mkMsg(col("doc_id"), col("text"))).as("msg_text"))
      .orderBy("doc_id")
  }

  /** S6/S7 — the attachment-then-parse loop (REF `save_email_attachments`
    * parsers.py:103-109: every attachment of a .msg saved under its
    * long filename, then fed to the per-format parsers): each document
    * becomes a genuine MS-CFB MSG carrying TWO attachments — a .txt
    * (UTF-8 payload in the ministream tier) and a real Flate-compressed
    * .pdf built from the same text (usually the FAT-stream tier) —
    * then [[ParseOps.msgAttachments]] walks the directory tree,
    * explodes the child rows, and each payload goes back through the
    * full [[ParseOps.parseText]] dispatch on its own extension. Both
    * decoders are exact, so the oracle is pure string algebra; any
    * drift in the storage walk, sibling-tree parentage, filename
    * properties, payload chains, or the re-parse breaks the hash. */
  val qParseAttachments: QueryDef = QueryDef.sql(
    "q_parse_attachments",
    """WITH a AS (
      |  SELECT doc_id,
      |    'notes_' || CAST(doc_id AS VARCHAR) || '.txt' AS att_name,
      |    'txt' AS att_type, text AS parsed
      |  FROM documents WHERE doc_id < 150
      |  UNION ALL
      |  SELECT doc_id,
      |    'report_' || CAST(doc_id AS VARCHAR) || '.pdf',
      |    'pdf', text
      |  FROM documents WHERE doc_id < 150
      |)
      |SELECT doc_id, att_name, att_type, parsed
      |FROM a
      |ORDER BY doc_id, att_name""".stripMargin) { (s, d) =>
    val mkMsg = udf((id: Long, t: String) =>
      graft.sources.OfficeParsers.makeMsg(s"doc_$id", t, Seq(
        (s"notes_$id.txt", t.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
        (s"report_$id.pdf", graft.sources.OfficeParsers.makePdf(t)))))
    docs(s, d).filter(col("doc_id") < 150)
      .select(col("doc_id"), mkMsg(col("doc_id"), col("text")).as("raw"))
      .select(col("doc_id"), explode(ParseOps.msgAttachments(col("raw"))).as("att"))
      .select(col("doc_id"),
        col("att._1").as("att_name"),
        TF.extExtract(col("att._1")).as("att_type"),
        ParseOps.parseText(TF.extExtract(col("att._1")), col("att._2")).as("parsed"))
      .orderBy("doc_id", "att_name")
  }

  /** S5 end-to-end proof of the REAL xlsx reader: each document becomes
    * a genuine shared-strings workbook (header row + one catalog row),
    * read back through [[ParseOps.xlsxCells]] with the reference's
    * `min_row=2` header skip and positional row access
    * (cmfunctions.py:453-459). Exact decode → identity oracle. */
  val qParseXlsx: QueryDef = QueryDef.sql(
    "q_parse_xlsx",
    """SELECT doc_id,
      |  'doc_' || CAST(doc_id AS VARCHAR) AS title,
      |  text AS short_desc
      |FROM documents
      |WHERE doc_id < 200
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val mk = udf((id: Long, t: String) => graft.sources.OfficeParsers.makeXlsx(Seq(
      Seq("Title", "Short Description"), Seq(s"doc_$id", t))))
    docs(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"),
        ParseOps.xlsxCells(mk(col("doc_id"), col("text"))).as("rows"))
      // min_row=2: skip the header, then positional row[0] / row[1]
      .select(col("doc_id"),
        element_at(element_at(col("rows"), 2), 1).as("title"),
        element_at(element_at(col("rows"), 2), 2).as("short_desc"))
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(qKbHtml, qKbTable, qParseDispatch, qParseOffice,
    qParseAttachments, qParseXlsx, qCatalogMarkdown, qPdfTables, qPdfTablesReal)
}
