package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.{Charset, StandardCharsets}
import java.util.Base64
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Pure-JVM text decoders for the zip+XML office formats and MIME mail
  * (SURVEY §2.1 S6/S7). The reference parses these via langchain
  * Unstructured loaders (`doc_parser` /root/reference/llmcore/cms/
  * parsers.py:89-93, `pptx_parser` :75-79, `email_parser` :120-124);
  * those native decoders aren't available in a zero-egress JVM, but
  * DOCX/PPTX are just zip archives of OOXML parts and EML is plain
  * MIME text — all parseable with `java.util.zip` + StAX + string
  * processing from the JDK alone. PDF and MSG (OLE compound files)
  * genuinely need external codecs and stay stubbed in [[ParseOps]].
  *
  * Extraction semantics (mirrors what the reference's loaders yield):
  *   - docx: text of every `<w:t>` run in `word/document.xml`,
  *     paragraphs (`<w:p>`) joined with '\n';
  *   - pptx: text of every `<a:t>` run per `ppt/slides/slideN.xml`
  *     (numeric slide order), paragraphs joined '\n', slides joined '\n';
  *   - eml: decoded body of the first `text/plain` part (any text-media
  *     part as fallback), honoring multipart nesting, quoted-printable
  *     and base64 transfer encodings, and the declared charset.
  *
  * All methods throw on undecodable input — [[ParseOps]] catches and
  * falls back to the deterministic byte-length stub, so a corrupt file
  * degrades instead of failing the job. Zip entries are size-capped:
  * a zip bomb in one row must not OOM an executor.
  */
object OfficeParsers {

  /** Per-entry decompressed-size cap. Office text parts are KB-to-MB;
    * anything larger in a single XML part is a bomb, not a document. */
  private val MaxEntryBytes: Int = 64 * 1024 * 1024

  // ---- zip plumbing ------------------------------------------------------

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n >= 0) {
            buf.write(chunk, 0, n)
            if (buf.size > MaxEntryBytes)
              throw new IllegalArgumentException(s"zip entry ${e.getName} exceeds $MaxEntryBytes bytes")
            n = zin.read(chunk)
          }
          out += e.getName -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  // ---- XML text extraction ----------------------------------------------

  /** Concatenate the character content of every `<{textLocal}>` element,
    * inserting '\n' between successive `<{breakLocal}>` containers
    * (`w:p` / `a:p` paragraphs — namespace prefixes are ignored, OOXML
    * local names don't collide here). */
  private def xmlText(xml: Array[Byte], textLocal: String, breakLocal: String): String = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
    val sb = new StringBuilder
    var inText = false
    var sawPara = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val n = r.getLocalName
            if (n == breakLocal) {
              if (sawPara) sb.append('\n')
              sawPara = true
            }
            if (n == textLocal) inText = true
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inText) sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == textLocal) inText = false
          case _ =>
        }
      }
    } finally r.close()
    sb.toString
  }

  // ---- format decoders ---------------------------------------------------

  /** DOCX → text (REF `doc_parser` parsers.py:89-93). */
  def docxText(bytes: Array[Byte]): String = {
    val doc = zipEntries(bytes).getOrElse("word/document.xml",
      throw new IllegalArgumentException("not a docx: word/document.xml missing"))
    xmlText(doc, "t", "p")
  }

  private val SlideName = raw"ppt/slides/slide(\d+)\.xml".r

  /** PPTX → text, slides in numeric order (REF `pptx_parser`
    * parsers.py:75-79). */
  def pptxText(bytes: Array[Byte]): String = {
    val slides = zipEntries(bytes).toSeq
      .collect { case (SlideName(n), body) => (n.toInt, body) }
      .sortBy(_._1)
    if (slides.isEmpty)
      throw new IllegalArgumentException("not a pptx: no ppt/slides/slideN.xml")
    slides.map { case (_, body) => xmlText(body, "t", "p") }.mkString("\n")
  }

  /** EML → body text of the first text/plain (else first text-media)
    * part (REF `email_parser` parsers.py:120-124). */
  def emlText(bytes: Array[Byte]): String = {
    // ISO-8859-1 is byte-preserving, so transfer-decoding can recover
    // the exact payload bytes before applying the declared charset
    val part = parseMimePart(new String(bytes, StandardCharsets.ISO_8859_1))
    part.getOrElse(throw new IllegalArgumentException("no text/* part in message"))
  }

  private final case class MimeHeaders(contentType: String, params: Map[String, String], cte: String)

  private def splitHeadersBody(raw: String): (Seq[String], String) = {
    val idx = raw.indexOf("\r\n\r\n") match {
      case -1 => raw.indexOf("\n\n") match {
        case -1 => raw.length
        case i  => i
      }
      case i => i
    }
    val headBlock = raw.substring(0, idx)
    val body = raw.substring(math.min(raw.length, idx)).dropWhile(c => c == '\r' || c == '\n')
    // unfold continuation lines (RFC 5322 §2.2.3)
    val unfolded = scala.collection.mutable.ArrayBuffer.empty[String]
    headBlock.linesIterator.foreach { l =>
      if ((l.startsWith(" ") || l.startsWith("\t")) && unfolded.nonEmpty)
        unfolded(unfolded.length - 1) = unfolded.last + " " + l.trim
      else unfolded += l.stripSuffix("\r")
    }
    (unfolded.toSeq, body)
  }

  private def headersOf(lines: Seq[String]): MimeHeaders = {
    def header(name: String): Option[String] =
      lines.find(_.toLowerCase.startsWith(name.toLowerCase + ":"))
        .map(_.substring(name.length + 1).trim)
    val ct = header("Content-Type").getOrElse("text/plain")
    val media = ct.split(";")(0).trim.toLowerCase
    val params = ct.split(";").drop(1).flatMap { p =>
      p.split("=", 2) match {
        case Array(k, v) => Some(k.trim.toLowerCase -> v.trim.stripPrefix("\"").stripSuffix("\""))
        case _           => None
      }
    }.toMap
    MimeHeaders(media, params, header("Content-Transfer-Encoding").getOrElse("7bit").trim.toLowerCase)
  }

  /** Depth-first: first text/plain part wins; any text-media part is
    * the fallback. */
  private def parseMimePart(raw: String): Option[String] = {
    val (headerLines, body) = splitHeadersBody(raw)
    val h = headersOf(headerLines)
    if (h.contentType.startsWith("multipart/")) {
      val boundary = h.params.getOrElse("boundary",
        throw new IllegalArgumentException("multipart without boundary"))
      val pieces = body.split(raw"(?m)^--${java.util.regex.Pattern.quote(boundary)}(--)?[ \t]*\r?\n?")
        .drop(1).filter(_.trim.nonEmpty)
      val parsed = pieces.flatMap(p => parseMimePart(p).map((headersOf(splitHeadersBody(p)._1).contentType, _)))
      parsed.collectFirst { case ("text/plain", t) => t }
        .orElse(parsed.headOption.map(_._2))
    } else if (h.contentType.startsWith("text/")) {
      val payload: Array[Byte] = h.cte match {
        case "base64"           => Base64.getMimeDecoder.decode(body.filterNot(_.isWhitespace))
        case "quoted-printable" => decodeQuotedPrintable(body)
        case _                  => body.getBytes(StandardCharsets.ISO_8859_1)
      }
      val cs = h.params.get("charset").flatMap { c =>
        try Some(Charset.forName(c)) catch { case _: Exception => None }
      }.getOrElse(StandardCharsets.UTF_8)
      Some(new String(payload, cs))
    } else None
  }

  private def decodeQuotedPrintable(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else if (c == '=') { // soft line break: swallow = CR? LF?
        i += 1
        if (i < s.length && s.charAt(i) == '\r') i += 1
        if (i < s.length && s.charAt(i) == '\n') i += 1
      } else { out.write(c.toInt & 0xFF); i += 1 }
    }
    out.toByteArray
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** XLSX → positional rows of display strings (SURVEY §2.1 S5; REF
    * `process_service_catalog` /root/reference/llmcore/cms/
    * cmfunctions.py:446-453 — openpyxl `load_workbook(...).active` +
    * `iter_rows(values_only=True)` positional access). First sheet =
    * active sheet (openpyxl's default for generated workbooks). Handles
    * shared strings (`t="s"`), inline strings (`t="inlineStr"`), and
    * raw values; absent cells (sparse `r` refs) pad with "". Header
    * skipping (`min_row=2`) is the CALLER's slice, as in the reference. */
  def xlsxRows(bytes: Array[Byte]): Seq[Seq[String]] = {
    val entries = zipEntries(bytes)
    val shared: IndexedSeq[String] = entries.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheet = entries.toSeq
      .collect { case (n, b) if n.matches(raw"xl/worksheets/sheet\d+\.xml") => (n, b) }
      .sortBy { case (n, _) => n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toInt }
      .headOption.map(_._2)
      .getOrElse(throw new IllegalArgumentException("not an xlsx: no xl/worksheets/sheetN.xml"))
    parseSheet(sheet, shared)
  }

  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    // each <si> is one shared string: concatenate its <t> runs
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t"  => inT = true
              case _    =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inSi && inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = false; out += cur.toString
              case "t"  => inT = false
              case _    =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  /** "AA7" → column 26 (0-based). */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  private def parseSheet(xml: Array[Byte], shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
    val rows = Seq.newBuilder[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val value = new StringBuilder
    def flushCell(): Unit = if (row != null && cellCol >= 0) {
      while (row.length < cellCol) row += "" // pad skipped cells
      val v = value.toString
      val rendered = cellType match {
        case "s" => if (v.trim.nonEmpty) shared(v.trim.toInt) else ""
        case _   => v
      }
      if (row.length == cellCol) row += rendered else row(cellCol) = rendered
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = scala.collection.mutable.ArrayBuffer.empty[String]
              case "c" =>
                val ref = Option(r.getAttributeValue(null, "r"))
                cellCol = ref.map(colIndex).getOrElse(if (row == null) 0 else row.length)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                value.clear()
              case "v" => inV = true
              case "t" => inIsT = true // inside <is> inline strings
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV || (inIsT && cellType == "inlineStr")) value.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "row" => if (row != null) { rows += row.toSeq; row = null }
              case "c"   => flushCell(); cellCol = -1
              case "v"   => inV = false
              case "t"   => inIsT = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.result()
  }

  // ---- fixture writers (q_parse_office roundtrip + ParseSpec) ------------
  // Minimal valid bytes for each format, mirroring what the reference's
  // SharePoint download step would hand the parsers. Only used to
  // exercise the decoders with a known-text oracle — production inputs
  // arrive as downloaded binary columns.

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val z = new ZipOutputStream(buf)
    entries.foreach { case (name, body) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    buf.toByteArray
  }

  /** One-paragraph DOCX containing exactly `text`. */
  def makeDocx(text: String): Array[Byte] = zipOf(
    "word/document.xml" ->
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:body><w:p><w:r><w:t xml:space="preserve">${xmlEscape(text)}</w:t></w:r></w:p></w:body>
         |</w:document>""".stripMargin)

  /** One-slide PPTX containing exactly `text`. */
  def makePptx(text: String): Array[Byte] = zipOf(
    "ppt/slides/slide1.xml" ->
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
         |       xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
         |<p:cSld><p:spTree><p:sp><p:txBody>
         |<a:p><a:r><a:t>${xmlEscape(text)}</a:t></a:r></a:p>
         |</p:txBody></p:sp></p:spTree></p:cSld>
         |</p:sld>""".stripMargin)

  /** XLSX with the given string rows, written in the shared-strings
    * form Excel/openpyxl produce (every cell `t="s"` → sst index), so
    * the reader's lookup path is the one exercised. */
  def makeXlsx(rows: Seq[Seq[String]]): Array[Byte] = {
    val strings = rows.flatten.distinct
    val index = strings.zipWithIndex.toMap
    val sst = strings.map(s => s"<si><t xml:space=\"preserve\">${xmlEscape(s)}</t></si>")
      .mkString(
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">""".stripMargin,
        "", "</sst>")
    def cellRef(rowIdx: Int, colIdx: Int): String = {
      var c = colIdx + 1
      val sb = new StringBuilder
      while (c > 0) { sb.insert(0, ('A' + (c - 1) % 26).toChar); c = (c - 1) / 26 }
      sb.append((rowIdx + 1).toString).toString
    }
    val sheet = rows.zipWithIndex.map { case (cells, ri) =>
      cells.zipWithIndex.map { case (v, ci) =>
        s"""<c r="${cellRef(ri, ci)}" t="s"><v>${index(v)}</v></c>"""
      }.mkString(s"""<row r="${ri + 1}">""", "", "</row>")
    }.mkString(
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""".stripMargin,
      "", "</sheetData></worksheet>")
    zipOf("xl/sharedStrings.xml" -> sst, "xl/worksheets/sheet1.xml" -> sheet)
  }

  /** Multipart EML whose base64 text/plain body is exactly `text`
    * (exercises boundary walking, part preference, and transfer
    * decoding in one fixture). */
  def makeEml(text: String): Array[Byte] = {
    val b64 = Base64.getMimeEncoder.encodeToString(text.getBytes(StandardCharsets.UTF_8))
    s"""Subject: fixture
       |MIME-Version: 1.0
       |Content-Type: multipart/alternative; boundary="b42"
       |
       |--b42
       |Content-Type: text/html; charset=utf-8
       |
       |<p>ignored alternative</p>
       |--b42
       |Content-Type: text/plain; charset=utf-8
       |Content-Transfer-Encoding: base64
       |
       |$b64
       |--b42--
       |""".stripMargin.replace("\n", "\r\n").getBytes(StandardCharsets.US_ASCII)
  }
}
