package graft.functions

import scala.collection.mutable
import scala.util.matching.Regex

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** HTML → text extraction (SURVEY.md §2.3 F9), reproducing the
  * reference's soup-walk semantics (/root/reference/llmcore/cms/
  * cmfunctions.py:269-321):
  *
  *   - `<style>` content dropped (process_soup :311-315);
  *   - text nodes outside table cells stripped & space-joined
  *     (process_descendants :291-301);
  *   - anchors rendered "text (href)", with relative hrefs resolved
  *     against a base URL (process_tag :269-277 — the reference pins a
  *     company portal; here the base is a parameter);
  *   - tables rendered "Table: " + " | "-joined cell rows +
  *     " Table ends here", newline-joined (process_table :280-288).
  *
  * Implemented as a single-pass tag tokenizer + stack walk over the
  * well-formed HTML subset the KB pipeline produces. A scalar UDF (a
  * recursive parse isn't expressible in Catalyst); it sits after the
  * narrow KB projection, so breaking codegen locally is acceptable
  * (SURVEY §4.2).
  */
object HtmlFunctions {

  private val token: Regex = "(?s)<[^>]+>|[^<]+".r
  private val tagName: Regex = "</?\\s*([a-zA-Z0-9]+)".r
  private val hrefAttr: Regex = "(?i)href\\s*=\\s*[\"']([^\"']*)[\"']".r

  def htmlToText(html: String, baseUrl: String = "https://example.com/"): String = {
    if (html == null) return ""
    val parts = mutable.ArrayBuffer.empty[String]
    val stack = mutable.Stack.empty[String]
    var anchorHref: Option[String] = None
    val anchorText = new StringBuilder
    val tableRows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[String]]
    val cell = new StringBuilder
    var inTable = false

    def inStyle = stack.contains("style")
    def inCell = stack.contains("td") || stack.contains("th")

    token.findAllIn(html).foreach { tok =>
      if (tok.startsWith("<")) {
        val closing = tok.startsWith("</")
        val name = tagName.findFirstMatchIn(tok).map(_.group(1).toLowerCase).getOrElse("")
        val selfClosing = tok.endsWith("/>") || name == "br" || name == "img" || name == "hr"
        if (!closing && !selfClosing) {
          name match {
            case "table" => inTable = true; tableRows.clear()
            case "tr" if inTable => tableRows += mutable.ArrayBuffer.empty[String]
            case "td" | "th" if inTable => cell.clear()
            case "a" =>
              anchorHref = hrefAttr.findFirstMatchIn(tok).map(_.group(1))
              anchorText.clear()
            case _ => ()
          }
          stack.push(name)
        } else if (closing) {
          name match {
            case "table" =>
              val body = tableRows.map(_.mkString(" | ")).mkString("\n")
              parts += ("Table: \n" + (if (body.isEmpty) "" else body + "\n") + " Table ends here")
              inTable = false
            case "td" | "th" if inTable && tableRows.nonEmpty =>
              tableRows.last += cell.toString.trim
            case "a" =>
              val href = anchorHref.getOrElse("")
              val resolved = if (href.startsWith("http")) href else baseUrl + href
              parts += s"${anchorText.toString} ($resolved)"
              anchorHref = None
            case _ => ()
          }
          while (stack.nonEmpty && stack.pop() != name) ()
        }
      } else if (!inStyle) {
        if (inCell) cell ++= tok
        else if (anchorHref.isDefined) anchorText ++= tok
        else if (!inTable) parts += tok.trim
      }
    }
    // REF joins parts with " " (process_soup :319-321); empty text nodes
    // are dropped here instead of collapsing whitespace afterwards, so
    // table-block newlines survive.
    parts.filter(_.nonEmpty).mkString(" ").trim
  }

  def htmlToTextUdf(baseUrl: String = "https://example.com/"): UserDefinedFunction =
    udf((html: String) => htmlToText(html, baseUrl))

  def html_to_text(c: Column): Column = htmlToTextUdf()(c)
}
