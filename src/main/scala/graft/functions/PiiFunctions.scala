package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction surface (EXT: training-data governance).
  *
  * A large-scale training-data pipeline scrubs personally identifiable
  * information before anything ships to a training set; the standard
  * shape is a battery of anchored regexes (email / phone / SSN / IPv4)
  * applied per row — embarrassingly parallel, codegen-friendly, no
  * shuffle. As with [[TextFunctions]], every function ships as an
  * exactly-equivalent (Spark Column, DuckDB SQL) pair so the oracle gate
  * can hash-compare results.
  *
  * The synthetic corpus contains no real PII, so the oracle queries
  * first WEAVE deterministic PII spans into each document from its own
  * key (same string algebra on both engines), then detect/redact them —
  * the regex engines under test run over realistic mixed text either
  * way. Patterns stay in the Java-regex ∩ RE2 common subset ('\b',
  * bounded classes, no backreferences) so Spark and DuckDB agree on
  * every match.
  */
object PiiFunctions {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b555-[0-9]{4}\\b"
  val SsnPattern   = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val Ipv4Pattern  = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  /** Deterministic PII weave: every doc gets a phone; docs with
    * doc_id%3=0 gain an email + an IPv4; docs with doc_id%5=0 gain an
    * SSN. Pure string algebra over (doc_id, text) — identical on both
    * engines, so detection counts are exactly predictable per doc. */
  def synthPii(docId: Column, text: Column): Column = {
    val id4 = lpad((docId % 10000).cast("string"), 4, "0")
    concat(
      text,
      lit(" call 555-"), id4,
      when(docId % 3 === 0,
        concat(lit(" contact doc"), docId.cast("string"),
          lit("@corp-mail.example via 10."), (docId % 256).cast("string"), lit(".0.1")))
        .otherwise(lit("")),
      when(docId % 5 === 0, concat(lit(" ssn 123-45-"), id4)).otherwise(lit("")))
  }

  def synthPiiSql(docId: String, text: String): String = {
    val id4 = s"lpad(CAST($docId % 10000 AS VARCHAR), 4, '0')"
    s"""$text || ' call 555-' || $id4
       | || CASE WHEN $docId % 3 = 0
       |      THEN ' contact doc' || CAST($docId AS VARCHAR) || '@corp-mail.example via 10.' || CAST($docId % 256 AS VARCHAR) || '.0.1'
       |      ELSE '' END
       | || CASE WHEN $docId % 5 = 0 THEN ' ssn 123-45-' || $id4 ELSE '' END""".stripMargin.replaceAll("\n\\s*", " ")
  }

  // ---- detection ---------------------------------------------------------

  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  def countMatchesSql(e: String, pattern: String): String =
    s"len(regexp_extract_all($e, '$pattern'))"

  // ---- redaction ---------------------------------------------------------

  /** Replace every PII span with a typed placeholder. Order matters and
    * is fixed: email first (its local/domain parts contain digits and
    * dots that the later patterns could nibble), then SSN, then phone,
    * then IPv4. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, EmailPattern, "[EMAIL]"),
          SsnPattern, "[SSN]"),
        PhonePattern, "[PHONE]"),
      Ipv4Pattern, "[IP]")

  def redactSql(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace($e,
       | '$EmailPattern', '[EMAIL]', 'g'),
       | '$SsnPattern', '[SSN]', 'g'),
       | '$PhonePattern', '[PHONE]', 'g'),
       | '$Ipv4Pattern', '[IP]', 'g')""".stripMargin.replaceAll("\n\\s*", " ")
}
