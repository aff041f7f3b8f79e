package graft

import java.text.Normalizer

import graft.expressions.NormalizeText
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernel + expression: UAX #15 goldens, the
  * allocation-free already-normalized fast path, null handling, and
  * SQL-registry vs functions-API agreement. The cross-engine claim
  * (NFC ≡ DuckDB `nfc_normalize` byte-for-byte) is hash-checked by
  * `q_doc_nfc`; these tests pin the kernel itself.
  */
class NormalizeSpec extends SparkSpec {

  private def nfc(s: String): String =
    NormalizeText.kernel(UTF8String.fromString(s), Normalizer.Form.NFC).toString
  private def nfkc(s: String): String =
    NormalizeText.kernel(UTF8String.fromString(s), Normalizer.Form.NFKC).toString

  test("NFC composes combining sequences and maps singletons") {
    assert(nfc("é") == "é")       // e + combining acute → é
    assert(nfc("Å") == "Å")       // A + combining ring → Å
    assert(nfc("Å") == "Å")        // ANGSTROM SIGN singleton → Å
    assert(nfc("ñ") == "ñ")       // n + combining tilde → ñ
    // NFC does NOT touch compatibility characters
    assert(nfc("ﬁ") == "ﬁ")        // ﬁ ligature survives NFC
    assert(nfc("０") == "０")        // fullwidth 0 survives NFC
  }

  test("NFKC additionally folds compatibility characters") {
    assert(nfkc("ﬁ") == "fi")           // ﬁ ligature → f i
    assert(nfkc("０Ａ") == "0A")     // fullwidth → ASCII
    assert(nfkc("²") == "2")            // superscript two → 2
    assert(nfkc("é") == "é")      // composition still applies
  }

  test("already-normalized input returns the same UTF8String reference") {
    val in = UTF8String.fromString("plain ascii stays untouched")
    assert(NormalizeText.kernel(in, Normalizer.Form.NFC) eq in,
      "the fast path must not allocate for clean input")
  }

  test("expression handles nulls, empty strings, and supplementary planes") {
    import spark.implicits._
    val df = Seq[(Integer, String)](
      (0, null), (1, ""), (2, "é"), (3, "😀 ok"))
      .toDF("id", "t")
      .selectExpr("id", "graft_normalize(t, 'NFC') AS n")
      .orderBy("id")
    val got = df.collect().map(r => Option(r.getString(1)))
    assert(got(0).isEmpty)
    assert(got(1).contains(""))
    assert(got(2).contains("é"))
    assert(got(3).contains("😀 ok")) // emoji already NFC
  }

  test("SQL registry form and functions-API form agree on corpus text") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), concat(col("text"), lit("Å")).as("t"))
    val both = docs.select(
      TF.normalize(spark, col("t"), "NFC").as("a"),
      call_function("graft_normalize", col("t"), lit("NFC")).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
  }

  test("unknown form is rejected loudly") {
    intercept[IllegalArgumentException] {
      TF.normalize(spark, col("x"), "NFX")
    }
  }

  test("URL canonicalization: every rule, plus the edges the oracle query can't weave") {
    import graft.functions.UrlFunctions
    import spark.implicits._
    val cases = Seq(
      // full messy form: case, www, default port, trailing slash, utm, fragment
      ("HTTPS://WWW.Example.COM:443/Articles/3/?utm_source=x&b=2&a=1#top",
        "https://example.com/Articles/3?a=1&b=2"),
      // already canonical: fixed point
      ("https://example.com/Articles/3?a=1&b=2",
        "https://example.com/Articles/3?a=1&b=2"),
      // http default port 80 dropped; non-default kept
      ("http://site.com:80/a", "http://site.com/a"),
      ("http://site.com:8080/a", "http://site.com:8080/a"),
      // https with port 80 is NOT default — kept
      ("https://site.com:80/a", "https://site.com:80/a"),
      // bare host: empty path becomes "/"
      ("https://Site.com", "https://site.com/"),
      ("https://site.com/?utm_source=x", "https://site.com/"),
      // all params dropped -> no "?" at all
      ("https://site.com/p?utm_source=a&utm_medium=b", "https://site.com/p"),
      // empty params (&&) dropped, order sorted, values untouched
      ("https://site.com/p?z=9&&a=B", "https://site.com/p?a=B&z=9"),
      // path case preserved, multiple trailing slashes stripped
      ("https://site.com/CaseSensitive///", "https://site.com/CaseSensitive"),
      // utm-prefixed VALUE is not a param prefix — kept
      ("https://site.com/p?q=utm_source", "https://site.com/p?q=utm_source"))
    val got = cases.map(_._1).toDF("url")
      .select(UrlFunctions.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), got.zip(cases).filter { case (g, (_, w)) => g != w }.toString)
  }
}
