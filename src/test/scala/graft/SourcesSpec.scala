package graft

import java.nio.file.Files

import graft.sources.{CsvIo, JsonIo}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Adversarial roundtrips for the text-format source/sink pairs: the
  * oracle queries (q_csv_roundtrip, q_jsonl_roundtrip) hash-check the
  * paths on the well-behaved testdata tables; these specs push the
  * strings the testdata doesn't contain — embedded newlines, quotes,
  * backslashes, control chars, unicode up to the supplementary plane,
  * empties and nulls — through write→read and require value identity.
  */
class SourcesSpec extends SparkSpec {

  private val nasty: Seq[String] = Seq(
    "plain",
    "", // empty string (distinct from null)
    "line\nbreak", "crlf\r\nline", "tab\tsep",
    "\"quoted\" and 'single'",
    "back\\slash and \\n literal",
    "comma,semicolon;pipe|",
    "json {\"k\": [1, 2]} braces",
    "unicode: éàß 日本語 Ж ε",
    "emoji: 😀🚀",
    "ctrl:.",
    " leading and trailing  ",
    "null" // the literal word, not a null
  )

  private def roundtripRows: Seq[Row] =
    nasty.zipWithIndex.map { case (s, i) => Row(i.toLong, s) } :+ Row(99L, null)

  private val schemaDdl = "id BIGINT, payload STRING"

  test("JSONL sink/scan round-trips adversarial strings and nulls") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(roundtripRows, 2), StructType.fromDDL(schemaDdl))
    val dir = Files.createTempDirectory("jsonl_rt").toFile.getAbsolutePath
    JsonIo.writeLines(df, dir)
    val back = JsonIo.readLines(spark, dir, schemaDdl)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(back.size == roundtripRows.size)
    for (Row(id: Long, s) <- roundtripRows)
      assert(back(id) == Option(s), s"payload $id mutated through JSONL")
  }

  test("CSV sink/scan round-trips quoting-hostile latin1 strings") {
    // latin1 path: stay in the charset, but hit every quoting branch
    val csvNasty = nasty.filterNot(s => s.exists(_ > 'ÿ'))
    val rows = csvNasty.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), StructType.fromDDL(schemaDdl))
    val dir = Files.createTempDirectory("csv_rt").toFile.getAbsolutePath
    CsvIo.writeLatin1(df, dir)
    // multiLine: embedded newlines are RFC-4180-quoted by the writer and
    // only parse back under the per-file (non-splittable) reader mode
    val back = CsvIo.readLatin1(spark, dir, schemaDdl, multiLine = true)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(back.size == rows.size)
    for (Row(id: Long, s) <- rows) {
      // CSV cannot represent empty-vs-null; both read back as null
      val expect = if (s == "") None else Option(s)
      assert(back(id) == expect, s"payload $id mutated through CSV")
    }
  }
}
