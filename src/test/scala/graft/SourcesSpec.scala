package graft

import java.nio.file.Files

import graft.sources.{CsvIo, JsonIo}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

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

  test("Tables guarantees a stable normalized schema for every table") {
    // The driver regenerated /root/testdata between rounds 5 and 6,
    // flipping events.ts from TIMESTAMP(NANOS) to un-adjusted
    // timestamp[us] and silently breaking 17 event-time queries. This
    // contract test makes the next drift loud: for each table, pin the
    // column names and the types downstream queries actually rely on.
    // Date-like columns are pinned to the CLASS of types every query
    // handles (date / timestamp / timestamp_ntz all compare correctly
    // against date-string literals); events.ts is pinned EXACTLY,
    // because Tables normalizes it and `unix_micros`/`window` require
    // TimestampType.
    def dateLike(t: DataType): Boolean = t match {
      case DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    val fixed: Map[String, Map[String, DataType]] = Map(
      "region"   -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation"   -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
                        "n_regionkey" -> IntegerType),
      "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
                        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                        "c_mktsegment" -> StringType),
      "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType),
      "part"     -> Map("p_partkey" -> LongType, "p_name" -> StringType,
                        "p_retailprice" -> DoubleType),
      "orders"   -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
                        "o_totalprice" -> DoubleType, "o_orderstatus" -> StringType,
                        "o_orderpriority" -> StringType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
                        "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
                        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
                        "l_tax" -> DoubleType, "l_returnflag" -> StringType,
                        "l_linestatus" -> StringType),
      "events"   -> Map("event_id" -> LongType, "ts" -> TimestampType,
                        "user_id" -> LongType, "event_type" -> StringType,
                        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
                        "lang" -> StringType, "source" -> StringType,
                        "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType, containsNull = true),
                        "label" -> IntegerType))
    val dateCols = Map(
      "orders" -> Seq("o_orderdate"), "lineitem" -> Seq("l_shipdate"))
    for (t <- Tables.all) {
      val schema = Tables(spark, sf, t).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      for ((c, want) <- fixed(t)) {
        assert(byName.contains(c), s"$t.$c missing; has ${schema.fieldNames.mkString(",")}")
        assert(byName(c) == want, s"$t.$c is ${byName(c)}, contract says $want")
      }
      for (c <- dateCols.getOrElse(t, Nil)) {
        assert(byName.contains(c), s"$t.$c missing")
        assert(dateLike(byName(c)), s"$t.$c is ${byName(c)}, not a date-like type")
      }
    }
  }

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
