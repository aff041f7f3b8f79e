package graft.operators

import graft.functions.{Chunkers, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{size => asize, _}

/** Deduplication primitives (EXT north-star surface: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash).
  *
  * All primitives are pure Catalyst expressions with DuckDB mirrors —
  * the cross-engine invariant is that per-row array folds evaluate in
  * array order in both engines, and anything aggregated ACROSS rows is
  * an exact integer.
  *
  * Scale posture (100 TB): every dedup family reduces to
  * explode → shuffle-on-key → aggregate: exact dedup shuffles on the
  * content hash, Jaccard/MinHash shuffle on shingle/band keys (candidate
  * generation is linear in corpus size, never all-pairs), SimHash is
  * embarrassingly parallel per row.
  */
object DedupOps {

  /** Distinct word n-gram shingles of the cleaned text (≥1 shingle even
    * for short docs). */
  def shingles(c: Column, n: Int = 3): Column = {
    val w = Chunkers.words(TextFunctions.cleanText(c))
    array_distinct(transform(
      sequence(lit(0), greatest(asize(w) - n, lit(0))),
      i => array_join(slice(w, i + 1, lit(n)), " ")))
  }

  def shinglesSql(e: String, n: Int = 3): String = {
    val w = Chunkers.wordsSql(TextFunctions.cleanTextSql(e))
    s"""list_distinct(list_transform(
       |  range(0, GREATEST(len($w) - $n, 0) + 1),
       |  i -> array_to_string(($w)[i + 1 : i + $n], ' ')))""".stripMargin
  }

  /** Document-frequency cap over an exploded (doc_id, shingle) frame:
    * drops shingles shared by more than `maxDf` documents BEFORE any
    * shingle-key self-join. Without it, one boilerplate shingle shared
    * by 10⁶ documents at 100 TB makes its join group quadratic; a hot
    * shingle also carries no near-dup signal (it fails to discriminate
    * by definition). The window's shuffle is on `shingle` — the same
    * key the candidate join uses, so the exchange is reused. */
  def capShinglesByDf(sh: DataFrame, maxDf: Int): DataFrame =
    sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDf)
      .drop("df")

  /** MinHash signature: element s = lexicographic min of
    * md5(shingle ‖ '#' ‖ s) over the shingle set, for seeds 0..k-1. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), s =>
      array_min(transform(shingleCol, x => md5(concat(x, lit("#"), s.cast("string"))))))

  def minhashSignatureSql(shinglesE: String, k: Int): String =
    s"""list_transform(range(0, $k), s ->
       |  list_aggregate(list_transform($shinglesE, x -> md5(x || '#' || CAST(s AS VARCHAR))), 'min'))""".stripMargin

  /** LSH band keys: band b hashes rows [b·r, b·r+r) of the signature. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat(b.cast("string"), lit(":"),
        md5(array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), "|"))))

  def lshBandsSql(sigE: String, bands: Int, rowsPerBand: Int): String =
    s"""list_transform(range(0, $bands), b ->
       |  CAST(b AS VARCHAR) || ':' ||
       |  md5(array_to_string(($sigE)[b * $rowsPerBand + 1 : (b + 1) * $rowsPerBand], '|')))""".stripMargin

  /** 16-bit SimHash over the shingle set: bit j is set iff the count of
    * shingles whose md5 has bit j set is ≥ half the shingle count
    * (majority vote, expressed with exact integers). Bit j of a shingle
    * hash = bit (j mod 4) of hex nibble (j div 4). */
  def simhash16(shingleCol: Column): Column = {
    val nShingles = asize(shingleCol)
    (0 until 16).map { j =>
      val nib = j / 4
      val bit = j % 4
      val ones = asize(filter(shingleCol, x =>
        (conv(substring(md5(x), nib + 1, 1), 16, 10).cast("int")
          .bitwiseAND(lit(1 << bit))) > 0))
      when(ones * 2 >= nShingles, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  def simhash16Sql(shinglesE: String): String = {
    def hexVal(h: String) =
      s"(ascii($h) - CASE WHEN ascii($h) >= 97 THEN 87 ELSE 48 END)"
    val terms = (0 until 16).map { j =>
      val nib = j / 4
      val bit = j % 4
      val ones =
        s"len(list_filter($shinglesE, x -> (${hexVal(s"substr(md5(x), ${nib + 1}, 1)")} & ${1 << bit}) > 0))"
      s"CASE WHEN $ones * 2 >= len($shinglesE) THEN ${1L << j} ELSE 0 END"
    }
    terms.mkString("CAST((", " + ", ") AS BIGINT)")
  }
}
