package graft.sources

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRIGRAM substring index AT REST — the FOURTH index family beside
  * [[VectorIndex]] (ANN), [[MinHashIndex]] (near-dup) and
  * [[InvertedIndex]] (keyword/BM25): the postgres `pg_trgm` design for
  * accelerating `LIKE '%pattern%'`, which no term-level index can
  * answer (a substring crosses word boundaries; a word index never
  * sees it).
  *
  * Layout: (gram, doc_id) postings over the DISTINCT character
  * 3-grams of each document's cleaned text, partitioned by a BOUNDED
  * md5-prefix cell (first 2 hex chars → ≤256 directories; hot grams
  * hash-spread instead of skewing a per-gram layout — the same cell
  * contract as the other three index families).
  *
  * A probe takes the pattern's own 3-grams (driver-side, bounded by
  * pattern length), reads ONLY their cells (static partition
  * pruning), intersects postings (a doc containing the pattern
  * necessarily contains every gram — candidates are a SUPERSET of
  * matches, never lossy), and re-verifies candidates with an exact
  * `contains` against the corpus row — so "index probe ≡ full-scan
  * LIKE" is exact, and the verify scan touches O(candidates) rows.
  *
  * Scale: the full-scan LIKE reads 100 TB per query; the probe reads
  * O(pattern grams' postings) + O(candidate docs). The intersection
  * is a groupBy on doc_id with an all-grams count — one bounded
  * shuffle keyed by candidate doc, never the corpus.
  */
object TrigramIndex {

  val N = 3

  private def cellOf(gram: Column, hexChars: Int): Column =
    substring(md5(gram), 1, hexChars)

  private def metaPath(path: String) = s"$path/_meta"

  /** Distinct character 3-grams of a MATERIALIZED string column (the
    * column is referenced twice textually — substr + length — so
    * CollapseProject keeps the caller's cleaned-text column real
    * instead of re-cleaning per gram). */
  def gramsOf(c: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(c) - (N - 1), lit(0))),
      i => c.substr(i, lit(N))))

  /** `cellHexChars` is a LAYOUT parameter recorded in a `_meta`
    * sidecar (the MinHashIndex pattern): 2 hex chars (≤256 dirs) keeps
    * files large at warehouse scale; 1 (≤16 dirs) fits small corpora —
    * unlike the word-term index, trigram keys cover their hash space
    * densely, so every cell materializes and per-file overhead shows
    * at toy scale. Probes read the sidecar, so build and probe can
    * never disagree on the layout. */
  def build(docs: DataFrame, path: String, textCol: String = "text",
      cellHexChars: Int = 2): Unit = {
    require(cellHexChars >= 1 && cellHexChars <= 4)
    docs.withColumn("_t", TF.cleanText(col(textCol)))
      .select(col("doc_id"), explode(gramsOf(col("_t"))).as("gram"))
      .withColumn("cell", cellOf(col("gram"), cellHexChars))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(cellHexChars).toDF("cell_hex_chars")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(path))
  }

  private def cellHexCharsOf(spark: SparkSession, path: String): Int =
    spark.read.parquet(metaPath(path)).head.getInt(0)

  /** New documents' postings land beside existing cell files; nothing
    * is rewritten (same contract as [[InvertedIndex.append]]). */
  def append(newDocs: DataFrame, path: String, textCol: String = "text"): Unit = {
    val hex = cellHexCharsOf(newDocs.sparkSession, path)
    newDocs.withColumn("_t", TF.cleanText(col(textCol)))
      .select(col("doc_id"), explode(gramsOf(col("_t"))).as("gram"))
      .withColumn("cell", cellOf(col("gram"), hex))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Fold append-accumulated small files back into scan-sized cell
    * files ([[CellCompaction]]); rows and probe results unchanged,
    * `_meta` untouched. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[String] =
    CellCompaction.compact(spark, path, "cell", targetBytes)

  private def md5Cell(s: String, hexChars: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      .take(hexChars)

  /** Candidate doc_ids: documents whose trigram set contains EVERY
    * gram of the pattern. Reads only the pattern grams' cells, under
    * the layout the `_meta` sidecar records. */
  def candidates(spark: SparkSession, path: String, pattern: String): DataFrame = {
    require(pattern.length >= N, s"pattern must be at least $N chars")
    val hex = cellHexCharsOf(spark, path)
    val grams = pattern.sliding(N).toSeq.distinct
    val cells = grams.map(md5Cell(_, hex)).distinct.sorted
    spark.read.parquet(path)
      .filter(col("cell").isin(cells: _*)) // static partition pruning
      .filter(col("gram").isin(grams: _*))
      .groupBy("doc_id").agg(countDistinct(col("gram")).as("ng"))
      .filter(col("ng") === grams.size)
      .select("doc_id")
  }

  /** Exact substring search: gram-intersected candidates re-verified
    * with `contains` on the cleaned text — identical row set to the
    * full-scan LIKE, at probe cost. `cand0` lets a caller that ALSO
    * consumes the candidate set (e.g. as pruning evidence) pass its
    * pinned copy so the intersection probe runs once, not per
    * reference. */
  def search(docs: DataFrame, path: String, pattern: String,
      cand0: Option[DataFrame] = None): DataFrame = {
    val cand = cand0.getOrElse(candidates(docs.sparkSession, path, pattern))
    docs.join(cand, "doc_id")
      .withColumn("_t", TF.cleanText(col("text")))
      .filter(col("_t").contains(pattern))
      .drop("_t")
  }
}
