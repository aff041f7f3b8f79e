package graft.sources

import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash-LSH near-duplicate index AT REST — the text-side sibling of
  * [[VectorIndex]] (IVF): instead of recomputing signatures over the
  * whole corpus per near-dup job (`q_dedup_minhash` is the one-time
  * backfill shape), the banded signatures are persisted once,
  * partitioned by a bounded CELL key (band index × first hex nibble of
  * the band hash → bands×16 directories), and a probe for new/query
  * documents reads ONLY the cells its own band keys touch — directory
  * pruning, not a corpus scan.
  *
  * Scale posture (100 TB):
  *   - the index is linear in the corpus (bands rows per doc) and its
  *     partition count is FIXED (bands×16), so files stay large and the
  *     cell listing is O(1);
  *   - a probe touches ≤ |query docs| × bands cells regardless of corpus
  *     size; the candidate join shuffles on the full band key WITHIN the
  *     pruned cells only — never all-pairs, never history×history;
  *   - signature parameters ride a `_meta` sidecar so probes can never
  *     silently hash with different k/bands than the index was built
  *     with (a mismatch returns garbage candidates — better to make it
  *     unrepresentable).
  */
object MinHashIndex {

  private def metaPath(path: String) = s"$path/_meta"

  /** Band rows for a (doc_id, text) frame under the given signature
    * params: one (doc_id, band, cell) row per band. */
  private def bandRows(docs: DataFrame, textCol: String, k: Int,
      bands: Int, rowsPerBand: Int): DataFrame =
    docs.withColumn("_shw", DedupOps.cleanWords(col(textCol)))
      .withColumn("_sh", DedupOps.shinglesFromWords(col("_shw")))
      .withColumn("_sig", DedupOps.minhashSignature(col("_sh"), k))
      .select(col("doc_id"),
        explode(DedupOps.lshBands(col("_sig"), bands, rowsPerBand)).as("band"))
      // band format is "<bandIdx>:<md5hex>" — cell = band idx + first
      // hex nibble, a bounded bands×16 partition space
      .withColumn("cell",
        concat(substring(col("band"), 1, 1), lit(":"), substring(col("band"), 3, 1)))

  /** Build the index: banded signatures written one file per cell. */
  def build(docs: DataFrame, path: String, textCol: String = "text",
      k: Int = 8, bands: Int = 4, rowsPerBand: Int = 2): Unit = {
    require(bands <= 9, "cell key uses one digit of band index")
    bandRows(docs, textCol, k, bands, rowsPerBand)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((k, bands, rowsPerBand)).toDF("k", "bands", "rows_per_band")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(path))
  }

  /** Incremental append: new documents' band rows land beside the
    * existing cell files under the `_meta`-recorded signature params —
    * build and append can never hash with different k/bands (same
    * contract as [[TrigramIndex.append]]). Nothing is rewritten; run
    * [[compact]] periodically to fold the accumulated small files. */
  def append(newDocs: DataFrame, path: String, textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    val meta = spark.read.parquet(metaPath(path)).head()
    bandRows(newDocs, textCol, meta.getAs[Int]("k"), meta.getAs[Int]("bands"),
        meta.getAs[Int]("rows_per_band"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Fold append-accumulated small files back into scan-sized cell
    * files ([[CellCompaction]]); rows and probe results unchanged,
    * `_meta` untouched. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[String] =
    CellCompaction.compact(spark, path, "cell", targetBytes)

  /** Probe: candidate (query_doc, cand_doc, n_bands) pairs for the query
    * documents, reading only the index cells the queries' own band keys
    * touch. The cell list is a driver-side collect bounded by bands×16
    * values — planning metadata, not row data. Self-pairs are dropped;
    * callers rescore candidates with exact Jaccard as usual. */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      textCol: String = "text"): DataFrame = {
    val meta = spark.read.parquet(metaPath(path)).head()
    val (k, bands, rpb) =
      (meta.getAs[Int]("k"), meta.getAs[Int]("bands"), meta.getAs[Int]("rows_per_band"))
    val qBands = bandRows(queries, textCol, k, bands, rpb)
      .select(col("doc_id").as("query_doc"), col("band"), col("cell"))
    val cells = qBands.select("cell").distinct()
      .collect().map(_.getString(0)).sorted
    val idx = spark.read.parquet(path)
      .filter(col("cell").isin(cells.toIndexedSeq: _*)) // static partition pruning
      .select(col("doc_id").as("cand_doc"), col("band"))
    idx.join(qBands.drop("cell"), Seq("band"))
      .filter(col("cand_doc") =!= col("query_doc"))
      .groupBy(col("query_doc"), col("cand_doc"))
      .agg(count(lit(1)).as("n_bands"))
  }
}
