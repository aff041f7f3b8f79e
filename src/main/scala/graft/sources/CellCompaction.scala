package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.col

/** Small-file compaction for the cell-partitioned index layouts
  * ([[MinHashIndex]], [[InvertedIndex]], [[TrigramIndex]] all share the
  * `cell=XX/part-*.parquet` contract): incremental appends land one
  * file set per append beside the existing cell files, and at 100 TB
  * the FILE COUNT — not the byte count — becomes the probe scheduler's
  * bottleneck (every probe lists its cells; a thousand appends = a
  * thousand files per cell). This is the index-side sibling of
  * [[VectorStore.compact]] / [[TimeTravel.optimize]]: pure layout
  * maintenance, row set unchanged, probe ≡ pre-compaction probe
  * (asserted in IndexSpec).
  *
  * Mechanics: cells whose file count exceeds what their byte size
  * needs (ceil(bytes / targetBytes)) are rewritten — staged to a
  * sibling directory first (Spark refuses to overwrite a path it is
  * reading), then DYNAMIC partition overwrite replaces only the
  * oversized cells; right-sized cells are never touched or read.
  * Driver work is O(cells) listing (bounded by each family's layout:
  * ≤256 dirs); row data never visits the driver. Oversized cells split
  * on a rows-per-file bound derived from the slice's observed
  * bytes/row, so one hot cell still produces scan-sized files.
  *
  * Single-writer contract (same as every sidecar in these layouts):
  * run compaction from the maintenance job, not concurrently with an
  * append.
  */
object CellCompaction {

  /** Compact oversized cells under `path`; returns the compacted cell
    * values (empty = layout already right-sized, nothing touched). */
  def compact(spark: SparkSession, path: String, cellCol: String = "cell",
      targetBytes: Long = 128L * 1024 * 1024): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val oversized = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$cellCol="))
      .flatMap { st =>
        val files = fs.listStatus(st.getPath).toSeq.filter(f =>
          f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        val bytes = files.map(_.getLen).sum
        val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
        if (files.length > want)
          Some(ExternalCatalogUtils.unescapePathName(
            st.getPath.getName.stripPrefix(s"$cellCol=")) -> bytes)
        else None
      }
    if (oversized.isEmpty) return Nil
    val values = oversized.map(_._1)
    val slice = spark.read.parquet(path)
      .filter(col(cellCol).isin(values: _*)) // static partition pruning
    val rows = slice.count()
    val bytes = math.max(1L, oversized.map(_._2).sum)
    val rowsPerFile = math.max(1L, rows * targetBytes / bytes)
    val staging = new Path(path + ".compact-staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    slice.repartition(col(cellCol))
      .write.option("maxRecordsPerFile", rowsPerFile)
      .partitionBy(cellCol).parquet(staging.toString)
    spark.read.parquet(staging.toString)
      .repartition(col(cellCol))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy(cellCol).parquet(path)
    fs.delete(staging, true)
    values
  }
}
