package graft.sources

import graft.operators.BloomOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping via a min/max manifest ("zone maps" — the
  * Delta/Iceberg/ORC stats pattern, re-expressed as a parquet sidecar).
  *
  * The vector store already prunes on PARTITION VALUES (equality on the
  * directory key); zone maps prune on VALUE RANGES of any tracked column:
  * after a clustered write, a one-pass job records per-file min/max for
  * the tracked columns into `_zonemap/`, and a range scan lists only the
  * files whose [min, max] interval overlaps the predicate — whole files
  * are skipped without opening their footers.
  *
  * Scale posture:
  *   - the manifest is O(files), KBs per TB — reading it on the driver is
  *     the same bounded listing every table format does (Delta log,
  *     Iceberg manifests); rows are never collected.
  *   - the stats pass is one distributed scan of the freshly written
  *     files (groupBy input file — map-side combined, no wide shuffle).
  *   - pruning effectiveness is exactly the write clustering: one file
  *     per zone of the tracked column makes file ranges disjoint, so a
  *     range predicate reads ⌈selectivity · files⌉. An unclustered
  *     column's stats still exist but spread over every file — the
  *     Z-order query (`q_zorder_cluster`) quantifies that trade.
  */
object ZoneMaps {

  final case class PruneStats(filesTotal: Long, filesRead: Long)

  private def manifestPath(path: String) = s"$path/_zonemap"

  /** Per-file Bloom sidecar sizing: 8 KB per file keeps fpp low through
    * ~10k keys per file (the sf0.1 zone occupancy) — at larger files,
    * size bits with the file row target the way every format's bloom
    * column index does. SQL-mirrorable via [[BloomOps.positionSql]] so
    * the oracle can recompute file admission relationally. */
  val BloomBits = 65536
  val BloomHashes = 4

  /** Write `df` one file per distinct value of `zoneCol` (cluster first so
    * each zone lands in exactly one task → exactly one file per zone
    * directory), then record per-file min/max/count for `statsCols` —
    * plus, when `bloomCol` is set, a per-file Bloom filter of that
    * column's values: min/max answers RANGE predicates on the
    * clustered column; the Bloom answers EQUALITY probes on a column
    * the layout was NOT clustered by, where every file's [min, max]
    * spans the whole domain and range stats prune nothing.
    * `_zonemap/` starts with an underscore so plain parquet reads of
    * `path` ignore it. */
  def write(df: DataFrame, path: String, zoneCol: String, statsCols: Seq[String],
      bloomCol: Option[String] = None): Unit = {
    df.repartition(col(zoneCol))
      .write.mode("overwrite").partitionBy(zoneCol).parquet(path)
    val spark = df.sparkSession
    val written = spark.read.parquet(path)
    val bloomAgg = udaf(new BloomOps.BloomAggregator(BloomBits, BloomHashes))
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      bloomCol.map(c => bloomAgg(md5(col(c).cast("string"))).as(s"bloom_$c")).toSeq :+
      count(lit(1)).as("n_rows")
    written
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(path))
  }

  /** Point lookup with Bloom file skipping: read only files whose
    * sidecar filter admits `key` (all hash positions set — no false
    * negatives, so the result is exact after the residual filter).
    * The positions are constants computed once from the key's md5;
    * admission is evaluated over the manifest rows' own bit arrays. */
  def readPoint(spark: SparkSession, path: String, bloomCol: String,
      key: Long): (DataFrame, PruneStats) = {
    val m = manifest(spark, path)
    val total = m.count()
    val admitted = BloomOps.admission(col(s"bloom_$bloomCol"), key.toString,
      BloomBits, BloomHashes)
    val selected = m.filter(admitted)
      .select("file").collect().map(_.getString(0)).sorted
    val df =
      if (selected.isEmpty)
        spark.read.parquet(path).filter(lit(false))
      else
        spark.read.option("basePath", path).parquet(selected.toIndexedSeq: _*)
          .filter(col(bloomCol) === key)
    (df, PruneStats(total, selected.length.toLong))
  }

  /** The stats sidecar: one row per data file with min_/max_ per tracked
    * column plus its row count. */
  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(manifestPath(path))

  /** Range scan with file skipping: read only files whose recorded
    * [min, max] of `statsCol` overlaps [lo, hi], then apply the exact
    * residual predicate. Returns the pruned DataFrame plus the
    * files-total/files-read evidence. The file listing is a driver-side
    * collect of the manifest — O(files), the standard table-format
    * planning cost, never row data. */
  def readRange(spark: SparkSession, path: String, statsCol: String,
      lo: Long, hi: Long): (DataFrame, PruneStats) = {
    val m = manifest(spark, path)
    val total = m.count()
    val selected = m
      .filter(col(s"min_$statsCol") <= hi && col(s"max_$statsCol") >= lo)
      .select("file").collect().map(_.getString(0)).sorted
    val df =
      if (selected.isEmpty)
        spark.read.parquet(path).filter(lit(false))
      else
        spark.read.option("basePath", path).parquet(selected.toIndexedSeq: _*)
          .filter(col(statsCol) >= lo && col(statsCol) <= hi)
    (df, PruneStats(total, selected.length.toLong))
  }
}
