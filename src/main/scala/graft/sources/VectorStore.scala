package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Vector-store sink surface (SURVEY.md §2.1 S10/S11/S12).
  *
  * The reference's sink is a Weaviate batch upsert: buffer rows, flush
  * every `batch_size` objects with the uuid primary key and the vector
  * attached out-of-band (`data_load_weaviate`
  * /root/reference/llmcore/cms/cmfunctions.py:177-223, batch config
  * :210-212, pk+vector :218-223), plus create-class-if-absent DDL
  * (:80-90) and predicate delete (:226-261).
  *
  * Offline the store is parquet with the same observable semantics:
  *   - [[createIfAbsent]] = S11 idempotent DDL;
  *   - [[upsert]] = S10: replace-by-`chunk_id`. When rows carry a
  *     `load_dt` column the store is laid out as `load_dt=...` hive
  *     partitions and an upsert rewrites ONLY the partitions that hold
  *     replaced keys or receive new rows (dynamic partition overwrite —
  *     O(touched partitions) write amplification, not O(store)); a
  *     store without `load_dt` falls back to a full staged rewrite.
  *   - [[deleteWhere]] = S12 anti-join rewrite, partition-scoped the
  *     same way;
  *   - [[foreachBatched]] = the executor-side buffered-flush writer
  *     shape for an external store (one client per PARTITION, flush per
  *     `batchSize` — never one call per row/chunk like the reference).
  *
  * Crash safety: the dynamic-overwrite path goes through Spark's commit
  * protocol (partitions swap at job commit — a failed job leaves every
  * old partition intact). The full-rewrite path stages to `.staging`,
  * then performs CHECKED renames via the Hadoop FileSystem API (works
  * on HDFS/S3A, not just the driver-local disk): live → `.old`,
  * staging → live, and only then drops `.old`; a failed second rename
  * rolls the old store back, so no failure mode truncates the store.
  */
object VectorStore {

  val KeyCol = "chunk_id"
  val PartitionCol = "load_dt"

  /** Executor-side batched sink. `open` runs once per partition (client
    * construction), `flush` once per buffered batch. Generic so tests
    * can count flushes; an HTTP-backed store would open a pooled client. */
  def foreachBatched[C](df: DataFrame, batchSize: Int)(
      open: () => C)(flush: (C, Seq[Row]) => Unit)(close: C => Unit): Unit =
    df.foreachPartition { (rows: Iterator[Row]) =>
      val client = open()
      try rows.grouped(batchSize).foreach(batch => flush(client, batch))
      finally close(client)
    }

  private def fileSystem(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, path: String): Boolean =
    fileSystem(spark, path).exists(new Path(path))

  /** Rows migrated from a legacy store carry a null `load_dt` and live
    * in hive's default-partition dir; every partition-value comparison
    * goes through this token so null rows match their directory instead
    * of silently failing `=`/`isin` null semantics (a compact() or
    * upsert that misses them would drop or duplicate the whole legacy
    * partition). */
  private val NullPartName = "__HIVE_DEFAULT_PARTITION__"
  private def partToken(c: Column): Column =
    coalesce(c.cast("string"), lit(NullPartName))

  /** Whether the on-disk store uses `load_dt=...` hive partition dirs. */
  private def isPartitionedOnDisk(spark: SparkSession, path: String): Boolean = {
    val fs = fileSystem(spark, path)
    fs.exists(new Path(path)) &&
      fs.listStatus(new Path(path)).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith(s"$PartitionCol="))
  }

  /** S11: create the store with a fixed schema iff absent. */
  def createIfAbsent(spark: SparkSession, path: String, schema: StructType): Unit =
    if (!exists(spark, path))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .write.mode(SaveMode.Overwrite).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S10: upsert keyed on `chunk_id` — existing rows with incoming keys
    * are replaced, others kept. Partition-scoped when the store is
    * `load_dt`-partitioned; a first upsert (or one against a legacy
    * unpartitioned store) rewrites once and leaves the store
    * partitioned for every later call. */
  def upsert(spark: SparkSession, path: String, incoming: DataFrame): Unit = {
    val partitionable = incoming.columns.contains(PartitionCol)
    if (!exists(spark, path)) {
      write(incoming, path, partitionable)
    } else if (partitionable && isPartitionedOnDisk(spark, path)) {
      val keys = incoming.select(KeyCol).distinct()
      val store = read(spark, path)
      // partitions that must change: those holding replaced keys (a
      // column-pruned (key, load_dt) scan) plus those receiving rows
      val oldParts = store.join(keys, Seq(KeyCol), "left_semi")
        .select(partToken(col(PartitionCol))).distinct()
        .collect().map(_.getString(0))
      val newParts = incoming
        .select(partToken(col(PartitionCol))).distinct()
        .collect().map(_.getString(0))
      val affected = (oldParts ++ newParts).distinct.toSeq
      val keep = store
        .filter(partToken(col(PartitionCol)).isin(affected: _*))
        .join(keys, Seq(KeyCol), "left_anti")
      val incomingAligned = incoming
        .withColumn(PartitionCol, col(PartitionCol).cast(store.schema(PartitionCol).dataType))
        .select(store.columns.map(col): _*)
      rewriteAffected(spark, path, affected, keep.unionByName(incomingAligned))
    } else {
      // legacy/unpartitioned store: one full staged rewrite. When incoming
      // carries `load_dt` and the legacy rows don't, MIGRATE instead of
      // dropping the column: legacy survivors land in the null
      // (__HIVE_DEFAULT_PARTITION__) partition, incoming keeps its dates,
      // and the store is partitioned from here on. The partitionBy flag is
      // derived from the UNIONED output inside swapRewrite, so a store that
      // lacks the column can never hit partitionBy on a missing column.
      swapRewrite(spark, path, wantPartition = partitionable) { store =>
        val base =
          if (partitionable && !store.columns.contains(PartitionCol))
            store.withColumn(PartitionCol,
              lit(null).cast(incoming.schema(PartitionCol).dataType))
          else store
        base.join(incoming.select(KeyCol).distinct(), Seq(KeyCol), "left_anti")
          .unionByName(incoming.select(base.columns.map(col): _*))
      }
    }
  }

  /** Full replace (the V2 TRUNCATE/overwrite path): the store's
    * contents become exactly `incoming`. Staged-swap when a store
    * exists — `incoming`'s plan may read the store it replaces. */
  def replaceAll(spark: SparkSession, path: String, incoming: DataFrame): Unit = {
    val partitioned = incoming.columns.contains(PartitionCol)
    if (!exists(spark, path)) write(incoming, path, partitioned)
    else swapRewrite(spark, path, wantPartition = partitioned)(_ => incoming)
  }

  /** S12: delete rows whose key appears in `keys` (anti-join rewrite);
    * rewrites only the partitions that contain matching keys. */
  def deleteWhere(spark: SparkSession, path: String, keys: DataFrame, keyCol: String): Unit = {
    val k = keys.select(col(keyCol)).distinct()
    if (isPartitionedOnDisk(spark, path)) {
      val store = read(spark, path)
      val affected = store.join(k, Seq(keyCol), "left_semi")
        .select(partToken(col(PartitionCol))).distinct()
        .collect().map(_.getString(0)).toSeq
      if (affected.nonEmpty) {
        val out = store
          .filter(partToken(col(PartitionCol)).isin(affected: _*))
          .join(k, Seq(keyCol), "left_anti")
        rewriteAffected(spark, path, affected, out)
      }
    } else {
      swapRewrite(spark, path, wantPartition = false)(
        _.join(k, Seq(keyCol), "left_anti"))
    }
  }

  /** Retention: drop whole `load_dt=` partitions strictly OLDER than
    * `cutoff` (ISO `yyyy-MM-dd`; hive directory values compare
    * lexicographically = chronologically for that format). This is how
    * a long-lived store stays bounded: at 100 TB the delete is
    * O(dropped partitions) directory removals — no scan, no rewrite,
    * no row ever read, and partition pruning means readers never saw
    * the dropped data as "current" anyway. Removal is per-directory
    * idempotent, so a crash mid-run leaves a store that a re-run
    * finishes. The null (legacy-migration) partition has no age and is
    * never dropped. An unpartitioned store that carries the column
    * falls back to one filter rewrite (null `load_dt` rows kept).
    * Returns the number of partition directories dropped (0 for the
    * rewrite fallback). */
  def dropPartitionsBefore(spark: SparkSession, path: String, cutoff: String): Int = {
    require(cutoff.matches("\\d{4}-\\d{2}-\\d{2}"),
      s"cutoff must be an ISO date (yyyy-MM-dd), got: $cutoff")
    if (isPartitionedOnDisk(spark, path)) {
      val fs = fileSystem(spark, path)
      val victims = fs.listStatus(new Path(path)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$PartitionCol="))
        .filter { st =>
          val v = st.getPath.getName.stripPrefix(s"$PartitionCol=")
          v != NullPartName && v < cutoff
        }
      victims.foreach(st => fs.delete(st.getPath, true))
      victims.size
    } else if (exists(spark, path) &&
        read(spark, path).columns.contains(PartitionCol)) {
      swapRewrite(spark, path, wantPartition = false)(store =>
        store.filter(col(PartitionCol).isNull ||
          col(PartitionCol) >= to_date(lit(cutoff))))
      0
    } else 0
  }

  /** Compact small files: streaming upserts (one commit per
    * micro-batch) and repeated partition rewrites accumulate files far
    * smaller than a scan-efficient parquet row group, and at 100 TB the
    * file count — not the byte count — becomes the scan scheduler's
    * bottleneck. For each `load_dt` partition whose file count exceeds
    * ceil(bytes / targetBytes), rewrite just that partition's rows into
    * that many files through the same staged dynamic-overwrite path as
    * upserts (crash-safe, other partitions untouched). Pure layout
    * maintenance — the row set is unchanged (asserted in PipelineSpec).
    * Driver work is bounded by the partition count, one rewrite job per
    * oversized partition; row data never visits the driver. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val fs = fileSystem(spark, path)
    def dataFiles(dir: Path) = fs.listStatus(dir).toSeq.filter(st =>
      st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    def wantFiles(bytes: Long) =
      math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (isPartitionedOnDisk(spark, path)) {
      val oversized = fs.listStatus(new Path(path)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$PartitionCol="))
        .flatMap { st =>
          val files = dataFiles(st.getPath)
          val want = wantFiles(files.map(_.getLen).sum)
          if (files.length > want)
            Some(st.getPath.getName.stripPrefix(s"$PartitionCol=") -> want)
          else None
        }
      oversized.foreach { case (value, want) =>
        val slice = read(spark, path)
          .filter(partToken(col(PartitionCol)) === value)
          .coalesce(want)
        rewriteAffected(spark, path, Seq(value), slice)
      }
    } else {
      val files = dataFiles(new Path(path))
      val want = wantFiles(files.map(_.getLen).sum)
      if (files.length > want)
        swapRewrite(spark, path, wantPartition = false)(_.coalesce(want))
    }
  }

  private def write(df: DataFrame, path: String, partitioned: Boolean): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitioned) w.partitionBy(PartitionCol) else w).parquet(path)
  }

  /** Rewrite exactly the `affected` partitions of the store to hold
    * `out`'s rows. `out`'s plan reads the live store, and Spark refuses
    * to overwrite a path its plan scans — so the new rows stage to a
    * sibling dir first, then dynamic partition overwrite copies them in
    * (only partitions present in the staging output swap; every other
    * partition's files are untouched — asserted by PipelineSpec).
    * Affected partitions with ZERO surviving rows never appear in the
    * staging output, so dynamic overwrite would leave their stale files
    * alive; they are dropped explicitly at the end. */
  private def rewriteAffected(spark: SparkSession, path: String,
      affected: Seq[String], out: DataFrame): Unit = {
    val fs = fileSystem(spark, path)
    val staging = new Path(path + ".staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    write(out, staging.toString, partitioned = true)
    val present = fs.listStatus(staging).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$PartitionCol="))
      .map(_.getPath.getName.stripPrefix(s"$PartitionCol="))
      .toSet
    if (present.nonEmpty)
      spark.read.parquet(staging.toString)
        // when staging holds ONLY null-partition rows, partition-type
        // inference over {__HIVE_DEFAULT_PARTITION__} yields VOID and
        // partitionBy refuses it — re-impose the source frame's type
        .withColumn(PartitionCol,
          col(PartitionCol).cast(out.schema(PartitionCol).dataType))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PartitionCol)
        .parquet(path)
    affected.filterNot(present).foreach { v =>
      fs.delete(new Path(path, s"$PartitionCol=$v"), true)
    }
    fs.delete(staging, true)
  }

  /** Full rewrite with checked rename swap. Partitions the rewritten
    * store only when the caller wants it AND the rewritten output
    * actually has the partition column — guards the legacy-migration
    * path where the pre-union store lacks `load_dt`. */
  private def swapRewrite(spark: SparkSession, path: String, wantPartition: Boolean)(
      f: DataFrame => DataFrame): Unit = {
    val staged = f(read(spark, path))
    val partitioned = wantPartition && staged.columns.contains(PartitionCol)
    val fs = fileSystem(spark, path)
    val target = new Path(path)
    val tmp = new Path(path + ".staging")
    val old = new Path(path + ".old")
    write(staged, tmp.toString, partitioned)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(target, old))
      throw new java.io.IOException(s"vector store swap: rename $target -> $old failed")
    if (!fs.rename(tmp, target)) {
      fs.rename(old, target) // roll the live store back before failing
      throw new java.io.IOException(
        s"vector store swap: rename $tmp -> $target failed; previous store restored")
    }
    fs.delete(old, true)
  }
}
