package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
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
  *   - [[upsert]] = S10: delete-then-append keyed on `chunk_id`,
  *     partitioned by `load_dt` so time-scoped reads prune partitions;
  *   - [[deleteWhere]] = S12 anti-join rewrite;
  *   - [[foreachBatched]] = the executor-side buffered-flush writer
  *     shape for an external store (one client per PARTITION, flush per
  *     `batchSize` — never one call per row/chunk like the reference).
  */
object VectorStore {

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

  def exists(spark: SparkSession, path: String): Boolean =
    new java.io.File(path).exists()

  /** S11: create the store with a fixed schema iff absent. */
  def createIfAbsent(spark: SparkSession, path: String, schema: StructType): Unit =
    if (!exists(spark, path))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .write.mode(SaveMode.Overwrite).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S10: upsert keyed on `chunk_id` — existing rows with incoming keys
    * are replaced, others kept. Rewrites to a staging dir then swaps, so
    * a failed job never truncates the store. */
  def upsert(spark: SparkSession, path: String, incoming: DataFrame): Unit = {
    val staged =
      if (exists(spark, path)) {
        val keep = read(spark, path)
          .join(incoming.select("chunk_id").distinct(), Seq("chunk_id"), "left_anti")
        keep.unionByName(incoming)
      } else incoming
    val tmp = path + ".staging"
    staged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(path)
    if (target.exists()) {
      val old = new java.io.File(path + ".old")
      deleteRecursively(old)
      target.renameTo(old)
    }
    new java.io.File(tmp).renameTo(target)
    deleteRecursively(new java.io.File(path + ".old"))
  }

  /** S12: delete rows whose key appears in `keys` (anti-join rewrite). */
  def deleteWhere(spark: SparkSession, path: String, keys: DataFrame, keyCol: String): Unit = {
    val remaining = read(spark, path)
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    val tmp = path + ".staging"
    remaining.write.mode(SaveMode.Overwrite).parquet(tmp)
    deleteRecursively(new java.io.File(path))
    new java.io.File(tmp).renameTo(new java.io.File(path))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) f.delete()
  }
}
