package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering.
  *
  * `row_number() OVER (ORDER BY k)` has an empty partition spec, so
  * Spark plans a SINGLE-PARTITION exchange — every row through one
  * task, the classic 100 TB cliff. The scalable form is the
  * zipWithIndex algorithm expressed in DataFrame terms:
  *
  *   1. range-repartition on the order key (partition i holds a
  *      contiguous key range below partition i+1's);
  *   2. pin the partitioning (localCheckpoint — the same job that
  *      zipWithIndex's internal count pays; at cluster scale this is
  *      `persist()` over executor memory/disk);
  *   3. count rows per partition — an O(numPartitions) driver-side
  *      table, the ONLY thing collected;
  *   4. local row_number per partition (the window's partition spec is
  *      the physical partition id, so no cross-partition exchange) plus
  *      the exclusive prefix-sum offset of the counts, broadcast back.
  *
  * Every training corpus needs this once per packing/sharding run:
  * stable contiguous example ids without funnelling the corpus through
  * one task.
  */
object IdOps {

  /** Contiguous ordinals 0..n-1 in `orderCol` order, as column `gid`.
    * `orderCol` must be unique (ties would make the ordinal
    * nondeterministic — same contract as any deterministic top-k). */
  def globalIds(df: DataFrame, orderCol: String, numParts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val pinned = df
      .repartitionByRange(numParts, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = pinned.groupBy("_pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until numParts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
      .take(numParts).zipWithIndex.map { case (off, p) => p -> off }
    import spark.implicits._
    val offsetDf = offsets.toDF("_pid", "_off")
    // range partitions are ordered by partition id, so local rank +
    // this partition's exclusive prefix sum IS the global ordinal
    val w = Window.partitionBy("_pid").orderBy(orderCol)
    pinned
      .join(broadcast(offsetDf), Seq("_pid"))
      .withColumn("gid", col("_off") + row_number().over(w) - 1)
      .drop("_pid", "_off")
  }
}
