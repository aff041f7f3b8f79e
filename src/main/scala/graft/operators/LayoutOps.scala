package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout primitives for scan pruning at scale.
  *
  * [[zValue]] interleaves the low `bits` bits of two dimension keys into
  * a Morton (Z-order) curve value. Writing a table sorted by this value
  * clusters rows that are close in BOTH dimensions into the same files,
  * so parquet min/max footer stats prune scans filtered on EITHER
  * dimension — the standard multi-dimensional layout trick (public:
  * Morton 1966; used by every lakehouse "OPTIMIZE ZORDER BY"
  * implementation). A single-column sort clusters only its leading
  * column; Z-order trades a little locality in each dimension for
  * locality in all of them (quantified in LayoutSpec).
  *
  * Pure integer bit arithmetic → codegen'd, embarrassingly parallel,
  * and expressible identically in DuckDB for the oracle. At 100 TB the
  * sort itself is Spark's range-partitioned global sort — one shuffle,
  * then each task writes one tight file.
  */
object LayoutOps {

  /** Morton-interleave the low `bits` bits of x (even positions) and y
    * (odd positions). Caller guarantees both fit in `bits` bits —
    * for wider keys, bucket/scale first (at 100 TB use bits=21 per
    * dimension for a 63-bit z). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** DuckDB mirror of [[zValue]] (inputs must already be BIGINT
    * expressions). */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** TEST-ONLY diagnostic (LayoutSpec) — NOT a production path. Sum
    * over `parts` equal-frequency buckets of the (spanX · spanY)
    * bounding-box area when `df` is bucketed by `orderCol` — the
    * figure of merit LayoutSpec uses to show Z-order beats a
    * single-column sort for two-dimensional pruning.
    *
    * The unpartitioned `ntile` window here plans
    * `Exchange SinglePartition` and `.head()` materializes on the
    * driver — both fine for a spec-sized diagnostic, both wrong at
    * scale. The production equivalent of this global bucketing is the
    * two-pass rank in `TpchQueries.qNtileBalance` (range-repartition +
    * partition-offset rank); use that shape for any data-sized input. */
  def clusteringCost(df: DataFrame, orderCol: Column,
      x: Column, y: Column, parts: Int): Long = {
    import org.apache.spark.sql.expressions.Window
    df.select(x.cast("long").as("x"), y.cast("long").as("y"),
        ntile(parts).over(Window.orderBy(orderCol)).as("bucket"))
      .groupBy("bucket")
      .agg(((max(col("x")) - min(col("x")) + 1L)
        * (max(col("y")) - min(col("y")) + 1L)).as("area"))
      .agg(sum(col("area")))
      .head().getLong(0)
  }
}
