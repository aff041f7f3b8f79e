package graft.functions

import org.apache.spark.sql.{Column, GraftPlanApi}

import graft.expressions.{IcebergBucket, IcebergEpochUnits, IcebergTruncate}

/** Column faces of the Iceberg partition transforms
  * ([[graft.expressions.IcebergTransforms]]): the same values the
  * export/append write paths compute, exposed so callers can
  * PRE-PARTITION a frame (`df.repartition(icebergBucket(16, $"id"))`
  * or sort by the transform) and land files that are transform-pure —
  * the precondition for a zero-copy transform-partitioned export. All
  * time transforms are UTC-exact (session-timezone-independent),
  * matching how the write path derives values from footer
  * statistics. */
object IcebergPartitionFns {

  /** `bucket[N](c)` — INT in `[0, N)`, the spec's murmur3 bucketing. */
  def icebergBucket(n: Int, c: Column): Column =
    GraftPlanApi.column(IcebergBucket(GraftPlanApi.expression(c), n))

  /** `truncate[W](c)` — floor-to-width (int/long) / prefix (string). */
  def icebergTruncate(w: Int, c: Column): Column =
    GraftPlanApi.column(IcebergTruncate(GraftPlanApi.expression(c), w))

  /** `year(c)` — whole years since 1970, INT. */
  def icebergYears(c: Column): Column =
    GraftPlanApi.column(IcebergEpochUnits(GraftPlanApi.expression(c), "year"))

  /** `month(c)` — whole months since 1970-01, INT. */
  def icebergMonths(c: Column): Column =
    GraftPlanApi.column(IcebergEpochUnits(GraftPlanApi.expression(c), "month"))

  /** `day(c)` — days since the epoch, INT. */
  def icebergDays(c: Column): Column =
    GraftPlanApi.column(IcebergEpochUnits(GraftPlanApi.expression(c), "day"))

  /** `hour(c)` — hours since the epoch, INT (timestamps only). */
  def icebergHours(c: Column): Column =
    GraftPlanApi.column(IcebergEpochUnits(GraftPlanApi.expression(c), "hour"))
}
