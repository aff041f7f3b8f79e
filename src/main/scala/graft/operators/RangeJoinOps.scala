package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval join — the classic rewrite that turns a PURE
  * inequality join (point ∈ [start, end), NO equi key) from the
  * nested-loop plan Spark would otherwise produce into an equi-join:
  *
  *   - each interval is exploded onto the fixed-width bins it overlaps
  *     (≤ ⌈span/binWidth⌉ + 1 rows — bounded when callers pick binWidth
  *     on the order of the interval span);
  *   - each point carries its single bin;
  *   - the bin equi-join SHUFFLES instead of looping, and the exact
  *     range predicate re-filters inside matching bins.
  *
  * A point's bin is unique and an interval lists each overlapped bin
  * once, so a qualifying (point, interval) pair matches on EXACTLY one
  * bin — no duplicate elimination is needed and aggregate counts stay
  * exact.
  *
  * Scale: this is O(points + intervals·bins_per_interval) shuffled on
  * a key with data-spread cardinality, vs the O(points × intervals)
  * nested loop; at 100 TB the nested loop is not slow, it is
  * impossible. Pick binWidth ≈ the typical interval span: wider bins
  * mean fewer duplicate interval rows but more false candidates to
  * re-filter, narrower bins the reverse.
  */
object RangeJoinOps {

  /** Join `points` to every interval containing them:
    * point(`pointCol`) ∈ [`startCol`, `endExclCol`). All three columns
    * are integer-valued (days, epoch seconds, ids — caller's unit);
    * output carries both sides' columns. */
  def binnedPointInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endExclCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ivb = intervals.withColumn("_bin",
      explode(sequence(
        floor(col(startCol).cast("double") / binWidth).cast("long"),
        floor((col(endExclCol) - 1).cast("double") / binWidth).cast("long"))))
    val ptb = points.withColumn("_bin",
      floor(col(pointCol).cast("double") / binWidth).cast("long"))
    ptb.join(ivb, Seq("_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endExclCol))
      .drop("_bin")
  }
}
