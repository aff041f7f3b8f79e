package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanApi}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native AS-OF join — the whole-operator tier of SURVEY §4's custom-
  * operator preference order (logical node + planner strategy +
  * physical operator, injected via [[graft.GraftExtensions]]).
  *
  * Semantics (backward as-of, the market-data/feature-store default):
  * for every left row, attach the right row with the same key and the
  * GREATEST right time ≤ the left time — ties on equal right times
  * resolved to the largest `rightTie` — or nulls when no right row
  * qualifies. The reference's retrieval flow has no as-of, but its CDC
  * protocol ("latest state not newer than the watermark",
  * /root/reference/llmcore/cms/sharepointutils.py:159-161) is exactly
  * this operator's shape; Spark's DataFrame API cannot express it
  * without materializing a window blob or an inequality-join funnel.
  *
  * Scale: each side shuffles ONCE on its key (ClusteredDistribution —
  * co-partitioned by EnsureRequirements) and sorts within partitions by
  * (key, time); the physical operator then streams BOTH sorted sides in
  * one merge pass holding exactly one candidate row — O(1) memory per
  * partition, no per-key right-side buffering, no window
  * materialization. Contrast the composed fallback below: an
  * inequality join that replays every qualifying right row per left
  * row before a top-1 window discards all but one.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    toleranceUs: Option[Long] = None)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected by
  * [[graft.GraftExtensions]] via `injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, tol) :: Nil
    case _ => Nil
  }
}

/** Single-pass sorted-merge as-of join. Children arrive co-partitioned
  * on the keys and sorted by (key, time[, tie]) — declared below, so
  * EnsureRequirements inserts exactly the two key shuffles and
  * per-partition sorts; the merge itself holds ONE held candidate row.
  * Not codegen'd: the operator is a cursor sweep, not an expression
  * tree — there is no per-row expression work to fuse.
  */
final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    toleranceUs: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  // the merge emits left rows in their incoming order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKey; val rk = rightKey; val lt = leftTime; val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind against NULLABLE right attrs: BindReferences takes
      // nullability from the input schema, and the no-match null row
      // must not be read as zeros
      val outProj =
        UnsafeProjection.create(output, leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      // the held candidate: last right row consumed for `heldKey`
      // (copies — sorter iterators reuse their row buffers)
      var held: InternalRow = null
      var heldKey: InternalRow = null
      var heldTime: Long = 0L

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l)
        if (!lTime.isNullAt(0)) {
          // consume right rows ≤ (lKey, lTime); remember the last
          // same-key one — sorted order makes it the (time, tie)-max
          var advancing = true
          while (advancing && rHead != null) {
            val rKey = rKeyProj(rHead)
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0 ||
                (kc == 0 && !rTimeProj(rHead).isNullAt(0) &&
                  timeOrd.compare(rTimeProj(rHead), lTime) <= 0)) {
              if (kc == 0) {
                held = rHead.copy(); heldKey = rKey.copy()
                if (toleranceUs.isDefined) heldTime = rTimeProj(rHead).getLong(0)
              }
              rHead = if (rIter.hasNext) rIter.next() else null
            } else if (kc == 0 && rTimeProj(rHead).isNullAt(0)) {
              // null-timed right rows sort first within the key and
              // never match; skip without holding
              rHead = if (rIter.hasNext) rIter.next() else null
            } else advancing = false
          }
        }
        val m =
          if (!lTime.isNullAt(0) && held != null && keyOrd.compare(heldKey, lKey) == 0 &&
              toleranceUs.forall(tol => lTime.getLong(0) - heldTime <= tol)) held
          else nullRight
        numOutputRows += 1
        outProj(joined(l, m))
      }
    }
  }
}

/** Public API over the native operator, with a composed fallback when
  * the session runs without [[graft.GraftExtensions]] (SPARK_GRAFT_NO_EXT
  * sessions still compute identical results, off the fast path — the
  * same contract as every fused expression in the library).
  */
object AsOfJoinOps {

  /** Backward as-of join `left ASOF right`: every left row, plus the
    * right row (columns suffixed) with the greatest `rightTime` ≤ the
    * row's `leftTime` on the same key; ties on equal times take the
    * greatest `rightTie`. Nulls when no right row qualifies — including
    * when the best match is staler than `toleranceUs` (pandas
    * merge_asof's `tolerance`; requires BIGINT time columns). */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightTie: String,
      suffix: String = "_r",
      toleranceUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    require(toleranceUs.isEmpty ||
        (left.schema(leftTime).dataType == org.apache.spark.sql.types.LongType &&
          right.schema(rightTime).dataType == org.apache.spark.sql.types.LongType),
      "toleranceUs requires BIGINT time columns on both sides")
    // fresh exprIds + distinct names: safe under self-as-of (same source
    // both sides), where raw child plans would share attribute ids
    val r = right.select(right.columns.map(c => col(c).as(c + suffix)): _*)
    val nativePlanner =
      spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)
    if (nativePlanner) {
      val lPlan = left.queryExecution.analyzed
      val rPlan = r.queryExecution.analyzed
      def attrOf(p: LogicalPlan, n: String): Attribute =
        p.output.find(_.name == n).getOrElse(
          throw new IllegalArgumentException(s"as-of column not found: $n"))
      GraftPlanApi.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
        attrOf(lPlan, leftKey), attrOf(rPlan, rightKey + suffix),
        attrOf(lPlan, leftTime), attrOf(rPlan, rightTime + suffix),
        attrOf(rPlan, rightTie + suffix), toleranceUs))
    } else composedAsOf(left, r, leftKey, rightKey + suffix,
      leftTime, rightTime + suffix, rightTie + suffix, toleranceUs)
  }

  /** The DataFrame-API fallback (also the test oracle for the native
    * operator): inequality join replaying every qualifying right row,
    * then a top-1 window per left row. Correct, but the candidate set
    * grows with right-side density — the native merge pass exists to
    * avoid exactly that replay. */
  private[graft] def composedAsOf(left: DataFrame, r: DataFrame,
      leftKey: String, rightKeyS: String,
      leftTime: String, rightTimeS: String, rightTieS: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val l2 = left.withColumn("__lid", monotonically_increasing_id())
    val lowerBound = toleranceUs
      .map(tol => col(rightTimeS) >= col(leftTime) - tol).getOrElse(lit(true))
    val cand = l2.join(r,
      col(leftKey) === col(rightKeyS) &&
        col(rightTimeS) <= col(leftTime) && lowerBound, "left")
    val w = Window.partitionBy(col("__lid"))
      .orderBy(col(rightTimeS).desc_nulls_last, col(rightTieS).desc_nulls_last)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__lid")
  }
}
