package graft

import graft.plans.AsOfJoinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native as-of join vs its composed DataFrame-API oracle, plus the
  * physical-plan contract (one merge operator fed by exactly the two
  * key shuffles) and the edge semantics a merge-cursor implementation
  * can get wrong: no-match nulls, equal-time ties, null times, and
  * self-as-of over one source.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def events(tpe: String): DataFrame =
    Tables(spark, sf, "events").filter(col("event_type") === tpe)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("value"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("native as-of matches the composed inequality-join oracle on real data") {
    val left = events("purchase")
    val right = events("signup")
    val native = AsOfJoinOps.asofBackward(left, right,
      "user_id", "user_id", "t_us", "t_us", "event_id")
    val composed = AsOfJoinOps.composedAsOf(left,
      right.select(right.columns.map(c => col(c).as(c + "_r")): _*),
      "user_id", "user_id_r", "t_us", "t_us_r", "event_id_r")
    assert(native.columns.toSeq == composed.columns.toSeq)
    assert(sortedRows(native) == sortedRows(composed))
    assert(native.count() == left.count(), "as-of must preserve every left row")
  }

  test("physical plan: one AsOfJoinExec, two key shuffles, no window, no join replay") {
    val native = AsOfJoinOps.asofBackward(events("purchase"), events("signup"),
      "user_id", "user_id", "t_us", "t_us", "event_id")
    // AQE wraps the plan; match on the rendered tree (nodeName AsOfJoin)
    val s = native.queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoin"), s"expected AsOfJoinExec:\n$s")
    assert("Exchange hashpartitioning".r.findAllIn(s).size == 2,
      s"exactly the two key shuffles expected:\n$s")
    assert(!s.contains("Window") && !s.contains("SortMergeJoin") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"the native operator must replace the window/inequality-join funnel:\n$s")
  }

  test("edge semantics: no-match nulls, backward-only, equal-time tie takes greatest tiebreak") {
    val left = Seq((1L, "k1", 100L), (2L, "k1", 10L), (3L, "k2", 100L), (4L, "kx", 50L))
      .toDF("lid", "k", "t")
    val right = Seq(
      (10L, "k1", 50L, 1.0), (11L, "k1", 50L, 2.0), // equal-time tie → lid 11
      (12L, "k1", 99L, 3.0),                        // newest ≤ 100 for lid 1
      (13L, "k2", 101L, 4.0))                       // in the future of lid 3
      .toDF("rid", "k", "t", "v")
    val out = AsOfJoinOps.asofBackward(left, right, "k", "k", "t", "t", "rid")
      .select("lid", "rid_r", "v_r").as[(Long, Option[Long], Option[Double])]
      .collect().map { case (k, r, v) => k -> ((r, v)) }.toMap
    assert(out(1L) == ((Some(12L), Some(3.0))), "greatest time ≤ left time wins")
    assert(out(2L) == ((None, None)), "all right rows in the future → nulls")
    assert(out(3L) == ((None, None)), "backward-only: future rows never match")
    assert(out(4L) == ((None, None)), "unseen key → nulls")
    // the tie itself, probed at t=50 exactly
    val tie = AsOfJoinOps.asofBackward(
      Seq((9L, "k1", 50L)).toDF("lid", "k", "t"), right, "k", "k", "t", "t", "rid")
      .select("rid_r").as[Option[Long]].collect().toSeq
    assert(tie == Seq(Some(11L)), "equal times resolve to the greatest tiebreak")
  }

  test("null right times never match; null left times yield nulls") {
    val left = Seq((1L, "k", 100L), (2L, "k", -1L)).toDF("lid", "k", "t")
      .withColumn("t", when(col("t") < 0, lit(null)).otherwise(col("t")))
    val right = Seq((10L, "k", -1L, 1.0), (11L, "k", 40L, 2.0)).toDF("rid", "k", "t", "v")
      .withColumn("t", when(col("t") < 0, lit(null)).otherwise(col("t")))
    val out = AsOfJoinOps.asofBackward(left, right, "k", "k", "t", "t", "rid")
      .select("lid", "rid_r").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(11L), "the null-timed right row must be skipped, not matched")
    assert(out(2L) == None, "a null left time matches nothing")
  }

  test("tolerance nulls matches staler than the bound (native ≡ composed)") {
    val left = Seq((1L, "k", 100L), (2L, "k", 1000L)).toDF("lid", "k", "t")
    val right = Seq((10L, "k", 90L, 1.0)).toDF("rid", "k", "t", "v")
    val native = AsOfJoinOps.asofBackward(left, right, "k", "k", "t", "t", "rid",
      toleranceUs = Some(50L))
    val out = native.select("lid", "rid_r").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(10L), "10 µs stale — inside the 50 µs tolerance")
    assert(out(2L) == None, "910 µs stale — tolerance must null it")
    val composed = AsOfJoinOps.composedAsOf(left,
      right.select(right.columns.map(c => col(c).as(c + "_r")): _*),
      "k", "k_r", "t", "t_r", "rid_r", Some(50L))
    assert(sortedRows(native) == sortedRows(composed))
  }

  test("self-as-of over one source resolves both sides' attributes") {
    val ev = events("purchase").limit(200)
    val out = AsOfJoinOps.asofBackward(ev, ev, "user_id", "user_id", "t_us", "t_us", "event_id")
    // every purchase's closest not-newer purchase is itself
    assert(out.filter(col("event_id_r") =!= col("event_id")).count() == 0)
    assert(out.count() == 200)
  }
}
