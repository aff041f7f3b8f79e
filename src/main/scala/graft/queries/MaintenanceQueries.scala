package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operational/maintenance analytics (EXT operators): the patterns a
  * 100 TB deployment needs to AVOID rescanning history — incremental
  * aggregate maintenance on top of the reference's watermark CDC
  * protocol (`sharepointutils.py:159-161`), mergeable distinct-count
  * sketches stored per partition and unioned at query time, and an
  * order-independent table fingerprint for replica anti-entropy checks.
  *
  * Scale notes: every query here exists precisely because full rescans
  * stop being affordable — each one touches only the delta (or a
  * sketch/sum that is constant-size per partition) and merges with an
  * associative, commutative operation, so the plan parallelizes with no
  * ordering constraint and no driver-side state.
  */
object MaintenanceQueries {

  import Exact._

  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")
  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")

  /** 2024-01-21 00:00 UTC — the CDC cutoff splitting "history" from
    * "new batch" (events span 2024-01-01..01-30). */
  private val CutoffUs = 1705795200000000L

  /** Incremental aggregate maintenance: per-user count/sum kept as a
    * stored aggregate over history, updated by aggregating ONLY the
    * post-watermark delta and merging with a coalescing full outer
    * join. The oracle is the from-scratch aggregate over everything —
    * proving base ⊎ delta ≡ recompute, which is the whole point.
    *
    * Scale: at 100 TB the base side is the stored aggregate table (one
    * row per user, no event rescans) and the log is date-partitioned so
    * the watermark prunes whole partitions (the contract PlanSpec
    * asserts for the vector store); here both branches filter the same
    * scan — post-scan, since the predicate sits on the µs timestamp
    * rebuilt from the fixture's ns column. Counts and exact-integer
    * unit sums are associative/commutative, so the merge is a
    * co-partitioned shuffle join on `user_id` with no broadcast (users
    * grow with the corpus; a full outer join never broadcasts —
    * PlanSpec-asserted). */
  val qIncrAggMerge: QueryDef = QueryDef.sql(
    "q_incr_agg_merge",
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    def aggOf(pred: org.apache.spark.sql.Column, np: String, sp: String) =
      ev(s, d).filter(pred)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as(np), sum(units(col("value"), 2)).as(sp))
    val base = aggOf(unix_micros(col("ts")) < CutoffUs, "b_n", "b_su")
    val delta = aggOf(unix_micros(col("ts")) >= CutoffUs, "d_n", "d_su")
    base.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n_events"),
        toDouble(coalesce(col("b_su"), lit(0L)) + coalesce(col("d_su"), lit(0L)), 2)
          .as("sum_value"))
      .orderBy("user_id")
  }

  /** Sketch-at-rest distinct counting: one Datasketches HLL sketch per
    * day (the shape you'd persist next to each date partition), unioned
    * across the month and estimated — vs the exact distinct, with the
    * q_approx_distinct-style bound check as the oracle-stable output.
    *
    * Scale: THE 100 TB distinct-user design — a daily sketch is a few
    * KB regardless of row count, the month/quarter rollup unions 30/90
    * sketches instead of rescanning the raw log, and union is
    * associative so any partitioning works. */
  val qSketchUnion: QueryDef = QueryDef.sql(
    "q_sketch_union",
    """SELECT COUNT(DISTINCT user_id) AS n_exact, true AS within_5pct
      |FROM events""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(floor(unix_micros(col("ts")) / lit(86400000000.0)).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val est = daily.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_approx"))
    ev(s, d).agg(countDistinct(col("user_id")).as("n_exact"))
      .crossJoin(est)
      .select(col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") <=
          col("n_exact").cast("double") * 0.05).as("within_5pct"))
  }

  /** Order-independent table fingerprint for anti-entropy: per
    * return-flag row count + XOR of a 60-bit md5 prefix of each row's
    * canonical repr. Two replicas (or a pre- and post-migration copy)
    * compare fingerprints without moving rows.
    *
    * XOR is commutative/associative and cannot overflow, so the
    * aggregate is one map-side-combined shuffle with no ordering
    * requirement — any partitioning of 100 TB produces the same
    * fingerprint. The row repr uses only exact-integer units, codes and
    * ISO dates (never float-to-string formatting, which differs across
    * engines). */
  val qTableChecksum: QueryDef = QueryDef.sql(
    "q_table_checksum",
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  bit_xor(CAST(concat('0x', substring(md5(concat_ws('|',
      |    CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
      |    CAST(CAST(ROUND(l_quantity * 100.0) AS BIGINT) AS VARCHAR),
      |    CAST(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS VARCHAR),
      |    l_linestatus, CAST(l_shipdate AS VARCHAR))), 1, 15)) AS BIGINT)) AS fingerprint
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val repr = concat_ws("|",
      col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
      units(col("l_quantity"), 2).cast("string"),
      units(col("l_extendedprice"), 2).cast("string"),
      col("l_linestatus"), col("l_shipdate").cast("string"))
    li(s, d)
      .select(col("l_returnflag"),
        conv(substring(md5(repr), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("fingerprint"))
      .orderBy("l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(qIncrAggMerge, qSketchUnion, qTableChecksum)
}
