package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-profiling and constraint-verification reports (EXT): the
  * pre-flight a 100 TB ingest runs before trusting a new drop of data —
  * a single-pass column profile and a Deequ-style check battery. Both
  * exist to compress the corpus into a constant-size report the driver
  * (or a human) can read; neither moves rows.
  */
object ProfileQueries {

  import Exact._

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")

  private val ProfiledCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Column profile of lineitem's numeric measures: row/null/distinct
    * counts and min/max, all in exact cent units, ONE ROW PER COLUMN.
    *
    * Scale: every statistic for every column rides a SINGLE aggregation
    * over one scan (Spark plans the multi-distinct via one Expand — the
    * scan is not repeated per column), reducing 100 TB to one row that
    * a `stack()` then pivots into the per-column report. Null counts
    * are COUNT(*) − COUNT(col) — no CASE arithmetic, and both engines
    * type them BIGINT. */
  val qProfile: QueryDef = QueryDef.sql(
    "q_profile_columns",
    ProfiledCols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT ${unitsSql(c, 2)}) AS n_distinct,
         |  MIN(${unitsSql(c, 2)}) AS min_units,
         |  MAX(${unitsSql(c, 2)}) AS max_units
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")) { (s, d) =>
    val u = li(s, d).select(ProfiledCols.map(c => units(col(c), 2).as(c)): _*)
    val aggs = count(lit(1)).as("n_rows") +: ProfiledCols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))
    }
    val one = u.agg(aggs.head, aggs.tail: _*)
    val stackArgs = ProfiledCols
      .map(c => s"'$c', n_rows, nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    one.select(expr(s"stack(${ProfiledCols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_units, max_units)"))
      .orderBy("col_name")
  }

  /** Constraint battery: primary-key uniqueness, referential integrity
    * lineitem→orders, and value-range rules, each reported as
    * (check_name, violations, passed).
    *
    * Scale: the PK check is one multi-column distinct aggregate; the FK
    * check is an unhinted anti-join on the order key (both sides grow
    * with the corpus); range rules are pushed-down filter counts. Each
    * check reduces to one row before the union — the union concatenates
    * four scalars, not four table scans' worth of rows. */
  val qDqChecks: QueryDef = QueryDef.sql(
    "q_dq_checks",
    """WITH checks AS (
      |  SELECT 'fk_lineitem_orders' AS check_name, CAST((
      |    SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
      |      ON o.o_orderkey = l.l_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT) AS violations
      |  UNION ALL
      |  SELECT 'pk_unique_lineitem', COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'positive_quantity', COUNT(*) FILTER (WHERE l_quantity <= 0) FROM lineitem
      |  UNION ALL
      |  SELECT 'discount_in_unit_range', COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
      |  FROM lineitem
      |)
      |SELECT check_name, violations, violations = 0 AS passed
      |FROM checks ORDER BY check_name""".stripMargin) { (s, d) =>
    val l = li(s, d)
    val fk = l.join(ord(s, d).select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("fk_lineitem_orders").as("check_name"), col("violations"))
    val pk = l.agg((count(lit(1)) -
        countDistinct(col("l_orderkey"), col("l_linenumber"))).as("violations"))
      .select(lit("pk_unique_lineitem").as("check_name"), col("violations"))
    val qty = l.agg(count(when(col("l_quantity") <= 0, 1)).as("violations"))
      .select(lit("positive_quantity").as("check_name"), col("violations"))
    val disc = l.agg(count(when(col("l_discount") < 0 || col("l_discount") > 1, 1))
        .as("violations"))
      .select(lit("discount_in_unit_range").as("check_name"), col("violations"))
    fk.unionAll(pk).unionAll(qty).unionAll(disc)
      .select(col("check_name"), col("violations"), (col("violations") === 0).as("passed"))
      .orderBy("check_name")
  }

  /** Pre-join skew diagnostic: the report an engineer reads BEFORE
    * launching a 100 TB join — the hottest keys on each side
    * (orders.o_custkey vs events.user_id here) and each hot key's
    * exact output contribution `n_left · n_right`. A key hot on both
    * sides multiplies; a key hot on only one side contributes nothing
    * by itself (its partner count is 0 in this report) but still marks
    * a shuffle-partition hotspot. This is the evidence that decides
    * between a plain join, a broadcast, or salting (SkewOps).
    *
    * Scale: two map-side-combined frequency aggregations, each reduced
    * to its global top-10 by a partial top-k (TakeOrderedAndProject —
    * never a global sort of the key space); the ≤20-key hot list then
    * joins BACK against the two frequency tables broadcast-style for
    * exact partner counts. Deterministic: count-desc-then-key ordering
    * breaks frequency ties. */
  val qJoinSkew: QueryDef = QueryDef.sql(
    "q_join_skew_report",
    """WITH lf AS (SELECT o_custkey AS lkey, COUNT(*) AS nl FROM orders GROUP BY 1),
      |     rf AS (SELECT user_id AS rkey, COUNT(*) AS nr FROM events GROUP BY 1),
      |     lt AS (SELECT lkey AS key FROM lf ORDER BY nl DESC, lkey LIMIT 10),
      |     rt AS (SELECT rkey AS key FROM rf ORDER BY nr DESC, rkey LIMIT 10),
      |     hot AS (SELECT key FROM lt UNION SELECT key FROM rt)
      |SELECT h.key AS key,
      |  COALESCE(lf.nl, 0) AS n_left,
      |  COALESCE(rf.nr, 0) AS n_right,
      |  COALESCE(lf.nl, 0) * COALESCE(rf.nr, 0) AS contribution
      |FROM hot h
      |LEFT JOIN lf ON h.key = lf.lkey
      |LEFT JOIN rf ON h.key = rf.rkey
      |ORDER BY contribution DESC, key""".stripMargin) { (s, d) =>
    val lf = ord(s, d).groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("nl"))
    val rf = Tables(s, d, "events").groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("nr"))
    val lt = lf.orderBy(col("nl").desc, col("key")).limit(10).select("key")
    val rt = rf.orderBy(col("nr").desc, col("key")).limit(10).select("key")
    val hot = lt.union(rt).distinct()
    // broadcast the ≤20-key HOT list, never the frequency tables (they
    // grow with the key space): each side is semi-filtered down to its
    // hot rows first, then the ≤20-row joins are trivially local
    val lfh = lf.join(broadcast(hot), Seq("key"), "left_semi")
    val rfh = rf.join(broadcast(hot), Seq("key"), "left_semi")
    hot.join(lfh, Seq("key"), "left")
      .join(rfh, Seq("key"), "left")
      .select(col("key"),
        coalesce(col("nl"), lit(0L)).as("n_left"),
        coalesce(col("nr"), lit(0L)).as("n_right"),
        (coalesce(col("nl"), lit(0L)) * coalesce(col("nr"), lit(0L))).as("contribution"))
      .orderBy(col("contribution").desc, col("key"))
  }

  /** Distribution-drift report between two cohorts (the new data drop
    * vs the reference window — here orders before/after a date split):
    * per-category observed shares in exact integer BASIS POINTS
    * (n·10000 div total — no IEEE anywhere), the share delta, and a
    * per-category drift verdict at a 50 bp threshold. This is the
    * monitoring half of [[qProfile]]: profile says what a drop looks
    * like, drift says whether it still looks like the corpus the model
    * was trained on — the check that catches a upstream pipeline
    * silently changing its mix.
    *
    * Scale: two filtered counts per category over one scan (the CASE
    * aggregation fuses them), report is O(categories). */
  val qDriftDetect: QueryDef = QueryDef.sql(
    "q_drift_detect",
    """WITH b AS (
      |  SELECT o_orderpriority AS category,
      |    o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AS is_cur
      |  FROM orders
      |), g AS (
      |  SELECT category,
      |    COUNT(*) FILTER (WHERE NOT is_cur) AS n_ref,
      |    COUNT(*) FILTER (WHERE is_cur) AS n_cur
      |  FROM b GROUP BY category
      |), t AS (
      |  SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM g
      |)
      |SELECT category, n_ref, n_cur,
      |  CAST(n_ref * 10000 // t_ref AS BIGINT) AS ref_bp,
      |  CAST(n_cur * 10000 // t_cur AS BIGINT) AS cur_bp,
      |  CAST(n_cur * 10000 // t_cur - n_ref * 10000 // t_ref AS BIGINT) AS delta_bp,
      |  ABS(n_cur * 10000 // t_cur - n_ref * 10000 // t_ref) > 50 AS drifted
      |FROM g, t
      |ORDER BY category""".stripMargin) { (s, d) =>
    val cut = lit("1996-01-01 00:00:00").cast("timestamp")
    val g = ord(s, d)
      .select(col("o_orderpriority").as("category"),
        (col("o_orderdate") >= cut).as("is_cur"))
      .groupBy("category")
      .agg(count(when(!col("is_cur"), 1)).as("n_ref"),
        count(when(col("is_cur"), 1)).as("n_cur"))
    // totals: O(categories) rows re-aggregated, then broadcast back —
    // the corpus is scanned exactly once
    val t = g.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    g.crossJoin(broadcast(t))
      .withColumn("ref_bp", expr("n_ref * 10000 div t_ref"))
      .withColumn("cur_bp", expr("n_cur * 10000 div t_cur"))
      .withColumn("delta_bp", col("cur_bp") - col("ref_bp"))
      .withColumn("drifted", abs(col("delta_bp")) > 50)
      .drop("t_ref", "t_cur")
      .orderBy("category")
  }

  /** Two-sample KS drift statistic over a CONTINUOUS measure — the
    * numeric complement to [[qDriftDetect]]'s categorical shares: the
    * reference and current windows' order-price distributions are
    * compared as CDFs over 64 equi-width bins (bounds from the
    * reference side), D = max |F_ref − F_cur| reported in exact basis
    * points (each CDF flooring-divided independently, so DuckDB's `//`
    * ≡ Spark's `div` on the non-negative counts — deterministic to the
    * bin+bp granularity, which is the documented approximation of the
    * exact KS). The current window carries a deterministically woven
    * shift (+0/+50/+100 by key residue) so the positive path — a
    * drifted verdict with a localizable argmax bin — is actually
    * exercised.
    *
    * Scale: two scalar bound aggregates, one binning pass per side
    * (shared scan via FILTER), cumulative windows over ≤64 bin rows —
    * the corpus is read once and the comparison state is O(bins). */
  val qDriftKs: QueryDef = QueryDef.sql(
    "q_drift_ks",
    """WITH src AS (
      |  SELECT CAST(ROUND(o_totalprice * 100.0) AS BIGINT)
      |      + CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |             THEN (o_orderkey % 3) * 5000 ELSE 0 END AS cents,
      |    o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AS is_cur
      |  FROM orders
      |), bounds AS (
      |  SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM src WHERE NOT is_cur
      |), binned AS (
      |  SELECT LEAST(GREATEST((cents - mn) * 64 // (mx - mn + 1), 0), 63) AS bin, is_cur
      |  FROM src, bounds
      |), g AS (
      |  SELECT bin,
      |    COUNT(*) FILTER (WHERE NOT is_cur) AS n_ref,
      |    COUNT(*) FILTER (WHERE is_cur) AS n_cur
      |  FROM binned GROUP BY bin
      |), cum AS (
      |  SELECT bin,
      |    SUM(n_ref) OVER (ORDER BY bin) AS c_ref,
      |    SUM(n_cur) OVER (ORDER BY bin) AS c_cur,
      |    SUM(n_ref) OVER () AS t_ref,
      |    SUM(n_cur) OVER () AS t_cur
      |  FROM g
      |), delta AS (
      |  SELECT bin,
      |    ABS(c_ref * 10000 // t_ref - c_cur * 10000 // t_cur) AS d_bp,
      |    t_ref, t_cur
      |  FROM cum
      |)
      |SELECT CAST(MIN(t_ref) AS BIGINT) AS n_ref, CAST(MIN(t_cur) AS BIGINT) AS n_cur,
      |  CAST(MAX(d_bp) AS BIGINT) AS ks_bp,
      |  CAST(MIN(CASE WHEN d_bp = (SELECT MAX(d_bp) FROM delta) THEN bin END) AS BIGINT)
      |    AS ks_bin,
      |  MAX(d_bp) > 300 AS drifted
      |FROM delta""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val cut = lit("1996-01-01 00:00:00").cast("timestamp")
    val src = ord(s, d).select(
      (units(col("o_totalprice"), 2) +
        when(col("o_orderdate") >= cut, (col("o_orderkey") % 3) * 5000L).otherwise(0L))
        .as("cents"),
      (col("o_orderdate") >= cut).as("is_cur"))
    val bounds = src.filter(!col("is_cur"))
      .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    val g = src.crossJoin(broadcast(bounds))
      .select(least(greatest(
          expr("(cents - mn) * 64 div (mx - mn + 1)"), lit(0L)), lit(63L)).as("bin"),
        col("is_cur"))
      .groupBy("bin")
      .agg(count(when(!col("is_cur"), 1)).as("n_ref"),
        count(when(col("is_cur"), 1)).as("n_cur"))
    // cumulative CDFs over the <=64-row bin table: the single-partition
    // window is bounded by the bin count, never by the corpus
    val byBin = Window.orderBy("bin")
    val cum = g.select(col("bin"),
      sum(col("n_ref")).over(byBin).as("c_ref"),
      sum(col("n_cur")).over(byBin).as("c_cur"),
      sum(col("n_ref")).over(Window.partitionBy()).as("t_ref"),
      sum(col("n_cur")).over(Window.partitionBy()).as("t_cur"))
    val delta = cum.select(col("bin"),
      abs(expr("c_ref * 10000 div t_ref") - expr("c_cur * 10000 div t_cur")).as("d_bp"),
      col("t_ref"), col("t_cur"))
    val mx = delta.agg(max(col("d_bp")).as("m")).select(col("m"))
    delta.crossJoin(broadcast(mx))
      .agg(
        min(col("t_ref")).as("n_ref"), min(col("t_cur")).as("n_cur"),
        max(col("d_bp")).as("ks_bp"),
        min(when(col("d_bp") === col("m"), col("bin"))).as("ks_bin"),
        (max(col("d_bp")) > 300).as("drifted"))
  }

  val all: Seq[QueryDef] = Seq(qProfile, qDqChecks, qJoinSkew, qDriftDetect, qDriftKs)
}
