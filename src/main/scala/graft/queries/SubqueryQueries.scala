package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession

/** Correlated / nested subqueries (SURVEY §2.4 J3 extension): the
  * TPC-H-shaped patterns Catalyst must DECORRELATE — correlated scalar
  * aggregates (Q17 shape), IN + HAVING (Q20 shape), NOT EXISTS + global
  * scalar threshold (Q22 shape). Each query is ONE ANSI SQL string run
  * verbatim by BOTH `spark.sql` (over temp views of the parquet tables)
  * and the DuckDB oracle — the engines must agree on the decorrelated
  * semantics, not just the plan.
  *
  * Scale notes: Catalyst rewrites every correlated subquery below into
  * aggregate + join (RewriteCorrelatedScalarSubquery /
  * RewritePredicateSubquery) — no per-row re-execution; thresholds
  * compare in exact integer units so float aggregation order can't flip
  * a boundary row (QueryDef determinism contract).
  */
object SubqueryQueries {

  private def sqlBoth(name: String, tables: Seq[String])(sql: String): QueryDef =
    QueryDef.sql(name, sql) { (s: SparkSession, d: String) =>
      tables.foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
      s.sql(sql)
    }

  /** Q17 shape: parts of one brand whose line items are below 20% of the
    * part's average quantity; the threshold `qty < 0.2·avg(qty)` is
    * algebraically rearranged to the exact-integer form
    * `5·qu·count < sum_units` (qu = qty·100). Two correlated scalar
    * subqueries on the same key — decorrelated into one aggregate join. */
  val q17SmallQuantity: QueryDef = sqlBoth(
    "q17_small_quantity", Seq("lineitem", "part"))(
    """SELECT CAST(SUM(pu) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly,
      |       COUNT(*) AS n_lines
      |FROM (SELECT l_partkey,
      |        CAST(ROUND(l_quantity * 100.0) AS BIGINT) AS qu,
      |        CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS pu
      |      FROM lineitem) l
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4' AND p_size <= 25
      |  AND 5 * l.qu * (SELECT COUNT(*) FROM lineitem l2
      |                  WHERE l2.l_partkey = l.l_partkey)
      |      < (SELECT SUM(CAST(ROUND(l2.l_quantity * 100.0) AS BIGINT))
      |         FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)

  /** Q20 shape: suppliers whose post-1997 shipment count clears a
    * threshold — IN over a grouped HAVING subquery (semi-join after
    * rewrite; threshold 425 ≈ the per-supplier median, so both branches
    * are populated). */
  val q20ActiveSuppliers: QueryDef = sqlBoth(
    "q20_active_suppliers", Seq("supplier", "lineitem"))(
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey
      |  HAVING COUNT(*) >= 425)
      |ORDER BY s_suppkey""".stripMargin)

  /** Q22 shape: above-average-balance customers with no urgent orders,
    * grouped by a name-derived code. The global-average threshold
    * compares as `balance_units · count > sum_units` (uncorrelated
    * scalar subqueries); the NOT EXISTS is a correlated anti-join. */
  val q22BalanceCode: QueryDef = sqlBoth(
    "q22_balance_code", Seq("customer", "orders"))(
    """WITH pos AS (
      |  SELECT c_custkey, c_name,
      |    CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS bu
      |  FROM customer WHERE c_acctbal > 0.0
      |)
      |SELECT SUBSTRING(c_name, LENGTH(c_name) - 1, 2) AS code,
      |  COUNT(*) AS numcust,
      |  CAST(SUM(bu) AS DOUBLE) / 100.0 AS totacctbal
      |FROM pos c
      |WHERE c.bu * (SELECT COUNT(*) FROM pos) > (SELECT SUM(bu) FROM pos)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY code
      |ORDER BY code""".stripMargin)

  /** LATERAL correlated subquery join (the SQL-standard face of
    * per-group top-k): for each high-value order, its two priciest line
    * items via `FROM orders o, LATERAL (... WHERE l_orderkey =
    * o.o_orderkey ORDER BY ... LIMIT 2)`. Same decorrelation contract
    * as the scalar shapes above, but here the subquery is a RELATION
    * per outer row, not a scalar — the piece of §2.4 the other
    * subquery entries don't exercise.
    *
    * Scale: Catalyst decorrelates the LIMIT-in-LATERAL into
    * WindowGroupLimit (partial top-2 per l_orderkey BEFORE the
    * shuffle — never a global sort, never per-row re-execution) and
    * broadcasts the filtered orders side; verified in PlanSpec. The
    * ORDER BY carries l_linenumber so equal-price ties can't flip the
    * kept pair between engines. */
  val qLateralTopK: QueryDef = sqlBoth(
    "q_lateral_topk", Seq("orders", "lineitem"))(
    """SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
      |FROM orders o, LATERAL (
      |  SELECT l_linenumber, l_extendedprice FROM lineitem
      |  WHERE l_orderkey = o.o_orderkey
      |  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
      |WHERE o.o_totalprice > 450000.0
      |ORDER BY o.o_orderkey, l.l_extendedprice DESC, l.l_linenumber""".stripMargin)

  val all: Seq[QueryDef] =
    Seq(q17SmallQuantity, q20ActiveSuppliers, q22BalanceCode, qLateralTopK)
}
