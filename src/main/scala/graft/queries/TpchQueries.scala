package graft.queries

import graft.{Exact, QueryDef, Tables}
import graft.operators.LayoutOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining TPC-H-shaped relational suite over this schema
  * (SURVEY §2.11 widening): the reference's query surface is a
  * vector-ingestion pipeline, but a user replacing it still runs ad-hoc
  * relational analytics over the same warehouse — these are the public
  * TPC-H patterns expressible on the driver's star schema. The driver
  * schema has no `partsupp` and no commit/receipt dates, so
  * Q2/Q9/Q11/Q12/Q16/Q19/Q21 are adapted to the columns that exist —
  * each keeps its ORIGINAL structural pattern (Q2's correlated scalar
  * MIN, Q11's HAVING-vs-global-scalar, Q12's two-class conditional
  * counts, Q21's EXISTS + NOT EXISTS double correlation) with the
  * missing attributes substituted (acctbal for supplycost, shipdate
  * lateness for commit/receipt slack, returnflag for shipmode).
  *
  * Each query is ONE ANSI SQL string run verbatim by both `spark.sql`
  * and the DuckDB oracle. Determinism contract (QueryDef): every money
  * aggregate sums exact integer units (`pu·(100-du)` = 10⁻⁴ currency
  * units) before a single final double division; DuckDB's
  * SUM(BIGINT)→HUGEINT widening is normalized with an explicit
  * `CAST(SUM(..) AS BIGINT)`; `EXTRACT(YEAR ...)` is cast to INT on
  * both engines; every ORDER BY carries a unique tie-break key.
  *
  * Scale notes: all are star joins over `lineitem` — the dimension
  * sides (nation/region/part/supplier/customer at their filtered
  * sizes) stay under the broadcast threshold, so Catalyst plans
  * broadcast-hash joins with the big fact probe side; the aggregates
  * are partial (map-side combine on long units); Q13's left join
  * shuffles on the customer key and is AQE-coalesced; Q15's scalar MAX
  * subquery evaluates the CTE once (no per-row re-execution after
  * RewriteCorrelatedScalarSubquery); Q18's IN rewrites to a semi-join
  * on `l_orderkey`, co-partitioned with the outer aggregation key so
  * the two shuffles share one exchange.
  */
object TpchQueries {

  private def sqlBoth(name: String, tables: Seq[String])(sql: String): QueryDef =
    QueryDef.sql(name, sql) { (s: SparkSession, d: String) =>
      tables.foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
      s.sql(sql)
    }

  private val AllTables =
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region", "part")

  /** Q2 minimum-cost supplier (adapted: no `partsupp`, so "cost" is the
    * supplier's account balance and part-supplier pairs come from
    * `lineitem`): for each qualifying part, the European supplier(s)
    * whose acctbal is the MINIMUM over that part's European suppliers —
    * the correlated-scalar-subquery pattern of the original.
    *
    * Scale: the `ps` CTE is one distinct-shuffle on (partkey, suppkey);
    * Catalyst de-correlates the scalar MIN into an aggregate on
    * `l_partkey` joined back on the part key — both sides partition on
    * the part key, and the dimension joins (supplier/nation/region)
    * broadcast. No per-row subquery re-execution survives planning. */
  val q2MinCostSupplier: QueryDef = sqlBoth(
    "q2_min_cost_supplier", AllTables)(
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part, ps, supplier, nation, region
      |WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND p_size IN (5, 10, 15, 20) AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      |  AND s_acctbal = (
      |    SELECT MIN(s2.s_acctbal)
      |    FROM ps ps2, supplier s2, nation n2, region r2
      |    WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin)

  /** Q7 volume shipping: bilateral trade between two nations by ship
    * year. The nation dimension joins TWICE (supplier role + customer
    * role) — same relation, two broadcast instances. */
  val q7VolumeShipping: QueryDef = sqlBoth(
    "q7_volume_shipping", AllTables)(
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(CAST(SUM(volume_u) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |        CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
      |        CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
      |          * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS volume_u
      |      FROM lineitem
      |      JOIN orders ON o_orderkey = l_orderkey
      |      JOIN customer ON c_custkey = o_custkey
      |      JOIN supplier ON s_suppkey = l_suppkey
      |      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                           AND TIMESTAMP '1997-12-31 00:00:00') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)

  /** Q8 market share: one supplier nation's share of PROMO-part revenue
    * sold into one region, by order year — a ratio of two exact-integer
    * sums over the same grouped rows (single aggregation, no re-scan). */
  val q8MarketShare: QueryDef = sqlBoth(
    "q8_market_share", AllTables)(
    """SELECT o_year,
      |  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume_u ELSE 0 END) AS BIGINT) AS DOUBLE)
      |    / CAST(CAST(SUM(volume_u) AS BIGINT) AS DOUBLE) AS mkt_share
      |FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
      |        CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
      |          * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS volume_u,
      |        n1.n_name AS supp_nation
      |      FROM lineitem
      |      JOIN part ON p_partkey = l_partkey
      |      JOIN orders ON o_orderkey = l_orderkey
      |      JOIN customer ON c_custkey = o_custkey
      |      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |      JOIN region ON r_regionkey = n2.n_regionkey
      |      JOIN supplier ON s_suppkey = l_suppkey
      |      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |      WHERE r_name = 'ASIA' AND p_type = 'PROMO') all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin)

  /** Q9 product-type profit (adapted: no `partsupp`, so profit is gross
    * line revenue rather than revenue − supplycost·qty), by supplier
    * nation and order year. */
  val q9ProductProfit: QueryDef = sqlBoth(
    "q9_product_profit", AllTables)(
    """SELECT nation, o_year,
      |  CAST(CAST(SUM(amount_u) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_profit
      |FROM (SELECT n_name AS nation,
      |        CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
      |        CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
      |          * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS amount_u
      |      FROM lineitem
      |      JOIN part ON p_partkey = l_partkey
      |      JOIN supplier ON s_suppkey = l_suppkey
      |      JOIN orders ON o_orderkey = l_orderkey
      |      JOIN nation ON n_nationkey = s_nationkey
      |      WHERE p_type = 'STANDARD') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin)

  /** Q10 returned items: top-20 customers by revenue lost to returns in
    * one quarter; ties broken on the unique customer key. */
  val q10ReturnedItems: QueryDef = sqlBoth(
    "q10_returned_items", AllTables)(
    """SELECT c_custkey, c_name,
      |  CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
      |    * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT))) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
      |  c_acctbal, n_name
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin)

  /** Q11 important stock (adapted: part "value" is NATION_1-supplied
    * line revenue instead of availqty·supplycost): parts whose value
    * exceeds 1/500 of the nation's total — the original's
    * HAVING-against-a-global-scalar pattern, expressed over a CTE the
    * planner evaluates once for both the per-part rows and the scalar
    * total (the ReuseExchange shape; the scalar side aggregates the
    * CTE's output, partition-count-bounded). Exact integer units
    * throughout; the 1/500 threshold compares in double AFTER the exact
    * sums. */
  val q11ImportantParts: QueryDef = sqlBoth(
    "q11_important_parts", Seq("lineitem", "supplier", "nation"))(
    """WITH pv AS (
      |  SELECT l_partkey AS p_partkey,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
      |      * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT))) AS BIGINT) AS value_u
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE n_name = 'NATION_1'
      |  GROUP BY l_partkey)
      |SELECT p_partkey, CAST(value_u AS DOUBLE) / 10000.0 AS part_value
      |FROM pv
      |WHERE value_u > (SELECT CAST(SUM(value_u) AS BIGINT) FROM pv) / 500.0
      |ORDER BY part_value DESC, p_partkey""".stripMargin)

  /** Q12 shipping modes and order priority (adapted: no `l_shipmode` or
    * commit/receipt dates — the mode class is `l_returnflag` and "late"
    * is shipped ≥60 days after the order date): per class, how many
    * late lines carried high- vs low-priority orders — the original's
    * two-class conditional-count pattern. One fact-fact equi-join on
    * the order key, counts partial-aggregated map-side. */
  val q12LateShipments: QueryDef = sqlBoth(
    "q12_late_shipments", Seq("orders", "lineitem"))(
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin)

  /** Q13 customer distribution: orders-per-customer histogram through a
    * LEFT join (zero-order customers count in the c_count=0 bucket). */
  val q13CustomerDistribution: QueryDef = sqlBoth(
    "q13_customer_distribution", Seq("customer", "orders"))(
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin)

  /** Q14 promo revenue share: conditional-sum ratio in one pass. */
  val q14PromoRevenue: QueryDef = sqlBoth(
    "q14_promo_revenue", Seq("lineitem", "part"))(
    """SELECT 100.0
      |  * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END) AS BIGINT) AS DOUBLE)
      |  / CAST(CAST(SUM(rev_u) AS BIGINT) AS DOUBLE) AS promo_revenue
      |FROM (SELECT p_type,
      |        CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
      |          * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS rev_u
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00') promo""".stripMargin)

  /** Q15 top supplier: the revenue CTE feeds both the join and the
    * scalar MAX threshold — Catalyst evaluates it once and broadcasts
    * the scalar, no per-row subquery. */
  val q15TopSupplier: QueryDef = sqlBoth(
    "q15_top_supplier", Seq("supplier", "lineitem"))(
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
      |      * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT))) AS BIGINT) AS total_u
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_u AS DOUBLE) / 10000.0 AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_u = (SELECT MAX(total_u) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin)

  /** Q16 supplier counts by part attributes (adapted: supplier-part
    * relationships come from `lineitem` instead of `partsupp`) —
    * COUNT(DISTINCT) per 3-attribute group. */
  val q16PartSuppliers: QueryDef = sqlBoth(
    "q16_part_suppliers", Seq("part", "lineitem"))(
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)

  /** Q18 large-volume orders: the HAVING subquery rewrites to an
    * aggregate + semi-join on `l_orderkey`, sharing its shuffle key
    * with the outer per-order aggregation. */
  val q18LargeOrders: QueryDef = sqlBoth(
    "q18_large_orders", Seq("customer", "orders", "lineitem"))(
    """SELECT c_name, c_custkey, o_orderkey,
      |  CAST(CAST(SUM(qu) AS BIGINT) AS DOUBLE) / 100.0 AS total_qty
      |FROM (SELECT l_orderkey, CAST(ROUND(l_quantity * 100.0) AS BIGINT) AS qu FROM lineitem) l
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) > 20000)
      |GROUP BY c_name, c_custkey, o_orderkey
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 100""".stripMargin)

  /** Q19 discounted revenue (adapted: brand/size/quantity bands instead
    * of the container attribute) — a disjunction of conjunctive range
    * predicates; the shared `p_partkey = l_partkey` stays an equi-join
    * with the OR residual as a post-join filter. */
  val q19DiscountedRevenue: QueryDef = sqlBoth(
    "q19_discounted_revenue", Seq("lineitem", "part"))(
    """SELECT CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
      |    * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT))) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1.0 AND l_quantity <= 20.0)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity >= 10.0 AND l_quantity <= 30.0)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
      |       AND l_quantity >= 20.0 AND l_quantity <= 40.0)""".stripMargin)

  /** Q21 suppliers who kept orders waiting (adapted: no commit/receipt
    * dates — the "waiting" supplier is the one whose line shipped
    * strictly AFTER every other supplier's lines on a multi-supplier
    * finished order): the original's double-correlation pattern — an
    * EXISTS (another supplier participated) and a NOT EXISTS (no other
    * supplier shipped as late) against the same fact table.
    *
    * Scale: Catalyst de-correlates both subqueries into a left-semi and
    * a left-anti join on `l_orderkey` — three shuffles on the same order
    * key (exchange-reusable), never a per-row probe; the supplier/
    * nation dimensions broadcast onto the fact side. */
  val q21WaitingSuppliers: QueryDef = sqlBoth(
    "q21_waiting_suppliers", Seq("supplier", "lineitem", "orders", "nation"))(
    """SELECT s_name, numwait FROM (
      |  SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |  FROM supplier
      |  JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |  JOIN orders ON o_orderkey = l1.l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
      |    AND EXISTS (SELECT 1 FROM lineitem l2
      |                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                  AND l3.l_shipdate >= l1.l_shipdate)
      |  GROUP BY s_name) w
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin)

  /** Equi-depth quantile bucketing (the histogram/banding primitive
    * §2.6 lacked) with EXACT `NTILE(4)` semantics over the total order
    * `(c_acctbal, c_custkey)` — but WITHOUT the global window a bare
    * `NTILE() OVER (ORDER BY …)` plans: an unpartitioned window is
    * `Exchange SinglePartition` in Spark — every customer row through
    * one task, the classic 100×-scale killer. The DuckDB oracle keeps
    * the NTILE form (exact by definition at oracle scale).
    *
    * Scale shape (two-pass global rank): (1) range-repartition on the
    * sort key, then pin the layout with an eager `localCheckpoint` so
    * every downstream branch reads the SAME partitioning (range-
    * boundary sampling is seeded per RDD id, so an un-pinned
    * recomputation could re-draw boundaries and misalign the offsets);
    * (2) per-partition row counts (≤ shuffle-partition-count rows)
    * cross-joined against themselves yield each partition's cumulative
    * offset and the total N — partition-count-bounded, never
    * data-sized, and free of scalar aggregates, so NO
    * `Exchange SinglePartition` appears anywhere in the plan (asserted
    * in PlanSpec); (3) global rank = broadcast partition offset +
    * parallel per-partition `row_number`; (4) the NTILE formula assigns
    * the tile arithmetically: with q = N div 4, rem = N mod 4, the
    * first rem tiles carry q+1 rows. */
  val qNtileBalance: QueryDef = QueryDef.sql(
    "q_ntile_balance",
    """SELECT tile, COUNT(*) AS n,
      |  CAST(CAST(SUM(bu) AS BIGINT) AS DOUBLE) / 100.0 AS sum_bal,
      |  CAST(MIN(bu) AS DOUBLE) / 100.0 AS min_bal,
      |  CAST(MAX(bu) AS DOUBLE) / 100.0 AS max_bal
      |FROM (SELECT CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS tile,
      |        CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS bu
      |      FROM customer) t
      |GROUP BY tile
      |ORDER BY tile""".stripMargin) { (s, d) =>
    val base = Tables(s, d, "customer")
      .select(col("c_acctbal"), col("c_custkey"),
        Exact.units(col("c_acctbal"), 2).as("bu"))
      .repartitionByRange(col("c_acctbal"), col("c_custkey"))
      .localCheckpoint()
      .withColumn("pid", spark_partition_id())
    val counts = base.groupBy("pid").agg(count(lit(1)).as("cnt"))
    val offsets = counts.as("a")
      .crossJoin(broadcast(counts.as("b")))
      .groupBy(col("a.pid").as("pid"))
      .agg(
        coalesce(sum(when(col("b.pid") < col("a.pid"), col("b.cnt"))), lit(0L)).as("off"),
        sum(col("b.cnt")).as("n"))
    base.join(broadcast(offsets), "pid")
      .withColumn("r",
        row_number().over(
          Window.partitionBy("pid").orderBy("c_acctbal", "c_custkey"))
          .cast("long") + col("off"))
      .withColumn("tile", expr(
        """CAST(CASE WHEN r <= (n div 4 + 1) * (n % 4)
          |     THEN (r + n div 4) div (n div 4 + 1)
          |     ELSE n % 4 + (r - (n div 4 + 1) * (n % 4) + n div 4 - 1) div (n div 4)
          |     END AS INTEGER)""".stripMargin))
      .groupBy("tile")
      .agg(count(lit(1)).as("n"),
        Exact.toDouble(sum(col("bu")).cast("long"), 2).as("sum_bal"),
        Exact.toDouble(min(col("bu")), 2).as("min_bal"),
        Exact.toDouble(max(col("bu")), 2).as("max_bal"))
      .orderBy("tile")
  }

  /** Z-order (Morton) clustering key over (customer, order-day) with a
    * bucket histogram — the layout primitive behind multi-dimensional
    * file skipping ([[graft.operators.LayoutOps.zValue]]; LayoutSpec
    * quantifies the pruning win). Pure codegen'd bit arithmetic, no
    * shuffle before the final small aggregation. */
  val qZorderCluster: QueryDef = QueryDef.sql(
    "q_zorder_cluster",
    s"""WITH z AS (
       |  SELECT ${LayoutOps.zValueSql(
              "CAST(o_custkey AS BIGINT)",
              "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)")} AS z
       |  FROM orders
       |)
       |SELECT CAST(z >> 18 AS BIGINT) AS z_bucket,
       |  COUNT(*) AS n, MIN(z) AS z_min, MAX(z) AS z_max
       |FROM z
       |GROUP BY z_bucket
       |ORDER BY z_bucket""".stripMargin) { (s, d) =>
    Tables(s, d, "orders")
      .select(LayoutOps.zValue(col("o_custkey"),
        expr("datediff(cast(o_orderdate as date), date'1970-01-01')")).as("z"))
      .groupBy(shiftright(col("z"), 18).as("z_bucket"))
      .agg(count(lit(1)).as("n"), min(col("z")).as("z_min"), max(col("z")).as("z_max"))
      .orderBy("z_bucket")
  }

  val all: Seq[QueryDef] = Seq(
    q2MinCostSupplier, q7VolumeShipping, q8MarketShare, q9ProductProfit,
    q10ReturnedItems, q11ImportantParts, q12LateShipments,
    q13CustomerDistribution, q14PromoRevenue, q15TopSupplier,
    q16PartSuppliers, q18LargeOrders, q19DiscountedRevenue,
    q21WaitingSuppliers, qNtileBalance, qZorderCluster)
}
