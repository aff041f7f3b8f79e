package graft.queries

import graft.pipeline.Ledger
import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CDC inventory (SURVEY.md §2.4 J1, §2.10, §2.11-10), simulated over
  * `orders` so the DuckDB oracle can verify it: the "state" ledger is a
  * date-bounded snapshot, the "current" listing perturbs every 10th key
  * with a 30-day-later modification, and J1 must emit exactly the new +
  * updated rows.
  */
object CdcQueries {

  private val Cutoff = "1998-01-01 00:00:00"

  /** J1: anti-join ∪ newer-timestamp semi-join. */
  val qCdcNewUpdated: QueryDef = QueryDef.sql(
    "q_cdc_new_updated",
    s"""WITH current AS (
       |  SELECT o_orderkey AS name,
       |    CASE WHEN o_orderkey % 10 = 0 THEN o_orderdate + INTERVAL 30 DAY
       |         ELSE o_orderdate END AS last_modified
       |  FROM orders
       |), state AS (
       |  SELECT o_orderkey AS name, o_orderdate AS last_modified
       |  FROM orders WHERE o_orderdate < TIMESTAMP '$Cutoff'
       |)
       |SELECT c.name AS name,
       |  epoch_us(c.last_modified) AS modified_us,
       |  CASE WHEN s.name IS NULL THEN 'new' ELSE 'updated' END AS change_type
       |FROM current c LEFT JOIN state s ON c.name = s.name
       |WHERE s.name IS NULL OR c.last_modified > s.last_modified
       |ORDER BY c.name""".stripMargin) { (s, d) =>
    val orders = Tables(s, d, "orders")
    val current = orders.select(
      col("o_orderkey").as("name"),
      when(col("o_orderkey") % 10 === 0, col("o_orderdate") + expr("INTERVAL 30 DAY"))
        .otherwise(col("o_orderdate")).cast("timestamp").as("last_modified"))
    val state = orders
      .filter(col("o_orderdate") < lit(Cutoff).cast("timestamp"))
      .select(col("o_orderkey").as("name"), col("o_orderdate").as("last_modified"))
    Ledger.newAndUpdated(current, state)
      .select(col("name"), unix_micros(col("last_modified")).as("modified_us"),
        col("change_type"))
      .orderBy("name")
  }

  /** S12 delete as anti-join rewrite: purge line items of finalized
    * orders, then summarize what survives. */
  val qCdcDelete: QueryDef = QueryDef.sql(
    "q_cdc_delete",
    """SELECT l_returnflag, COUNT(*) AS n_remaining,
      |  CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val store = Tables(s, d, "lineitem")
    val keys = Tables(s, d, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"))
    Ledger.deleteByKey(store, keys, "l_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_remaining"),
        graft.Exact.toDouble(sum(graft.Exact.units(col("l_quantity"), 2)), 2).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Watermark filter (P2): the reference's `modified_dt > load_dt`
    * predicate — pushed down to the parquet scan. */
  val qCdcWatermark: QueryDef = QueryDef.sql(
    "q_cdc_watermark",
    s"""SELECT o_orderpriority, COUNT(*) AS n
       |FROM orders
       |WHERE o_orderdate > TIMESTAMP '$Cutoff'
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables(s, d, "orders")
      .filter(col("o_orderdate") > lit(Cutoff).cast("timestamp"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[QueryDef] = Seq(qCdcNewUpdated, qCdcDelete, qCdcWatermark)
}
