package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Graph analytics over relationship structures derived from the
  * relational tables (EXT — joins [[SearchQueries.qPageRank]] in the
  * graph family). The co-purchase graph links two parts when some order
  * contains both — the item-item affinity structure recommendation and
  * fraud pipelines mine.
  */
object GraphQueries {

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")

  /** Triangle count over the co-purchase part graph, via DEGREE-ORDERED
    * wedge closing: orient every undirected edge from its (degree, id)-
    * smaller endpoint to the larger, enumerate wedges only between
    * out-neighbors, and close each wedge against the oriented edge set.
    * Every triangle {a ≺ b ≺ c} appears exactly once — as the wedge
    * (a→b, a→c) closed by b→c — so the count needs no dedup.
    *
    * The orientation is the scale move: out-degrees under the
    * (degree, id) order are O(√m), so wedge work is O(m^1.5) instead of
    * Σ deg² — on a power-law co-purchase graph the difference is the
    * hub nodes' deg² blowing up (a part in a million orders would
    * otherwise spawn 10¹² wedges on its own). All steps are equi-joins
    * and aggregations on node keys, unhinted (the graph grows with the
    * corpus); per-order pair expansion is bounded by lines-per-order.
    * Edges carry a market-basket support threshold (co-purchased in ≥2
    * distinct orders) — the standard noise floor that keeps an affinity
    * graph's density from tracking one-off baskets. The DuckDB oracle
    * counts the same triangles by the naive id-order formulation — same
    * total by the bijection above. */
  val qTriangles: QueryDef = QueryDef.sql(
    "q_graph_triangles",
    """WITH e AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2
      |)
      |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
      |  (SELECT COUNT(*)
      |   FROM e e1
      |   JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
      |   JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb) AS n_triangles""".stripMargin) { (s, d) =>
    val items = li(s, d).select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val und = items.select(col("ok"), col("pk").as("pa"))
      .join(items.select(col("ok"), col("pk").as("pb")), Seq("ok"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(countDistinct(col("ok")).as("support"))
      .filter(col("support") >= 2)
      .select("pa", "pb")
    val deg = und.select(col("pa").as("n")).unionAll(und.select(col("pb").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // pa < pb always, so (deg, id)-order puts pa first iff deg(pa) <= deg(pb)
    val oriented = und
      .join(deg.select(col("n").as("pa"), col("deg").as("da")), Seq("pa"))
      .join(deg.select(col("n").as("pb"), col("deg").as("db")), Seq("pb"))
      .select(
        when(col("da") <= col("db"), col("pa")).otherwise(col("pb")).as("src"),
        when(col("da") <= col("db"), col("pb")).otherwise(col("pa")).as("dst"),
        when(col("da") <= col("db"), col("db")).otherwise(col("da")).as("ddeg"))
    val wedges = oriented.select(col("src"), col("dst").as("v"), col("ddeg").as("dv"))
      .join(oriented.select(col("src"), col("dst").as("w"), col("ddeg").as("dw")), Seq("src"))
      .filter(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
    val triangles = wedges
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
    und.agg(count(lit(1)).as("n_edges")).crossJoin(triangles)
  }

  /** Association rules over the same co-purchase baskets: for every
    * supported pair {a, b} (≥2 distinct orders) emit both directed
    * rules a→b and b→a with confidence supp(ab)/supp(a) and lift
    * N·supp(ab)/(supp(a)·supp(b)), keeping the top 20 by lift.
    *
    * Scale: item supports and pair supports are two aggregations over
    * the distinct (order, part) projection; attaching supports to rule
    * ends is two UNHINTED equi-joins on the part key (the item-support
    * table grows with the catalog — never broadcast); the basket count
    * N is a scalar. Confidence/lift divide exact BIGINT supports in
    * IEEE doubles — bit-identical across engines — and the top-k breaks
    * lift ties on the (antecedent, consequent) unique pair. */
  val qAssocRules: QueryDef = QueryDef.sql(
    "q_assoc_rules",
    """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
      |item AS (SELECT pk, COUNT(*) AS supp FROM op GROUP BY pk),
      |pair AS (
      |  SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS supp_ab
      |  FROM op a JOIN op b ON b.ok = a.ok AND b.pk > a.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |), rule AS (
      |  SELECT pa AS antecedent, pb AS consequent, supp_ab FROM pair
      |  UNION ALL
      |  SELECT pb, pa, supp_ab FROM pair
      |)
      |SELECT r.antecedent, r.consequent, r.supp_ab,
      |  CAST(r.supp_ab AS DOUBLE) / CAST(ia.supp AS DOUBLE) AS confidence,
      |  CAST(n.n_orders * r.supp_ab AS DOUBLE) / CAST(ia.supp * ic.supp AS DOUBLE) AS lift
      |FROM rule r
      |JOIN item ia ON ia.pk = r.antecedent
      |JOIN item ic ON ic.pk = r.consequent
      |CROSS JOIN n
      |ORDER BY lift DESC, antecedent, consequent
      |LIMIT 20""".stripMargin) { (s, d) =>
    val op = li(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val n = op.agg(countDistinct(col("ok")).as("n_orders"))
    val item = op.groupBy("pk").agg(count(lit(1)).as("supp"))
    val pair = op.select(col("ok"), col("pk").as("pa"))
      .join(op.select(col("ok"), col("pk").as("pb")), Seq("ok"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= 2)
    val rules = pair.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("supp_ab"))
      .unionAll(pair.select(col("pb").as("antecedent"), col("pa").as("consequent"), col("supp_ab")))
    rules
      .join(item.select(col("pk").as("antecedent"), col("supp").as("supp_a")), Seq("antecedent"))
      .join(item.select(col("pk").as("consequent"), col("supp").as("supp_c")), Seq("consequent"))
      .crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("supp_ab"),
        (col("supp_ab").cast("double") / col("supp_a").cast("double")).as("confidence"),
        ((col("n_orders") * col("supp_ab")).cast("double") /
          (col("supp_a") * col("supp_c")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(20)
  }

  val all: Seq[QueryDef] = Seq(qTriangles, qAssocRules)
}
