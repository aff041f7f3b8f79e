package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary: 6 flag/status groups, exact totals") {
    val rows = Relational.q1PricingSummary.run(spark, sf).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 1000)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_qty") > 0)
      assert(r.getAs[Double]("sum_base_price") > r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q3 top-10 is deterministic and descending by revenue") {
    val rows = Relational.q3ShippingPriority.run(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("every declared query runs at sf0.001 and yields a schema") {
    SparkEntry.defs.foreach { q =>
      val df = q.run(spark, sf)
      assert(df.schema.nonEmpty, q.name)
      assert(df.count() >= 0, q.name)
    }
  }

  test("registered query count is pinned (silent registration loss is loud)") {
    // Round 6 shipped a "green" board that had silently shrunk from 155
    // to 138 reported queries. Pin the count: adding a query means
    // bumping this number in the same commit — removing one without
    // noticing becomes a test failure instead of a shorter report.
    assert(SparkEntry.queries.size == 176,
      s"expected 176 registered queries, got ${SparkEntry.queries.size}")
    assert(SparkEntry.defs.map(_.name).distinct.size == SparkEntry.defs.size,
      "duplicate query names would silently collapse in the queries map")
  }

  test("oracle coverage: every query with SQL has matching name") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("two-pass equi-depth bucketing ≡ NTILE(4) on a remainder-size table") {
    // sf0.001 customer has 150 rows (150 mod 4 == 2), exercising the
    // uneven-tile branch of the arithmetic NTILE assignment that the
    // sf0.01 oracle run (1500 rows, divisible by 4) never reaches; the
    // oracle SQL is ANSI enough for Spark itself to be the referee
    val q = queries.TpchQueries.qNtileBalance
    Tables(spark, sf, "customer").createOrReplaceTempView("customer")
    val want = spark.sql(q.oracle.get).collect().toSeq
    val got = q.run(spark, sf).collect().toSeq
    assert(got == want, s"two-pass tiles diverge from NTILE:\ngot  $got\nwant $want")
  }
}
