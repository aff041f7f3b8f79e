package graft

import graft.queries.Relational
import org.apache.spark.sql.functions.col

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
    assert(SparkEntry.queries.size == 290,
      s"expected 290 registered queries, got ${SparkEntry.queries.size}")
    assert(SparkEntry.defs.map(_.name).distinct.size == SparkEntry.defs.size,
      "duplicate query names would silently collapse in the queries map")
  }

  test("oracle coverage: every query with SQL has matching name") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("binned interval join ≡ the direct inequality join, edges included") {
    import graft.operators.RangeJoinOps
    import spark.implicits._
    // intervals crafted to hit every edge: bin-boundary start, width-1,
    // empty (start == end), spanning 3 bins, negative days
    val intervals = Seq(
      (1L, 0L, 30L), (2L, 32L, 33L), (3L, 31L, 31L),
      (4L, 10L, 75L), (5L, -20L, 5L)).toDF("iid", "sd", "ed")
    val points = (-25L to 80L).map(p => Tuple1(p)).toDF("pd")
    val got = RangeJoinOps.binnedPointInterval(points, "pd", intervals, "sd", "ed", 32)
      .select("pd", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expect = points.as("p").join(intervals.as("i"),
        col("p.pd") >= col("i.sd") && col("p.pd") < col("i.ed"))
      .select("pd", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == expect)
    assert(got.nonEmpty && !expect.exists { case (p, i) => i == 3L }) // empty interval matches nothing
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

  test("global ids: contiguous, order-correct, robust to empty range partitions") {
    import graft.operators.IdOps
    import spark.implicits._
    // keys deliberately clustered so some of the 8 range partitions end
    // up empty (the prefix-sum must skip them without slipping)
    val keys = Seq(5L, 900L, 901L, 902L, 903L, 1L, 950L, 2L, 960L, 3L)
    val got = IdOps.globalIds(keys.map(Tuple1(_)).toDF("k"), "k", numParts = 8)
      .select("k", "gid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = keys.sorted.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    assert(got == want, s"got $got")
    // single row, more partitions than rows
    val one = IdOps.globalIds(Seq(Tuple1(42L)).toDF("k"), "k", numParts = 4)
      .select("gid").collect().map(_.getLong(0)).toSeq
    assert(one == Seq(0L))
  }
}
