package graft

import graft.operators.BloomOps
import org.apache.spark.sql.functions._

/** Bloom filter invariants: one-sided error (no false negatives,
  * bounded false positives), merge/partitioning invariance, and
  * agreement between the packed-bit JVM build and the pure-Catalyst
  * membership expression.
  */
class BloomSpec extends SparkSpec {

  private val M = 2048
  private val K = 4

  private def keysDf(keys: Seq[String]) = {
    import spark.implicits._
    keys.toDF("k").select(md5(col("k")).as("mh"))
  }

  private def build(keys: Seq[String], parts: Int): Seq[Long] = {
    val agg = udaf(new BloomOps.BloomAggregator(M, K))
    keysDf(keys).repartition(parts).agg(agg(col("mh")).as("b"))
      .head.getSeq[Long](0)
  }

  test("no false negatives: every inserted key tests positive") {
    val keys = (0 until 200).map(i => s"key-$i-payload")
    val bits = build(keys, parts = 5)
    val misses = keysDf(keys)
      .filter(!BloomOps.mightContain(bits, M, K)(col("mh")))
      .count()
    assert(misses == 0)
  }

  test("merge is order/partitioning-invariant") {
    val keys = (0 until 300).map(i => s"item $i")
    assert(build(keys, 1) == build(keys, 7))
    assert(build(keys, 7) == build(keys.reverse, 3))
  }

  test("false-positive rate stays near the design point") {
    val inserted = (0 until 200).map(i => s"in-$i")
    val bits = build(inserted, 4)
    // expected fpp = (1 - e^(-kn/m))^k ≈ 1.6% at n=200, m=2048, k=4
    val probes = (0 until 1000).map(i => s"out-$i")
    val fp = keysDf(probes)
      .filter(BloomOps.mightContain(bits, M, K)(col("mh")))
      .count()
    assert(fp < 60, s"false-positive count $fp far above the ~16 expected")
  }

  test("hash-count and bit-width bounds are enforced") {
    // position nine would overflow the 60-bit double-hash sum
    intercept[IllegalArgumentException](new BloomOps.BloomAggregator(M, 9))
    intercept[IllegalArgumentException](new BloomOps.BloomAggregator(100, K))
    intercept[IllegalArgumentException](BloomOps.mightContain(Seq(0L), 64, 0)(col("x")))
  }

  test("set bits are exactly the positions arithmetic says") {
    val keys = Seq("alpha", "beta", "gamma")
    val bits = build(keys, 2)
    val setBits = for {
      w <- bits.indices
      b <- 0 until 64
      if (bits(w) & (1L << b)) != 0
    } yield w * 64 + b
    val expected = keysDf(keys)
      .select(explode(BloomOps.positions(col("mh"), M, K)).as("p"))
      .collect().map(_.getLong(0)).toSet
    assert(setBits.toSet == expected.map(_.toInt))
  }

  // ---- count-min sketch (the frequency sibling) --------------------------

  private val W = 64
  private val D = 4

  private def cmsBuild(keys: Seq[String], parts: Int): Seq[Long] = {
    import graft.operators.SketchOps
    val agg = udaf(new SketchOps.CmsAggregator(W, D))
    keysDf(keys).repartition(parts).agg(agg(col("mh")).as("c"))
      .head.getSeq[Long](0)
  }

  test("CMS: merge invariance, never-undercount, and estimate ≡ scalar recompute") {
    import graft.operators.SketchOps
    // skewed multiset over a deliberately tiny width → real collisions
    val keys = (0 until 400).map(i => s"u-${i % 37}") ++ (0 until 60).map(_ => "u-0")
    assert(cmsBuild(keys, 1) == cmsBuild(keys, 7))
    assert(cmsBuild(keys, 7) == cmsBuild(keys.reverse, 3))
    val sketch = cmsBuild(keys, 5)
    // total mass: every row of the matrix sums to the input size
    (0 until D).foreach { i =>
      assert(sketch.slice(i * W, (i + 1) * W).sum == keys.size.toLong)
    }
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = keysDf(exact.keys.toSeq)
      .withColumn("est", SketchOps.estimate(sketch, W, D)(col("mh")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // scalar recompute of the same double-hash min — pure JVM, no Spark
    def scalarEst(mh: String): Long = {
      val a = java.lang.Long.parseLong(mh.substring(0, 15), 16)
      val b = java.lang.Long.parseLong(mh.substring(16, 31), 16)
      (0 until D).map(i => sketch(i * W + ((a + i.toLong * b) % W).toInt)).min
    }
    exact.foreach { case (k, n) =>
      val mh = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(mh) >= n, s"CMS undercounted $k")
      assert(got(mh) == scalarEst(mh), s"Catalyst estimate diverged for $k")
    }
  }

  test("CMS depth bound is enforced (double-hash overflow)") {
    import graft.operators.SketchOps
    intercept[IllegalArgumentException](new SketchOps.CmsAggregator(W, 9))
    intercept[IllegalArgumentException](SketchOps.estimate(Seq(0L), W, 0)(col("x")))
  }
}
