package graft

import graft.operators.SearchOps
import org.apache.spark.sql.functions.{size => asize, _}

class SearchSpec extends SparkSpec {

  test("winnowing: two docs sharing a long run share a fingerprint") {
    import spark.implicits._
    // winnowing guarantee: any shared token run of length >= w+k-1 (= 6
    // tokens at k=3, w=4) produces at least one shared fingerprint
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"prefix one two $shared suffix words here"),
      (2L, s"$shared completely different tail tokens"),
      (3L, "nothing in common with the others at all ok"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        SearchOps.winnow(SearchOps.gramHashes(col("text"))).as("fps"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty, "shared run must share a fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty, "disjoint docs must not collide")
    // fingerprints are a subset of the gram hashes and never empty
    assert(fps.values.forall(_.nonEmpty))
  }

  test("winnowing: fingerprint count is bounded by gram count") {
    val out = Tables(spark, sf, "documents")
      .select(SearchOps.gramHashes(col("text")).as("g"))
      .select(asize(col("g")).as("n_g"),
        asize(SearchOps.winnow(col("g"))).as("n_f"))
      .agg(count(when(col("n_f") > col("n_g"), 1)).as("bad"),
        count(when(col("n_f") <= 0, 1)).as("empty"))
      .head()
    assert(out.getLong(0) == 0 && out.getLong(1) == 0)
  }

  test("hash bucket: stable, in range, and usably uniform") {
    import spark.implicits._
    val b = (1L to 2000L).toDF("id")
      .select(SearchOps.hashBucket(col("id").cast("string"), 100).as("bucket"))
    val rows = b.groupBy("bucket").count().collect()
    assert(rows.map(_.getLong(0)).forall(x => x >= 0 && x < 100))
    // 2000 keys over 100 buckets: every bucket within loose 4x bounds
    assert(rows.length > 90)
    assert(rows.map(_.getLong(1)).max <= 80)
    // deterministic across evaluations
    val twice = b.collect().map(_.getLong(0)).toSeq
    assert(twice == b.collect().map(_.getLong(0)).toSeq)
  }

  test("connected components: min-label propagation on a known graph") {
    // two triangles bridged by a chain, plus an isolated edge:
    // {1,2,3,4,5,6,7} form one component via the 3-4 bridge, {10,11} another
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (5L, 7L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var comp = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
    var changed = 1L
    while (changed > 0) {
      val viaNbr = edges.join(comp, col("src") === col("id"))
        .select(col("dst").as("id"), col("component"))
      val next = comp.select("id", "component").union(viaNbr)
        .groupBy("id").agg(min("component").as("component")).localCheckpoint()
      changed = next.as("n").join(comp.as("o"), "id")
        .filter(col("n.component") =!= col("o.component")).count()
      comp = next
    }
    val got = comp.as[(Long, Long)].collect().toMap
    assert((1L to 7L).forall(got(_) == 1L))
    assert(got(10L) == 10L && got(11L) == 10L)
  }

  test("waterfilling allocation: budget exhausted exactly, nobody oversampled") {
    import org.apache.spark.sql.functions._
    val rows = queries.SearchQueries.qMixWaterfill.run(spark, sf)
      .select("avail", "alloc", "saturated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val totalAvail = rows.map(_._1).sum
    val budget = totalAvail * 6 / 10
    assert(rows.map(_._2).sum == budget,
      s"sum(alloc)=${rows.map(_._2).sum} must equal the budget $budget")
    assert(rows.forall { case (a, al, _) => al <= a }, "alloc must never exceed avail")
    assert(rows.exists(_._3) && rows.exists(!_._3),
      "fixture should produce both saturated and water-level domains")
    // saturated domains keep everything; unsaturated all sit within 1 of
    // the common water level (max-min fairness)
    val levels = rows.filter(!_._3).map(_._2)
    assert(levels.max - levels.min <= 1, s"water levels must be even: $levels")
  }
}
