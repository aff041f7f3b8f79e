package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("df cap drops boilerplate shingles, keeps discriminating ones") {
    import spark.implicits._
    // 40 docs share the same boilerplate opener; docs 0 and 1 also share
    // a rare phrase that real near-dup detection must keep.
    val boiler = "terms of service apply to all"
    val docs = (0 until 40).map { i =>
      val tail = if (i <= 1) "identical rare payload here" else s"unique body $i x$i y$i"
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")

    val sh = docs.select(col("doc_id"), explode(DedupOps.shingles(col("text"))).as("shingle"))
    val capped = DedupOps.capShinglesByDf(sh, maxDf = 10)

    // boilerplate shingles (df=40) are gone; the rare shared shingles stay
    val remaining = capped.select("shingle").distinct().as[String].collect().toSet
    assert(!remaining.contains("terms of service"))
    assert(remaining.contains("identical rare payload"))

    // candidate join on capped shingles pairs ONLY the true near-dups —
    // the hot key no longer yields the 40·39/2 pair blow-up
    val a = capped.as("a")
    val b = capped.as("b")
    val pairs = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("df cap is inert when no shingle is hot") {
    import spark.implicits._
    val docs = (0 until 10).map(i => (i.toLong, s"alpha beta gamma delta $i")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), explode(DedupOps.shingles(col("text"))).as("shingle"))
    assert(DedupOps.capShinglesByDf(sh, maxDf = 50).count() == sh.count())
  }

  test("ppjoin prefix filter is COMPLETE: same pairs as the unfiltered exact scorer") {
    import spark.implicits._
    // brute-force truth at sf0.001: every pair sharing >=1 distinct
    // 3-shingle, scored with exact integer intersection/union at tau=0.5
    // (J >= 0.5 > 0 implies >=1 shared token, so share-any-token
    // candidate generation is trivially complete)
    val tok = Tables(spark, sf, "documents")
      .withColumn("_w", DedupOps.cleanWords(col("text")))
      .select(col("doc_id"), explode(DedupOps.shinglesFromWords(col("_w"))).as("t"))
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    val truth = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(col("i") * 2 >= col("na") + col("nb") - col("i"))
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet

    val got = queries.DedupQueries.qDedupPpjoin.run(spark, sf)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet

    assert(got == truth,
      s"prefix filtering must not lose pairs: missing=${truth -- got} extra=${got -- truth}")
    assert(truth.nonEmpty, "fixture should contain near-dup pairs at sf0.001")
  }

  test("ppjoin completeness holds on seeded random corpora, not just the fixture") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    // small vocab forces real overlaps; doc pairs share prefixes of each
    // other's text with varying cut points, giving Jaccards on both
    // sides of tau = 1/2
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (trial <- 1 to 3) {
      val base = Seq.fill(20)(Seq.fill(12 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))))
      val docs = base.zipWithIndex.flatMap { case (w, i) =>
        val cut = 3 + rnd.nextInt(w.size - 2)
        Seq((i * 2L, w.mkString(" ")),
            (i * 2L + 1, (w.take(cut) ++ Seq(s"x$trial$i")).mkString(" ")))
      }.toDF("doc_id", "text")

      val tok = docs
        .withColumn("_w", DedupOps.cleanWords(col("text")))
        .select(col("doc_id"), explode(DedupOps.shinglesFromWords(col("_w"))).as("t"))
      val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val truth = tok.as("a").join(tok.as("b"),
          col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
        .filter(col("i") * 2 >= col("na") + col("nb") - col("i"))
        .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet

      val got = DedupOps.ppjoinPairsHalf(docs)
        .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
      assert(got == truth,
        s"trial $trial: missing=${truth -- got} extra=${got -- truth}")
    }
  }
}
