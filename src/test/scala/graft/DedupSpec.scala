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
}
