package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join on a pathologically hot key") {
    import spark.implicits._
    // 10k rows on ONE key plus a thin tail — the shape AQE can't fix
    val fact = ((1 to 10000).map(_ => (1L, "hot")) ++
      (2 to 50).map(i => (i.toLong, s"cold$i"))).toDF("k", "payload")
    val dim = (1 to 50).map(i => (i.toLong, s"attr$i")).toDF("k", "attr")

    val plain = fact.join(dim, Seq("k"))
    val salted = SkewOps.saltedJoin(fact, dim, "k", salt = 8)

    assert(salted.count() == plain.count())
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k", "attr").count().orderBy("k").collect().toSeq
    assert(agg(salted) == agg(plain))
    // the salted plan spreads the hot key over (k, _salt) sub-keys
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("_salt"))
  }
}
