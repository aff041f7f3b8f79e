package graft

import graft.functions.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("GraftExtensions registers graft_cosine in the session") {
    assert(spark.catalog.functionExists("graft_cosine"))
    // callable straight from SQL
    val v = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head().getDouble(0)
    assert(v == 1.0)
  }

  /** Run `body` with the FuseCosine rewrite disabled, so "composed"
    * really evaluates through the interpreted HOF path. */
  private def withoutFuseRule[A](body: => A): A = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.FuseCosine")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("fused CosineSim is bit-identical to the composed Catalyst form") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextDouble() * 2 - 1),
        Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    // repartition keeps the projection out of ConvertToLocalRelation's
    // reach — otherwise the whole select constant-folds to a LocalTableScan
    // and neither form appears in the executed plan
    val df = rows.toDF("id", "a", "b").repartition(4)
    val both = withoutFuseRule {
      val q = df.select(col("id"),
        Similarity.cosine(col("a"), col("b")).as("composed"),
        call_function("graft_cosine", col("a"), col("b")).as("fused"))
      // the exclusion must actually hold, or "composed" is fused too and
      // this test proves nothing: exactly ONE graft_cosine (the explicit one)
      assert("graft_cosine".r.findAllIn(q.queryExecution.executedPlan.toString).size == 1)
      q.collect()
    }
    both.foreach { r =>
      // exact bit equality, not approximate: same accumulation order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
  }

  test("FuseCosine rule rewrites the composed HOF shape to the fused kernel") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .repartition(2) // keep the projection live (see above)
    val q = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(q.queryExecution.executedPlan.toString.contains("graft_cosine"),
      "composed cosine over non-null double arrays must fuse")
    // value unchanged by the rewrite
    val fusedVal = q.head().getDouble(0)
    val plainVal = withoutFuseRule {
      df.select(Similarity.cosine(col("a"), col("b")).as("c")).head().getDouble(0)
    }
    assert(java.lang.Double.doubleToLongBits(fusedVal) ==
      java.lang.Double.doubleToLongBits(plainVal))
    // nullable-element arrays must NOT fuse (null-propagation differs)
    val nullable = Seq((Seq(Option(1.0), Option(2.0)), Seq(Option(3.0), Option(4.0))))
      .toDF("a", "b").repartition(2)
    val q2 = nullable.select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(!q2.queryExecution.executedPlan.toString.contains("graft_cosine"),
      "containsNull=true input must stay on the composed path")
  }

  test("CosineSim accepts float arrays via implicit cast and handles nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Option(Seq(1.0f, 2.0f, 3.0f)), Option(Seq(1.0f, 2.0f, 3.0f))),
      (2L, None: Option[Seq[Float]], Option(Seq(1.0f, 2.0f, 3.0f))))
      .toDF("id", "fa", "fb")
    val out = df.select(col("id"),
        call_function("graft_cosine", col("fa"), col("fb")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(out(1L).get - 1.0) < 1e-12)
    assert(out(2L).isEmpty)
  }

  test("CosineSim returns null on mismatched lengths, matching the composed form") {
    import spark.implicits._
    // ADVICE r2: the fused kernel must agree with the composed zip_with
    // form off the equal-dim happy path too — both answer null
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),
      (2L, Seq(1.0, 2.0), Seq(1.0, 2.0)))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
        Similarity.cosine(col("a"), col("b")).as("composed"),
        call_function("graft_cosine", col("a"), col("b")).as("fused"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(1L) == ((true, true)), "mismatched dims: both forms null")
    assert(out(2L) == ((false, false)))
  }

  test("fused DeterministicEmbed is bit-identical to the composed embedder") {
    import spark.implicits._
    val texts = Seq("", "a", "hello world", "x" * 500,
      "unicode: héllo wörld ünïcode", (1 to 100).map(i => s"w$i").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val both = df.select(col("id"),
        graft.functions.Embedders.deterministicEmbed(col("t"), 16).as("composed"),
        call_function("graft_embed", col("t"), lit(16)).as("fused"))
      .collect()
    both.foreach { r =>
      val c = r.getSeq[Double](1)
      val f = r.getSeq[Double](2)
      assert(c.size == 16 && f.size == 16)
      c.zip(f).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y),
          s"row ${r.getLong(0)}")
      }
    }
    // null text -> null embedding
    val nulls = Seq((1L, null: String)).toDF("id", "t")
      .select(call_function("graft_embed", col("t"), lit(8)).as("e")).head()
    assert(nulls.isNullAt(0))
  }

  test("cosineIn falls back to the composed form without the extension") {
    // a bare session name check: cosineIn consults the catalog, so on
    // this (extension-loaded) session it must pick the fused function
    val fast = Similarity.cosineIn(spark, col("a"), col("b"))
    assert(fast.toString.contains("graft_cosine"))
  }
}
