package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Vector similarity primitives (SURVEY.md §2.4 J-sim, EXT similarity
  * search). Pure Catalyst expressions over ArrayType columns.
  *
  * Determinism: dot products fold left-to-right (`aggregate` starts at
  * 0.0, so the grouping is ((p₁+p₂)+p₃)… — the same association DuckDB's
  * `list_reduce` produces), which makes cosine scores bit-identical
  * cross-engine for identical float inputs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ with left-to-right association. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> ($a)[i] * ($b)[i]), (x, y) -> x + y)"

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def normSql(a: String): String =
    s"sqrt(list_reduce(list_transform($a, v -> v * v), (x, y) -> x + y))"

  /** cosine(a, b) = dot/(‖a‖·‖b‖) — identical expression shape in SQL. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Fast path: the fused codegen'd [[graft.expressions.CosineSim]]
    * when the session loaded [[graft.GraftExtensions]]; otherwise the
    * composed form above. Both use the same left-to-right accumulation,
    * so results are bit-identical (asserted in SimilaritySpec) — a
    * session without the extension is merely slower, never wrong. */
  def cosineIn(spark: SparkSession, a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_cosine")) call_function("graft_cosine", a, b)
    else cosine(a, b)

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / ((${normSql(a)}) * (${normSql(b)}))"

  /** Σ(aᵢ−bᵢ)² over two `array<long>` columns — the Lloyd-assignment
    * distance. Exact long arithmetic: any accumulation order is
    * bit-identical, so composed and fused forms agree by exactness. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Fast path: the fused codegen'd [[graft.expressions.SqDistLong]]
    * when the session loaded [[graft.GraftExtensions]]; otherwise the
    * composed form above — same contract as [[cosineIn]]. */
  def sqDistIn(spark: SparkSession, a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_sqdist")) call_function("graft_sqdist", a, b)
    else sqDist(a, b)

  /** argmin-by-(distance, cid) over a packed centroid table
    * `array<struct<cid long, carr array<long>>>`: the winning cid
    * (null when the pack is empty) — min (d, cid) with the struct
    * field order as the lexicographic tie-break, exactly what the
    * Lloyd trainers' former ROW_NUMBER() OVER (ORDER BY d, cid)
    * picked. Fused single-loop kernel
    * ([[graft.expressions.ArgminCell]]) when the extension is loaded;
    * composed HOF argmin otherwise — bit-identical either way. */
  def argminCid(spark: SparkSession, uq: Column, cents: Column): Column =
    if (spark.catalog.functionExists("graft_argmin_cell"))
      call_function("graft_argmin_cell", uq, cents)
    else
      array_min(transform(cents, ct =>
        struct(
          sqDistIn(spark, uq, ct.getField("carr")).as("d"),
          ct.getField("cid").as("cid")))).getField("cid")
}
