package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding surface (SURVEY.md §2.3 F12).
  *
  * The reference embeds one chunk per synchronous HTTP call
  * (/root/reference/llmcore/cms/sharepointutils.py:377-378 →
  * cmfunctions.py:62-71) — its #1 scale bug. This engine splits the
  * surface in two:
  *
  *   - [[deterministicEmbed]]: an offline, reproducible hash-projection
  *     embedder used by every test/oracle path. Component j is derived
  *     from md5(text ‖ ':' ‖ j): the first 4 hex chars as an integer,
  *     mapped to [-1, 1). All values are dyadic rationals (k/32768 − 1),
  *     so sums/products/norms are EXACT in IEEE doubles and hash
  *     identically in Spark and DuckDB. Pure Catalyst — no UDF.
  *
  *   - [[graft.pipeline.BatchedEmbedder]]: the production-shaped
  *     mapPartitions operator that batches rows per partition before
  *     calling a pluggable backend (deterministic here; an HTTP client
  *     with retry/backoff in production), amortizing per-call overhead
  *     the way the reference never did.
  */
object Embedders {

  val DefaultDim = 64 // matches embeddings.parquet

  /** Un-normalized deterministic embedding, ArrayType(DoubleType). */
  def deterministicEmbed(c: Column, dim: Int = DefaultDim): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      conv(substring(md5(concat(c, lit(":"), j.cast("string"))), 1, 4), 16, 10)
        .cast("double") / 32768.0d - 1.0d)

  /** Fast path: the fused [[graft.expressions.DeterministicEmbed]]
    * (hash the text once, clone the MD5 state per component) when the
    * session loaded [[graft.GraftExtensions]]; bit-identical to the
    * composed form either way. */
  def deterministicEmbedIn(spark: SparkSession, c: Column, dim: Int = DefaultDim): Column =
    if (spark.catalog.functionExists("graft_embed")) call_function("graft_embed", c, lit(dim))
    else deterministicEmbed(c, dim)

  /** DuckDB mirror: hex nibbles parsed via ascii() arithmetic (DuckDB has
    * no conv(); subqueries are not allowed in lambdas, so the md5 is
    * inlined per nibble); identical dyadic values. */
  def deterministicEmbedSql(e: String, dim: Int = DefaultDim): String = {
    def nib(k: Int) = {
      val h = s"substr(md5(($e) || ':' || CAST(j AS VARCHAR)), $k, 1)"
      s"(ascii($h) - CASE WHEN ascii($h) >= 97 THEN 87 ELSE 48 END)"
    }
    val hex4 = s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)})"
    s"list_transform(range(0, $dim), j -> CAST($hex4 AS DOUBLE) / 32768.0 - 1.0)"
  }

  /** L2-normalize a double array (norm computed by an in-order fold). */
  def l2Normalize(v: Column): Column = {
    val norm = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))
    transform(v, x => x / norm)
  }

  def l2NormSql(e: String): String =
    s"sqrt(list_reduce(list_transform($e, x -> x * x), (a, b) -> a + b))"
}
