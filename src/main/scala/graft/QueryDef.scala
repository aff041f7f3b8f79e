package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when the semantics are
  * ANSI-SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names/aliases MUST match between `run` and `oracle` —
  * the driver sorts columns by name before hashing values.
  *
  * Determinism contract (cross-engine hash equality):
  *   - double outputs are always `exact-integer / 10^k` or pure IEEE
  *     arithmetic over exact integers, never `round(double, k>0)`
  *     (Spark rounds via BigDecimal.valueOf's string repr; DuckDB rounds
  *     the binary value — they disagree near scale>0 boundaries, but
  *     agree at scale 0);
  *   - every top-k / limit query breaks ties on a unique key.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  /** No DuckDB-expressible oracle → driver records a rows-only check. */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
