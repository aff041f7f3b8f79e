package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-integer money/measure arithmetic shared by all queries.
  *
  * Doubles with k decimal digits (prices, discounts, event values) are
  * converted to exact BIGINT units via round(x * 10^k) BEFORE any
  * aggregation, so sums are order-independent integers and hash-compare
  * identically between Spark and the DuckDB oracle. Scale-0 rounding of
  * a double is engine-agreement-safe (see QueryDef).
  */
object Exact {
  /** round(c * 10^scale) as BIGINT — exact units. */
  def units(c: Column, scale: Int): Column =
    round(c * pow10(scale)).cast("long")

  /** Mirror in DuckDB SQL of [[units]]. */
  def unitsSql(expr: String, scale: Int): String =
    s"CAST(ROUND(($expr) * ${pow10(scale).formatted("%.1f")}) AS BIGINT)"

  /** exact integer units back to double by IEEE division (bit-identical
    * in both engines for identical integer inputs). */
  def toDouble(c: Column, scale: Int): Column =
    c.cast("double") / lit(pow10(scale))

  def toDoubleSql(expr: String, scale: Int): String =
    s"CAST(($expr) AS DOUBLE) / ${pow10(scale).formatted("%.1f")}"

  private def pow10(scale: Int): Double = math.pow(10.0, scale.toDouble)
}
