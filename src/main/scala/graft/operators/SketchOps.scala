package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch over string keys — the FREQUENCY member of the
  * bounded-memory sketch triad this engine persists beside partitions
  * (membership = [[BloomOps]], distinct = the Datasketches HLL in
  * `q_sketch_union`, frequency = this). `depth × width` long counters
  * answer "how often did key k occur" for ANY key after one mergeable
  * pass, with one-sided error: the estimate never undercounts, and
  * overcounts only by colliding keys' mass (≤ εN w.h.p. at width 2/ε).
  * `approx_top_k` (q_heavy_hitters) answers "which keys are big" —
  * CMS answers point queries about keys chosen AFTER the scan, which a
  * top-k sketch cannot.
  *
  * Row-i position of a key reuses the Kirsch–Mitzenmacher double hash
  * of [[BloomOps]] over the two 60-bit md5 halves:
  * posᵢ = (h1 + i·h2) mod width — exact-integer, so a DuckDB oracle
  * rebuilds the ENTIRE sketch relationally (cell = (i, pos) group,
  * estimate = MIN over rows) and cross-validates the packed-counter
  * implementation bit-for-bit, collisions included.
  *
  * Scale: the aggregation is one map-side-combined pass producing a
  * `depth·width`-long array per partition, merged by elementwise add
  * (associative/commutative — partitioning never changes the result);
  * the finished sketch is a bounded literal (KBs) broadcast into a
  * narrow per-row estimate expression. Nothing corpus-sized moves.
  */
object SketchOps {

  /** i ≤ 8 keeps h1 + i·h2 under 2⁶³ (both halves < 2⁶⁰). */
  private def requireDepthBound(depth: Int): Unit =
    require(depth >= 1 && depth <= 8,
      s"depth must be in [1, 8] (60-bit double-hash overflow bound), got $depth")

  /** Mergeable one-pass CMS builder. Input rows are md5-hex strings
    * (hash upstream in Catalyst: `md5(key)`), buffer is the flattened
    * depth×width counter matrix. */
  final class CmsAggregator(width: Int, depth: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    requireDepthBound(depth)
    require(width >= 1)
    def zero: Array[Long] = new Array[Long](width * depth)
    def reduce(buf: Array[Long], mh: String): Array[Long] = {
      val a = java.lang.Long.parseLong(mh.substring(0, 15), 16)
      val b = java.lang.Long.parseLong(mh.substring(16, 31), 16)
      var i = 0
      while (i < depth) {
        buf(i * width + ((a + i.toLong * b) % width).toInt) += 1L
        i += 1
      }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Pure-Catalyst point estimate against a built sketch: min over the
    * depth rows of the counter at this key's position. The sketch rides
    * along as an array literal — bounded by (width, depth), never by
    * the data. Arithmetic is identical to [[CmsAggregator.reduce]] and
    * to the SQL mirror below. */
  def estimate(counts: Seq[Long], width: Int, depth: Int)(mh: Column): Column = {
    requireDepthBound(depth)
    array_min(transform(sequence(lit(0), lit(depth - 1)), i => {
      val pos = (BloomOps.hexSliceCol(mh, 1, 15) +
        i.cast("long") * BloomOps.hexSliceCol(mh, 17, 15)) % width
      element_at(typedLit(counts), (i * width + pos).cast("int") + 1)
    }))
  }

  /** DuckDB fragment for row `iExpr`'s position of md5-hex expression
    * `e` — the oracle builds cells with it and MINs over rows. */
  def positionSql(e: String, width: Int, iExpr: String): String =
    s"((${BloomOps.hexSliceSql(e, 1, 15)} + $iExpr * ${BloomOps.hexSliceSql(e, 17, 15)}) % $width)"
}
