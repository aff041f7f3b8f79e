package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over string keys: the bounded-memory
  * membership sketch a 100 TB incremental pipeline uses to pre-screen
  * an ingest batch against corpus history WITHOUT joining the corpus —
  * the filter is `numBits/8` bytes no matter how many keys went in,
  * builds in one pass as a mergeable typed [[Aggregator]] (per-partition
  * bit arrays OR-merged — order-free, so partitioning never changes the
  * result), and broadcasts to executors as a literal. One-sided error:
  * no false negatives ever; false-positive rate set by (bits, hashes,
  * keys). Candidates it admits still hit an exact verifier — the same
  * screen-then-verify contract as the MinHash band join
  * ([[graft.streaming.IncrementalDedup]]), but O(1) state instead of a
  * history-sized index.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over the two 60-bit
  * halves of the key's md5 hex (nibbles 1-15 and 17-31):
  * posᵢ = (h1 + i·h2) mod numBits. Exact-integer and expressible in
  * BOTH engines — [[positionsSql]] mirrors it nibble-by-nibble in
  * DuckDB, so `q_bloom_screen` cross-validates the packed-bit
  * implementation against a relational reformulation (a membership test
  * against the DISTINCT set-bit positions of history).
  */
object BloomOps {

  /** 1-based hex substring [start, start+len) of an md5-hex column as
    * an exact long (len ≤ 15 keeps it under 2⁶⁰). */
  private def hexSlice(mh: Column, start: Int, len: Int): Column =
    conv(substring(mh, start, len), 16, 10).cast("long")

  /** Public face of [[hexSlice]] for the sibling sketches
    * ([[SketchOps]] reuses the same double-hash arithmetic). */
  def hexSliceCol(mh: Column, start: Int, len: Int): Column =
    hexSlice(mh, start, len)

  /** DuckDB mirror of [[hexSlice]]: no `conv`, so nibbles accumulate
    * with ascii arithmetic (the [[SearchOps.hashBucketSql]] trick,
    * widened to an arbitrary slice). */
  def hexSliceSql(e: String, start: Int, len: Int): String = {
    def nib(i: Int) = {
      val h = s"substr($e, $i, 1)"
      s"(ascii($h) - CASE WHEN ascii($h) >= 97 THEN 87 ELSE 48 END)"
    }
    (0 until len)
      .map(j => s"CAST(${nib(start + j)} AS BIGINT) * ${1L << (4 * (len - 1 - j))}")
      .mkString("(", " + ", ")")
  }

  /** h1 + i·h2 stays under 2⁶³ only while i ≤ 8 (both halves are < 2⁶⁰);
    * beyond that the position wraps negative and indexes off the array. */
  private def requireHashBound(numHashes: Int): Unit =
    require(numHashes >= 1 && numHashes <= 8,
      s"numHashes must be in [1, 8] (60-bit double-hash overflow bound), got $numHashes")

  /** The `numHashes` bit positions of one md5-hex key. */
  def positions(mh: Column, numBits: Int, numHashes: Int): Column = {
    requireHashBound(numHashes)
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      (hexSlice(mh, 1, 15) + i.cast("long") * hexSlice(mh, 17, 15)) % numBits)
  }

  /** SQL fragment for position i of md5-hex expression `e` (the oracle
    * expands the i-range itself). */
  def positionSql(e: String, numBits: Int, iExpr: String): String =
    s"((${hexSliceSql(e, 1, 15)} + $iExpr * ${hexSliceSql(e, 17, 15)}) % $numBits)"

  /** Membership probe of a DRIVER-SIDE key against a stored bit-array
    * column (the packed output of [[BloomAggregator]]): all hash
    * positions set. The positions are constants folded from the key's
    * md5 with exactly [[BloomAggregator.reduce]]'s arithmetic — the
    * single source of the write/probe symmetry that file-skipping's
    * no-false-negative guarantee rests on (ZoneMaps point reads, the
    * TimeTravel bloom sidecars). */
  def admission(bloomArr: Column, key: String, numBits: Int,
      numHashes: Int): Column = {
    requireHashBound(numHashes)
    val mh = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val a = java.lang.Long.parseLong(mh.substring(0, 15), 16)
    val b = java.lang.Long.parseLong(mh.substring(16, 31), 16)
    (0 until numHashes).map { i =>
      val p = ((a + i.toLong * b) % numBits).toInt
      call_function("shiftright", element_at(bloomArr, p / 64 + 1), lit(p % 64))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Driver-side sibling of [[admission]] for collected manifests
    * (same arithmetic, no Spark expression): does the packed bit
    * array possibly contain `key`? */
  def admits(bits: Seq[Long], key: String, numBits: Int,
      numHashes: Int): Boolean = {
    requireHashBound(numHashes)
    val mh = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val a = java.lang.Long.parseLong(mh.substring(0, 15), 16)
    val b = java.lang.Long.parseLong(mh.substring(16, 31), 16)
    (0 until numHashes).forall { i =>
      val p = ((a + i.toLong * b) % numBits).toInt
      ((bits(p >> 6) >> (p & 63)) & 1L) == 1L
    }
  }

  /** Mergeable one-pass builder. Input rows are md5-hex strings (hash
    * upstream in Catalyst: `md5(key)` — keeps the JVM side a pure bit
    * setter identical to [[positions]]'s arithmetic). */
  final class BloomAggregator(numBits: Int, numHashes: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(numBits % 64 == 0, "numBits must pack into whole longs")
    requireHashBound(numHashes)
    def zero: Array[Long] = new Array[Long](numBits / 64)
    def reduce(buf: Array[Long], mh: String): Array[Long] = {
      val a = java.lang.Long.parseLong(mh.substring(0, 15), 16)
      val b = java.lang.Long.parseLong(mh.substring(16, 31), 16)
      var i = 0
      while (i < numHashes) {
        val p = ((a + i.toLong * b) % numBits).toInt
        buf(p >> 6) |= 1L << (p & 63)
        i += 1
      }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Pure-Catalyst membership test against a built filter: every
    * position's bit is set. The filter rides along as an array literal
    * (numBits/8 bytes — broadcast-bounded by construction). */
  def mightContain(bits: Seq[Long], numBits: Int, numHashes: Int)(mh: Column): Column =
    forall(positions(mh, numBits, numHashes), p => {
      val word = element_at(typedLit(bits), floor(p / 64).cast("int") + 1)
      call_function("shiftright", word, (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    })
}
