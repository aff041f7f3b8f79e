package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Apache Iceberg PARTITION TRANSFORMS, computed exactly as the
  * public table-spec defines them (spec "Partition Transforms" +
  * "Appendix B: 32-bit Hash Requirements"):
  *
  *   - `bucket[N](v)` = `(murmur3_x86_32(bytes(v)) & Int.MaxValue) % N`
  *     where int/long/date/timestamp hash their LONG value as 8
  *     little-endian bytes and strings hash their UTF-8 bytes — the
  *     hash is pinned by the spec so every engine buckets identically
  *     (the appendix's published test vectors pin this implementation
  *     in IcebergTransformSpec);
  *   - `truncate[W](v)` = `v - (((v % W) + W) % W)` for integers
  *     (floor-to-width, exact for negatives), first `W` CODEPOINTS for
  *     strings;
  *   - `year/month/day/hour` = whole units elapsed since the epoch
  *     (1970-01-01 00:00:00), as INT.
  *
  * These exist as native codegen'd expressions (not UDFs) because the
  * write path evaluates them once per row when staging a
  * transform-partitioned export or foreign append, and because users
  * need the same column face to PRE-PARTITION data so each written
  * file is transform-pure. */
object IcebergTransforms {

  /** murmur3_x86_32 with seed 0 — the spec's pinned hash function
    * (public algorithm; Appendix B). */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val n = data.length
    var i = 0
    while (i + 4 <= n) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (n & 3) match {
      case 3 =>
        k ^= (data(i + 2) & 0xff) << 16
        k ^= (data(i + 1) & 0xff) << 8
        k ^= data(i) & 0xff
      case 2 =>
        k ^= (data(i + 1) & 0xff) << 8
        k ^= data(i) & 0xff
      case 1 =>
        k ^= data(i) & 0xff
      case _ =>
    }
    if ((n & 3) != 0) {
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
    }
    h ^= n
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  /** int/long/date/timestamp all hash as the 8-byte LITTLE-ENDIAN long
    * (the spec's `hashLong`; `hashInt(v) = hashLong(v)` so bucketing
    * survives int→long type promotion). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  def bucketLong(v: Long, n: Int): Int =
    ((hashLong(v) & Int.MaxValue) % n)

  def bucketUtf8(v: UTF8String, n: Int): Int =
    ((murmur3(v.getBytes) & Int.MaxValue) % n)

  def truncateLong(v: Long, w: Long): Long = v - (((v % w) + w) % w)

  def truncateInt(v: Int, w: Int): Int = v - (((v % w) + w) % w)

  def truncateUtf8(v: UTF8String, w: Int): UTF8String =
    v.substring(0, w)

  /** Whole units since the epoch, from a value already normalized to
    * MICROSECONDS (timestamps) or DAYS (dates). */
  def epochDaysOfMicros(us: Long): Int = Math.floorDiv(us, 86400000000L).toInt

  def epochHoursOfMicros(us: Long): Int = Math.floorDiv(us, 3600000000L).toInt

  def monthsOfEpochDays(days: Int): Int = {
    val d = java.time.LocalDate.ofEpochDay(days.toLong)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  def yearsOfEpochDays(days: Int): Int =
    java.time.LocalDate.ofEpochDay(days.toLong).getYear - 1970

  def monthsOfMicros(us: Long): Int = monthsOfEpochDays(epochDaysOfMicros(us))

  def yearsOfMicros(us: Long): Int = yearsOfEpochDays(epochDaysOfMicros(us))
}

/** `bucket[N](child)` as a codegen'd scalar: INT result in `[0, N)`.
  * Accepts int/long/date (hash their long value), timestamp /
  * timestamp_ntz (micros), and string (UTF-8 bytes). */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"bucket width must be positive, got $n")

  override def dataType: DataType = IntegerType

  override def prettyName: String = s"iceberg_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType |
          TimestampNTZType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket covers int/long/date/timestamp/string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType =>
      IcebergTransforms.bucketLong(input.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      IcebergTransforms.bucketLong(input.asInstanceOf[Long], n)
    case StringType =>
      IcebergTransforms.bucketUtf8(input.asInstanceOf[UTF8String], n)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = "graft.expressions.IcebergTransforms"
    child.dataType match {
      case IntegerType | DateType =>
        defineCodeGen(ctx, ev, c => s"$kernel.bucketLong((long) $c, $n)")
      case LongType | TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev, c => s"$kernel.bucketLong($c, $n)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$kernel.bucketUtf8($c, $n)")
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `year/month/day/hour(child)` — whole units since the epoch as INT,
  * computed in UTC exactly as the write path derives them from footer
  * statistics (session-timezone-independent, unlike composing Spark's
  * `year()`/`to_date()` over a timestamp). `hour` rejects dates. */
case class IcebergEpochUnits(child: Expression, unit: String)
    extends UnaryExpression {
  require(Set("year", "month", "day", "hour").contains(unit),
    s"unknown epoch unit $unit")

  override def dataType: DataType = IntegerType

  override def prettyName: String = s"iceberg_$unit"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DateType if unit != "hour" =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case TimestampType | TimestampNTZType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_$unit covers ${if (unit == "hour") "timestamps"
          else "date/timestamp"}, got $other")
    }

  private def ofDays(days: Int): Int = unit match {
    case "year" => IcebergTransforms.yearsOfEpochDays(days)
    case "month" => IcebergTransforms.monthsOfEpochDays(days)
    case _ => days
  }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case DateType => ofDays(input.asInstanceOf[Int])
    case _ =>
      val us = input.asInstanceOf[Long]
      if (unit == "hour") IcebergTransforms.epochHoursOfMicros(us)
      else ofDays(IcebergTransforms.epochDaysOfMicros(us))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = "graft.expressions.IcebergTransforms"
    child.dataType match {
      case DateType => unit match {
        case "year" => defineCodeGen(ctx, ev, c => s"$kernel.yearsOfEpochDays($c)")
        case "month" => defineCodeGen(ctx, ev, c => s"$kernel.monthsOfEpochDays($c)")
        case _ => defineCodeGen(ctx, ev, c => c)
      }
      case _ => unit match {
        case "year" => defineCodeGen(ctx, ev, c => s"$kernel.yearsOfMicros($c)")
        case "month" => defineCodeGen(ctx, ev, c => s"$kernel.monthsOfMicros($c)")
        case "day" => defineCodeGen(ctx, ev, c => s"$kernel.epochDaysOfMicros($c)")
        case _ => defineCodeGen(ctx, ev, c => s"$kernel.epochHoursOfMicros($c)")
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `truncate[W](child)`: floor-to-width for int/long (result keeps the
  * input type), first-W-codepoints prefix for strings. */
case class IcebergTruncate(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"truncate width must be positive, got $w")

  override def dataType: DataType = child.dataType

  override def prettyName: String = "iceberg_truncate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_truncate covers int/long/string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType =>
      IcebergTransforms.truncateInt(input.asInstanceOf[Int], w)
    case LongType =>
      IcebergTransforms.truncateLong(input.asInstanceOf[Long], w.toLong)
    case StringType =>
      IcebergTransforms.truncateUtf8(input.asInstanceOf[UTF8String], w)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = "graft.expressions.IcebergTransforms"
    child.dataType match {
      case IntegerType =>
        defineCodeGen(ctx, ev, c => s"$kernel.truncateInt($c, $w)")
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$kernel.truncateLong($c, ${w}L)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$kernel.truncateUtf8($c, $w)")
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
