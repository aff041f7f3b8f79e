package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.IcebergTransforms

/** The Iceberg spec pins its 32-bit hash (murmur3_x86_32, seed 0) and
  * publishes reference vectors (spec, "Appendix B: 32-Bit Hash
  * Requirements") precisely so independent implementations can prove
  * they bucket identically — every engine must route the same key to
  * the same bucket or cross-engine reads break. These tests pin this
  * implementation to those published vectors. */
class IcebergTransformSpec extends AnyFunSuite {

  test("murmur3 hash matches the spec's published vectors") {
    // hashInt(34) == hashLong(34): int promotion must not move buckets
    assert(IcebergTransforms.hashLong(34L) == 2017239379)
    // string "iceberg"
    assert(IcebergTransforms.murmur3("iceberg".getBytes("UTF-8")) == 1210000089)
    // date 2017-11-16 = 17486 epoch days, hashes as its long value
    assert(java.time.LocalDate.of(2017, 11, 16).toEpochDay == 17486L)
    assert(IcebergTransforms.hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 UTC in micros
    val us = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(IcebergTransforms.hashLong(us) == -2047944441)
  }

  test("bucket values are non-negative and stable under int->long promotion") {
    (0 until 1000).foreach { i =>
      val b = IcebergTransforms.bucketLong(i.toLong - 500, 16)
      assert(b >= 0 && b < 16)
    }
    assert(IcebergTransforms.bucketLong(34L, 16) ==
      ((2017239379 & Int.MaxValue) % 16))
    assert(IcebergTransforms.bucketUtf8(UTF8String.fromString("iceberg"), 16) ==
      ((1210000089 & Int.MaxValue) % 16))
  }

  test("truncate floors toward negative infinity; strings cut by codepoint") {
    assert(IcebergTransforms.truncateInt(1, 10) == 0)
    assert(IcebergTransforms.truncateInt(-1, 10) == -10)
    assert(IcebergTransforms.truncateLong(-1L, 10L) == -10L)
    assert(IcebergTransforms.truncateLong(2047L, 100L) == 2000L)
    assert(IcebergTransforms.truncateUtf8(
      UTF8String.fromString("iceberg"), 3).toString == "ice")
    // a 4-byte supplementary codepoint counts as ONE unit
    val s = "a😀b" // a, U+1F600, b
    assert(IcebergTransforms.truncateUtf8(
      UTF8String.fromString(s), 2).toString == "a😀")
  }

  test("epoch units match java.time over a seeded sweep, negatives included") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val days = rnd.nextInt(40000) - 10000 // 1942..2079
      val d = java.time.LocalDate.ofEpochDay(days.toLong)
      assert(IcebergTransforms.yearsOfEpochDays(days) == d.getYear - 1970)
      assert(IcebergTransforms.monthsOfEpochDays(days) ==
        (d.getYear - 1970) * 12 + d.getMonthValue - 1)
      val us = days.toLong * 86400000000L + rnd.nextLong(86400000000L)
      assert(IcebergTransforms.epochDaysOfMicros(us) == days)
      assert(IcebergTransforms.epochHoursOfMicros(us) ==
        Math.floorDiv(us, 3600000000L).toInt)
    }
  }
}
