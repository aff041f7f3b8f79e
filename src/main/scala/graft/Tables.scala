package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries receive an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * tables lazily; Catalyst pushes filters/projections into the parquet
  * scan, so at 100 TB the scan reads only the referenced columns and
  * row groups surviving predicate pushdown.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The generator has emitted events.ts under several parquet encodings
    // across rounds; normalize every one of them to a session-TZ TIMESTAMP
    // so downstream event-time queries (`unix_micros`, `window`, as-of)
    // always see the same type:
    //  - TIMESTAMP(NANOS): Spark 4 can't read it as a timestamp; sessions
    //    set spark.sql.legacy.parquet.nanosAsLong=true and we rebuild the
    //    µs timestamp (ns div 1000 — generated values are exact µs
    //    multiples, so lossless).
    //  - timestamp[us] with no UTC adjustment: Spark reads TIMESTAMP_NTZ;
    //    the session TZ is pinned UTC, so NTZ→LTZ is an identity on the
    //    underlying instants.
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
}
