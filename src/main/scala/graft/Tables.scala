package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

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
    // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 cannot read as a
    // timestamp; sessions set spark.sql.legacy.parquet.nanosAsLong=true and
    // we rebuild the µs timestamp here (ns div 1000 — integer division, the
    // generated values are exact µs multiples so this is lossless).
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
