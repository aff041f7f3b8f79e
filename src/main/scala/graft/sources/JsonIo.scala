package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink surface.
  *
  * JSONL is the interchange format of training-data pipelines (one JSON
  * object per line, splittable, append-friendly); the engine exposes it
  * with the same contract as [[CsvIo]]: an EXPLICIT schema on read —
  * schema inference would scan twice and guess types, and at 100 TB the
  * schema is a contract, not a discovery. The writer emits UTF-8 with
  * full JSON string escaping, so arbitrary document text (control
  * chars, quotes, non-ASCII) round-trips losslessly — q_jsonl_roundtrip
  * hash-checks that against the parquet source of truth.
  */
object JsonIo {

  /** JSONL scan with a declared schema. */
  def readLines(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read
      .schema(StructType.fromDDL(schemaDdl))
      .json(path)

  /** JSONL snapshot sink (full overwrite). `compression` is the codec
    * 100 TB archives actually apply at rest — `gzip` is the JSONL-
    * interchange default (one gzip stream per part file: the part
    * stays the parallelism unit, which is why shard-sized parts matter
    * more than splittability here); `None` writes plain text. The
    * reader needs no flag — Spark sniffs the `.gz` extension. */
  def writeLines(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    compression.foreach(c => w.option("compression", c))
    w.json(path)
  }
}
