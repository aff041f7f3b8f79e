package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink surface (SURVEY.md §2.1 S4/S9).
  *
  * The reference reads its KB-article extract as latin1 CSV
  * (`pd.read_csv(path, encoding="latin1")`
  * /root/reference/llmcore/cms/cmfunctions.py:360) and persists its only
  * durable state as a CSV snapshot (`files_df.to_csv`
  * /root/reference/data_ingestion.py:69, re-read at :58).
  *
  * Spark-native equivalents: the DataSource CSV reader/writer with an
  * explicit charset and an EXPLICIT schema (schema inference would scan
  * the data twice and guess types — at 100 TB the schema is a contract,
  * not a discovery). Header on, quoting handled by the writer.
  */
object CsvIo {

  val Latin1 = "ISO-8859-1"

  /** S4: latin1 CSV scan with a declared schema.
    *
    * `multiLine = false` (the default) keeps the scan SPLITTABLE — each
    * 128 MB file split parses independently, which is what a 100 TB CSV
    * scan needs — but cannot parse quoted fields containing embedded
    * newlines (each physical line is taken as a record). Pass
    * `multiLine = true` when the data may carry embedded newlines
    * (RFC 4180 quoting): each FILE then parses as a unit, trading
    * split-parallelism for full quoting fidelity — the right trade for
    * snapshot/state files, the wrong one for bulk scans. */
  def readLatin1(spark: SparkSession, path: String, schemaDdl: String,
      multiLine: Boolean = false): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", Latin1)
      .option("multiLine", multiLine.toString)
      .schema(StructType.fromDDL(schemaDdl))
      .csv(path)

  /** S9: latin1 CSV snapshot sink (full overwrite, like the reference's
    * state file). The writer's whitespace trimming is OFF — Spark's CSV
    * writer silently strips leading/trailing whitespace by default,
    * which breaks write→read value identity. */
  def writeLatin1(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("encoding", Latin1)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
}
