package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-metadata ledger + CDC (SURVEY.md §2.4 J1, §3.2).
  *
  * The reference keeps its only durable state in `files_df.csv`
  * (/root/reference/data_ingestion.py:58,69) and detects changes with a
  * per-file nested loop (`find_new_and_updated_files`
  * /root/reference/llmcore/cms/sharepointutils.py:169-186): a file is
  * NEW when its name is absent from the state, UPDATED when present but
  * the current timestamp is strictly newer.
  *
  * Here the ledger is a parquet table and change detection is one
  * left-outer join — O(n) with a broadcast when the state is small, a
  * shuffled hash join otherwise; at 100 TB of listings both sides
  * partition by `name` and nothing touches the driver.
  */
object Ledger {

  /** Rows of `current` that are new or strictly newer than `state`.
    * Both frames need (name, last_modified); all other current columns
    * pass through, plus `change_type` ∈ {new, updated}. */
  def newAndUpdated(current: DataFrame, state: DataFrame): DataFrame = {
    val st = state.select(col("name").as("_st_name"),
      col("last_modified").as("_st_last_modified"))
    current.join(st, current("name") === col("_st_name"), "left_outer")
      .filter(col("_st_name").isNull ||
        current("last_modified") > col("_st_last_modified"))
      .withColumn("change_type",
        when(col("_st_name").isNull, "new").otherwise("updated"))
      .drop("_st_name", "_st_last_modified")
  }

  /** Overwrite the ledger with the post-run listing (REF re-lists after
    * download, data_ingestion.py:60,69 — state reflects downloaded truth). */
  def write(listing: DataFrame, path: String): Unit =
    listing.write.mode(SaveMode.Overwrite).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S12 predicate delete re-expressed as an anti-join rewrite: keep
    * store rows whose key is NOT in `keys`. */
  def deleteByKey(store: DataFrame, keys: DataFrame, keyCol: String): DataFrame =
    store.join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
}
