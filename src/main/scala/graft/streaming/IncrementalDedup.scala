package graft.streaming

import graft.functions.{TextFunctions => TF}
import graft.operators.DedupOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming face of the incremental dedup screen: the batch query
  * `q_dedup_incremental` (DedupQueries) decides novelty for one ingest
  * batch; here the reference's CDC re-ingest loop (/root/reference/
  * llmcore/cms/data_ingestion.py:56-69 — list → diff → re-ingest →
  * overwrite state) becomes a stream where EACH MICRO-BATCH is one
  * ingest batch, screened against the historical corpus index, with
  * only novel documents flowing into the vector store.
  *
  * The screen itself runs as a bounded batch job inside `foreachBatch`
  * rather than as stateful streaming operators, deliberately: novelty
  * needs a per-document verdict over an anti-join against a
  * corpus-sized index, and holding that index in the state store would
  * re-materialize the whole corpus per executor. As a foreachBatch
  * batch job it is two equi-joins (content hash, MinHash band) that
  * shuffle batch+index linearly — the q_dedup_incremental scale shape —
  * while the stream gets checkpointed exactly-once batch boundaries and
  * the key-based store upsert absorbs at-least-once replays
  * (StreamingSpec asserts both ≡ the batch screen and replay
  * idempotence).
  *
  * History refresh is the CALLER's loop, as in the reference: novel
  * rows land in the store, and the next run's history index is read
  * from the store — this module screens against the index it is handed,
  * so within one run two near-dup docs that are BOTH novel vs history
  * both pass (the same verdict the batch screen gives them).
  */
object IncrementalDedup {

  private def contentHash(text: Column): Column = sha2(TF.cleanText(text), 256)

  /** Adds exploded band keys for `text`, materializing shingles and
    * signature as real columns so each is computed once per row (see
    * [[DedupOps.minhashSignature]]'s materialization note). */
  private def withBands(df: DataFrame, text: Column): DataFrame =
    df.withColumn("_shw", DedupOps.cleanWords(text))
      .withColumn("_sh", DedupOps.shinglesFromWords(col("_shw")))
      .withColumn("_sig", DedupOps.minhashSignature(col("_sh"), 8))
      .withColumn("band", explode(DedupOps.lshBands(col("_sig"), 4, 2)))
      .drop("_shw", "_sh", "_sig")

  /** Second stage shared by both screens: drop survivors that share a
    * MinHash band with history. */
  private def bandScreen(exactNovel: DataFrame, history: DataFrame,
      idCol: String): DataFrame = {
    val histBands = withBands(history, col("text")).select("band").distinct()
    val nearHitIds = withBands(exactNovel, col("text"))
      .select(col(idCol), col("band"))
      .join(histBands, Seq("band"), "left_semi")
      .select(idCol).distinct()
    exactNovel.join(nearHitIds, Seq(idCol), "left_anti")
  }

  /** Screen one bounded batch of `(idCol, text, …)` rows against the
    * historical corpus: keep exactly the rows with NO exact content-hash
    * match and NO shared MinHash band in `history` — the novel=1 set of
    * `q_dedup_incremental`. Both screens are unhinted equi-joins (both
    * sides grow with the corpus). Output keeps the incoming schema. */
  def screenBatch(incoming: DataFrame, history: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val histHashes = history.select(contentHash(col("text")).as("ch")).distinct()
    val exactNovel = incoming
      .withColumn("ch", contentHash(col("text")))
      .join(histHashes, Seq("ch"), "left_anti")
      .drop("ch")
    bandScreen(exactNovel, history, idCol)
  }

  /** Sketch-accelerated exact stage: a [[graft.operators.BloomOps]]
    * filter over history's content hashes splits the batch into
    * definite-misses (no false negatives → provably hash-novel, no join
    * needed) and candidates that still go through the exact anti-join.
    * The RESULT is identical to [[screenBatch]] (asserted in
    * StreamingSpec); the WORK changes — at 100 TB the exact join probes
    * only the candidate sliver while the filter is numBits/8 bytes of
    * state, built in one mergeable pass. The band stage is unchanged
    * (band screening is not single-key membership). */
  def screenBatchBloom(incoming: DataFrame, history: DataFrame,
      idCol: String = "doc_id", numBits: Int = 1 << 17,
      numHashes: Int = 4): DataFrame = {
    import graft.operators.BloomOps
    val bloom = udaf(new BloomOps.BloomAggregator(numBits, numHashes))
    val bits = history.agg(bloom(contentHash(col("text"))).as("b"))
      .head.getSeq[Long](0)
    val hashed = incoming.withColumn("ch", contentHash(col("text")))
    val hit = BloomOps.mightContain(bits, numBits, numHashes)(col("ch"))
    val histHashes = history.select(contentHash(col("text")).as("ch")).distinct()
    val exactNovel = hashed.filter(!hit)
      .unionByName(hashed.filter(hit).join(histHashes, Seq("ch"), "left_anti"))
      .drop("ch")
    bandScreen(exactNovel, history, idCol)
  }

  /** IMAGE-stream novelty screen — the perceptual-hash analogue of
    * [[screenBatch]] for binary media: incoming images are dHashed
    * through the real decode kernel (corrupt bytes fall back to the
    * deterministic FNV byte hash, so they screen exactly among
    * themselves) and kept only when the hash is absent from the
    * historical hash set. Exact-hash screening by design: history is a
    * bounded one-long-per-image index (not the images), the anti-join
    * shuffles both sides by hash, and near-pair discovery
    * (`q_multimodal_phash_pairs`) stays a batch maintenance job —
    * per-ingest screening wants the O(1)-state verdict. Output keeps
    * the incoming schema plus the kernel columns (`phash`, `decoded`,
    * dims) so the caller can store the index row without re-decoding. */
  def screenImagesBatch(incoming: DataFrame, historyHashes: DataFrame,
      binCol: String = "bytes"): DataFrame =
    graft.operators.MultimodalOps.perceptualHash(incoming, binCol)
      .join(historyHashes.select(col("phash")).distinct(), Seq("phash"), "left_anti")

  /** Drive the image screen as a stream: per micro-batch, screen
    * against the history hash index and upsert novel rows into the
    * store keyed on the hash — at-least-once replays collapse on the
    * key exactly as in [[screenAndUpsertStream]]. */
  def screenImagesAndUpsertStream(incoming: DataFrame, historyHashes: DataFrame,
      storePath: String, checkpoint: String, binCol: String = "bytes"): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // within-batch dedup BEFORE the upsert: several images in one
        // micro-batch can share a hash (that is the point of the
        // screen), and the store's key invariant is one row per
        // chunk_id — keep one representative per hash
        val novel = screenImagesBatch(batch, historyHashes, binCol)
          .withColumn(graft.sources.VectorStore.KeyCol,
            format_string("%016x", col("phash")))
          .dropDuplicates(graft.sources.VectorStore.KeyCol)
        graft.sources.VectorStore.upsert(batch.sparkSession, storePath, novel)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drive the screen as a stream: per micro-batch, screen against
    * `history` and upsert the novel rows (keyed on `chunk_id`, see
    * [[graft.sources.VectorStore.KeyCol]]) into the store. AvailableNow
    * drains the backlog and stops — the scheduled-ingest shape. */
  def screenAndUpsertStream(incoming: DataFrame, history: DataFrame,
      storePath: String, checkpoint: String, idCol: String = "doc_id"): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val novel = screenBatch(batch, history, idCol)
        graft.sources.VectorStore.upsert(batch.sparkSession, storePath, novel)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
