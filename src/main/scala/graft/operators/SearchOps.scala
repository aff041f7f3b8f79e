package graft.operators

import graft.functions.{Chunkers, TextFunctions}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{size => asize, _}

/** Full-text search / fingerprinting primitives (EXT surface): winnowing
  * rolling-hash fingerprints, and the cross-engine hash-bucket helper the
  * sampling queries share.
  *
  * Winnowing follows the public algorithm (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003): hash every k-gram, slide a window of `w` consecutive
  * k-gram hashes, keep the minimum of each window; the distinct kept
  * hashes are the document's fingerprints. Guarantees: any shared run
  * of ≥ w+k-1 tokens between two documents shares ≥1 fingerprint.
  *
  * Cross-engine determinism: the k-gram "hash" is the md5 hex string
  * (lexicographic min — DuckDB `list_aggregate(.., 'min')` ≡ Spark
  * `array_min`), so no integer conversion is needed and the selected
  * fingerprints are bit-identical in both engines.
  *
  * Scale: everything here is per-row Catalyst (no shuffle); the
  * fingerprint → candidate join downstream shuffles on the fingerprint
  * key exactly like the MinHash band join in [[DedupOps]].
  */
object SearchOps {

  /** Ordered (NOT distinct — positions matter) md5 hashes of the
    * k-token grams over a MATERIALIZED word-array column (see
    * [[graft.operators.DedupOps.cleanWords]] for why the words must be
    * their own column: a lambda slicing an inline clean+split
    * re-evaluates it per gram). */
  def gramHashesFromWords(w: Column, k: Int = 3): Column =
    transform(
      sequence(lit(0), greatest(asize(w) - k, lit(0))),
      i => md5(array_join(slice(w, i + 1, lit(k)), " ")))

  /** One-expression convenience form (clean+split per gram — prefer
    * [[gramHashesFromWords]] on anything large). */
  def gramHashes(c: Column, k: Int = 3): Column =
    gramHashesFromWords(Chunkers.words(TextFunctions.cleanText(c)), k)

  def gramHashesSql(e: String, k: Int = 3): String = {
    val w = Chunkers.wordsSql(TextFunctions.cleanTextSql(e))
    s"""list_transform(
       |  range(0, GREATEST(len($w) - $k, 0) + 1),
       |  i -> md5(array_to_string(($w)[i + 1 : i + $k], ' ')))""".stripMargin
  }

  /** Window minima over the gram-hash sequence (winnowing selection). */
  def winnow(grams: Column, window: Int = 4): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(asize(grams) - window, lit(0))),
      j => array_min(slice(grams, j + 1, lit(window)))))

  def winnowSql(gramsE: String, window: Int = 4): String =
    s"""list_distinct(list_transform(
       |  range(0, GREATEST(len($gramsE) - $window, 0) + 1),
       |  j -> list_aggregate(($gramsE)[j + 1 : j + $window], 'min')))""".stripMargin

  /** Deterministic hash bucket in [0, mod): first 8 hex digits of
    * md5(expr) as an integer. Used for stratified sampling and split
    * assignment — stable across engines, partitions and reruns. */
  def hashBucket(c: Column, mod: Int): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % mod

  /** Bucket-granular quota selection — the scalable replacement for a
    * per-row rank when picking `quota` rows per group by hash order:
    * rows hash into `buckets` buckets per group, a per-group cumulative
    * bucket count picks the largest threshold bucket whose running
    * total stays within quota, and the keep rule is a plain
    * `bucket ≤ threshold` filter. The only window runs over the
    * BOUNDED (group × buckets) count table; every corpus-sized pass is
    * a narrow filter or partial-agg shuffle (PlanSpec-asserted via the
    * two quota queries). n_kept lands ≤ quota, within one bucket's rows
    * of it, deterministically on both engines.
    *
    * `quotas` is (groupCol, quota); joins against it stay UNHINTED —
    * whether the group table is broadcast-safe depends on whether the
    * group key grows with the corpus (languages: bounded; domains: NOT).
    * Output: per group (n_total, quota, n_kept, kept_sum). */
  def bucketQuota(rows: org.apache.spark.sql.DataFrame, groupCol: String,
      idCol: String, quotas: org.apache.spark.sql.DataFrame,
      buckets: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = rows.select(col(groupCol), col(idCol),
      hashBucket(col(idCol).cast("string"), buckets).as("bucket"))
    val bc = b.groupBy(groupCol, "bucket").agg(count(lit(1)).as("nb"))
    val cum = bc.withColumn("cum",
      sum("nb").over(Window.partitionBy(groupCol).orderBy("bucket")))
    val thr = cum.join(quotas, Seq(groupCol))
      .groupBy(groupCol)
      .agg(max(when(col("cum") <= col("quota"), col("bucket")).otherwise(lit(-1L))).as("tbkt"))
    b.join(thr, Seq(groupCol)).join(quotas, Seq(groupCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_total"),
        max(col("quota")).cast("long").as("quota"),
        sum(when(col("bucket") <= col("tbkt"), 1).otherwise(0)).cast("long").as("n_kept"),
        sum(when(col("bucket") <= col("tbkt"), col(idCol)).otherwise(lit(0L)))
          .cast("long").as("kept_sum"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror: no `conv`, so the 8 nibbles are accumulated with
    * ascii arithmetic (same trick as [[DedupOps.simhash16Sql]]). */
  def hashBucketSql(e: String, mod: Int): String = {
    def nib(i: Int) = {
      val h = s"substr(md5($e), $i, 1)"
      s"(ascii($h) - CASE WHEN ascii($h) >= 97 THEN 87 ELSE 48 END)"
    }
    val value = (1 to 8).map(i => s"CAST(${nib(i)} AS BIGINT) * ${1L << (4 * (8 - i))}")
      .mkString("(", " + ", ")")
    s"($value % $mod)"
  }
}
