package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real byte-pair-encoding tokenizer: exact training + exact greedy
  * encoding, with a pluggable merge table. The reference counts tokens
  * with tiktoken's cl100k_base (/root/reference/llmcore/cms/
  * sharepointutils.py:364,379; parsers.py:206-208); its merge DATA
  * cannot ship into a zero-egress build (SURVEY §7.4 pins the
  * regex-approximation deviation for the oracle-checked queries), but
  * the ALGORITHM is public and exact — so this module implements it
  * fully: hand a trained merge table to [[encode]] and the token
  * stream is byte-identical to any other faithful BPE implementation
  * on that table.
  *
  * Scale shape of training (how sentencepiece/GPT-2 BPE actually
  * train): the only corpus-sized work is ONE distributed word-count
  * aggregation ([[topWordCounts]] — linear scan, one shuffle, top-K
  * cap so the driver holds a bounded vocabulary). The merge loop
  * itself ([[trainMerges]]) runs over that vocabulary-bounded
  * frequency table on the driver — iterating it over 100 TB of raw
  * text would be wrong; iterating it over the word-frequency table is
  * the textbook algorithm. Encoding is embarrassingly parallel: the
  * rank table broadcasts (tokenizer-sized, NOT corpus-growing — the
  * legitimate broadcast case) and each row encodes independently.
  */
object BpeOps {

  /** Distributed word-frequency table, capped to the `k` most frequent
    * words (count desc, word asc — deterministic under ties). The one
    * corpus-scale job in tokenizer training. */
  def topWordCounts(docs: DataFrame, textCol: Column, k: Int): Seq[(String, Long)] =
    docs.select(explode(split(trim(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Classic BPE training over a word-frequency table: `nMerges` times,
    * count adjacent symbol pairs weighted by word frequency, merge the
    * most frequent pair (ties broken by lexicographic pair order for
    * determinism), rewrite the table. Vocabulary-bounded — never sees
    * the corpus. */
  def trainMerges(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] = wordCounts
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.groupMapReduce { case (syms, _) => mergePair(syms, best) }(_._2)(_ + _)
        i += 1
      }
    }
    merges.result()
  }

  /** Merge every non-overlapping occurrence of `pair`, left to right —
    * the rewrite both training and encoding share. */
  private[operators] def mergePair(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Exact greedy BPE encode of one word: repeatedly apply the
    * lowest-rank applicable merge until none applies — the GPT-2/
    * tiktoken encoding loop. */
  def encode(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      val best = syms.iterator.zip(syms.iterator.drop(1))
        .flatMap(p => rank.get(p).map(r => (r, p))).minOption
      best match {
        case Some((_, pair)) =>
          syms = mergePair(syms, pair)
          done = syms.length < 2
        case None => done = true
      }
    }
    syms
  }

  /** Spark face: per-row BPE token count over whitespace-pre-tokenized
    * text, with the rank table broadcast to executors. A dictionary-
    * driven merge loop has no Catalyst-expression equivalent, so this
    * is the documented UDF exception (SURVEY §7.3) — still one narrow
    * pass, no shuffle. */
  def bpeTokenCountCol(spark: SparkSession, merges: Seq[(String, String)]): Column => Column = {
    val rank = merges.zipWithIndex.toMap
    val b = spark.sparkContext.broadcast(rank)
    val f = udf { (s: String) =>
      if (s == null) 0L
      else s.trim.split("\\s+").iterator.filter(_.nonEmpty)
        .map(w => encode(w, b.value).length.toLong).sum
    }
    c => f(c)
  }
}
