package graft

import graft.operators.BpeOps
import org.apache.spark.sql.functions._

/** Exact-BPE training and encoding (BpeOps): hand-computed goldens for
  * the merge selection and greedy encode, plus corpus-level bounds and
  * partitioning invariance for the Spark face.
  */
class BpeSpec extends SparkSpec {

  test("training picks the most frequent pair, ties broken lexicographically") {
    // "aaab": pairs (a,a)×2, (a,b)×1 → first merge (a,a);
    // then [aa,a,b]: (aa,a)×1, (a,b)×1 tie → (a,b) < (aa,a) wins
    val merges = BpeOps.trainMerges(Seq(("aaab", 1L)), 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))
    // frequency weighting: words ("ab", 3) and ("cd", 2) → (a,b) first
    assert(BpeOps.trainMerges(Seq(("ab", 3L), ("cd", 2L)), 1) == Seq(("a", "b")))
    // training stops when no pairs remain (single-char vocab)
    assert(BpeOps.trainMerges(Seq(("a", 9L), ("b", 1L)), 5).isEmpty)
    // duplicate words in the table accumulate
    assert(BpeOps.trainMerges(Seq(("cd", 2L), ("ab", 2L), ("ab", 1L)), 1)
      == Seq(("a", "b")))
  }

  test("greedy encode applies lowest-rank merges, non-overlapping, to a fixpoint") {
    val rank = Map(("a", "a") -> 0, ("a", "b") -> 1)
    assert(BpeOps.encode("aaab", rank) == Vector("aa", "ab"))
    // non-overlapping left-to-right: "aaa" → [aa, a], not [a, aa]
    assert(BpeOps.encode("aaa", rank) == Vector("aa", "a"))
    // no applicable merge → character split
    assert(BpeOps.encode("xyz", rank) == Vector("x", "y", "z"))
    assert(BpeOps.encode("q", rank) == Vector("q"))
    // rank order decides the merge path: (a,b) first gives a,a,ab then
    // (a,a) closes it — same fixpoint reached through different steps
    val rank2 = Map(("a", "b") -> 0, ("a", "a") -> 1)
    assert(BpeOps.encode("aaab", rank2) == Vector("aa", "ab"))
  }

  test("encode of a trained table reconstructs every training word exactly") {
    val words = Seq(("lower", 4L), ("newest", 5L), ("widest", 3L), ("low", 6L))
    val merges = BpeOps.trainMerges(words, 16)
    val rank = merges.zipWithIndex.toMap
    words.foreach { case (w, _) =>
      val toks = BpeOps.encode(w, rank)
      assert(toks.mkString == w, s"tokens of $w must concatenate back")
      assert(toks.length <= w.length)
    }
    // 16 merges over this 4-word table compress every word to one token
    assert(words.forall { case (w, _) => BpeOps.encode(w, rank).length == 1 })
  }

  test("corpus training: token counts sit between word and char counts, invariant to partitioning") {
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val merges = BpeOps.trainMerges(BpeOps.topWordCounts(docs, col("text"), 256), 32)
    assert(merges.length == 32, "corpus must support 32 merges")
    val bpe = BpeOps.bpeTokenCountCol(spark, merges)
    def counts(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), bpe(col("text")).as("n_bpe"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars"))
    val c = counts(docs).cache()
    assert(c.filter(col("n_bpe") < col("n_words")).count() == 0,
      "BPE can never produce fewer tokens than whitespace words")
    assert(c.filter(col("n_bpe") > col("n_chars")).count() == 0,
      "BPE can never produce more tokens than non-space characters")
    assert(c.filter(col("n_bpe") < col("n_chars")).count() > 0,
      "trained merges must actually compress some documents")
    val a = c.select("doc_id", "n_bpe").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = counts(docs.repartition(7)).select("doc_id", "n_bpe")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "encoding must not depend on partitioning")
    c.unpersist()
  }
}
