package graft

import graft.functions.Chunkers
import org.apache.spark.sql.functions._

class ChunkersSpec extends SparkSpec {

  private def chunksOf(text: String, size: Int, frac: Double): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(Chunkers.chunkFixedWords(col("t"), size, frac).as("c"))
      .head().getSeq[String](0)
  }

  // The reference's entire executable spec: the two doctests in
  // /root/reference/llmcore/cms/parsers.py:29-58.
  test("G2 reproduces the reference doctest (size=5, overlap=0.2)") {
    val text = "I would like to thank my middle finger for always sticking" +
      " up for me when I needed it."
    assert(chunksOf(text, 5, 0.2) == Seq(
      "I would like to thank",
      "thank my middle finger for always",
      "always sticking up for me when",
      "when I needed it."))
  }

  test("word_splitter collapses runs (doctest parsers.py:29-33)") {
    import spark.implicits._
    val text = "I would like to thank my middle finger for always sticking" +
      " up               for me when I       needed it."
    val words = Seq(text).toDF("t").select(Chunkers.words(col("t"))).head().getSeq[String](0)
    assert(words == Seq("I", "would", "like", "to", "thank", "my", "middle",
      "finger", "for", "always", "sticking", "up", "for", "me", "when", "I",
      "needed", "it."))
  }

  test("G2 invariants: coverage and bounded chunk length (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 40) {
      val ws = Seq.fill(1 + rnd.nextInt(40))("w" + rnd.nextInt(100))
      val size = 2 + rnd.nextInt(9)
      val chunks = chunksOf(ws.mkString(" "), size, 0.2)
      val ov = (size * 0.2).toInt
      // each chunk has at most size + overlap words
      assert(chunks.forall(c => c.split(" ").length <= size + ov))
      // de-overlapped concatenation covers all words in order
      val covered = chunks.zipWithIndex.flatMap { case (c, i) =>
        val w = c.split(" ").toSeq
        if (i == 0) w else w.drop(math.min(ov, i * size)) // overlap words repeat
      }
      assert(covered == ws)
    }
  }

  test("G3 split_kbs semantics: floor parts, remainder to last, prefix") {
    import spark.implicits._
    val text = "Intro Full Article: " + (1 to 20).map(i => s"w$i").mkString(" ")
    val df = Seq(text).toDF("t")
      .withColumn("n_tokens", functions.TextFunctions.wordCount(col("t")))
      .select(explode(Chunkers.splitOversized(col("t"), col("n_tokens"), 10)).as("p"))
      .select(col("p.part"), col("p.part_tokens"))
    val parts = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 23 words, limit 10 -> 3 splits of floor(23/3)=7, last takes 9
    assert(parts.length == 3)
    assert(parts.map(_._2) == Seq(7L, 7L, 9L))
    assert(parts(1)._1.startsWith("Intro  Part Article: "))
    assert(parts(2)._1.endsWith("w20"))
  }
}
