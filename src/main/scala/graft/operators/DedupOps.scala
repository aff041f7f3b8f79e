package graft.operators

import graft.functions.{Chunkers, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{size => asize, _}

/** Deduplication primitives (EXT north-star surface: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash).
  *
  * All primitives are pure Catalyst expressions with DuckDB mirrors —
  * the cross-engine invariant is that per-row array folds evaluate in
  * array order in both engines, and anything aggregated ACROSS rows is
  * an exact integer.
  *
  * Scale posture (100 TB): every dedup family reduces to
  * explode → shuffle-on-key → aggregate: exact dedup shuffles on the
  * content hash, Jaccard/MinHash shuffle on shingle/band keys (candidate
  * generation is linear in corpus size, never all-pairs), SimHash is
  * embarrassingly parallel per row.
  */
object DedupOps {

  /** Words of the cleaned text — materialize THIS as its own column and
    * feed it to [[shinglesFromWords]]/[[minhashSignature]] etc.: any
    * lambda that slices or indexes the word array re-evaluates its
    * operand expression PER ELEMENT (HOFs get no codegen subexpression
    * elimination), so an inline clean+split inside a shingle lambda
    * costs O(words) clean+splits per row instead of one. */
  def cleanWords(c: Column): Column =
    Chunkers.words(TextFunctions.cleanText(c))

  /** Distinct word n-gram shingles over a MATERIALIZED word-array
    * column (≥1 shingle even for short docs). `w` occurs twice
    * textually, so CollapseProject keeps the caller's word column
    * materialized. */
  def shinglesFromWords(w: Column, n: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(asize(w) - n, lit(0))),
      i => array_join(slice(w, i + 1, lit(n)), " ")))

  /** One-expression convenience form — evaluates the clean+split once
    * per SHINGLE when used inline (see [[cleanWords]]); prefer the
    * two-step form on anything large. */
  def shingles(c: Column, n: Int = 3): Column =
    shinglesFromWords(cleanWords(c), n)

  def shinglesSql(e: String, n: Int = 3): String = {
    val w = Chunkers.wordsSql(TextFunctions.cleanTextSql(e))
    s"""list_distinct(list_transform(
       |  range(0, GREATEST(len($w) - $n, 0) + 1),
       |  i -> array_to_string(($w)[i + 1 : i + $n], ' ')))""".stripMargin
  }

  /** PPJoin-style prefix-filtered exact similarity self-join at
    * τ = 1/2 over distinct 3-shingles (the `q_dedup_ppjoin` engine,
    * factored out so DedupSpec can fuzz completeness on random
    * corpora): tokens globally ordered rarest-first by df, each doc
    * exposes its first ⌊n/2⌋+1 tokens, candidates = prefix equi-join,
    * exact-integer intersection/union verify. Returns (doc_a, doc_b,
    * n_common, n_a, n_b, jaccard) for every pair with J ≥ 1/2. */
  def ppjoinPairsHalf(docs: DataFrame): DataFrame = {
    // the explicit not-null no-op filter aligns the inferred isnotnull
    // across every branch so the token exchange canonicalizes equal and
    // is reused instead of recomputed per consumer
    val tok = docs
      .withColumn("_w", cleanWords(col("text")))
      .select(col("doc_id"), explode(shinglesFromWords(col("_w"))).as("t"))
      .filter(col("t").isNotNull)
    val dfreq = tok.groupBy("t").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ordered = tok.join(dfreq, "t")
      .withColumn("pos", row_number().over(byDoc.orderBy(col("df"), col("t"))))
      .withColumn("n", count(lit(1)).over(byDoc))
    // prefix length p = n − ⌈τ·n⌉ + 1 at τ=1/2 is ⌊n/2⌋+1; the integer
    // form 2·pos ≤ n+2 is exact in both engines
    val prefix = ordered.filter(col("pos") * 2 <= col("n") + 2).select("doc_id", "t")
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val inter = cand
      .join(tok.as("x"), col("doc_a") === col("x.doc_id"))
      .join(tok.as("y"), col("doc_b") === col("y.doc_id") && col("x.t") === col("y.t"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .filter(col("n_common") * 2 >= col("n_a") + col("n_b") - col("n_common"))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double")).as("jaccard"))
  }

  /** Document-frequency cap over an exploded (doc_id, shingle) frame:
    * drops shingles shared by more than `maxDf` documents BEFORE any
    * shingle-key self-join. Without it, one boilerplate shingle shared
    * by 10⁶ documents at 100 TB makes its join group quadratic; a hot
    * shingle also carries no near-dup signal (it fails to discriminate
    * by definition). The window's shuffle is on `shingle` — the same
    * key the candidate join uses, so the exchange is reused. */
  def capShinglesByDf(sh: DataFrame, maxDf: Int): DataFrame =
    sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDf)
      .drop("df")

  /** k-seed minhash signature (element s = min over shingles of
    * md5(shingle#s)). Unrolled over seeds — not a lambda over
    * sequence(0,k−1) — so `shingleCol` occurs k times TEXTUALLY: when
    * callers materialize the shingle array as its own column,
    * CollapseProject sees a multiply-referenced non-cheap alias and
    * keeps it materialized (the lambda form held a single textual
    * reference, which the optimizer inlines back under the per-seed
    * loop — re-deriving the shingles k× per row, since HOFs get no
    * codegen subexpression elimination). Pair with a
    * `.withColumn("_sh", shingles(...))` at the call site. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { s =>
      array_min(transform(shingleCol, x => md5(concat(x, lit("#"), lit(s.toString)))))
    }: _*)

  def minhashSignatureSql(shinglesE: String, k: Int): String =
    s"""list_transform(range(0, $k), s ->
       |  list_aggregate(list_transform($shinglesE, x -> md5(x || '#' || CAST(s AS VARCHAR))), 'min'))""".stripMargin

  /** Band keys "b:md5(rows)" (band b = signature rows [b·r, b·r+r)) — unrolled over bands (not a lambda over
    * sequence) for the same materialization reason as
    * [[minhashSignature]]: a caller's `sig` column is referenced
    * `bands` times textually, so CollapseProject keeps it a real
    * column instead of re-deriving the signature per band. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat(lit(s"$b:"),
        md5(array_join(slice(sig, b * rowsPerBand + 1, rowsPerBand), "|")))
    }: _*)

  def lshBandsSql(sigE: String, bands: Int, rowsPerBand: Int): String =
    s"""list_transform(range(0, $bands), b ->
       |  CAST(b AS VARCHAR) || ':' ||
       |  md5(array_to_string(($sigE)[b * $rowsPerBand + 1 : (b + 1) * $rowsPerBand], '|')))""".stripMargin

  /** Packed 16-bit md5 prefix per shingle — ONE md5 per shingle.
    * Materialize this as its own column and feed it to
    * [[simhash16FromHashes]]: the 16 per-bit counters all reference the
    * materialized array, and Catalyst's CollapseProject keeps a
    * multiply-referenced non-cheap alias as a real column, so the hash
    * work runs once per row instead of 16× (the fused single-expression
    * form re-evaluated md5 inside every bit's lambda — HOFs don't get
    * codegen subexpression elimination). */
  def simhash16Hashes(shingleCol: Column): Column =
    transform(shingleCol, x => conv(substring(md5(x), 1, 4), 16, 10).cast("int"))

  /** Majority-vote simhash over pre-packed 16-bit hashes: bit (nib,
    * bit) of the hex prefix lives at packed position (3−nib)·4+bit —
    * same bit values as hashing inside each lambda, verified by the
    * unchanged oracle. */
  def simhash16FromHashes(hashed: Column): Column = {
    val n = asize(hashed)
    (0 until 16).map { j =>
      val nib = j / 4
      val bit = j % 4
      val mask = 1 << ((3 - nib) * 4 + bit)
      val ones = asize(filter(hashed, h => h.bitwiseAND(lit(mask)) > 0))
      when(ones * 2 >= n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** One-expression convenience form (16× md5 — prefer the two-step
    * [[simhash16Hashes]]/[[simhash16FromHashes]] on anything large). */
  def simhash16(shingleCol: Column): Column =
    simhash16FromHashes(simhash16Hashes(shingleCol))

  def simhash16Sql(shinglesE: String): String = {
    def hexVal(h: String) =
      s"(ascii($h) - CASE WHEN ascii($h) >= 97 THEN 87 ELSE 48 END)"
    val terms = (0 until 16).map { j =>
      val nib = j / 4
      val bit = j % 4
      val ones =
        s"len(list_filter($shinglesE, x -> (${hexVal(s"substr(md5(x), ${nib + 1}, 1)")} & ${1 << bit}) > 0))"
      s"CASE WHEN $ones * 2 >= len($shinglesE) THEN ${1L << j} ELSE 0 END"
    }
    terms.mkString("CAST((", " + ", ") AS BIGINT)")
  }
}
