package graft.queries

import graft.functions.{Chunkers, Embedders, TextFunctions => TF}
import graft.operators.BpeOps
import graft.pipeline.DocPipeline
import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Text-analysis + document-pipeline inventory (SURVEY.md §2.3, §2.9,
  * §2.11-7 and the EXT text-analysis operators).
  */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** F5+F6+fingerprint per document. */
  val qDocTokens: QueryDef = QueryDef.sql(
    "q_doc_tokens",
    s"""SELECT doc_id,
       |  length(${TF.cleanTextSql("text")}) AS clean_len,
       |  ${TF.wordCountSql("text")} AS n_words,
       |  ${TF.bpeTokenCountSql("text")} AS n_bpe,
       |  ${TF.fingerprintSql("text")} AS fp
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    docs(s, d).select(
      col("doc_id"),
      length(TF.cleanText(col("text"))).cast("long").as("clean_len"),
      TF.wordCount(col("text")).as("n_words"),
      TF.bpeTokenCount(col("text")).as("n_bpe"),
      TF.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic vs the labeled lang: confusion-matrix counts. */
  val qDocLangId: QueryDef = QueryDef.sql(
    "q_doc_langid",
    s"""SELECT lang, ${TF.langGuessSql("text")} AS guess, COUNT(*) AS n
       |FROM documents
       |GROUP BY lang, guess
       |ORDER BY lang, guess""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("lang"), TF.langGuess(col("text")).as("guess"))
      .groupBy("lang", "guess").agg(count(lit(1)).as("n"))
      .orderBy("lang", "guess")
  }

  /** Quality scoring per source: exact-integer components, IEEE ratios. */
  val qDocQuality: QueryDef = QueryDef.sql(
    "q_doc_quality",
    s"""SELECT source,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       |  CAST(SUM(${TF.wordCountSql("text")}) AS BIGINT) AS sum_words,
       |  CAST(SUM(${TF.punctCountSql("text")}) AS BIGINT) AS sum_punct,
       |  CAST(SUM(${TF.stopwordCountSql("text")}) AS BIGINT) AS sum_stop,
       |  CAST(SUM(${TF.stopwordCountSql("text")}) AS DOUBLE) / CAST(SUM(${TF.wordCountSql("text")}) AS DOUBLE) AS stop_ratio
       |FROM documents
       |GROUP BY source
       |ORDER BY source""".stripMargin) { (s, d) =>
    docs(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("sum_chars"),
        sum(TF.wordCount(col("text"))).cast("long").as("sum_words"),
        sum(TF.punctCount(col("text"))).cast("long").as("sum_punct"),
        sum(TF.stopwordCount(col("text"))).cast("long").as("sum_stop"))
      .withColumn("stop_ratio",
        col("sum_stop").cast("double") / col("sum_words").cast("double"))
      .orderBy("source")
  }

  /** G2 chunk explode: every chunk row with ordinal, tokens, chunk_id. */
  val qDocChunks: QueryDef = QueryDef.sql(
    "q_doc_chunks",
    s"""WITH c AS (
       |  SELECT doc_id, lang, source,
       |    ${Chunkers.chunkFixedWordsSql(TF.cleanTextSql("text"), DocPipeline.ChunkWords, DocPipeline.OverlapFraction)} AS chunks
       |  FROM documents
       |)
       |SELECT doc_id, lang, source,
       |  unnest(range(0, len(chunks))) AS chunk_index,
       |  unnest(chunks) AS chunk,
       |  ${TF.wordCountSql("unnest(chunks)")} AS n_tokens,
       |  ${TF.bpeTokenCountSql("unnest(chunks)")} AS n_bpe_tokens,
       |  ${TF.chunkIdSql("CAST(doc_id AS VARCHAR)", "unnest(range(0, len(chunks)))")} AS chunk_id
       |FROM c
       |ORDER BY doc_id, chunk_index""".stripMargin) { (s, d) =>
    DocPipeline.chunks(docs(s, d)).orderBy("doc_id", "chunk_index")
  }

  /** Per-document chunk stats — the natural aggregate over the reference
    * chunk table (SURVEY §2.5). */
  val qChunkStats: QueryDef = QueryDef.sql(
    "q_chunk_stats",
    s"""WITH c AS (
       |  SELECT doc_id,
       |    unnest(${Chunkers.chunkFixedWordsSql(TF.cleanTextSql("text"), DocPipeline.ChunkWords, DocPipeline.OverlapFraction)}) AS chunk
       |  FROM documents
       |)
       |SELECT doc_id, COUNT(*) AS n_chunks,
       |  CAST(SUM(${TF.wordCountSql("chunk")}) AS BIGINT) AS sum_tokens,
       |  CAST(SUM(${TF.wordCountSql("chunk")}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tokens
       |FROM c
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    DocPipeline.chunks(docs(s, d))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
      .withColumn("avg_tokens",
        col("sum_tokens").cast("double") / col("n_chunks").cast("double"))
      .orderBy("doc_id")
  }

  /** Full pipeline (§2.11-7): chunk → deterministic embed → verifiable
    * projections of the vector (norm before normalization, first
    * component after, in-order component sum — all dyadic-exact). */
  val qPipelineEmbed: QueryDef = QueryDef.sql(
    "q_pipeline_embed",
    s"""WITH c AS (
       |  SELECT doc_id,
       |    unnest(range(0, len(chunks))) AS chunk_index,
       |    unnest(chunks) AS chunk
       |  FROM (
       |    SELECT doc_id,
       |      ${Chunkers.chunkFixedWordsSql(TF.cleanTextSql("text"), DocPipeline.ChunkWords, DocPipeline.OverlapFraction)} AS chunks
       |    FROM documents
       |  )
       |), e AS (
       |  SELECT doc_id, chunk_index,
       |    ${TF.chunkIdSql("CAST(doc_id AS VARCHAR)", "chunk_index")} AS chunk_id,
       |    ${Embedders.deterministicEmbedSql("chunk")} AS emb
       |  FROM c
       |)
       |SELECT doc_id, chunk_index, chunk_id,
       |  ${Embedders.l2NormSql("emb")} AS raw_norm,
       |  (emb)[1] / (${Embedders.l2NormSql("emb")}) AS c0,
       |  (list_reduce(emb, (x, y) -> x + y)) / (${Embedders.l2NormSql("emb")}) AS comp_sum
       |FROM e
       |ORDER BY doc_id, chunk_index""".stripMargin) { (s, d) =>
    val raw = DocPipeline.chunks(docs(s, d))
      .withColumn("emb", Embedders.deterministicEmbedIn(s, col("chunk")))
    raw.select(
      col("doc_id"), col("chunk_index"), col("chunk_id"),
      sqrt(aggregate(col("emb"), lit(0.0d), (a, x) => a + x * x)).as("raw_norm"),
      (element_at(col("emb"), 1) /
        sqrt(aggregate(col("emb"), lit(0.0d), (a, x) => a + x * x))).as("c0"),
      (aggregate(col("emb"), lit(0.0d), (a, x) => a + x) /
        sqrt(aggregate(col("emb"), lit(0.0d), (a, x) => a + x * x))).as("comp_sum"))
      .orderBy("doc_id", "chunk_index")
  }

  /** G3 oversize re-split (REF split_kbs, token_limit scaled to the
    * synthetic docs): explode parts with their recomputed token counts. */
  val qSplitOversized: QueryDef = QueryDef.sql(
    "q_split_oversized",
    s"""WITH t AS (
       |  SELECT doc_id, text, ${TF.wordCountSql("text")} AS n_tokens FROM documents
       |), p AS (
       |  SELECT doc_id,
       |    unnest(${Chunkers.splitOversizedSql("text", "n_tokens", 40)}) AS part
       |  FROM t
       |)
       |SELECT doc_id, part.part AS part_text, part.part_tokens AS part_tokens,
       |  length(part.part) AS part_len
       |FROM p
       |ORDER BY doc_id, part_text""".stripMargin) { (s, d) =>
    docs(s, d)
      .withColumn("n_tokens", TF.wordCount(col("text")))
      .select(col("doc_id"),
        explode(Chunkers.splitOversized(col("text"), col("n_tokens"), 40)).as("part"))
      .select(col("doc_id"),
        col("part.part").as("part_text"),
        col("part.part_tokens").as("part_tokens"),
        length(col("part.part")).cast("long").as("part_len"))
      .orderBy("doc_id", "part_text")
  }

  /** G1 — the reference's actual production chunker
    * (RecursiveCharacterTextSplitter, parsers.py:161-166) over
    * `documents`, chunk_size=100 / overlap=20 (the reference's 2000/50
    * would leave every ≤553-char doc a single chunk; the ratio is
    * preserved and the production constants are exercised in
    * ChunkersSpec).
    *
    * Oracle: the corpus is single-space words ≤8 chars (no newlines, no
    * runs), so the recursive splitter reduces to the " "-separator
    * greedy merge — expressed EXACTLY in DuckDB as a recursive CTE over
    * piece prefix-sums: chunk i covers pieces s..j with j = max index
    * fitting chunkSize, and the next s is the first index whose carried
    * tail is ≤ overlap and admits the following piece (the langchain
    * pop-loop, solved in closed form on the monotone prefix sums). The
    * general path (paragraph separators, char-level fallback) is
    * golden-tested in ChunkersSpec. */
  val qDocChunksRecursive: QueryDef = {
    val C = 100
    val OV = 20
    // j(s): last piece index of the chunk starting at piece s (1-based)
    val J = s"(st.s - 1 + len(list_filter(range(st.s, n + 1), jj -> ps[jj + 1] - ps[st.s] <= $C)))"
    def chunkExpr = s"trim(substring(text, ps[st.s] + 1, ps[($J) + 1] - ps[st.s]))"
    QueryDef.sql(
      "q_doc_chunks_recursive",
      s"""WITH RECURSIVE pieces_t AS (
         |  SELECT doc_id, text,
         |    list_filter([parts[1]] || list_transform(parts[2:], p -> ' ' || p), p -> p <> '') AS pieces
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS parts FROM documents)
         |), lens_t AS (
         |  SELECT doc_id, text, pieces, len(pieces) AS n,
         |    list_transform(pieces, p -> len(p)) AS lens
         |  FROM pieces_t
         |), arr AS (
         |  SELECT doc_id, text, n, lens,
         |    list_transform(range(0, n + 1), i -> CAST(coalesce(list_sum(lens[1:i]), 0) AS BIGINT)) AS ps
         |  FROM lens_t
         |), st AS (
         |  SELECT doc_id, 0 AS ord, CAST(1 AS INTEGER) AS s FROM arr WHERE n > 0
         |  UNION ALL
         |  SELECT st.doc_id, st.ord + 1,
         |    CAST(list_aggregate(list_filter(range(st.s + 1, ($J) + 2),
         |      c -> ps[($J) + 1] - ps[c] <= $OV
         |       AND (ps[($J) + 1] - ps[c] + lens[($J) + 1] <= $C OR ps[($J) + 1] - ps[c] = 0)), 'min') AS INTEGER)
         |  FROM st JOIN arr USING (doc_id)
         |  WHERE ($J) < n
         |)
         |SELECT st.doc_id,
         |  CAST(st.ord AS BIGINT) AS chunk_index,
         |  $chunkExpr AS chunk,
         |  CAST(length($chunkExpr) AS BIGINT) AS n_chars
         |FROM st JOIN arr USING (doc_id)
         |ORDER BY doc_id, chunk_index""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          posexplode(Chunkers.recursiveSplitUdf(C, OV)(col("text"))).as(Seq("chunk_index", "chunk")))
        .select(col("doc_id"), col("chunk_index").cast("long").as("chunk_index"),
          col("chunk"), length(col("chunk")).cast("long").as("n_chars"))
        .orderBy("doc_id", "chunk_index")
    }
  }

  /** Sequence-packing context length (tokens per training sequence).
    * Small relative to real 4k–128k windows so the sf0.01 corpus (docs
    * of ~10–90 words) exercises many boundary crossings. */
  private val PackCtx = 128

  /** Packing shard fan-out per lang. Real pipelines pack within output
    * shards (one writer task each); parallelism = langs × PackShards,
    * tuned to the cluster, never 1. */
  private val PackShards = 8

  /** Sequence packing: concatenate-and-chop documents into fixed
    * [[PackCtx]]-token training sequences — the layout step a pretraining
    * pipeline runs after filtering/dedup. Documents pack in doc_id order
    * WITHIN a (lang, shard) group — shard = doc_id % [[PackShards]] — so
    * at 100 TB every shard packs independently: the running-token-sum
    * window is partitioned on (lang, shard) (parallelism scales with the
    * shard count, never the single-partition global-window shape;
    * PlanSpec-asserted) and sequences never mix languages. Per doc: its
    * shard, starting sequence id within the shard, and whether the chop
    * splits it across a sequence boundary. All integer arithmetic; the
    * floor divisions are exact-multiple divisions of BIGINTs. */
  val qPackSequences: QueryDef = {
    def fdivSql(x: String) = s"CAST((($x) - (($x) % $PackCtx)) / $PackCtx AS BIGINT)"
    QueryDef.sql(
      "q_pack_sequences",
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(doc_id % $PackShards AS BIGINT) AS shard,
         |    CAST(${TF.wordCountSql("text")} AS BIGINT) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, lang, shard, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_tok
         |  FROM t
         |)
         |SELECT doc_id, lang, shard, n_tokens,
         |  ${fdivSql("start_tok")} AS seq_id,
         |  CASE WHEN n_tokens > 0
         |        AND ${fdivSql("start_tok + n_tokens - 1")} <> ${fdivSql("start_tok")}
         |       THEN 1 ELSE 0 END AS crosses_boundary
         |FROM c
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def fdiv(x: org.apache.spark.sql.Column) =
        ((x - (x % PackCtx)) / PackCtx).cast("long")
      docs(s, d)
        .select(col("doc_id"), col("lang"),
          (col("doc_id") % PackShards).cast("long").as("shard"),
          TF.wordCount(col("text")).as("n_tokens"))
        .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
          fdiv(col("start_tok")).as("seq_id"),
          when(col("n_tokens") > 0 &&
              fdiv(col("start_tok") + col("n_tokens") - 1) =!= fdiv(col("start_tok")),
            lit(1)).otherwise(lit(0)).as("crosses_boundary"))
        .orderBy("doc_id")
    }
  }

  /** Micro-batch size for the padding-waste report. */
  private val BatchB = 32

  /** Padding-waste report: the batching-efficiency metric a fixed-batch
    * training (or embedding-inference) pipeline watches. Within each
    * (lang, shard) group — shard = doc_id % [[PackShards]], the same
    * writer-task sharding as [[qPackSequences]] — documents form
    * [[BatchB]]-row micro-batches, and a batch pads every member to its
    * longest sequence: padded = count·max(n_tokens), waste = padded −
    * Σ n_tokens. Reported per lang under BOTH batch orders: arrival
    * (doc_id) and length-sorted — the delta is exactly the win
    * length-bucketed batching buys, measured on the real corpus. Scale
    * posture: both windows partition on (lang, shard) (parallelism =
    * langs × shards, never a global window — same shape PlanSpec pins
    * for packing), everything downstream is partial-agg shuffles, all
    * arithmetic exact BIGINT. */
  val qPadWaste: QueryDef = {
    def fdivSql(x: String, k: Int) = s"CAST((($x) - (($x) % $k)) / $k AS BIGINT)"
    def batchedSql(order: String, out: String) =
      s"""$out AS (
         |  SELECT lang, shard,
         |    ${fdivSql(s"ROW_NUMBER() OVER (PARTITION BY lang, shard ORDER BY $order) - 1", BatchB)} AS batch,
         |    n_tokens
         |  FROM t
         |), ${out}b AS (
         |  SELECT lang, COUNT(*) AS n_batches, SUM(waste) AS waste FROM (
         |    SELECT lang, shard, batch,
         |      COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS waste
         |    FROM $out GROUP BY lang, shard, batch)
         |  GROUP BY lang
         |)""".stripMargin
    QueryDef.sql(
      "q_pad_waste",
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(doc_id % $PackShards AS BIGINT) AS shard,
         |    CAST(${TF.wordCountSql("text")} AS BIGINT) AS n_tokens
         |  FROM documents
         |), ${batchedSql("doc_id", "a")}, ${batchedSql("n_tokens, doc_id", "s")},
         |tot AS (SELECT lang, SUM(n_tokens) AS sum_tokens FROM t GROUP BY lang)
         |SELECT lang, ab.n_batches AS n_batches,
         |  CAST(sum_tokens AS BIGINT) AS sum_tokens,
         |  CAST(ab.waste AS BIGINT) AS pad_naive,
         |  CAST(sb.waste AS BIGINT) AS pad_sorted
         |FROM tot JOIN ab USING (lang) JOIN sb USING (lang)
         |ORDER BY lang""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val base = docs(s, d).select(col("doc_id"), col("lang"),
        (col("doc_id") % PackShards).cast("long").as("shard"),
        TF.wordCount(col("text")).cast("long").as("n_tokens"))
      def fdiv(x: org.apache.spark.sql.Column, k: Int) =
        ((x - (x % k)) / k).cast("long")
      // both orderings share the (lang, shard) hash partitioning, so the
      // exchange is reused and each branch pays only its in-partition
      // sort; sum_tokens rides the naive branch's aggregation — the
      // tokenize+scan runs per branch, never a third time for totals
      def padPerLang(order: Seq[org.apache.spark.sql.Column], name: String) = {
        val w = Window.partitionBy("lang", "shard").orderBy(order: _*)
        base
          .withColumn("batch", fdiv(row_number().over(w).cast("long") - 1, BatchB))
          .groupBy("lang", "shard", "batch")
          .agg((count(lit(1)) * max(col("n_tokens")) - sum(col("n_tokens"))).as("w"),
            sum(col("n_tokens")).as("sm"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_batches"),
            sum(col("sm")).cast("long").as("sum_tokens"),
            sum(col("w")).cast("long").as(name))
      }
      val naive = padPerLang(Seq(col("doc_id")), "pad_naive")
      val sorted = padPerLang(Seq(col("n_tokens"), col("doc_id")), "pad_sorted")
        .drop("n_batches").drop("sum_tokens")
      naive.join(sorted, "lang")
        .select(col("lang"), col("n_batches"), col("sum_tokens"),
          col("pad_naive"), col("pad_sorted"))
        .orderBy("lang")
    }
  }

  /** The tokenizer's merge table as a FIXED ARTIFACT — how production
    * tokenizers actually ship (GPT-2/cl100k merges are data trained
    * once, applied to every corpus thereafter): trained at object-init
    * by the exact [[graft.operators.BpeOps.trainMerges]] algorithm over
    * a pinned seed vocabulary (the corpus's own common words with
    * frozen frequencies), so the table is a deterministic pure function
    * of code — identical at every data scale. Round 9's golden-VALUES
    * oracle was pinned at sf0.01 because per-scale training made the
    * merges scale-dependent; the artifact design removes the exception. */
  private val BpeSeedVocab: Seq[(String, Long)] = Seq(
    "join" -> 964L, "hash" -> 947L, "row" -> 943L, "batch" -> 937L,
    "scan" -> 936L, "column" -> 934L, "customer" -> 934L, "filter" -> 933L,
    "small" -> 928L, "merge" -> 918L, "slow" -> 918L, "order" -> 912L,
    "vector" -> 912L, "line" -> 910L, "data" -> 908L, "table" -> 908L,
    "agg" -> 901L, "value" -> 897L, "key" -> 896L, "stream" -> 888L,
    "window" -> 886L, "a" -> 880L, "spark" -> 880L, "group" -> 878L,
    "part" -> 878L, "big" -> 876L, "sort" -> 872L, "query" -> 871L,
    "fast" -> 854L, "the" -> 840L, "dup" -> 26L)

  private val BpeSeedMerges: Seq[(String, String)] =
    BpeOps.trainMerges(BpeSeedVocab, 64)

  /** Independent DuckDB re-implementation of the greedy BPE encode for
    * the oracle: applying the merges SEQUENTIALLY in rank order over a
    * separator-joined symbol string is provably the greedy encoding
    * (a merge only ever creates pairs involving its new, strictly
    * longer symbol, so it can't mint occurrences of any earlier-rank
    * pair — or of itself), and SQL `replace` shares `mergePair`'s
    * left-to-right non-overlap semantics. Symbols must be FULLY
    * DELIMITED on both sides or `replace` can match the interior or
    * prefix of a longer symbol (pattern `a<US>b` inside `xa<US>bz`),
    * so each symbol renders as `<US>sym<US>` and merge (a,b) becomes
    * `replace(e, '<US>a<US><US>b<US>', '<US>ab<US>')` — the double
    * separator exists exactly at symbol junctions, and consecutive
    * matches never share consumed characters. Tokens = seps / 2. */
  private def bpeChainSql: String = {
    val sep = "\u001f" // UNIT SEPARATOR — outside the corpus alphabet
    val wrapped =
      s"'$sep' || array_to_string(string_split(w, ''), '$sep$sep') || '$sep'"
    BpeSeedMerges.foldLeft(wrapped) {
      case (acc, (a, b)) => s"replace($acc, '$sep$a$sep$sep$b$sep', '$sep$a$b$sep')"
    }
  }

  /** Exact-BPE token accounting with the artifact merge table (F6's
    * real algorithm; [[graft.operators.BpeOps]]): each document's words
    * encode through the exact greedy encoder (rank table broadcast,
    * embarrassingly parallel, no shuffle before the per-lang
    * aggregate), and the ORACLE recomputes the same encoding
    * independently in DuckDB as a rank-ordered replace chain
    * ([[bpeChainSql]]) — a genuine cross-implementation check that
    * travels with the data to ANY scale, closing round 9's one
    * sf0.01-pinned golden. BpeSpec additionally pins the algorithm
    * (hand goldens, training determinism, partitioning invariance). */
  val qDocBpeExact: QueryDef = QueryDef.sql("q_doc_bpe_exact",
    s"""WITH w AS (
       |  SELECT lang, unnest(string_split_regex(lower(text), '\\s+')) AS w
       |  FROM documents
       |), ww AS (SELECT lang, w FROM w WHERE length(w) > 0),
       |enc AS (SELECT lang, w, $bpeChainSql AS e FROM ww),
       |tok AS (SELECT lang, w,
       |  (length(e) - length(replace(e, chr(31), ''))) // 2 AS n_bpe FROM enc),
       |byl AS (SELECT lang, COUNT(*) AS n_words,
       |  CAST(SUM(length(w)) AS BIGINT) AS n_chars,
       |  CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens FROM tok GROUP BY lang),
       |nd AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
       |SELECT lang, n_docs, n_words, n_chars, n_bpe_tokens
       |FROM byl JOIN nd USING (lang)
       |ORDER BY lang""".stripMargin) { (s, d) =>
    val base = docs(s, d).select(col("lang"), lower(col("text")).as("t"))
    val bpe = BpeOps.bpeTokenCountCol(s, BpeSeedMerges)
    base
      .select(col("lang"),
        when(length(trim(col("t"))) === 0, 0L)
          .otherwise(size(split(trim(col("t")), "\\s+")).cast("long")).as("n_words"),
        length(regexp_replace(col("t"), "\\s+", "")).cast("long").as("n_chars"),
        bpe(col("t")).as("n_bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_bpe")).as("n_bpe_tokens"))
      .orderBy("lang")
  }

  /** Unicode NFC normalization over the corpus — the pre-tokenization
    * canonicalization step, run through the native codegen'd
    * [[graft.expressions.NormalizeText]] kernel and hash-checked
    * against DuckDB's independent `nfc_normalize` implementation
    * (both implement UAX #15, so normalized bytes agree exactly).
    *
    * The synthetic corpus is ASCII (already NFC — the fast path), so
    * each doc gets a deterministic decomposed suffix by doc_id class:
    * combining acute (e+U+0301 → é), combining ring (A+U+030A → Å),
    * the ANGSTROM SIGN singleton (U+212B → U+00C5), or nothing (the
    * is-normalized fast path stays exercised). Hash-checked facts:
    * codepoint count before/after (composition shrinks the string),
    * the changed flag, and md5 of the normalized UTF-8 bytes.
    *
    * Scale: per-row scalar work, no shuffle except the output sort;
    * the already-normalized check is allocation-free, which is what a
    * 100 TB mostly-clean corpus actually pays. */
  val qDocNfc: QueryDef = QueryDef.sql(
    "q_doc_nfc",
    """WITH raw AS (
      |  SELECT doc_id,
      |    substr(text, 1, 24) ||
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'e' || chr(769)
      |      WHEN 1 THEN 'A' || chr(778)
      |      WHEN 2 THEN chr(8491)
      |      ELSE '' END AS t
      |  FROM documents
      |)
      |SELECT doc_id,
      |  length(t) AS raw_cp,
      |  length(nfc_normalize(t)) AS nfc_cp,
      |  (nfc_normalize(t) <> t) AS changed,
      |  md5(nfc_normalize(t)) AS digest
      |FROM raw ORDER BY doc_id""".stripMargin) { (s, d) =>
    val suffix = when(pmod(col("doc_id"), lit(4)) === 0, lit("e\u0301"))
      .when(pmod(col("doc_id"), lit(4)) === 1, lit("A\u030A"))
      .when(pmod(col("doc_id"), lit(4)) === 2, lit("\u212B"))
      .otherwise(lit(""))
    val raw = docs(s, d).select(col("doc_id"),
      concat(substring(col("text"), 1, 24), suffix).as("t"))
    raw.select(
      col("doc_id"),
      length(col("t")).cast("long").as("raw_cp"),
      length(TF.normalize(s, col("t"), "NFC")).cast("long").as("nfc_cp"),
      (TF.normalize(s, col("t"), "NFC") =!= col("t")).as("changed"),
      md5(TF.normalize(s, col("t"), "NFC").cast("binary")).as("digest"))
      .orderBy("doc_id")
  }

  /** URL canonicalization + URL-level dedup — the first dedup tier of a
    * web-corpus ingest (far cheaper than any content hash). Messy URLs
    * are woven deterministically from doc_id (uppercase scheme/host,
    * `www.`, an explicit default port, optional trailing slash,
    * tracking params out of order, optional fragment); the full
    * [[graft.functions.UrlFunctions]] rule chain collapses the 6
    * presentation variants of each logical page onto one canonical
    * form, verified end to end because the oracle recomputes every rule
    * in DuckDB. One shuffle on the canonical key. */
  val qUrlCanonical: QueryDef = QueryDef.sql(
    "q_url_canonical",
    s"""WITH u AS (
       |  SELECT doc_id,
       |    'HTTPS://WWW.Example' || CAST(doc_id % 20 AS VARCHAR) ||
       |    '.COM:443/Articles/' || CAST(doc_id % 7 AS VARCHAR) ||
       |    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
       |    '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR) ||
       |    '&utm_campaign=x&b=2&a=1' ||
       |    CASE WHEN doc_id % 3 = 0 THEN '#section-2' ELSE '' END AS url
       |  FROM documents
       |)
       |SELECT canonical,
       |  COUNT(*) AS n_variants,
       |  COUNT(DISTINCT url) AS n_distinct_raw,
       |  MIN(doc_id) AS first_doc
       |FROM (SELECT doc_id, url, ${graft.functions.UrlFunctions.canonicalUrlSql("url")} AS canonical FROM u)
       |GROUP BY canonical
       |ORDER BY canonical""".stripMargin) { (s, d) =>
    import graft.functions.UrlFunctions
    val u = docs(s, d).select(col("doc_id"),
      concat(
        lit("HTTPS://WWW.Example"), (col("doc_id") % 20).cast("string"),
        lit(".COM:443/Articles/"), (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 2 === 0, "/").otherwise(""),
        lit("?utm_source=feed&ref="), (col("doc_id") % 5).cast("string"),
        lit("&utm_campaign=x&b=2&a=1"),
        when(col("doc_id") % 3 === 0, "#section-2").otherwise("")).as("url"))
    u.select(col("doc_id"), col("url"),
        UrlFunctions.canonicalUrl(col("url")).as("canonical"))
      .groupBy("canonical")
      .agg(count(lit(1)).as("n_variants"),
        countDistinct(col("url")).as("n_distinct_raw"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("canonical")
  }

  /** Tokenizer fertility report — the tokenizer-budget health number a
    * multilingual corpus tracks per language: UTF-8 bytes per token and
    * tokens per word (a tokenizer that fragments one language pays its
    * context window there). Exact BIGINT sums (bytes, BPE tokens,
    * words) per language; the two ratios are single IEEE divisions of
    * those sums — one map-side-combined shuffle on `lang`. */
  val qTokenFertility: QueryDef = QueryDef.sql(
    "q_token_fertility",
    s"""SELECT lang,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes,
       |  CAST(SUM(${TF.bpeTokenCountSql("text")}) AS BIGINT) AS sum_tokens,
       |  CAST(SUM(${TF.wordCountSql("text")}) AS BIGINT) AS sum_words,
       |  CAST(SUM(strlen(text)) AS DOUBLE)
       |    / CAST(SUM(${TF.bpeTokenCountSql("text")}) AS DOUBLE) AS bytes_per_token,
       |  CAST(SUM(${TF.bpeTokenCountSql("text")}) AS DOUBLE)
       |    / CAST(SUM(${TF.wordCountSql("text")}) AS DOUBLE) AS tokens_per_word
       |FROM documents
       |GROUP BY lang
       |ORDER BY lang""".stripMargin) { (s, d) =>
    docs(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(octet_length(col("text"))).as("sum_bytes"),
        sum(TF.bpeTokenCount(col("text"))).as("sum_tokens"),
        sum(TF.wordCount(col("text"))).as("sum_words"))
      .select(col("lang"), col("n_docs"), col("sum_bytes"), col("sum_tokens"),
        col("sum_words"),
        (col("sum_bytes").cast("double") / col("sum_tokens").cast("double"))
          .as("bytes_per_token"),
        (col("sum_tokens").cast("double") / col("sum_words").cast("double"))
          .as("tokens_per_word"))
      .orderBy("lang")
  }

  val all: Seq[QueryDef] = Seq(
    qUrlCanonical, qTokenFertility,
    qDocTokens, qDocLangId, qDocQuality, qDocChunks,
    qChunkStats, qPipelineEmbed, qSplitOversized, qDocChunksRecursive,
    qPackSequences, qPadWaste, qDocBpeExact, qDocNfc)
}
