package graft.queries

import graft.functions.{Chunkers, PiiFunctions => PII, TextFunctions => TF}
import graft.operators.SearchOps
import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data governance inventory (EXT operators): PII
  * detection/redaction, eval-set contamination screening, and the
  * Gopher-style quality-rule battery. All per-row work is pure Catalyst
  * (codegen'd regex/HOF expressions, no UDFs); the one shuffle in the
  * family is the contamination equi-join on the n-gram key — the
  * linear-in-corpus shape that survives 100 TB (never all-pairs, no
  * broadcast of corpus-growing sides).
  */
object QualityQueries {

  import Exact._

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** PII scan: per-source counts of each PII class over documents with
    * deterministically woven PII spans (see [[PII.synthPii]] — the
    * corpus itself is PII-free). Narrow scan + one partial-agg shuffle
    * on `source`. */
  val qPiiScan: QueryDef = QueryDef.sql(
    "q_pii_scan",
    s"""WITH p AS (
       |  SELECT source, ${PII.synthPiiSql("doc_id", "text")} AS full_text
       |  FROM documents
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(${PII.countMatchesSql("full_text", PII.EmailPattern)}) AS BIGINT) AS n_email,
       |  CAST(SUM(${PII.countMatchesSql("full_text", PII.PhonePattern)}) AS BIGINT) AS n_phone,
       |  CAST(SUM(${PII.countMatchesSql("full_text", PII.SsnPattern)}) AS BIGINT) AS n_ssn,
       |  CAST(SUM(${PII.countMatchesSql("full_text", PII.Ipv4Pattern)}) AS BIGINT) AS n_ip
       |FROM p
       |GROUP BY source
       |ORDER BY source""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("source"), PII.synthPii(col("doc_id"), col("text")).as("full_text"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(PII.countMatches(col("full_text"), PII.EmailPattern)).cast("long").as("n_email"),
        sum(PII.countMatches(col("full_text"), PII.PhonePattern)).cast("long").as("n_phone"),
        sum(PII.countMatches(col("full_text"), PII.SsnPattern)).cast("long").as("n_ssn"),
        sum(PII.countMatches(col("full_text"), PII.Ipv4Pattern)).cast("long").as("n_ip"))
      .orderBy("source")
  }

  /** PII redaction: the typed-placeholder rewrite itself, row by row —
    * any divergence in match extents, replacement order, or global-flag
    * semantics between the engines breaks the hash. Per-row narrow
    * work; the LIMIT-shaped doc_id filter is pushed to the scan. */
  val qPiiRedact: QueryDef = QueryDef.sql(
    "q_pii_redact",
    s"""WITH p AS (
       |  SELECT doc_id, ${PII.synthPiiSql("doc_id", "text")} AS full_text
       |  FROM documents WHERE doc_id < 150
       |)
       |SELECT doc_id, ${PII.redactSql("full_text")} AS redacted
       |FROM p
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    docs(s, d).filter(col("doc_id") < 150)
      .select(col("doc_id"), PII.synthPii(col("doc_id"), col("text")).as("full_text"))
      .select(col("doc_id"), PII.redact(col("full_text")).as("redacted"))
      .orderBy("doc_id")
  }

  // ---- eval-set contamination -------------------------------------------

  /** n-gram size. The standard screen uses 13-grams (GPT-3 appendix C /
    * published decontamination practice); the synthetic docs are ≤~90
    * words of random short tokens, so 13-grams never collide across
    * docs — 3 keeps the operator shape while yielding a non-degenerate
    * overlap distribution at test scale. */
  val ContamN = 3

  private def ngrams(text: Column, n: Int): Column = {
    val words = split(text, " ")
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private def ngramsSql(parts: String, n: Int): String =
    s"list_transform(range(0, greatest(len($parts) - ${n - 1}, 0)), i -> array_to_string(($parts)[i+1:i+$n], ' '))"

  /** Eval-contamination screen: docs with doc_id%10=0 form the held-out
    * eval set; every remaining (train) doc is scored by how many of its
    * distinct n-grams appear anywhere in the eval set, with a ≥5-shared
    * contaminated flag. The candidate step is one equi-join on the
    * n-gram string against the distinct eval n-gram set — linear in
    * corpus n-grams, unhinted (the eval side grows with the eval
    * corpus; AQE may still pick a broadcast when it measures small). */
  val qContamination: QueryDef = QueryDef.sql(
    "q_contamination",
    s"""WITH parts_t AS (
       |  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
       |), g AS (
       |  SELECT doc_id, unnest(${ngramsSql("parts", ContamN)}) AS ng FROM parts_t
       |), ev AS (
       |  SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 0
       |), tr AS (
       |  SELECT DISTINCT doc_id, ng FROM g WHERE doc_id % 10 <> 0
       |)
       |SELECT tr.doc_id,
       |  COUNT(*) AS n_ngrams,
       |  CAST(SUM(CASE WHEN ev.ng IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |  CASE WHEN SUM(CASE WHEN ev.ng IS NOT NULL THEN 1 ELSE 0 END) >= 5 THEN 1 ELSE 0 END AS contaminated
       |FROM tr LEFT JOIN ev ON tr.ng = ev.ng
       |GROUP BY tr.doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val g = docs(s, d)
      .select(col("doc_id"), explode(ngrams(col("text"), ContamN)).as("ng"))
    val ev = g.filter(col("doc_id") % 10 === 0).select("ng").distinct()
      .withColumn("hit", lit(1))
    val tr = g.filter(col("doc_id") % 10 =!= 0).distinct()
    tr.join(ev, Seq("ng"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_shared"))
      .withColumn("contaminated", when(col("n_shared") >= 5, lit(1)).otherwise(lit(0)))
      .orderBy("doc_id")
  }

  // ---- Gopher-style quality rules ---------------------------------------

  /** Quality-rule battery in the style of the published Gopher/MassiveText
    * filters, adapted to a no-newline corpus (the line-shape rules
    * degenerate): word-count bounds, mean-word-length bounds,
    * alpha-word fraction, and a stopword floor, each surfaced as a 0/1
    * flag plus the combined pass bit. Exact-integer components; the two
    * ratios are IEEE divisions of exact BIGINTs (determinism contract).
    * Per-row narrow work — the only shuffle is the output ORDER BY. */
  val qGopherQuality: QueryDef = QueryDef.sql(
    "q_gopher_quality",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split(trim(text), ' ')) END AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
       |    CAST(len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
       |    ${TF.punctCountSql("text")} AS n_symbols,
       |    ${TF.stopwordCountSql("text")} AS n_stop
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, n_words, n_symbols, n_stop,
       |    CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_letters AS DOUBLE) / CAST(n_words AS DOUBLE) END AS mean_word_len,
       |    CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) END AS alpha_frac
       |  FROM m
       |)
       |SELECT doc_id, n_words, mean_word_len, alpha_frac, n_symbols, n_stop,
       |  CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1 ELSE 0 END AS f_words,
       |  CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 THEN 1 ELSE 0 END AS f_mwl,
       |  CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS f_alpha,
       |  CASE WHEN n_stop >= 1 THEN 1 ELSE 0 END AS f_stop,
       |  CASE WHEN n_words >= 10 AND n_words <= 100000
       |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |        AND alpha_frac >= 0.8 AND n_stop >= 1 THEN 1 ELSE 0 END AS passes
       |FROM r
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val words = split(trim(col("text")), " ")
    val m = docs(s, d).select(
      col("doc_id"),
      when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise(size(words).cast("long")).as("n_words"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("n_letters"),
      size(filter(split(col("text"), " "), w => w.rlike("[A-Za-z]"))).cast("long").as("n_alpha_words"),
      TF.punctCount(col("text")).as("n_symbols"),
      TF.stopwordCount(col("text")).as("n_stop"))
    val r = m.select(
      col("doc_id"), col("n_words"), col("n_symbols"), col("n_stop"),
      when(col("n_words") === 0, lit(0.0))
        .otherwise(col("n_letters").cast("double") / col("n_words").cast("double")).as("mean_word_len"),
      when(col("n_words") === 0, lit(0.0))
        .otherwise(col("n_alpha_words").cast("double") / col("n_words").cast("double")).as("alpha_frac"))
    val fWords = col("n_words") >= 10 && col("n_words") <= 100000
    val fMwl = col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0
    val fAlpha = col("alpha_frac") >= 0.8
    val fStop = col("n_stop") >= 1
    r.select(
      col("doc_id"), col("n_words"), col("mean_word_len"), col("alpha_frac"),
      col("n_symbols"), col("n_stop"),
      when(fWords, lit(1)).otherwise(lit(0)).as("f_words"),
      when(fMwl, lit(1)).otherwise(lit(0)).as("f_mwl"),
      when(fAlpha, lit(1)).otherwise(lit(0)).as("f_alpha"),
      when(fStop, lit(1)).otherwise(lit(0)).as("f_stop"),
      when(fWords && fMwl && fAlpha && fStop, lit(1)).otherwise(lit(0)).as("passes"))
      .orderBy("doc_id")
  }

  private val DsirBuckets = 64
  private val DsirScale = 1000000000L

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): featurize each
    * document as its bag of HASHED unigrams (`DsirBuckets` buckets —
    * the hashed-ngram trick that makes the feature space bounded no
    * matter the vocabulary), estimate a target distribution from the
    * `en` slice and the raw distribution from the whole corpus, and
    * score each document by how much more target-like than raw-like its
    * words are. The published scorer sums log-probability ratios;
    * transcendental logs are not bit-stable across engines, so the
    * score here is the exact-integer analog Σ(p̂_tgt − p̂_raw) with
    * probabilities floor-scaled to 10⁻⁹ units — same ordering intent,
    * hash-exact everywhere. Top-100 most target-like docs, doc_id
    * tie-break.
    *
    * Scale: one linear explode; bucket aggregations carry map-side
    * partial combine into a `DsirBuckets`-row table, so the weight
    * table is bounded by the BUCKET COUNT, not the vocabulary or the
    * corpus — broadcasting it is the legitimate case (contrast the
    * de-broadcast rule for corpus-growing model tables); per-doc score
    * is one shuffle on doc_id; top-k is TakeOrdered, never a global
    * sort. Arithmetic bound: `ct · DsirScale` must stay under 2⁶³, i.e.
    * ≲9·10⁹ words per bucket — so DsirBuckets is sized WITH the corpus
    * (the published method uses 10⁴ buckets at web scale, which lifts
    * the bound past 10¹⁴ words; 64 buckets is the sf-scale setting that
    * keeps the oracle readable). Spark's non-ANSI multiply would wrap
    * silently past the bound, DuckDB would error — size buckets first. */
  val qDsirScore: QueryDef = {
    val wordsSql = Chunkers.wordsSql(TF.cleanTextSql("text"))
    QueryDef.sql(
      "q_dsir_score",
      s"""WITH w AS (
         |  SELECT doc_id, lang, ${SearchOps.hashBucketSql("w", DsirBuckets)} AS b
         |  FROM (SELECT doc_id, lang, unnest($wordsSql) AS w FROM documents)
         |), tgt AS (
         |  SELECT b, COUNT(*) AS ct FROM w WHERE lang = 'en' GROUP BY b
         |), raw AS (
         |  SELECT b, COUNT(*) AS cr FROM w GROUP BY b
         |), tot AS (
         |  SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt, COUNT(*) AS tr
         |  FROM w
         |), wt AS (
         |  SELECT r.b,
         |    (COALESCE(t.ct, 0) * $DsirScale) // tot.tt AS pt,
         |    (r.cr * $DsirScale) // tot.tr AS pr
         |  FROM raw r LEFT JOIN tgt t ON t.b = r.b CROSS JOIN tot
         |)
         |SELECT doc_id, lang, CAST(SUM(wt.pt - wt.pr) AS BIGINT) AS score
         |FROM w JOIN wt ON wt.b = w.b
         |GROUP BY doc_id, lang
         |ORDER BY score DESC, doc_id
         |LIMIT 100""".stripMargin) { (s, d) =>
      val w = docs(s, d)
        .select(col("doc_id"), col("lang"),
          explode(Chunkers.words(TF.cleanText(col("text")))).as("w"))
        .select(col("doc_id"), col("lang"),
          SearchOps.hashBucket(col("w"), DsirBuckets).as("b"))
      val tgt = w.filter(col("lang") === "en").groupBy("b").agg(count(lit(1)).as("ct"))
      val raw = w.groupBy("b").agg(count(lit(1)).as("cr"))
      val tot = w.agg(
        sum(when(col("lang") === "en", 1).otherwise(0)).cast("long").as("tt"),
        count(lit(1)).as("tr"))
      val wt = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tot))
        .select(col("b"),
          expr(s"(coalesce(ct, 0L) * ${DsirScale}L) div tt").as("pt"),
          expr(s"(cr * ${DsirScale}L) div tr").as("pr"))
      w.join(broadcast(wt), Seq("b"))
        .groupBy("doc_id", "lang")
        .agg(sum(col("pt") - col("pr")).cast("long").as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(100)
    }
  }

  private val NegBuckets = 64
  private val NegPerAnchor = 2

  /** Deterministic CONTRASTIVE negative sampling: every document
    * (anchor) pairs with the representatives of the `NegPerAnchor`
    * hash-adjacent NON-EMPTY buckets — the uniform random-negative
    * baseline for contrastive embedding training (hard-negative mining
    * is the ANN path, [[SimilarityQueries]] `q_knn_*`). Bucketing is
    * the shared md5 hash, so the pairing is reproducible across
    * engines, partitionings and reruns — the property a training-data
    * pipeline needs so shuffling the corpus doesn't change the dataset.
    * Wrapping over the DENSE index of occupied buckets (not raw bucket
    * ids) guarantees exactly `NegPerAnchor` negatives per anchor even
    * when the hash leaves buckets empty; an anchor's own bucket is
    * never probed, so a negative is never the anchor itself.
    *
    * Scale: the representative table is bounded by the FIXED bucket
    * count (broadcast-legitimate, unlike corpus-growing domains), so
    * its dense-index window sorts ≤`NegBuckets` rows; the corpus-sized
    * anchor side is one narrow pass + broadcast joins — no per-row
    * rank, no corpus shuffle at all. */
  val qNegativePairs: QueryDef = QueryDef.sql(
    "q_negative_pairs",
    s"""WITH b AS (
       |  SELECT doc_id,
       |    ${SearchOps.hashBucketSql("CAST(doc_id AS VARCHAR)", NegBuckets)} AS bucket
       |  FROM documents
       |), reps AS (
       |  SELECT bucket, MIN(doc_id) AS neg_id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY bucket) - 1 AS BIGINT) AS idx
       |  FROM b GROUP BY bucket
       |), rn AS (
       |  SELECT COUNT(*) AS r FROM reps
       |), offs AS (
       |  SELECT unnest(range(1, ${NegPerAnchor + 1})) AS j
       |)
       |SELECT b.doc_id, CAST(offs.j AS BIGINT) AS j, r2.neg_id
       |FROM b
       |JOIN reps r1 ON r1.bucket = b.bucket
       |CROSS JOIN offs CROSS JOIN rn
       |JOIN reps r2 ON r2.idx = (r1.idx + offs.j) % rn.r
       |ORDER BY b.doc_id, j""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val b = docs(s, d).select(col("doc_id"),
      SearchOps.hashBucket(col("doc_id").cast("string"), NegBuckets).as("bucket"))
    val reps = b.groupBy("bucket").agg(min(col("doc_id")).as("neg_id"))
      .withColumn("idx",
        (row_number().over(Window.orderBy(col("bucket"))) - 1).cast("long"))
    val rn = reps.agg(count(lit(1)).as("r"))
    val offs = (1 to NegPerAnchor).map(lit(_))
    b.join(broadcast(reps.select(col("bucket"), col("idx").as("aidx"))), Seq("bucket"))
      .select(col("doc_id"), col("aidx"), explode(array(offs: _*)).as("ji"))
      .withColumn("j", col("ji").cast("long"))
      .crossJoin(broadcast(rn))
      .join(broadcast(reps.select(col("idx"), col("neg_id"))),
        col("idx") === (col("aidx") + col("j")) % col("r"))
      .select("doc_id", "j", "neg_id")
      .orderBy("doc_id", "j")
  }

  /** The CAPSTONE composition — the four stages every training-data
    * ingest chains, as ONE oracle-checked query: Gopher-style quality
    * gate (ratio rules in cross-multiplied form so neither engine ever
    * divides) → exact-dedup canonical survivor (min doc_id per cleaned
    * content hash, survivor's stats via min_by/arg_min) → deterministic
    * md5 shard assignment → per-shard manifest (count, token mass,
    * order-free XOR fingerprint — the line a downstream trainer checks
    * before reading a shard). Every stage is an existing library
    * primitive; what this pins is that they COMPOSE: one narrow pass,
    * one content-hash shuffle, one shard shuffle, end to end.
    *
    * Scale: filter is per-row narrow, dedup shuffles once on the
    * content hash, the report shuffles once on 8 shards with map-side
    * combine; nothing quadratic, nothing collected. */
  val qCorpusPipeline: QueryDef = QueryDef.sql(
    "q_corpus_pipeline",
    s"""WITH m AS (
       |  SELECT doc_id, text,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split(trim(text), ' ')) END AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
       |    CAST(len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
       |    ${TF.stopwordCountSql("text")} AS n_stop
       |  FROM documents
       |), pass AS (
       |  SELECT doc_id, text, n_words FROM m
       |  WHERE n_words >= 10 AND n_words <= 100000
       |    AND CAST(n_letters AS DOUBLE) >= 3.0 * CAST(n_words AS DOUBLE)
       |    AND CAST(n_letters AS DOUBLE) <= 10.0 * CAST(n_words AS DOUBLE)
       |    AND CAST(n_alpha_words AS DOUBLE) >= 0.8 * CAST(n_words AS DOUBLE)
       |    AND n_stop >= 1
       |), keep AS (
       |  SELECT MIN(doc_id) AS doc_id, arg_min(n_words, doc_id) AS n_words
       |  FROM pass
       |  GROUP BY md5(${TF.cleanTextSql("text")})
       |)
       |SELECT ${SearchOps.hashBucketSql("CAST(doc_id AS VARCHAR)", 8)} AS shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_words) AS BIGINT) AS sum_words,
       |  bit_xor(CAST(concat('0x', substring(md5(
       |    CAST(doc_id AS VARCHAR) || ':' || CAST(n_words AS VARCHAR)), 1, 15)) AS BIGINT)) AS fingerprint
       |FROM keep
       |GROUP BY shard
       |ORDER BY shard""".stripMargin) { (s, d) =>
    val m = docs(s, d).select(col("doc_id"), col("text"),
      when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("text")), " ")).cast("long")).as("n_words"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("n_letters"),
      size(filter(split(col("text"), " "), w => w.rlike("[A-Za-z]"))).cast("long").as("n_alpha_words"),
      TF.stopwordCount(col("text")).as("n_stop"))
    val pass = m.filter(
      col("n_words") >= 10 && col("n_words") <= 100000 &&
        col("n_letters").cast("double") >= lit(3.0) * col("n_words").cast("double") &&
        col("n_letters").cast("double") <= lit(10.0) * col("n_words").cast("double") &&
        col("n_alpha_words").cast("double") >= lit(0.8) * col("n_words").cast("double") &&
        col("n_stop") >= 1)
    val keep = pass
      .groupBy(md5(TF.cleanText(col("text"))).as("ch"))
      .agg(min(col("doc_id")).as("doc_id"), min_by(col("n_words"), col("doc_id")).as("n_words"))
    keep
      .select(SearchOps.hashBucket(col("doc_id").cast("string"), 8).as("shard"),
        col("doc_id"), col("n_words"),
        conv(substring(md5(concat_ws(":",
          col("doc_id").cast("string"), col("n_words").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sum_words"),
        expr("bit_xor(h)").as("fingerprint"))
      .orderBy("shard")
  }

  /** k-anonymity / l-diversity audit — the re-identification check run
    * before a dataset with quasi-identifiers is released (the privacy
    * tier's measurement half, beside [[qPiiScan]]/[[qPiiRedact]]'s
    * detection and TimeTravel.purge's erasure): group by the
    * quasi-identifier tuple (nation × market segment), report each
    * equivalence class's size, whether it breaks k=10 (any member is
    * re-identifiable within < k candidates), and the class's count of
    * DISTINCT sensitive values ($5000-bucketed balance) against l=3 —
    * a class can be k-anonymous yet leak the sensitive value when
    * everyone in it shares one (that is what l-diversity catches).
    *
    * Scale: one groupBy on the QI tuple with a fused count-distinct —
    * O(classes) output, single shuffle, no row ever leaves the
    * executor. */
  val qKAnonymity: QueryDef = QueryDef.sql(
    "q_k_anonymity",
    """SELECT c_nationkey AS nation, c_mktsegment AS segment,
      |  COUNT(*) AS n,
      |  COUNT(*) < 10 AS k_violated,
      |  COUNT(DISTINCT (CAST(ROUND(c_acctbal * 100.0) AS BIGINT) + 100000) // 500000) AS n_sensitive,
      |  COUNT(DISTINCT (CAST(ROUND(c_acctbal * 100.0) AS BIGINT) + 100000) // 500000) < 3 AS l_violated
      |FROM customer
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables(s, d, "customer")
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        expr("(cast(round(c_acctbal * 100.0) as bigint) + 100000) div 500000").as("sens"))
      .groupBy("nation", "segment")
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) < 10).as("k_violated"),
        countDistinct(col("sens")).as("n_sensitive"),
        (countDistinct(col("sens")) < 3).as("l_violated"))
      .orderBy("nation", "segment")
  }

  /** Keyed PSEUDONYMIZATION with referential integrity — the GDPR
    * pseudonymization pattern (recital 28 shape): natural keys on both
    * sides of a relationship are replaced by a keyed hash
    * (pepper ∥ key → md5), the raw key is dropped, and the analytics
    * join runs ON THE TOKENS. The oracle computes the same report from
    * the RAW-key join, so hash equality proves tokenization preserved
    * the join structure exactly (same token function ⟹ same equality
    * classes — the whole point of deterministic pseudonymization); the
    * token-distinct count per nation additionally pins the absence of
    * collisions at this scale.
    *
    * Scale: tokenization is a narrow codegen'd projection (md5);
    * the join shuffles on the token exactly as it would on the key —
    * pseudonymizing costs nothing structurally. */
  val qPseudonymize: QueryDef = QueryDef.sql(
    "q_pseudonymize",
    """WITH a AS (
      |  SELECT md5('pepper-2024:' || CAST(c_custkey AS VARCHAR)) AS token,
      |    c_nationkey
      |  FROM customer
      |), b AS (
      |  SELECT md5('pepper-2024:' || CAST(o_custkey AS VARCHAR)) AS token,
      |    CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents
      |  FROM orders
      |)
      |SELECT c.c_nationkey AS nation,
      |  COUNT(o.o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  (SELECT COUNT(DISTINCT a.token) FROM a
      |     WHERE a.c_nationkey = c.c_nationkey) AS n_tokens
      |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_nationkey
      |ORDER BY nation""".stripMargin) { (s, d) =>
    val pepper = "pepper-2024:"
    val a = Tables(s, d, "customer")
      .select(md5(concat(lit(pepper), col("c_custkey").cast("string"))).as("token"),
        col("c_nationkey").cast("long").as("nation"))
    val b = Tables(s, d, "orders")
      .select(md5(concat(lit(pepper), col("o_custkey").cast("string"))).as("token"),
        units(col("o_totalprice"), 2).as("cents"))
    val joined = a.join(b, Seq("token"))
      .groupBy("nation")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
    val tokens = a.groupBy("nation").agg(countDistinct(col("token")).as("n_tokens"))
    joined.join(tokens, Seq("nation"))
      .select(col("nation"), col("n_orders"), col("sum_cents"), col("n_tokens"))
      .orderBy("nation")
  }

  /** C4-style LINE-level page cleaning (Raffel et al. 2020 §2.2) — the
    * rule tier below the doc-level Gopher battery: pages are cleaned
    * line by line (drop boilerplate lines mentioning javascript/cookie,
    * lines under 5 words, lines without terminal punctuation, repeated
    * lines keep-first) and only then reassembled. The corpus has no
    * line structure, so each doc is paged deterministically (6-word
    * lines from the cleaned words) with every failure class woven in by
    * (doc_id + line) residues: full boilerplate lines, 3-word
    * truncations, a repeated per-doc line, and punctuation-free lines —
    * identical weaving in both engines, like the PII spans. Output per
    * doc: the per-rule drop counts (each line is classified by its
    * FIRST failing rule, in C4's order) and the md5 of the reassembled
    * cleaned page, so a single line kept or dropped differently breaks
    * the hash.
    *
    * Scale: one narrow explode per doc (O(lines)), a (doc_id, line)
    * window for keep-first dedup that shuffles on doc_id, and the final
    * doc_id aggregate riding the same partitioning — no joins, no
    * corpus-wide state. */
  val qDocC4: QueryDef = QueryDef.sql(
    "q_doc_c4",
    s"""WITH d0 AS (
       |  SELECT doc_id, ${Chunkers.wordsSql(TF.cleanTextSql("text"))} AS wds
       |  FROM documents
       |), ln AS (
       |  SELECT doc_id, i,
       |    CASE WHEN (doc_id + i) % 11 = 0
       |           THEN 'please enable javascript and accept cookies to continue.'
       |         WHEN (doc_id + i) % 13 = 0
       |           THEN array_to_string(wds[i*6+1 : i*6+3], ' ') || '.'
       |         WHEN (doc_id + i) % 7 = 3
       |           THEN array_to_string(wds[1 : 6], ' ') || '.'
       |         WHEN (doc_id + i) % 3 = 2
       |           THEN array_to_string(wds[i*6+1 : i*6+6], ' ')
       |         ELSE array_to_string(wds[i*6+1 : i*6+6], ' ') || '.' END AS line
       |  FROM d0, LATERAL (SELECT unnest(range(0, GREATEST((len(wds) + 5) // 6, 1))) AS i)
       |), fl AS (
       |  SELECT doc_id, i, line,
       |    (line LIKE '%javascript%' OR line LIKE '%cookie%') AS boiler,
       |    len(string_split(line, ' ')) AS wc,
       |    (line LIKE '%.') AS haspunct,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id, line ORDER BY i) AS rn
       |  FROM ln
       |), cls AS (
       |  SELECT doc_id, i, line,
       |    CASE WHEN boiler THEN 'boiler'
       |         WHEN wc < 5 THEN 'short'
       |         WHEN NOT haspunct THEN 'nopunct'
       |         WHEN rn > 1 THEN 'dup'
       |         ELSE 'kept' END AS cls
       |  FROM fl
       |)
       |SELECT doc_id, COUNT(*) AS n_lines,
       |  CAST(SUM(CASE WHEN cls = 'boiler' THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  CAST(SUM(CASE WHEN cls = 'short' THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       |  CAST(SUM(CASE WHEN cls = 'nopunct' THEN 1 ELSE 0 END) AS BIGINT) AS n_nopunct,
       |  CAST(SUM(CASE WHEN cls = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(SUM(CASE WHEN cls = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  md5(COALESCE(string_agg(CASE WHEN cls = 'kept' THEN line END, chr(10) ORDER BY i), ''))
       |    AS clean_md5
       |FROM cls
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val paged = docs(s, d)
      .withColumn("wds", Chunkers.words(TF.cleanText(col("text"))))
      .select(col("doc_id"), col("wds"),
        explode(sequence(lit(0),
          greatest(expr("(size(wds) + 5) div 6"), lit(1)) - 1)).as("i"))
    val key = (col("doc_id") + col("i"))
    val line = paged.withColumn("line",
      when(key % 11 === 0,
          lit("please enable javascript and accept cookies to continue."))
        .when(key % 13 === 0,
          concat(array_join(slice(col("wds"), col("i") * 6 + 1, lit(3)), " "), lit(".")))
        .when(key % 7 === 3,
          concat(array_join(slice(col("wds"), 1, 6), " "), lit(".")))
        .when(key % 3 === 2,
          array_join(slice(col("wds"), col("i") * 6 + 1, lit(6)), " "))
        .otherwise(
          concat(array_join(slice(col("wds"), col("i") * 6 + 1, lit(6)), " "), lit("."))))
      .select("doc_id", "i", "line")
    val cls = line
      .withColumn("boiler",
        col("line").contains("javascript") || col("line").contains("cookie"))
      .withColumn("wc", size(split(col("line"), " ")))
      .withColumn("haspunct", col("line").endsWith("."))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"), col("line")).orderBy(col("i"))))
      .withColumn("cls",
        when(col("boiler"), "boiler")
          .when(col("wc") < 5, "short")
          .when(!col("haspunct"), "nopunct")
          .when(col("rn") > 1, "dup")
          .otherwise("kept"))
    cls.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("cls") === "boiler", 1).otherwise(0)).as("n_boiler"),
        sum(when(col("cls") === "short", 1).otherwise(0)).as("n_short"),
        sum(when(col("cls") === "nopunct", 1).otherwise(0)).as("n_nopunct"),
        sum(when(col("cls") === "dup", 1).otherwise(0)).as("n_dup"),
        sum(when(col("cls") === "kept", 1).otherwise(0)).as("n_kept"),
        md5(array_join(
          transform(
            array_sort(collect_list(
              when(col("cls") === "kept", struct(col("i"), col("line"))))),
            r => r.getField("line")),
          "\n")).as("clean_md5"))
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(qPiiScan, qPiiRedact, qContamination, qGopherQuality,
    qDsirScore, qNegativePairs, qCorpusPipeline, qKAnonymity, qPseudonymize, qDocC4)
}
