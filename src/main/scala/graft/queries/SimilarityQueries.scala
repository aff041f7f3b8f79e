package graft.queries

import graft.functions.Similarity
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.4 J-sim,
  * §2.11-9; EXT north-star ANN surface).
  *
  * Exact brute-force cosine top-k is the correctness baseline; IVF-style
  * centroid-routed search is the scale path (probe the best partition
  * instead of scanning the corpus — at 100 TB the per-query work drops
  * from O(N) to O(N/partitions), and candidate routing is a broadcast
  * join against a tiny centroid table).
  *
  * Determinism: per-row array folds are order-stable in both engines;
  * centroids (cross-row sums of floats) are quantized to exact integer
  * units (round(v·2²⁰)) before summation so partial-aggregation order
  * cannot perturb them.
  */
object SimilarityQueries {

  private val Dim = 64
  private val NQueries = 5 // vec_id < 5 are the query vectors

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))

  private def topkSql(filterExtra: String, k: Int): String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, label AS qlabel, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id < $NQueries
       |), t AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), scored AS (
       |  SELECT qid, vec_id, ${Similarity.cosineSql("qe", "e")} AS sim
       |  FROM q, t
       |  WHERE vec_id <> qid $filterExtra
       |)
       |SELECT qid, vec_id, sim, rk FROM (
       |  SELECT qid, vec_id, sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rk
       |  FROM scored
       |) WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin

  /** Top-k per query id. A `PARTITION BY qid` window with tiny Q looks
    * like a Q-reducer funnel, but Spark ≥3.5 plans a
    * `WindowGroupLimit(..., Partial)` BEFORE the exchange — each map
    * task forwards at most k rows per qid, so the reducer sees
    * O(k·maps), never the full N·Q scored rows. PlanSpec asserts the
    * partial group limit is present (a manual bucket-then-merge phase
    * was tried and only added a redundant extra shuffle). */
  private def topK(scored: DataFrame, k: Int, extraCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("qid" +: extraCols :+ "vec_id" :+ "sim" :+ "rk" map col: _*)
      .orderBy("qid", "rk")
  }

  private def topkSpark(s: SparkSession, d: String, sameLabel: Boolean, k: Int): DataFrame = {
    val all = emb(s, d)
    val q = all.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("e").as("qe"))
    val joined =
      if (sameLabel)
        all.join(broadcast(q), col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      else
        all.join(broadcast(q), col("vec_id") =!= col("qid"))
    topK(joined.withColumn("sim", Similarity.cosineIn(s, col("qe"), col("e"))), k, Nil)
  }

  /** Exact brute-force cosine top-10 for 5 query vectors. */
  val qKnnBrute: QueryDef = QueryDef.sql(
    "q_knn_bruteforce", topkSql("", 10)) { (s, d) => topkSpark(s, d, sameLabel = false, 10) }

  /** Label-filtered variant (predicate pushdown shrinks the candidate
    * set before any distance math). */
  val qKnnFiltered: QueryDef = QueryDef.sql(
    "q_knn_filtered", topkSql("AND t.label = q.qlabel", 10)) { (s, d) =>
    topkSpark(s, d, sameLabel = true, 10)
  }

  /** Embedding-cosine near-dup via random-hyperplane LSH (Charikar '02):
    * sign-bit signature → banded buckets → equi-join candidates → exact
    * cosine rescore, top-20.
    *
    * Scale posture: candidate generation is a shuffle on the band key —
    * linear in corpus size, never all-pairs (the round-1 version's
    * `vec_a < vec_b` theta join materialized O(N²) rows). Bands/bits are
    * the recall/selectivity dial: 4 bands × 4 bits here; a 100 TB corpus
    * raises bits-per-band to shrink buckets.
    *
    * Determinism: hyperplane weights are md5-derived integer literals
    * baked into BOTH plans at build time, and each sign bit is the sign
    * of Σ round(e[p]·2²⁰)·w[p] — an exact-integer dot whose value (hence
    * the bucketing) is engine- and order-independent. */
  private val LshBits = 16
  private val LshBands = 4
  private val BitsPerBand = LshBits / LshBands
  /** w(j)(p) ∈ [-32768, 32767]: first 2 md5 bytes of "lsh:j:p" − 2¹⁵. */
  private lazy val lshPlanes: IndexedSeq[IndexedSeq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(LshBits, Dim) { (j, p) =>
      md.reset()
      val h = md.digest(s"lsh:$j:$p".getBytes("UTF-8"))
      (((h(0) & 0xff) << 8 | (h(1) & 0xff)) - 32768).toLong
    }
  }

  val qEmbedNearDup: QueryDef = {
    def planeSqlLit(j: Int): String = lshPlanes(j).mkString("[", ", ", "]")
    // exact-integer dot of quantized embedding uq with plane j
    def dotSql(j: Int) =
      s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> uq[i] * (${planeSqlLit(j)})[i]), (x, y) -> x + y)"
    def bandSql(b: Int): String =
      (0 until BitsPerBand).map(r => s"(CASE WHEN ${dotSql(b * BitsPerBand + r)} >= 0 THEN '1' ELSE '0' END)")
        .mkString(s"'$b:' || ", " || ", "")
    QueryDef.sql(
      "q_embed_neardup",
      s"""WITH t AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), u AS (
         |  SELECT vec_id, list_transform(e, v -> CAST(ROUND(v * 1048576.0) AS BIGINT)) AS uq
         |  FROM t
         |), bands AS (
         |  SELECT vec_id, unnest([${(0 until LshBands).map(bandSql).mkString(",\n    ")}]) AS band
         |  FROM u
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.vec_id < b.vec_id
         |)
         |SELECT vec_a, vec_b, ${Similarity.cosineSql("ta.e", "tb.e")} AS sim
         |FROM cand
         |JOIN t ta ON ta.vec_id = vec_a
         |JOIN t tb ON tb.vec_id = vec_b
         |ORDER BY sim DESC, vec_a, vec_b
         |LIMIT 20""".stripMargin) { (s, d) =>
      val t = emb(s, d).select(col("vec_id"), col("e"))
      val uq = transform(col("e"), v => round(v * 1048576.0d).cast("long"))
      def dot(j: Int): Column =
        aggregate(zip_with(col("uq"), typedLit(lshPlanes(j)), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v)
      def band(b: Int): Column =
        concat(lit(s"$b:") +: (0 until BitsPerBand).map(r =>
          when(dot(b * BitsPerBand + r) >= 0, "1").otherwise("0")): _*)
      val banded = t.withColumn("uq", uq)
        .select(col("vec_id"), explode(array((0 until LshBands).map(band): _*)).as("band"))
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
      cand
        .join(t.select(col("vec_id").as("vec_a"), col("e").as("ea")), Seq("vec_a"))
        .join(t.select(col("vec_id").as("vec_b"), col("e").as("eb")), Seq("vec_b"))
        .select(col("vec_a"), col("vec_b"), Similarity.cosineIn(s, col("ea"), col("eb")).as("sim"))
        .orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
        .limit(20)
    }
  }

  /** IVF-style routed search: label partitions act as coarse cells.
    * Quantized-integer centroids per label → route each query to its
    * best cell (exact-int scoring) → exact cosine top-5 within the cell.
    */
  val qKnnIvf: QueryDef = ivfQuery("q_knn_ivf", probes = 1)

  /** Multi-probe IVF: probe the TOP-2 cells per query instead of one —
    * the standard recall dial (probes ≪ cells keeps per-query work
    * O(probes·N/cells); cells are disjoint so candidates never
    * duplicate). */
  val qKnnIvfProbe2: QueryDef = ivfQuery("q_knn_ivf_probe2", probes = 2)

  private def ivfQuery(name: String, probes: Int): QueryDef =
    QueryDef.sql(name, ivfSql(probes)) { (s, d) => ivfSpark(s, d, probes) }

  private def ivfSql(probes: Int): String =
    s"""WITH comp AS (
       |  SELECT vec_id, label,
       |    unnest(range(0, $Dim)) AS pos,
       |    unnest(CAST(embedding AS DOUBLE[])) AS v
       |  FROM embeddings
       |), cent AS (
       |  SELECT label, pos,
       |    CAST(SUM(CAST(ROUND(v * 1048576.0) AS BIGINT)) AS BIGINT) AS s_units
       |  FROM comp GROUP BY label, pos
       |), cnorm AS (
       |  SELECT label, CAST(SUM(s_units * s_units) AS BIGINT) AS sq
       |  FROM cent GROUP BY label
       |), qcomp AS (
       |  SELECT vec_id AS qid, pos, v AS qv FROM comp WHERE vec_id < $NQueries
       |), routed AS (
       |  SELECT qid, label, score, CAST(ROW_NUMBER() OVER (
       |      PARTITION BY qid ORDER BY score DESC, label) AS BIGINT) AS crk
       |  FROM (
       |    SELECT q.qid, c.label,
       |      CAST(SUM(CAST(ROUND(q.qv * c.s_units) AS BIGINT)) AS DOUBLE) /
       |        sqrt(CAST(n.sq AS DOUBLE)) AS score
       |    FROM qcomp q
       |    JOIN cent c ON q.pos = c.pos
       |    JOIN cnorm n ON n.label = c.label
       |    GROUP BY q.qid, c.label, n.sq
       |  )
       |), best AS (
       |  SELECT qid, label AS best_label FROM routed WHERE crk <= $probes
       |), q AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id < $NQueries
       |), cand AS (
       |  SELECT b.qid, t.vec_id, b.best_label,
       |    ${Similarity.cosineSql("q.qe", "CAST(t.embedding AS DOUBLE[])")} AS sim
       |  FROM best b
       |  JOIN embeddings t ON t.label = b.best_label
       |  JOIN q ON q.qid = b.qid
       |  WHERE t.vec_id <> b.qid
       |)
       |SELECT qid, best_label, vec_id, sim, rk FROM (
       |  SELECT qid, best_label, vec_id, sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rk
       |  FROM cand
       |) WHERE rk <= 5
       |ORDER BY qid, rk""".stripMargin

  private def ivfSpark(s: SparkSession, d: String, probes: Int): DataFrame = {
    val all = emb(s, d)
    val comp = all.select(col("vec_id"), col("label"),
      posexplode(col("e")).as(Seq("pos", "v")))
    val cent = comp.groupBy(col("label"), col("pos"))
      .agg(sum(round(col("v") * 1048576.0d).cast("long")).as("s_units"))
    val cnorm = cent.groupBy(col("label"))
      .agg(sum(col("s_units") * col("s_units")).as("sq"))
    val qcomp = comp.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("pos"), col("v").as("qv"))
    val scored = qcomp
      .join(broadcast(cent), Seq("pos"))
      .join(broadcast(cnorm), Seq("label"))
      .groupBy(col("qid"), col("label"), col("sq"))
      .agg(sum(round(col("qv") * col("s_units")).cast("long")).as("dot_units"))
      .select(col("qid"), col("label"),
        (col("dot_units").cast("double") / sqrt(col("sq").cast("double"))).as("score"))
    val wRoute = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("label"))
    val best = scored.withColumn("crk", row_number().over(wRoute))
      .filter(col("crk") <= probes)
      .select(col("qid"), col("label").as("best_label"))
    val q = all.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val cand = all.join(broadcast(best), col("label") === col("best_label"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("sim", Similarity.cosineIn(s, col("qe"), col("e")))
    topK(cand, 5, Seq("best_label"))
  }

  /** K-MEANS-trained IVF: unlike [[qKnnIvf]]'s label cells, the coarse
    * quantizer here is LEARNED — `KmCells` Lloyd centroids from
    * `KmIters` iterations expressed entirely in DataFrame ops (assign =
    * integer argmin over a broadcast centroid join; update = per-cell
    * component means), then kNN searches only the query's final cell.
    *
    * Cross-engine determinism: vectors quantize ONCE to 2²⁰ integer
    * units; distances are integer sums of squared unit deltas (order-
    * free), centroid means round back to the unit grid (scale-0 round
    * of an exact-integer ratio — both engines agree), argmin ties break
    * on cell id, and init is the first `KmCells` vectors by vec_id. So
    * the whole training trajectory is bit-reproducible in Spark AND
    * DuckDB. At 100 TB: assignment is a broadcast join (centroid table
    * is KmCells·dim rows), update is one shuffle per iteration on the
    * cell id — the standard distributed Lloyd shape. */
  private val KmCells = 8
  private val KmIters = 2

  /** WITH-clause body of the shared deterministic Lloyd trainer (see the
    * q_knn_kmeans scaladoc for the bit-reproducibility argument): ends
    * at CTE `assign$KmIters` = (vec_id, cid). Shared by q_knn_kmeans and
    * q_semdedup so both engines train the identical quantizer. */
  private def kmeansCtes: String = {
    def iterCtes(i: Int, prevCent: String): String =
      s"""dist$i AS (
         |  SELECT comp.vec_id, c.cid,
         |    SUM((comp.uq - c.c) * (comp.uq - c.c)) AS d
         |  FROM comp JOIN $prevCent c ON comp.pos = c.pos
         |  GROUP BY comp.vec_id, c.cid
         |), assign$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         |    FROM dist$i) WHERE rn = 1
         |), cent$i AS (
         |  SELECT a.cid, comp.pos,
         |    CAST(ROUND(CAST(SUM(comp.uq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c
         |  FROM comp JOIN assign$i a ON comp.vec_id = a.vec_id
         |  GROUP BY a.cid, comp.pos
         |)""".stripMargin
    val iters = (1 to KmIters)
      .map(i => iterCtes(i, if (i == 1) "cent0" else s"cent${i - 1}"))
      .mkString(", ")
    s"""comp AS (
       |  SELECT vec_id, unnest(range(0, $Dim)) AS pos,
       |    CAST(ROUND(unnest(CAST(embedding AS DOUBLE[])) * 1048576.0) AS BIGINT) AS uq
       |  FROM embeddings
       |), cent0 AS (
       |  SELECT vec_id AS cid, pos, uq AS c FROM comp WHERE vec_id < $KmCells
       |), $iters""".stripMargin
  }
  private def kmeansLastAssign: String = s"assign$KmIters"

  /** Pack a (cid, pos, c) centroid table into one (cid, carr) array row
    * per centroid, carr ordered by pos — the K-bounded broadcast shape
    * the array-form assignment consumes. Exchanges here carry ≤ K·Dim
    * rows, never the corpus. */
  private def packCent(centLong: DataFrame, cidCol: String): DataFrame =
    centLong.groupBy(col(cidCol))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("carr"))

  /** Quantize an embedding to the 2²⁰ integer grid, packed:
    * round(vᵢ·2²⁰) per element. Fused codegen'd kernel when the
    * extension is loaded ([[graft.expressions.QuantizeGrid]] — the
    * composed `transform` pays an interpreted lambda + BigDecimal
    * `round` per element); bit-identical either way. */
  private def quantizeIn(s: SparkSession, e: Column): Column =
    if (s.catalog.functionExists("graft_quantize")) call_function("graft_quantize", e)
    else transform(e, v => round(v * lit(1048576.0d)).cast("long"))

  /** argmin over the packed centroid array — [[Similarity.argminCid]]
    * (fused kernel or composed HOF, bit-identical); the pack always
    * carries its id under the field name `cid`. */
  private def argminCidIn(s: SparkSession, uq: Column, cents: Column): Column =
    Similarity.argminCid(s, uq, cents)

  /** Spark face of the same trainer: (comp, assign, cent) after
    * `KmIters` Lloyd rounds on the 2²⁰ integer grid.
    *
    * r16 (VERDICT r15 #4, guide §2.3/§2.4/§1.2): ONE corpus-bearing
    * shuffle per Lloyd iteration. The r15 shape ran each iteration as
    * dist-join → groupBy(vec_id,cid) exchange → window exchange →
    * assign-join (corpus SMJ on vec_id) → groupBy(cid,pos) exchange —
    * three corpus-keyed exchanges plus an N·Dim·K exploded join. Now
    * vectors stay PACKED (vec_id, uq array): assignment is a narrow
    * map against the K-bounded packed centroid broadcast (argmin via
    * the fused graft_sqdist kernel — no exchange at all), and the
    * centroid update is the single surviving exchange, hash-partitioned
    * on (cid,pos) with map-side partial aggregation so only K·Dim
    * partial rows per task cross the wire. Values are bit-identical:
    * exact integer distances (any order), the same (d, cid) argmin
    * tie-break, the same ROUND(sum/count) update — asserted by the
    * unchanged oracle SQL.
    *
    * r15's loop-exit pins stay: the final assign/cent are
    * localCheckpoint'ed so consumers referencing them 2-4× never
    * re-expand the training lineage. */
  private def kmeansTrain(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // quantize ONCE, keep vectors packed; pinned because the trainer
    // walks it KmIters×2 times and consumers read comp below
    val vecs = emb(s, d)
      .select(col("vec_id"), quantizeIn(s, col("e")).as("uq"))
      .localCheckpoint()
    // legacy exploded shape for consumers (qKnnIvfPq residuals/routing):
    // a NARROW expansion of the pinned vecs, no second materialization
    val comp = vecs.select(col("vec_id"), posexplode(col("uq")).as(Seq("pos", "uq")))
    var centArr = vecs.filter(col("vec_id") < KmCells)
      .select(col("vec_id").as("cid"), col("uq").as("carr"))
    var assign: DataFrame = null
    var cent: DataFrame = null
    for (i <- 1 to KmIters) {
      // K rows → 1 packed row (bounded funnel, same cardinality a
      // BroadcastExchange would funnel); sort_array keys the pack by cid
      val packed = centArr
        .agg(sort_array(collect_list(struct(col("cid"), col("carr")))).as("cents"))
      val av = vecs.crossJoin(broadcast(packed))
        .withColumn("cid", argminCidIn(s, col("uq"), col("cents")))
        // empty-centroid guard: argmin over an empty pack is null; the
        // legacy exploded join produced NO row there — drop, don't null
        .filter(col("cid").isNotNull)
        .select(col("vec_id"), col("uq"), col("cid"))
      val centLong = av
        .select(col("cid"), posexplode(col("uq")).as(Seq("pos", "uq")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(sum(col("uq")).cast("double") / count(lit(1)).cast("double"))
          .cast("long").as("c"))
      if (i == KmIters) {
        assign = av.select("vec_id", "cid").localCheckpoint()
        // LAZY pin: two of the three consumers (q_knn_kmeans,
        // q_semdedup) never touch cent — an eager pin would bill them
        // a wasted materialization job; q_knn_ivfpq still gets the
        // pinned table on first reference and its later references
        // read the pin
        cent = centLong.localCheckpoint(eager = false)
      } else {
        // pin the ITERATION BOUNDARY: K packed rows. Without it the two
        // final-exit pins (assign, cent) each re-evaluate this
        // iteration's whole corpus aggregation through the lazy lineage;
        // with it a re-evaluation is one narrow pass over pinned vecs.
        // (This is NOT the r15-rejected per-iterate pin — that pinned
        // corpus-sized assign tables; this pins K·Dim values.)
        centArr = packCent(centLong, "cid").localCheckpoint()
      }
    }
    (comp, assign, cent, vecs)
  }

  private def kmeansAssign(s: SparkSession, d: String): DataFrame =
    kmeansTrain(s, d)._2

  val qKnnKmeans: QueryDef = {
    val last = kmeansLastAssign
    QueryDef.sql(
      "q_knn_kmeans",
      s"""WITH $kmeansCtes, t AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), cand AS (
         |  SELECT q.vec_id AS qid, v.vec_id,
         |    ${Similarity.cosineSql("qt.e", "vt.e")} AS sim
         |  FROM $last q
         |  JOIN $last v ON v.cid = q.cid AND v.vec_id <> q.vec_id
         |  JOIN t qt ON qt.vec_id = q.vec_id
         |  JOIN t vt ON vt.vec_id = v.vec_id
         |  WHERE q.vec_id < $NQueries
         |)
         |SELECT qid, vec_id, sim, rk FROM (
         |  SELECT qid, vec_id, sim,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rk
         |  FROM cand
         |) WHERE rk <= 5
         |ORDER BY qid, rk""".stripMargin) { (s, d) =>
      val assign = kmeansAssign(s, d)
      val t = emb(s, d).select(col("vec_id"), col("e"))
      val q = assign.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("cid"))
      val cand = assign.join(broadcast(q), Seq("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .join(t.select(col("vec_id").as("qid"), col("e").as("qe")), Seq("qid"))
        .join(t, Seq("vec_id"))
        .withColumn("sim", Similarity.cosineIn(s, col("qe"), col("e")))
      topK(cand, 5, Nil)
    }
  }

  /** Threshold tuned to this corpus: the global max pairwise cosine at
    * sf0.01 is ~0.51, so 0.35 marks the "semantically close" tail (the
    * published method also tunes ε per corpus, to a within-cluster
    * similarity percentile). */
  private val SemTau = 0.35

  /** SEMANTIC dedup (SemDeDup, Abbas et al. 2023): cluster the
    * embedding space with the shared k-means quantizer, then drop every
    * vector that has a LOWER-ID near-neighbor above cosine `SemTau`
    * WITHIN ITS CLUSTER — the lowest id in each semantic near-dup set
    * survives (the q_dedup_exact_keep convention). Output is a
    * per-cluster audit: member count, dropped count, and the exact
    * kept-membership checksum.
    *
    * Scale shape — the reason SemDeDup exists at all: candidate pairs
    * are confined to a cluster, so the quadratic term is bounded by the
    * LARGEST CLUSTER, not the corpus. Cluster count grows with the
    * corpus (k ∝ N/target-cell-size, exactly how [[graft.sources.VectorIndex]]
    * sizes cells), keeping per-cluster membership roughly constant; the
    * pair join shuffles once on cid and is never corpus×corpus. The
    * training cost is the same one-shuffle-per-iteration Lloyd as
    * q_knn_kmeans. No broadcast hints on the pair join — both sides
    * grow with the corpus. */
  val qSemdedup: QueryDef = QueryDef.sql(
    "q_semdedup",
    s"""WITH $kmeansCtes, t AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), m AS (
       |  SELECT a.vec_id, a.cid, t.e
       |  FROM $kmeansLastAssign a JOIN t ON t.vec_id = a.vec_id
       |), dup AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ${Similarity.cosineSql("a.e", "b.e")} > $SemTau
       |)
       |SELECT m.cid, COUNT(*) AS n_members,
       |  CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped,
       |  CAST(SUM(CASE WHEN d.vec_id IS NULL THEN m.vec_id ELSE 0 END) AS BIGINT) AS kept_sum
       |FROM m LEFT JOIN dup d ON d.vec_id = m.vec_id
       |GROUP BY m.cid
       |ORDER BY m.cid""".stripMargin) { (s, d) =>
    val m = kmeansAssign(s, d)
      .join(emb(s, d).select(col("vec_id"), col("e")), Seq("vec_id"))
    val dup = m.as("a")
      .join(m.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(Similarity.cosineIn(s, col("a.e"), col("b.e")) > SemTau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    m.join(dup.withColumn("isdup", lit(1)), Seq("vec_id"), "left")
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n_members"),
        count(col("isdup")).cast("long").as("n_dropped"),
        sum(when(col("isdup").isNull, col("vec_id")).otherwise(lit(0L)))
          .cast("long").as("kept_sum"))
      .orderBy("cid")
  }

  private val PqSubs = 4
  private val PqSubDim = Dim / PqSubs
  private val PqK = 4
  private val PqIters = 2

  /** PRODUCT quantization (Jégou et al., PAMI '11): split each
    * embedding into `PqSubs` contiguous subvectors and run the shared
    * deterministic Lloyd recipe INDEPENDENTLY per subspace — a vector
    * compresses to `PqSubs` centroid codes (log₂K bits each, vs
    * Dim·4 bytes of floats), the memory trick behind IVF-PQ indexes.
    * Output: per-vector code word + exact integer reconstruction error
    * for the first 50 vectors.
    *
    * Scale: all `PqSubs` trainings ride ONE set of shuffles — the
    * subspace id is just another grouping key, so cost matches a single
    * k-means, not M of them. Assignment joins a broadcast centroid
    * table bounded by K·Dim (never corpus-growing); codes/error are one
    * groupBy on vec_id.
    *
    * Determinism: identical to q_knn_kmeans — 2²⁰ integer grid, exact
    * integer squared distances, argmin ties on cid, means rounded back
    * to the grid; init is subvectors of the first `PqK` vectors. */
  /** WITH-clause body of the per-subspace Lloyd trainer: CTEs `scomp`
    * (vec_id, pos, sub, uq) through `passign$PqIters` / `pcent$PqIters`.
    * Shared by q_embed_pq and q_knn_pq so both engines train the
    * identical product quantizer. */
  private def pqCtes: String = {
    def iterCtes(i: Int, prevCent: String): String =
      s"""pdist$i AS (
         |  SELECT s.vec_id, s.sub, c.cid, SUM((s.uq - c.c) * (s.uq - c.c)) AS d
         |  FROM scomp s JOIN $prevCent c ON s.pos = c.pos
         |  GROUP BY s.vec_id, s.sub, c.cid
         |), passign$i AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT vec_id, sub, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
         |    FROM pdist$i) WHERE rn = 1
         |), pcent$i AS (
         |  SELECT a.cid, s.pos,
         |    CAST(ROUND(CAST(SUM(s.uq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c
         |  FROM scomp s JOIN passign$i a ON s.vec_id = a.vec_id AND s.sub = a.sub
         |  GROUP BY a.cid, s.pos
         |)""".stripMargin
    val iters = (1 to PqIters)
      .map(i => iterCtes(i, if (i == 1) "pcent0" else s"pcent${i - 1}"))
      .mkString(", ")
    s"""comp AS (
       |  SELECT vec_id, unnest(range(0, $Dim)) AS pos,
       |    CAST(ROUND(unnest(CAST(embedding AS DOUBLE[])) * 1048576.0) AS BIGINT) AS uq
       |  FROM embeddings
       |), scomp AS (
       |  SELECT vec_id, pos, pos // $PqSubDim AS sub, uq FROM comp
       |), pcent0 AS (
       |  SELECT vec_id AS cid, pos, uq AS c FROM scomp WHERE vec_id < $PqK
       |), $iters""".stripMargin
  }
  private def pqLastAssign: String = s"passign$PqIters"
  private def pqLastCent: String = s"pcent$PqIters"

  /** Spark face of [[pqCtes]]: (scomp, assign, cent) after `PqIters`
    * per-subspace Lloyd rounds on the 2²⁰ integer grid.
    *
    * `pin = false` skips the loop-exit localCheckpoints so PlanSpec can
    * inspect the full TRAINING plan (the argmin window's partial
    * group-limit, no single-partition funnel) — pinning hides that
    * lineage behind a `Scan ExistingRDD` in the executed plan, which is
    * the point of the pin but blinds the plan assertions. Production
    * callers keep the default. */
  private[graft] def pqTrain(s: SparkSession, d: String,
      pin: Boolean = true): (DataFrame, DataFrame, DataFrame) = {
    // r16: same one-exchange-per-iteration array shape as [[kmeansTrain]],
    // with the subspace id as one more key — all PqSubs trainings still
    // ride ONE set of (K-bounded) aggregations. Each vector splits into
    // PqSubs packed subvectors once; assignment per (vec_id, sub) is the
    // narrow fused-kernel argmin against the per-sub packed codebook.
    // r15's loop-exit pins stay (see [[kmeansTrain]]).
    val svecs0 = emb(s, d)
      .select(col("vec_id"), posexplode(
        array((0 until PqSubs).map(j =>
          quantizeIn(s, slice(col("e"), j * PqSubDim + 1, PqSubDim))): _*))
        .as(Seq("subI", "suq")))
      // `pos div n` is LongType — keep the legacy sub type for consumers
      .select(col("vec_id"), col("subI").cast("long").as("sub"), col("suq"),
        (col("subI") * PqSubDim).as("posBase"))
    val svecs = if (pin) svecs0.localCheckpoint() else svecs0
    // legacy exploded shape for the LUT/error consumers: a NARROW
    // expansion of the pinned subvectors (pos = subBase + local index)
    val comp = svecs
      .select(col("vec_id"), col("sub"), col("posBase"),
        posexplode(col("suq")).as(Seq("li", "uq")))
      .select(col("vec_id"), (col("posBase") + col("li")).cast("int").as("pos"),
        col("sub"), col("uq"))
    // codebooks: (cid, sub, scarr) — cid shared across subspaces, each
    // sub's slice trained independently (pos determines the sub)
    var scent = svecs.filter(col("vec_id") < PqK)
      .select(col("vec_id").as("cid"), col("sub"), col("suq").as("carr"))
    var assign: DataFrame = null
    var cent: DataFrame = null
    for (i <- 1 to PqIters) {
      // ≤ K rows per sub → PqSubs packed rows; broadcast-joined on sub
      val packed = scent.groupBy(col("sub"))
        .agg(sort_array(collect_list(struct(col("cid"), col("carr")))).as("cents"))
      val av = svecs.join(broadcast(packed), Seq("sub"))
        .withColumn("cid", argminCidIn(s, col("suq"), col("cents")))
        .filter(col("cid").isNotNull) // empty-codebook guard, see kmeansTrain
        .select(col("vec_id"), col("sub"), col("suq"), col("posBase"), col("cid"))
      val centLong = av
        .select(col("cid"), col("sub"), col("posBase"),
          posexplode(col("suq")).as(Seq("li", "uq")))
        .groupBy(col("cid"), (col("posBase") + col("li")).cast("int").as("pos"))
        .agg(round(sum(col("uq")).cast("double") / count(lit(1)).cast("double"))
          .cast("long").as("c"))
      if (i == PqIters) {
        assign = av.select("vec_id", "sub", "cid")
        cent = centLong
        if (pin) { assign = assign.localCheckpoint(); cent = cent.localCheckpoint() }
      } else {
        // back to per-(cid, sub) packed slices: pos//PqSubDim recovers
        // the sub, pos orders the slice — K·Dim rows, bounded; pinned
        // at the iteration boundary (see kmeansTrain) so the final-exit
        // pins don't replay earlier iterations' corpus aggregations
        scent = centLong
          .groupBy(col("cid"), (col("pos").cast("long") / PqSubDim).cast("long").as("sub"))
          .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
            x => x.getField("c")).as("carr"))
        if (pin) scent = scent.localCheckpoint()
      }
    }
    (comp, assign, cent)
  }

  val qEmbedPq: QueryDef = {
    QueryDef.sql(
      "q_embed_pq",
      s"""WITH $pqCtes, perr AS (
         |  SELECT s.vec_id, CAST(SUM((s.uq - c.c) * (s.uq - c.c)) AS BIGINT) AS err
         |  FROM scomp s
         |  JOIN $pqLastAssign a ON a.vec_id = s.vec_id AND a.sub = s.sub
         |  JOIN $pqLastCent c ON c.cid = a.cid AND c.pos = s.pos
         |  GROUP BY s.vec_id
         |), pcodes AS (
         |  SELECT vec_id,
         |    ${(0 until PqSubs).map(j =>
               s"MAX(CASE WHEN sub = $j THEN cid END) AS c$j").mkString(",\n    ")}
         |  FROM $pqLastAssign GROUP BY vec_id
         |)
         |SELECT p.vec_id, ${(0 until PqSubs).map(j => s"p.c$j").mkString(", ")}, e.err
         |FROM pcodes p JOIN perr e ON e.vec_id = p.vec_id
         |WHERE p.vec_id < 50
         |ORDER BY p.vec_id""".stripMargin) { (s, d) =>
      val (comp, assign, cent) = pqTrain(s, d)
      val err = comp.join(assign, Seq("vec_id", "sub"))
        .join(broadcast(cent), Seq("cid", "pos"))
        .groupBy(col("vec_id"))
        .agg(sum((col("uq") - col("c")) * (col("uq") - col("c"))).cast("long").as("err"))
      val codeCols = (0 until PqSubs)
        .map(j => max(when(col("sub") === j, col("cid"))).as(s"c$j"))
      val codes = assign.groupBy("vec_id").agg(codeCols.head, codeCols.tail: _*)
      codes.join(err, "vec_id").filter(col("vec_id") < 50)
        .select(("vec_id" +: (0 until PqSubs).map(j => s"c$j") :+ "err").map(col): _*)
        .orderBy("vec_id")
    }
  }

  /** PQ kNN via ASYMMETRIC distance computation (the ADC serving path
    * of Jégou et al.'s IVF-PQ): per query, an exact-integer lookup
    * table of squared distances from the query's subvectors to every
    * per-subspace centroid; a vector's approximate distance is then the
    * SUM of `PqSubs` LUT entries selected by its code word — the raw
    * corpus vectors are never touched at search time.
    *
    * Scale: this is why PQ indexes fit in memory — search reads only
    * the code table (PqSubs small ints per vector) and joins a
    * broadcast LUT bounded by queries·PqSubs·PqK, never corpus-sized;
    * the per-query top-k is the same WindowGroupLimit partial shape as
    * q_knn_bruteforce. Recall loss vs exact cosine is the PQ trade —
    * q_embed_pq's reconstruction error quantifies it.
    *
    * Determinism: LUT entries and their sums are exact integers on the
    * 2²⁰ grid; ties break on vec_id. */
  val qKnnPq: QueryDef = QueryDef.sql(
    "q_knn_pq",
    s"""WITH $pqCtes, lut AS (
       |  SELECT s.vec_id AS qid, s.sub, c.cid, SUM((s.uq - c.c) * (s.uq - c.c)) AS d
       |  FROM scomp s JOIN $pqLastCent c ON s.pos = c.pos
       |  WHERE s.vec_id < $NQueries
       |  GROUP BY s.vec_id, s.sub, c.cid
       |), scored AS (
       |  SELECT l.qid, a.vec_id, CAST(SUM(l.d) AS BIGINT) AS adist
       |  FROM $pqLastAssign a JOIN lut l ON l.sub = a.sub AND l.cid = a.cid
       |  WHERE a.vec_id <> l.qid
       |  GROUP BY l.qid, a.vec_id
       |)
       |SELECT qid, vec_id, adist, rk FROM (
       |  SELECT qid, vec_id, adist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS BIGINT) AS rk
       |  FROM scored
       |) WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin) { (s, d) =>
    val (comp, assign, cent) = pqTrain(s, d)
    val lut = comp.filter(col("vec_id") < NQueries)
      .join(broadcast(cent), Seq("pos"))
      .groupBy(col("vec_id"), col("sub"), col("cid"))
      .agg(sum((col("uq") - col("c")) * (col("uq") - col("c"))).as("d"))
      .withColumnRenamed("vec_id", "qid")
    val scored = assign.join(broadcast(lut), Seq("sub", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d")).cast("long").as("adist"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))).cast("long"))
      .filter(col("rk") <= 10)
      .select("qid", "vec_id", "adist", "rk")
      .orderBy("qid", "rk")
  }

  /** IVF×PQ COMPOSED (Jégou et al.'s IVFADC — the production ANN
    * recipe, r10 tier; the at-rest layout face is
    * [[graft.sources.VectorIndex.buildIvfPq]], pinned by IndexSpec):
    * the learned coarse quantizer routes each query to its `IvfPqProbes`
    * nearest cells, vectors are PRODUCT-quantized over their RESIDUAL
    * to the cell centroid (shared per-subspace codebooks — residual
    * encoding is what keeps one codebook tight across cells), and
    * serving is pure ADC: a per-(query, cell) lookup table of exact
    * integer residual distances, summed per candidate through its code
    * word — raw vectors untouched at search time. Output carries the
    * RECALL REPORT: each query's ADC top-10 joined with its overlap
    * count against the exact cosine top-10, so the quantization loss is
    * measured inside the hash-checked result, not asserted offline.
    *
    * Both engines recompute the ENTIRE composition independently —
    * coarse Lloyd, residual PQ training, routing, LUT, ADC — on the 2²⁰
    * integer grid (distances exact integer sums, means ROUND half-away
    * which both engines share on signed residuals, ties on id).
    *
    * Scale: routing probes a centroid table bounded by cells·dim; the
    * candidate pass reads only code words within probed cells (the
    * partition-pruned I/O story measured in IndexSpec); the LUT is
    * probes·subs·K per query. Nothing corpus-sized crosses the driver. */
  val qKnnIvfPq: QueryDef = {
    val Probes = 2
    val lastCent = s"cent$KmIters"
    def rIter(i: Int, prev: String): String =
      s"""rdist$i AS (
         |  SELECT res.vec_id, res.sub, c.pcid, SUM((res.r - c.c) * (res.r - c.c)) AS d
         |  FROM res JOIN $prev c ON res.pos = c.pos
         |  GROUP BY res.vec_id, res.sub, c.pcid
         |), rassign$i AS (
         |  SELECT vec_id, sub, pcid FROM (
         |    SELECT vec_id, sub, pcid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d, pcid) AS rn
         |    FROM rdist$i) WHERE rn = 1
         |), rcent$i AS (
         |  SELECT a.pcid, res.pos,
         |    CAST(ROUND(CAST(SUM(res.r) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c
         |  FROM res JOIN rassign$i a ON res.vec_id = a.vec_id AND res.sub = a.sub
         |  GROUP BY a.pcid, res.pos
         |)""".stripMargin
    val rIters = (1 to PqIters)
      .map(i => rIter(i, if (i == 1) "rcent0" else s"rcent${i - 1}")).mkString(", ")
    QueryDef.sql(
      "q_knn_ivfpq",
      s"""WITH $kmeansCtes, res AS (
         |  SELECT comp.vec_id, a.cid AS cell, comp.pos,
         |    comp.pos // $PqSubDim AS sub, comp.uq - c.c AS r
         |  FROM comp
         |  JOIN $kmeansLastAssign a ON a.vec_id = comp.vec_id
         |  JOIN $lastCent c ON c.cid = a.cid AND c.pos = comp.pos
         |), rcent0 AS (
         |  SELECT vec_id AS pcid, pos, r AS c FROM res WHERE vec_id < $PqK
         |), $rIters, qroute AS (
         |  SELECT comp.vec_id AS qid, c.cid,
         |    SUM((comp.uq - c.c) * (comp.uq - c.c)) AS d
         |  FROM comp JOIN $lastCent c ON comp.pos = c.pos
         |  WHERE comp.vec_id < $NQueries
         |  GROUP BY comp.vec_id, c.cid
         |), probed AS (
         |  SELECT qid, cid AS cell FROM (
         |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d, cid) AS rn
         |    FROM qroute) WHERE rn <= $Probes
         |), qres AS (
         |  SELECT q.vec_id AS qid, p.cell, q.pos, q.pos // $PqSubDim AS sub, q.uq - c.c AS r
         |  FROM comp q
         |  JOIN probed p ON p.qid = q.vec_id
         |  JOIN $lastCent c ON c.cid = p.cell AND c.pos = q.pos
         |  WHERE q.vec_id < $NQueries
         |), lut AS (
         |  SELECT qr.qid, qr.cell, qr.sub, c.pcid, SUM((qr.r - c.c) * (qr.r - c.c)) AS d
         |  FROM qres qr JOIN rcent$PqIters c ON qr.pos = c.pos
         |  GROUP BY qr.qid, qr.cell, qr.sub, c.pcid
         |), vcell AS (
         |  SELECT DISTINCT vec_id, cell FROM res
         |), codes AS (
         |  SELECT a.vec_id, v.cell, a.sub, a.pcid
         |  FROM rassign$PqIters a JOIN vcell v ON v.vec_id = a.vec_id
         |), scored AS (
         |  SELECT l.qid, cd.vec_id, CAST(SUM(l.d) AS BIGINT) AS adist
         |  FROM codes cd
         |  JOIN lut l ON l.cell = cd.cell AND l.sub = cd.sub AND l.pcid = cd.pcid
         |  WHERE cd.vec_id <> l.qid
         |  GROUP BY l.qid, cd.vec_id
         |), adc AS (
         |  SELECT qid, vec_id, adist, CAST(rk AS BIGINT) AS rk FROM (
         |    SELECT qid, vec_id, adist,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rk
         |    FROM scored) WHERE rk <= 10
         |), t AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), exact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT q.vec_id AS qid, v.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${Similarity.cosineSql("q.e", "v.e")} DESC, v.vec_id) AS rk
         |    FROM t q JOIN t v ON v.vec_id <> q.vec_id
         |    WHERE q.vec_id < $NQueries) WHERE rk <= 10
         |), rec AS (
         |  SELECT a.qid, CAST(COUNT(e.vec_id) AS BIGINT) AS recall10
         |  FROM adc a LEFT JOIN exact e ON e.qid = a.qid AND e.vec_id = a.vec_id
         |  GROUP BY a.qid
         |)
         |SELECT a.qid, a.vec_id, a.adist, a.rk, r.recall10
         |FROM adc a JOIN rec r ON r.qid = a.qid
         |ORDER BY a.qid, a.rk""".stripMargin) { (s, d) =>
      val (comp, assign, cent, vecs) = kmeansTrain(s, d)
      // r16: residuals stay PACKED per (vec_id, sub) — the pinned set is
      // N·PqSubs array rows instead of N·Dim exploded rows (¼ the rows,
      // same bytes of payload, one schema-narrow shuffle to attach the
      // pinned assignment instead of the former N·Dim exploded SMJ), and
      // the residual Lloyd below runs in the same one-exchange-per-
      // iteration array shape as kmeansTrain/pqTrain. Values unchanged:
      // r = uq − c componentwise on the same 2²⁰ grid.
      val rsvecs = vecs
        .join(assign, Seq("vec_id"))
        .join(broadcast(packCent(cent, "cid")), Seq("cid"))
        .select(col("vec_id"), col("cid").as("cell"), posexplode(
          array((0 until PqSubs).map(j => zip_with(
            slice(col("uq"), j * PqSubDim + 1, PqSubDim),
            slice(col("carr"), j * PqSubDim + 1, PqSubDim),
            (a, b) => a - b)): _*)).as(Seq("subI", "rarr")))
        .select(col("vec_id"), col("cell"), col("subI").cast("long").as("sub"),
          (col("subI") * PqSubDim).as("posBase"), col("rarr"))
        .localCheckpoint() // PQ training + encoding read one pinned residual set
      var rscent = rsvecs.filter(col("vec_id") < PqK)
        .select(col("vec_id").as("pcid"), col("sub"), col("rarr").as("carr"))
      var rassign: DataFrame = null
      var rcent: DataFrame = null
      // final-exit pinning, same rationale as kmeansTrain: the final
      // rcent is read by the LUT and the final rassign by codes —
      // unpinned, each reference re-expanded the whole residual training
      for (i <- 1 to PqIters) {
        val packed = rscent.groupBy(col("sub"))
          .agg(sort_array(collect_list(
            struct(col("pcid").as("cid"), col("carr")))).as("cents"))
        val av = rsvecs.join(broadcast(packed), Seq("sub"))
          .withColumn("pcid", argminCidIn(s, col("rarr"), col("cents")))
          .filter(col("pcid").isNotNull) // empty-codebook guard, see kmeansTrain
          .select(col("vec_id"), col("sub"), col("rarr"), col("posBase"), col("pcid"))
        val centLong = av
          .select(col("pcid"), col("posBase"), posexplode(col("rarr")).as(Seq("li", "r")))
          .groupBy(col("pcid"), (col("posBase") + col("li")).cast("int").as("pos"))
          .agg(round(sum(col("r")).cast("double") / count(lit(1)).cast("double"))
            .cast("long").as("c"))
        if (i == PqIters) {
          rassign = av.select("vec_id", "sub", "pcid").localCheckpoint()
          rcent = centLong.localCheckpoint()
        } else {
          // K·Dim-bounded iteration-boundary pin, see kmeansTrain
          rscent = centLong
            .groupBy(col("pcid"),
              (col("pos").cast("long") / PqSubDim).cast("long").as("sub"))
            .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
              x => x.getField("c")).as("carr"))
            .localCheckpoint()
        }
      }
      val qroute = comp.filter(col("vec_id") < NQueries)
        .join(broadcast(cent), Seq("pos"))
        .groupBy(col("vec_id").as("qid"), col("cid"))
        .agg(sum((col("uq") - col("c")) * (col("uq") - col("c"))).as("d"))
      val wr = Window.partitionBy(col("qid")).orderBy(col("d"), col("cid"))
      val probed = qroute.withColumn("rn", row_number().over(wr))
        .filter(col("rn") <= Probes).select(col("qid"), col("cid").as("cell"))
      val centR = cent.select(col("cid").as("ccell"),
        col("pos").as("cpos"), col("c"))
      val qres = comp.filter(col("vec_id") < NQueries)
        .join(broadcast(probed), col("vec_id") === col("qid"))
        .join(broadcast(centR),
          col("ccell") === col("cell") && col("cpos") === col("pos"))
        .select(col("qid"), col("cell"), col("pos"),
          expr(s"pos div $PqSubDim").as("sub"), (col("uq") - col("c")).as("r"))
      val lut = qres.join(broadcast(rcent), Seq("pos"))
        .groupBy(col("qid"), col("cell"), col("sub"), col("pcid"))
        .agg(sum((col("r") - col("c")) * (col("r") - col("c"))).as("d"))
      val vcell = rsvecs.select(col("vec_id"), col("cell")).distinct()
      val codes = rassign.join(vcell, Seq("vec_id"))
      val scored = codes
        .join(broadcast(lut), Seq("cell", "sub", "pcid"))
        .filter(col("vec_id") =!= col("qid"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("d")).cast("long").as("adist"))
      // adc is referenced twice (the recall join and the final join):
      // pin the ≤ Q·10-row list instead of re-running the whole ADC
      val adc = scored.withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))).cast("long"))
        .filter(col("rk") <= 10)
        .localCheckpoint()
      val t = emb(s, d).select(col("vec_id"), col("e"))
      val exact = t.as("q").filter(col("q.vec_id") < NQueries)
        .join(t.as("v"), col("v.vec_id") =!= col("q.vec_id"))
        .select(col("q.vec_id").as("qid"), col("v.vec_id").as("vec_id"),
          Similarity.cosineIn(s, col("q.e"), col("v.e")).as("sim"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))))
        .filter(col("rk") <= 10)
        .select(col("qid").as("eqid"), col("vec_id").as("evec"))
      val rec = adc.join(exact,
          col("eqid") === col("qid") && col("evec") === col("vec_id"), "left")
        .groupBy(col("qid")).agg(count(col("evec")).as("recall10"))
      adc.join(rec, Seq("qid"))
        .select(col("qid"), col("vec_id"), col("adist"), col("rk"), col("recall10"))
        .orderBy("qid", "rk")
    }
  }

  /** MMR (Maximal Marginal Relevance, Carbonell–Goldstein '98)
    * DIVERSIFIED top-k: after ANN retrieval, greedily pick the
    * candidate maximizing `λ·rel − (1−λ)·max sim(c, selected)` — the
    * standard rerank that stops a result list collapsing onto one
    * near-duplicate cluster. λ = ½, so the selection ORDER is decided
    * by `rel − maxsim` — a single IEEE-exact subtraction of two
    * order-stable cosines, which is what lets both engines pick
    * bit-identical sets (no float multiply by an inexact λ).
    *
    * Scale: the ONLY corpus-sized pass is the initial scoring, which
    * keeps the brute-force partial-top-k shape; the candidate table is
    * `localCheckpoint`ed at Q·$MmrCand rows so every greedy step reads
    * the pinned 100-row table instead of re-scanning the corpus, and
    * the K−1 unrolled steps (loop over STEPS, never over data) touch
    * only candidate-bounded joins and windows partitioned by qid. */
  val qMmrRerank: QueryDef = {
    val NCand = 20; val KSel = 5
    val steps = (2 to KSel).map { i =>
      s""", m$i AS (
         |  SELECT p.qid, p.va, MAX(p.s) AS m
         |  FROM p JOIN sel${i - 1} sl ON sl.qid = p.qid AND sl.vec_id = p.vb
         |  GROUP BY p.qid, p.va
         |), r$i AS (
         |  SELECT cv.qid, cv.vec_id, cv.rel, cv.rel - m$i.m AS sc
         |  FROM cv JOIN m$i ON m$i.qid = cv.qid AND m$i.va = cv.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} sl
         |                    WHERE sl.qid = cv.qid AND sl.vec_id = cv.vec_id)
         |), w$i AS (
         |  SELECT qid, vec_id, rel, $i AS step FROM (
         |    SELECT qid, vec_id, rel,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS rk
         |    FROM r$i) z$i WHERE rk = 1
         |), sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM w$i)""".stripMargin
    }.mkString
    QueryDef.sql(
      "q_mmr_rerank",
      s"""WITH q AS (
         |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |  FROM embeddings WHERE vec_id < $NQueries
         |), t AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), cv AS (
         |  SELECT qid, vec_id, rel, e FROM (
         |    SELECT qid, vec_id, rel, e,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rk
         |    FROM (SELECT q.qid, t.vec_id, ${Similarity.cosineSql("qe", "e")} AS rel, t.e
         |          FROM q, t WHERE t.vec_id <> q.qid) s0
         |  ) s1 WHERE rk <= $NCand
         |), p AS (
         |  SELECT a.qid, a.vec_id AS va, b.vec_id AS vb,
         |    ${Similarity.cosineSql("a.e", "b.e")} AS s
         |  FROM cv a JOIN cv b ON a.qid = b.qid AND a.vec_id <> b.vec_id
         |), sel1 AS (
         |  SELECT qid, vec_id, rel, 1 AS step FROM (
         |    SELECT qid, vec_id, rel,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rk
         |    FROM cv) z1 WHERE rk = 1
         |)$steps
         |SELECT qid, vec_id, rel, step FROM sel$KSel
         |ORDER BY qid, step""".stripMargin) { (s, d) =>
      val all0 = emb(s, d)
      val q = all0.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"))
      val wv = Window.partitionBy("qid").orderBy(col("rel").desc, col("vec_id"))
      val cv = all0.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("rel", Similarity.cosineIn(s, col("qe"), col("e")))
        .withColumn("rk", row_number().over(wv)).filter(col("rk") <= NCand)
        .select(col("qid"), col("vec_id"), col("rel"), col("e"))
        .localCheckpoint()
      // p is re-read by every greedy step: pin the Q·NCand² pair table
      // once (localCheckpoint, like cv) instead of re-running the
      // cv×cv cosine join per step
      val p = cv.as("a").join(cv.as("b"),
          col("a.qid") === col("b.qid") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.qid").as("qid"), col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
          Similarity.cosineIn(s, col("a.e"), col("b.e")).as("ps"))
        .localCheckpoint()
      var sel = cv.withColumn("rk", row_number().over(wv)).filter(col("rk") === 1)
        .select(col("qid"), col("vec_id"), col("rel")).withColumn("step", lit(1))
        // each step references `sel` THREE times (max-sim join, the
        // remaining-candidates anti-join, and the union) — without a
        // per-step checkpoint the plan re-expands the whole prefix at
        // every reference and the unrolled loop goes exponential in
        // exchanges (r15 measurement: 13.5 s at sf0.01). Checkpointing
        // the ≤ Q·KSel-row selection keeps every step O(1) plan nodes.
        .localCheckpoint()
      for (i <- 2 to KSel) {
        val selR = sel.select(col("qid").as("sqid"), col("vec_id").as("svid"))
        val m = p.join(selR, col("qid") === col("sqid") && col("vb") === col("svid"))
          .groupBy(col("qid"), col("va")).agg(max(col("ps")).as("ms"))
        val rem = cv.join(sel.select("qid", "vec_id"), Seq("qid", "vec_id"), "left_anti")
        val scoredI = rem.join(m, rem("qid") === m("qid") && rem("vec_id") === m("va"))
          .select(rem("qid"), rem("vec_id"), rem("rel"), (rem("rel") - col("ms")).as("sc"))
        val wI = Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))
        val win = scoredI.withColumn("rk", row_number().over(wI)).filter(col("rk") === 1)
          .select(col("qid"), col("vec_id"), col("rel")).withColumn("step", lit(i))
        sel = sel.union(win).localCheckpoint()
      }
      sel.orderBy("qid", "step")
    }
  }

  /** ANN recall@5 report — the measurement face of the IVF probes
    * dial: per query, how many of the exact top-5 neighbours the
    * routed search actually returned at probes=1 vs probes=2. This is
    * the number an operator watches when trading probes for latency;
    * hash-checking it makes "probes is the recall dial" a verified
    * claim, not a slogan (probe-2 candidates are a superset, so
    * hits_p2 ≥ hits_p1 row by row).
    *
    * Exact-integer counts only — no float leaves the overlap join.
    *
    * Scale: each leg ends in its own partial top-k ([[topK]]); the
    * overlap join is k·NQueries rows against k·NQueries rows. At
    * 100 TB this runs on a SAMPLE of queries (recall estimation never
    * needs the full query log) while the brute leg stays the one
    * corpus scan. */
  val qKnnRecall: QueryDef = QueryDef.sql(
    "q_knn_recall",
    s"""WITH brute AS (
       |  SELECT qid, vec_id FROM (${topkSql("", 5)})
       |), iv1 AS (
       |  SELECT qid, vec_id FROM (${ivfSql(1)})
       |), iv2 AS (
       |  SELECT qid, vec_id FROM (${ivfSql(2)})
       |), bk AS (
       |  SELECT qid, COUNT(*) AS k FROM brute GROUP BY qid
       |), h1 AS (
       |  SELECT brute.qid, COUNT(*) AS n FROM brute
       |  JOIN iv1 ON brute.qid = iv1.qid AND brute.vec_id = iv1.vec_id
       |  GROUP BY brute.qid
       |), h2 AS (
       |  SELECT brute.qid, COUNT(*) AS n FROM brute
       |  JOIN iv2 ON brute.qid = iv2.qid AND brute.vec_id = iv2.vec_id
       |  GROUP BY brute.qid
       |)
       |SELECT bk.qid, k,
       |  CAST(COALESCE(h1.n, 0) AS BIGINT) AS hits_p1,
       |  CAST(COALESCE(h2.n, 0) AS BIGINT) AS hits_p2
       |FROM bk
       |LEFT JOIN h1 ON h1.qid = bk.qid
       |LEFT JOIN h2 ON h2.qid = bk.qid
       |ORDER BY bk.qid""".stripMargin) { (s, d) =>
    val brute = topkSpark(s, d, sameLabel = false, 5).select(col("qid"), col("vec_id"))
    def hits(ivf: DataFrame, as: String): DataFrame =
      brute.join(ivf.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as(as))
    brute.groupBy("qid").agg(count(lit(1)).as("k"))
      .join(hits(ivfSpark(s, d, 1), "hits_p1"), Seq("qid"), "left")
      .join(hits(ivfSpark(s, d, 2), "hits_p2"), Seq("qid"), "left")
      .select(col("qid"), col("k"),
        coalesce(col("hits_p1"), lit(0L)).as("hits_p1"),
        coalesce(col("hits_p2"), lit(0L)).as("hits_p2"))
      .orderBy("qid")
  }

  /** HARD-NEGATIVE mining for contrastive/retrieval training: for each
    * query vector, the top-3 nearest neighbours with a DIFFERENT label —
    * the informative negatives (random in-batch negatives are trivially
    * far; the near-but-wrong items are what sharpen an embedding model,
    * per the published dense-retrieval recipes). Same fused-cosine +
    * partial-top-k machinery as [[qKnnBrute]] with the label predicate
    * inverted — the filter drops same-label rows before any distance
    * math, and the broadcast query side keeps the corpus scan
    * shuffle-free. */
  val qHardNegatives: QueryDef = QueryDef.sql(
    "q_hard_negatives", topkSql("AND t.label <> q.qlabel", 3)) { (s, d) =>
    val all0 = emb(s, d)
    val q = all0.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("e").as("qe"))
    val joined = all0.join(broadcast(q),
      col("label") =!= col("qlabel") && col("vec_id") =!= col("qid"))
    topK(joined.withColumn("sim", Similarity.cosineIn(s, col("qe"), col("e"))), 3, Nil)
  }

  private val CoresetK = 8

  /** CORESET selection by greedy k-center (farthest-point traversal,
    * Gonzalez 1985 — the 2-approximation of the k-center objective):
    * the diversity-sampling step of data selection — pick the point
    * farthest (cosine distance) from everything selected so far, k
    * times from a fixed seed. The output is the selection ORDER
    * itself (step, vec_id) — pure integers, but every step's argmax
    * depends on the full running min-distance state, so any
    * divergence anywhere in k rounds of distance math flips the
    * permutation and the hash. Complements [[qMmrRerank]] (diversity
    * within a query's candidates) and [[qKnnKmeans]] (centroids):
    * this one picks EXISTING exemplars for global coverage.
    *
    * Scale: each of the k rounds is one distributed pass updating a
    * per-point running min via LEAST against the newest center (a
    * 1-row broadcast), then a partial top-1; state between rounds is
    * localCheckpoint-pinned. k passes over 100 TB is the published
    * cost of exact greedy k-center; subsampled variants keep the
    * shape. */
  val qSampleCoreset: QueryDef = {
    val stepCtes = (1 until CoresetK).map { i =>
      s"""s$i AS (
         |  SELECT vec_id FROM d$i ORDER BY dm DESC, vec_id LIMIT 1
         |), e$i AS (
         |  SELECT t.e AS ce FROM t JOIN s$i ON t.vec_id = s$i.vec_id
         |), d${i + 1} AS (
         |  SELECT d$i.vec_id, d$i.e,
         |    LEAST(d$i.dm, 1.0 - ${Similarity.cosineSql(s"d$i.e", s"e$i.ce")}) AS dm
         |  FROM d$i, e$i
         |)""".stripMargin
    }.mkString(",\n")
    val stepRows = (1 until CoresetK)
      .map(i => s"SELECT $i AS step, vec_id FROM s$i").mkString("\nUNION ALL\n")
    QueryDef.sql(
      "q_sample_coreset",
      s"""WITH t AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), e0 AS (
         |  SELECT e AS ce FROM t WHERE vec_id = 0
         |), d1 AS (
         |  SELECT t.vec_id, t.e,
         |    1.0 - ${Similarity.cosineSql("t.e", "e0.ce")} AS dm
         |  FROM t, e0
         |),
         |$stepCtes
         |SELECT step, vec_id FROM (
         |  SELECT 0 AS step, CAST(0 AS BIGINT) AS vec_id
         |  UNION ALL
         |  $stepRows
         |)
         |ORDER BY step""".stripMargin) { (s, d) =>
      val t = emb(s, d).select(col("vec_id"), col("e"))
      def centerOf(id: Long) = t.filter(col("vec_id") === id).select(col("e").as("ce"))
      var selected = List(0L)
      var dists = t.crossJoin(broadcast(centerOf(0L)))
        .select(col("vec_id"), col("e"),
          (lit(1.0) - Similarity.cosine(col("e"), col("ce"))).as("dm"))
        .localCheckpoint()
      for (_ <- 1 until CoresetK) {
        val next = dists.orderBy(col("dm").desc, col("vec_id"))
          .limit(1).select("vec_id").head.getLong(0)
        selected = next :: selected
        dists = dists.crossJoin(broadcast(centerOf(next)))
          .select(col("vec_id"), col("e"),
            least(col("dm"), lit(1.0) - Similarity.cosine(col("e"), col("ce"))).as("dm"))
          .localCheckpoint()
      }
      import s.implicits._
      selected.reverse.zipWithIndex
        .map { case (id, i) => (i, id) }.toDF("step", "vec_id")
        .orderBy("step")
    }
  }

  val all: Seq[QueryDef] = Seq(qKnnBrute, qKnnFiltered, qEmbedNearDup, qKnnIvf, qKnnIvfProbe2, qKnnKmeans, qSemdedup, qEmbedPq, qKnnPq, qKnnIvfPq, qMmrRerank, qKnnRecall, qHardNegatives, qSampleCoreset)
}
