package graft

import graft.pipeline.DocPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the scale claims in the scaladocs —
  * pushdown, pruning, broadcast star joins, shuffle-free document
  * pipeline, fused expressions inside codegen — checked against the
  * actual planned output, so a regression that silently de-optimizes a
  * plan (a lost hint, a UDF that blocks pushdown) fails the suite, not
  * just the benchmark.
  */
class PlanSpec extends SparkSpec {

  private def phys(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1 parquet scan pushes the date filter and prunes columns") {
    val p = phys(queries.Relational.q1PricingSummary.run(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "date filter must reach the parquet scan")
    // projection pruning: q1 never touches join keys
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey"),
      "unused columns must not be read")
  }

  test("q5 star join broadcasts every dimension") {
    val p = phys(queries.Relational.q5LocalSupplier.run(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "customer/supplier/nation/region sides should all be broadcast")
  }

  test("evidence-guarded dim hints: BHJ at test scale, shuffle join when stats say huge") {
    import graft.operators.JoinAdvisor
    // q3/q4/q5 route their scale-growing customer/supplier sides through
    // hintIfSmall — at sandbox scale the SAME BroadcastHashJoin must
    // emerge from Catalyst's size evidence as the old literal hint gave
    for (q <- Seq(queries.Relational.q3ShippingPriority,
        queries.Relational.q4TopCustomersPerNation)) {
      val p = phys(q.run(spark, sf))
      assert(p.contains("BroadcastHashJoin"),
        s"${q.name}: customer should still broadcast at test scale:\n$p")
    }
    // a stats-say-huge side comes back UNhinted and the planner keeps a
    // shuffle join: range's size estimate is exact (8 bytes/row), so
    // 200M rows ≈ 1.6 GB crosses the guard without materializing a row
    val huge = spark.range(200L * 1000 * 1000).toDF("k")
    val other = spark.range(200L * 1000 * 1000)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    val p = phys(other.join(JoinAdvisor.hintIfSmall(huge), "k"))
    assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"a huge-by-evidence side must not be force-broadcast:\n$p")
    // and the guard itself: small side hinted, huge side passed through
    assert(JoinAdvisor.hintIfSmall(Tables(spark, sf, "customer"))
      .queryExecution.analyzed.toString.contains("ResolvedHint"),
      "small-by-evidence side should carry the broadcast hint")
    assert(!JoinAdvisor.hintIfSmall(huge)
      .queryExecution.analyzed.toString.contains("ResolvedHint"),
      "huge-by-evidence side must pass through unhinted")
  }

  test("iceberg equality-delete MoR plans hash anti-joins, never a nested loop") {
    // the null-safe (<=>) match columns are still equi-join keys —
    // a BroadcastNestedLoopJoin here would be O(rows × deletes)
    val p = phys(queries.CdcQueries.qIcebergReadEq.run(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"equality-delete anti-joins must stay hash joins:\n$p")
    assert(p.contains("LeftAnti"), s"expected anti-join application:\n$p")
    // ONE data scan regardless of commit count (r13): the commit-order
    // rule rides the join, not the plan shape — the earlier
    // scan-per-sequence union grew with table history. This fixture has
    // two data sequences + an equality-delete scan + a position-delete
    // scan = exactly 3 parquet scans; a per-seq shape would show 4+.
    assert("Scan parquet".r.findAllIn(p).size == 3,
      s"expected one data scan + two delete scans, got:\n$p")
  }

  test("document chunk pipeline is narrow (no shuffle)") {
    val p = phys(DocPipeline.chunks(Tables(spark, sf, "documents")))
    assert(!p.contains("Exchange"),
      "chunk+enrich must stay shuffle-free end to end")
  }

  test("decode kernels and attachment explode run narrow: one output-sort exchange at most") {
    // encode → decode → featurize (image, audio) and the MSG
    // walk-explode-reparse are all per-row work; at 100 TB the only
    // exchange these pipelines may contain is the presentation ORDER BY
    for (q <- Seq(queries.MultimodalQueries.qMultimodalDecode,
        queries.MultimodalQueries.qMultimodalAudio,
        queries.MultimodalQueries.qMultimodalVideo,
        queries.MultimodalQueries.qMultimodalAudioQuality,
        queries.MultimodalQueries.qMultimodalExif,
        queries.MultimodalQueries.qMultimodalConsistency,
        queries.KbQueries.qParseAttachments)) {
      val p = phys(q.run(spark, sf))
      assert("Exchange".r.findAllIn(p).size <= 1,
        s"${q.name}: decode pipelines must not shuffle beyond the final sort:\n$p")
    }
  }

  test("join-skew report: partial top-k per side, hot list broadcast, no key-space sort") {
    val p = phys(queries.ProfileQueries.qJoinSkew.run(spark, sf))
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"q_join_skew_report: both frequency tops must be partial top-k:\n$p")
    // the ≤20-key hot list is the broadcast side of the semi-filters —
    // the corpus-growing frequency tables must never broadcast
    assert(p.contains("BroadcastHashJoin"),
      s"q_join_skew_report: hot-list semi joins should broadcast:\n$p")
  }

  test("perceptual near-pair candidates ride a block equi-join, never a nested loop") {
    val p = phys(queries.MultimodalQueries.qMultimodalPhashPairs.run(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q_multimodal_phash_pairs: hash-byte blocking must keep the join equi:\n$p")
  }

  test("perceptual-hash dedup shuffles once by hash, never globally") {
    // decode + dHash are per-row; the ONLY data exchanges are the
    // hash-partitioned shuffle that forms the dup clusters and the
    // presentation sort — and the cluster window must be keyed on
    // phash, not a global (empty-partition) window
    val p = phys(queries.MultimodalQueries.qMultimodalPhash.run(spark, sf))
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"q_multimodal_phash: expected only the phash shuffle + output sort:\n$p")
    assert(p.contains("hashpartitioning(phash"),
      s"q_multimodal_phash: dup-cluster window must partition by phash:\n$p")
  }

  test("kNN scoring uses the fused cosine and a map-side partial top-k") {
    val p = phys(queries.SimilarityQueries.qKnnBrute.run(spark, sf))
    assert(p.contains("graft_cosine"), "fused CosineSim expression expected")
    // the qid window must not funnel all scored rows into Q reducers:
    // Spark's WindowGroupLimit(Partial) bounds each map task to k rows/qid
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      "map-side partial top-k expected before the window exchange")
  }

  test("bucketed tables co-locate the equi-join: no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("bucketed").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.option("path", s"$wh/li").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")
      .write.option("path", s"$wh/ord").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val p = phys(j)
      // matching bucket layouts feed the sort-merge join directly —
      // at 100 TB this is the difference between a full shuffle of the
      // fact table per join and none at all
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join must reuse the on-disk partitioning")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("semi/anti joins plan as joins, not subquery re-execution") {
    val p = phys(queries.Relational.qSemiJoin.run(spark, sf))
    assert(p.contains("LeftSemi"), s"expected a semi join, got:\n$p")
    val p2 = phys(queries.SubqueryQueries.q22BalanceCode.run(spark, sf))
    assert(p2.contains("Anti"), "NOT EXISTS must decorrelate to an anti join")
  }

  test("q2's correlated scalar MIN decorrelates to an aggregate join") {
    val p = phys(queries.TpchQueries.q2MinCostSupplier.run(spark, sf))
    // RewriteCorrelatedScalarSubquery: the per-part MIN must become a
    // grouped aggregate joined on the part key — no per-row subquery
    assert(!p.contains("ScalarSubquery"),
      s"the correlated MIN must not survive as a per-row subquery:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "supplier/nation/region dimensions must broadcast")
  }

  test("q21's EXISTS pair decorrelates to semi+anti joins on the order key") {
    val p = phys(queries.TpchQueries.q21WaitingSuppliers.run(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(p.contains("Anti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the correlated probes must stay keyed, never nested-loop:\n$p")
  }

  test("TPC-H q7 broadcasts the dims and pushes the ship-date filter") {
    val p = phys(queries.TpchQueries.q7VolumeShipping.run(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "BETWEEN on l_shipdate must reach the parquet scan")
  }

  test("tf-idf top-k window gets the partial group-limit pushdown") {
    val p = phys(queries.SearchQueries.qTfidfTop.run(spark, sf))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      "per-doc top-3 must be bounded map-side before the window exchange")
  }

  test("naive inequality join auto-rewrites to the bin equi-join") {
    // q_interval_auto is WRITTEN as a pure inequality join; the
    // injected BinnedRangeJoin rule must turn it into a _graft_bin
    // equi-join — no nested loop, no cartesian — and the rewrite must
    // NOT fire on joins that already have an equi key (q_range_join)
    val p = phys(queries.Relational.qIntervalAuto.run(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"inequality join must rewrite to the binned plan:\n$p")
    assert(p.contains("_graft_bin"), s"expected the injected bin key in:\n$p")
    val keyed = phys(queries.Relational.qRangeJoin.run(spark, sf))
    assert(!keyed.contains("_graft_bin"),
      "a join with an equi key must keep its native hash/merge plan")
  }

  test("timestamp inequality join rewrites only with an explicit bin width") {
    // temporal bins are seconds — the integral default (64) would blow
    // a realistic interval into thousands of bins, so the rewrite
    // demands the session state its width; without it, the naive plan
    // stands (nested loop), with it, the binned plan takes over and
    // returns the same rows
    val ev = Tables(spark, sf, "events").filter(col("user_id") % 17 === 0)
    val pts = ev.select(col("ts").as("pt"))
    val ivs = ev.select(col("ts").as("s0"),
      (col("ts") + expr("INTERVAL 2 HOURS")).as("e0"))
    def joined = pts.join(ivs, col("pt") >= col("s0") && col("pt") < col("e0"))
    val naive = phys(joined)
    assert(naive.contains("BroadcastNestedLoopJoin") && !naive.contains("_graft_bin"),
      s"without an explicit width the temporal join must stay native:\n$naive")
    val nNaive = joined.count()
    spark.conf.set(graft.plans.BinnedRangeJoin.BinWidthConf, "7200")
    try {
      val binned = phys(joined)
      assert(binned.contains("_graft_bin") && !binned.contains("BroadcastNestedLoopJoin"),
        s"with a width the temporal join must bin:\n$binned")
      assert(joined.count() == nNaive, "binned result must equal the nested-loop result")
    } finally spark.conf.unset(graft.plans.BinnedRangeJoin.BinWidthConf)
  }

  test("attribution interval join is a keyed join, not a nested loop") {
    val p = phys(queries.Events.qAttribution.run(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"user_id equality must drive the join; interval stays a residual:\n$p")
  }

  test("embedding quantization broadcasts the 64-row calibration table") {
    val p = phys(queries.SearchQueries.qEmbedQuantize.run(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "per-dimension stats must broadcast, not shuffle the components")
  }

  test("corpus-growing model tables are never hint-broadcast") {
    // bigram/prefix counts and the tf-idf df table grow with corpus
    // size (typos, ids, names) — a broadcast HINT on them OOMs every
    // executor at 100 TB. With the stats-based threshold disabled, any
    // BroadcastHashJoin left in these plans can only come from a
    // reintroduced hint.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = phys(queries.SearchQueries.qDocBigramLm.run(spark, sf))
      assert(!p.contains("BroadcastHashJoin"),
        s"bigram model join must shuffle, not broadcast:\n$p")
      val p2 = phys(queries.SearchQueries.qTfidfTop.run(spark, sf))
      assert(!p2.contains("BroadcastHashJoin"),
        s"vocabulary df join must shuffle, not broadcast:\n$p2")
      // the contamination screen's eval n-gram set grows with the eval
      // corpus — same rule: the join key is the n-gram string, unhinted
      val p3 = phys(queries.QualityQueries.qContamination.run(spark, sf))
      assert(!p3.contains("BroadcastHashJoin"),
        s"eval n-gram join must shuffle, not broadcast:\n$p3")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_sample_weighted is a map-side partial top-k, never a global sort") {
    val p = phys(queries.SearchQueries.qSampleWeighted.run(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"global k-smallest must plan as TakeOrderedAndProject:\n$p")
    assert(!p.contains("Exchange SinglePartition") && !p.contains("Exchange rangepartitioning"),
      s"no corpus-wide sort or funnel may appear:\n$p")
  }

  test("q_dedup_snm windows are block-partitioned, never global") {
    val p = phys(queries.DedupQueries.qDedupSnm.run(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"the neighbourhood sort must stay inside hash blocks:\n$p")
    assert(p.contains("Window"), "the lead() neighbourhood must be a window")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidate rescore must stay on equi-joins:\n$p")
  }

  test("q_mmr_rerank greedy steps stay on qid-partitioned bounded tables") {
    val p = phys(queries.SimilarityQueries.qMmrRerank.run(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"no greedy step may funnel through one task:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"candidate pair sims must join on qid, not cross:\n$p")
  }

  test("q_ntile_balance plans no single-partition exchange") {
    // the naive NTILE() OVER (ORDER BY ...) funnels the whole table
    // through one task; the two-pass rank must keep every data-sized
    // stage parallel (the only driver-visible objects are the
    // partition-count-bounded offsets)
    val p = phys(queries.TpchQueries.qNtileBalance.run(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"equi-depth bucketing must not plan a global single-partition stage:\n$p")
  }

  test("q_pack_sequences packs in sharded windows, never a global one") {
    // packing uses a running token sum; an unpartitioned window would
    // funnel the corpus through one task — the (lang, shard) partition
    // keeps it parallel (the same trap q_ntile_balance avoids)
    val p = phys(queries.TextQueries.qPackSequences.run(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"sequence packing must not plan a global single-partition window:\n$p")
    assert(p.contains("hashpartitioning(lang"),
      s"the running-sum window must partition on (lang, shard):\n$p")
  }

  test("bucket-quota sampler windows are partitioned, never global") {
    // q_domain_cap / q_sample_temperature select by cumulative bucket
    // counts precisely so the only windows run over bounded bucket
    // tables partitioned by source/lang — a per-row rank would need a
    // global (or giant-domain) window sort
    val pCap = phys(queries.SearchQueries.qDomainCap.run(spark, sf))
    assert(pCap.contains("windowspecdefinition(source") &&
      !pCap.contains("windowspecdefinition(bucket"),
      s"q_domain_cap's cumulative window must partition by source:\n$pCap")
    // and nothing in the cap plan funnels through one task (the
    // temperature plan's only single-partition stage is the Σ√n over
    // the language-count-bounded weight table — bounded, acceptable)
    assert(!pCap.contains("Exchange SinglePartition"),
      s"q_domain_cap must stay parallel end to end:\n$pCap")
    val pTmp = phys(queries.SearchQueries.qSampleTemperature.run(spark, sf))
    assert(pTmp.contains("windowspecdefinition(lang"),
      s"q_sample_temperature's cumulative window must partition by lang:\n$pTmp")
  }

  test("q_hybrid_rrf legs end in partial top-k; windows only see the lists") {
    // each retrieval leg must finish with a distributed
    // TakeOrderedAndProject(limit=64) so the global rank windows and
    // the fusion join run over fusion-depth-bounded lists — the corpus
    // never crosses an unpartitioned window
    val p = phys(queries.SearchQueries.qHybridRrf.run(spark, sf))
    assert("TakeOrderedAndProject\\(limit=64".r.findAllIn(p).size == 2,
      s"both the BM25 and cosine legs must truncate via partial top-k:\n$p")
    assert(p.contains("TakeOrderedAndProject(limit=25"),
      s"the fused ranking must end in a partial top-k too:\n$p")
  }

  test("q_vocab_coverage top-V window gets the partial group-limit pushdown") {
    // the per-language vocabulary is corpus-growing: without the
    // map-side WindowGroupLimit each reducer would sort a language's
    // whole vocabulary — with it, every task forwards at most V terms
    val p = phys(queries.SearchQueries.qVocabCoverage.run(spark, sf))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"top-V per language needs the map-side partial group limit:\n$p")
  }

  test("q_negative_pairs windows only the bounded bucket table") {
    // pairing is a narrow pass + broadcasts of the bucket-bounded
    // representative table; the ONLY window is the dense index over
    // reps (≤ NegBuckets rows) — a window touching doc-level columns
    // would mean a per-row rank snuck back in
    val p = phys(queries.QualityQueries.qNegativePairs.run(spark, sf))
    val windows = "windowspecdefinition\\(([a-z_]+)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(windows.subsetOf(Set("bucket")),
      s"only the reps dense-index window (ORDER BY bucket) is allowed, saw $windows:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket-representative joins should broadcast:\n$p")
  }

  test("q_knn_pq searches codes via broadcast LUT and partial top-k") {
    val p = phys(queries.SimilarityQueries.qKnnPq.run(spark, sf))
    // ADC search must join the bounded LUT/centroid tables broadcast
    // and bound the per-query top-k map-side
    assert(p.contains("BroadcastHashJoin"),
      s"LUT/centroid joins should broadcast:\n$p")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"per-query top-k needs the map-side partial group limit:\n$p")
  }

  test("q_pagerank never hint-broadcasts the corpus-growing tables") {
    // rank and edge tables grow with the corpus: with the size-based
    // threshold off, any BroadcastHashJoin left in the plan could only
    // come from an (incorrect) explicit hint — the single-row node
    // count broadcast rides a nested-loop cross join and is exempt
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = phys(queries.SearchQueries.qPageRank.run(spark, sf))
      assert(!p.contains("BroadcastHashJoin"),
        s"edges/rank/outdeg joins must shuffle, not broadcast:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_embed_pq trains all subspaces in shared parallel stages") {
    // the r15 loop-exit pin hides the executed training behind a
    // `Scan ExistingRDD`, so the training-plan properties are asserted
    // on the UNPINNED trainer (same lineage the pin materializes once)
    val (_, assign, _) =
      queries.SimilarityQueries.pqTrain(spark, sf, pin = false)
    val pt = phys(assign)
    // r16 array-form trainer: the argmin is a NARROW fused-kernel map —
    // no corpus-keyed exchange may remain anywhere in the training (the
    // r15 shape shuffled on vec_id for the dist groupBy, the argmin
    // window AND the update join; all three are gone)
    assert(!pt.contains("hashpartitioning(vec_id"),
      s"PQ training must never shuffle the corpus by vec_id:\n$pt")
    assert(!pt.contains("Window"),
      s"the argmin is a narrow array fold now — no window, no sort:\n$pt")
    // the assignment argmin runs through the fused codegen'd kernel
    assert(pt.contains("graft_argmin_cell"),
      s"assignment argmin should be the fused graft_argmin_cell kernel:\n$pt")
    // packed codebooks are K·Dim-bounded: assignment joins broadcast
    assert(pt.contains("BroadcastHashJoin"),
      s"codebook assignment join should broadcast the bounded pack:\n$pt")
    // the served query (pinned trainer) keeps the parallel contract
    val p = phys(queries.SimilarityQueries.qEmbedPq.run(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"PQ encoding/serving must stay parallel end to end:\n$p")
  }

  test("domain-cap joins are never hint-broadcast (domains grow with the corpus)") {
    // distinct domains grow with a crawl corpus, so the per-source
    // cap/threshold tables are corpus-growing — same de-broadcast rule
    // as the bigram/tf-idf model tables
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = phys(queries.SearchQueries.qDomainCap.run(spark, sf))
      assert(!p.contains("BroadcastHashJoin"),
        s"per-source tables must shuffle-join, not broadcast:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("semdedup pair generation is a cid-keyed join, not a nested loop") {
    // the within-cluster pair join must plan as an equi-join on cid
    // (with the vec_id inequality as a post-condition) — a nested-loop
    // or cartesian shape would be all-pairs over the corpus
    val p = phys(queries.SimilarityQueries.qSemdedup.run(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semantic-dedup candidates must come from the cid equi-join:\n$p")
  }

  test("dsir weight join broadcasts the bucket-bounded table") {
    // the weight table is DsirBuckets rows no matter the corpus — the
    // legitimate broadcast case (contrast the domain-cap rule above)
    val p = phys(queries.QualityQueries.qDsirScore.run(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"the 64-row weight table should broadcast into the score join:\n$p")
  }

  test("vector store reads prune load_dt partitions at the source") {
    // the store is hive-partitioned on load_dt; a date predicate must
    // become a PartitionFilter (skip whole directories), not a post-scan
    // row filter — at 100 TB that's the difference between reading one
    // day and reading the corpus
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vstore_prune")
      .toFile.getAbsolutePath + "/store"
    val rows = Seq(("a", "2023-01-01", 1), ("b", "2023-06-01", 2))
      .toDF("chunk_id", "load_dt", "v")
    graft.sources.VectorStore.upsert(spark, dir, rows)
    val p = phys(graft.sources.VectorStore.read(spark, dir)
      .filter(col("load_dt") === "2023-01-01"))
    assert("""PartitionFilters: \[[^\]]*load_dt""".r.findFirstIn(p).isDefined,
      s"load_dt predicate must prune at the partition level:\n$p")
  }

  test("jaccard df-cap window exchange is reused by the candidate join") {
    // capShinglesByDf's window shuffles on `shingle` — the same key the
    // self-join uses; the scaladoc claims that exchange is reused, so
    // assert it (one live shingle exchange + ReusedExchange twins).
    // AQE reuses stages at runtime via its stage cache, which the
    // pre-execution plan string can't show — turn it off here so the
    // static ReuseExchange rule makes the claim visible in the plan.
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = phys(queries.DedupQueries.qDedupJaccard.run(spark, sf))
      assert(p.contains("ReusedExchange"),
        s"self-join sides must share one shingle exchange:\n$p")
      // a ReusedExchange line repeats the referenced exchange's
      // description, so count live exchanges per-line
      val live = p.linesIterator.filterNot(_.contains("ReusedExchange"))
        .count(_.contains("Exchange hashpartitioning(shingle"))
      assert(live == 1,
        s"expected exactly one live shingle-key exchange, got $live:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("content-defined chunking shuffles only for the output ordering") {
    val p = phys(queries.SearchQueries.qDocCdcChunks.run(spark, sf))
    // boundary detection is per-row; the single exchange is the final
    // ORDER BY the verify dump needs — anything more means the chunker
    // itself went wide
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"expected at most the final sort exchange:\n$p")
  }

  test("retention cohort window is user-partitioned, never global") {
    val p = phys(queries.Events.qRetention.run(spark, sf))
    assert(p.contains("windowspecdefinition(user_id"),
      s"cohort min must ride the user_id partitioning:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no stage may funnel the event log through one task:\n$p")
  }

  test("incremental aggregate merge never broadcasts a per-user side") {
    // both merge sides grow with the user dimension; the plan must
    // shuffle-join them (full outer has no broadcast form — this
    // asserts nobody 'optimizes' the merge into a broadcastable shape)
    val p = phys(queries.MaintenanceQueries.qIncrAggMerge.run(spark, sf))
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"base ⋈ delta must be a co-partitioned shuffle join:\n$p")
  }

  test("table fingerprint is one map-side-combined shuffle") {
    val p = phys(queries.MaintenanceQueries.qTableChecksum.run(spark, sf))
    val live = p.linesIterator.filterNot(_.contains("ReusedExchange"))
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(live == 1,
      s"expected exactly the l_returnflag aggregation exchange:\n$p")
    assert(p.contains("partial_bit_xor") || p.contains("partial"),
      s"xor must partial-aggregate before the shuffle:\n$p")
  }

  test("triangle counting stays on equi-joins — no nested-loop shapes") {
    val p = phys(queries.GraphQueries.qTriangles.run(spark, sf))
    // the 1-row n_edges × n_triangles cross join is the only permitted
    // non-equi join; anything else means the wedge join went all-pairs
    assert(!p.contains("CartesianProduct"),
      s"wedge generation/closing must be key-partitioned equi-joins:\n$p")
  }

  test("fuzzy near-dup join is a blocked equi-join, never a nested loop") {
    // the ±10-char length band is an exploded (lang, band) equi-join;
    // a theta/range join here would be all-pairs per language at 100 TB
    val p = phys(queries.DedupQueries.qDedupFuzzy.run(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"length-band blocking must plan as an equi-join:\n$p")
  }

  test("duplicate-span detection stays on gram equi-joins") {
    val p = phys(queries.DedupQueries.qDedupSpans.run(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span df join must be keyed on gram, never all-pairs:\n$p")
  }

  test("OHLC bars partition by (type, hour) — no global window") {
    val p = phys(queries.Events.qOhlc.run(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"both row_number windows must stay (event_type, hour)-partitioned:\n$p")
  }

  test("salted aggregation carries the salt scatter in its plan") {
    val p = phys(queries.Events.qSaltedAgg.run(spark, sf))
    assert(p.contains("pmod"),
      s"the fact side must be salted (pmod scatter key) before the join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no single-partition funnel in the salted path:\n$p")
  }

  test("shard assignment broadcasts the 256-row offset table, no global window") {
    val p = phys(queries.SearchQueries.qShuffleShards.run(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"the (shard, bkt) offset table is 256 rows and must broadcast:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"positions come from per-(shard, bkt) windows — never a global one:\n$p")
  }

  test("approx percentile aggregates with a map-side partial phase") {
    val p = phys(queries.Events.qPercentilesApprox.run(spark, sf))
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_"),
      s"sketches must merge map-side, not ship raw values per group:\n$p")
  }

  test("snapshot diff: co-partitioned key join, rows collapsed to hashes, no broadcast") {
    // both snapshot sides grow with the table; a full outer join has no
    // broadcast form and the payload must already be a 32-byte hash
    // when it reaches the shuffle
    val p = phys(queries.MaintenanceQueries.qTableDiff.run(spark, sf))
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"snapshot diff must shuffle-join on the key:\n$p")
    assert(p.contains("md5"), s"row payloads must collapse to hashes pre-shuffle:\n$p")
  }

  test("bivariate moment sums aggregate map-side: one hash exchange for q_events_corr") {
    val p = phys(queries.Events.qCorr.run(spark, sf))
    val live = p.linesIterator.filterNot(_.contains("ReusedExchange"))
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(live == 1, s"expected only the event_type aggregation exchange:\n$p")
    assert(p.contains("partial_"), s"moments must partial-aggregate before the shuffle:\n$p")
  }

  test("token fertility is one map-side-combined shuffle on lang") {
    val p = phys(queries.TextQueries.qTokenFertility.run(spark, sf))
    val live = p.linesIterator.filterNot(_.contains("ReusedExchange"))
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(live == 1 && p.contains("partial_"),
      s"expected one partial-aggregated lang exchange:\n$p")
  }

  test("URL canonicalization is narrow; every shuffle keys on the canonical URL") {
    // COUNT(DISTINCT url) legitimately plans the two-phase distinct
    // (exchange on (canonical, url) then on canonical) — what must
    // never appear is a shuffle on anything BUT the canonical key, or
    // any join
    val p = phys(queries.TextQueries.qUrlCanonical.run(spark, sf))
    val shuffles = p.linesIterator.filterNot(_.contains("ReusedExchange"))
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.nonEmpty && shuffles.forall(_.contains("canonical")),
      s"every exchange must key on the canonical URL:\n$p")
    assert(!p.contains("Join"), s"canonicalization must not join anything:\n$p")
  }

  test("CMS point estimates are literal lookups — no join, no broadcast in the report") {
    val p = phys(queries.MaintenanceQueries.qCmsCounts.run(spark, sf))
    assert(!p.contains("Join"),
      s"the sketch rides as an array literal, not a joined table:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be a partial top-k, not a global sort:\n$p")
  }

  test("MP4 frame sampling is a narrow per-row kernel") {
    val p = phys(queries.MultimodalQueries.qMultimodalFrames.run(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      s"sample-table parsing must not shuffle (output sort excepted):\n$p")
  }

  test("pure interval join plans a bin equi-join, never a nested loop") {
    val p = phys(queries.Relational.qIntervalJoin.run(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the binned rewrite must keep the inequality join off nested loops:\n$p")
    assert(p.contains("_bin"), s"the bin key must drive the join:\n$p")
  }

  test("ORC scan pushes the status filter and prunes to the referenced columns") {
    val p = phys(queries.CdcQueries.qOrcRoundtrip.run(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("o_orderstatus"),
      s"the status filter must reach the ORC reader:\n$p")
    assert(!p.contains("o_custkey") && !p.contains("o_orderdate"),
      s"unused columns must not be read back from ORC:\n$p")
  }

  test("global ids: partition-local window + broadcast offsets, never a single-partition exchange") {
    val p = phys(queries.Relational.qGlobalIds.run(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"the whole point: no all-rows single-task exchange:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the O(partitions) offset table must broadcast:\n$p")
    // the naive form DOES plan the cliff — proving the assertion bites
    import org.apache.spark.sql.expressions.Window
    val naive = Tables(spark, sf, "orders")
      .withColumn("gid", row_number().over(Window.orderBy("o_orderkey")))
    assert(phys(naive).contains("Exchange SinglePartition"),
      "naive row_number over an empty partition spec should single-partition")
  }

  test("LATERAL top-k decorrelates to a partial WindowGroupLimit, no per-row subquery") {
    val p = phys(queries.SubqueryQueries.qLateralTopK.run(spark, sf))
    // the LIMIT-in-LATERAL must become map-side top-2 per order key...
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"LATERAL LIMIT should plan a partial per-group limit:\n$p")
    // ...probed by a broadcast of the filtered orders side, and never a
    // nested-loop per-outer-row re-execution
    assert(p.contains("BroadcastHashJoin"),
      s"the filtered orders side should broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"decorrelation must not fall back to nested loops:\n$p")
  }

  test("ppjoin candidate generation is an equi-join on prefix tokens, never all-pairs") {
    val p = phys(queries.DedupQueries.qDedupPpjoin.run(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix-filtered similarity join must stay on hash joins:\n$p")
  }

  test("record linkage blocks on the nation key: hash join, no cartesian") {
    val p = phys(queries.DedupQueries.qRecordLinkage.run(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must keep pair generation an equi-join:\n$p")
  }

  test("C4 line cleaning is one explode + doc_id-partitioned windows, no joins") {
    val p = phys(queries.QualityQueries.qDocC4.run(spark, sf))
    assert(!p.contains("Join"), s"per-doc line rules must not join:\n$p")
  }

  test("runtime bloom filter: a selective dim filter reaches the fact scan as might_contain") {
    // the Spark-4 runtime-filter engine posture: when the dim side of a
    // shuffle join carries a selective predicate, the optimizer plants a
    // bloom filter built from the dim keys onto the fact side BEFORE its
    // shuffle -- at 100 TB this is row-group-level pruning the static
    // planner can't express. Local thresholds are tuned down only
    // because sf0.001 is below the production defaults (10GB scan side).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      val dim = Tables(spark, sf, "orders").filter(col("o_totalprice") > 500000.0)
      val fact = Tables(spark, sf, "lineitem")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") || opt.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter on the fact side:\n$opt")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("merkle drill re-scans rows only inside divergent buckets via a broadcast semi-join") {
    val p = phys(queries.MaintenanceQueries.qMerkleDiff.run(spark, sf))
    assert(p.contains("LeftSemi"),
      s"the drill must semi-filter rows against the divergent-bucket list:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"bucket compare and drill must stay on keyed joins:\n$p")
  }

  test("ppjoin prefix self-join twins share one exchange") {
    // the prefix relation feeds both sides of the candidate self-join on
    // the same token key; static ReuseExchange should dedupe the twin
    // shuffles (AQE's runtime stage cache hides this in the plan string,
    // so turn it off like the jaccard reuse test)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = phys(queries.DedupQueries.qDedupPpjoin.run(spark, sf))
      assert(p.contains("ReusedExchange"),
        s"prefix self-join sides must share an exchange:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("cost-based join reorder: ANALYZE stats flip a bad join order") {
    // engine posture: with catalog statistics, Catalyst's CBO reorders a
    // user-written join sequence by estimated cardinality instead of
    // executing it literally. Tables live in a tmp-located database so
    // the repo dir stays clean; stats come from ANALYZE TABLE.
    val dbDir = s"${System.getProperty("java.io.tmpdir")}/graft_cbo_p${ProcessHandle.current().pid()}"
    val conf = spark.conf
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_cbo LOCATION '$dbDir'")
      Tables(spark, sf, "lineitem").write.mode("overwrite")
        .saveAsTable("graft_cbo.l")
      Tables(spark, sf, "orders").write.mode("overwrite")
        .saveAsTable("graft_cbo.o")
      Tables(spark, sf, "nation").write.mode("overwrite")
        .saveAsTable("graft_cbo.n")
      Tables(spark, sf, "customer").write.mode("overwrite")
        .saveAsTable("graft_cbo.c")
      Seq("l", "o", "n", "c").foreach(t =>
        spark.sql(s"ANALYZE TABLE graft_cbo.$t COMPUTE STATISTICS FOR ALL COLUMNS"))
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // isolate reorder from broadcast
      // written order: fact x fact first, dims last — the worst order
      val sql =
        """SELECT n.n_name, COUNT(*) AS cnt
          |FROM graft_cbo.l l
          |JOIN graft_cbo.o o ON l.l_orderkey = o.o_orderkey
          |JOIN graft_cbo.c c ON o.o_custkey = c.c_custkey
          |JOIN graft_cbo.n n ON c.c_nationkey = n.n_nationkey
          |WHERE n.n_name IN ('FRANCE', 'GERMANY')
          |GROUP BY n.n_name""".stripMargin
      def joinOrder(): Seq[String] = {
        val plan = spark.sql(sql).queryExecution.optimizedPlan
        plan.collectLeaves().map(_.toString).map { s =>
          Seq("l", "o", "n", "c").find(t => s.contains(s"graft_cbo.$t[")).getOrElse(s.take(60))
        }
      }
      conf.set("spark.sql.cbo.enabled", "false")
      conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val without = joinOrder()
      conf.set("spark.sql.cbo.enabled", "true")
      conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val withCbo = joinOrder()
      assert(withCbo != without,
        s"CBO with column stats should reorder the joins: both orders $withCbo")
    } finally {
      saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
      spark.sql("DROP DATABASE IF EXISTS graft_cbo CASCADE")
    }
  }

  test("AQE converts a statically-planned shuffle join to broadcast at runtime") {
    // the 100 TB posture: static stats can't see that a filtered side is
    // tiny, so the STATIC plan is a sort-merge join; AQE measures the
    // actual shuffle output and re-plans a broadcast join mid-query.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")      // static: never broadcast
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760") // runtime: may
      val dim = Tables(spark, sf, "orders").filter(col("o_totalprice") > 400000.0)
      val joined = Tables(spark, sf, "lineitem")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
      val static = joined.queryExecution.executedPlan.toString
      assert(static.contains("SortMergeJoin"),
        s"with broadcast disabled statically, the pre-execution plan must SMJ:\n$static")
      joined.collect() // execute so AQE finalizes
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"AQE should have re-planned the tiny filtered side as broadcast:\n$finalPlan")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("JoinAdvisor: same query, different stored stats → different pinned join strategy") {
    import graft.operators.JoinAdvisor
    import graft.operators.JoinAdvisor._
    import spark.implicits._
    // fact: key 7 pathologically hot; dim: unique keys
    val fact = ((1L to 2000L).map(i => (i % 50, i)) ++
      (1L to 3000L).map(i => (7L, 100000L + i))).toDF("k", "payload")
    val dim = (0L until 50L).map(i => (i, s"dim_$i")).toDF("k", "attr")
    val plainRows = fact.join(dim, "k").orderBy("payload").collect().toSeq

    // the stats ladder: the QUERY is identical, only the sidecar changes
    val dimTiny = KeyStats(rows = 50, distinctEst = 50, topKeys = Seq("7" -> 1L), rowBytes = 24)
    val dimHuge = dimTiny.copy(rows = 100000000L, distinctEst = 100000000L)
    val factSkewed = KeyStats(rows = 5000, distinctEst = 50,
      topKeys = Seq("7" -> 3040L, "3" -> 40L), rowBytes = 16000) // big bytes: no broadcast
    val factFlat = factSkewed.copy(topKeys = Seq("3" -> 110L))

    val s1 = choose(factSkewed, dimTiny)
    val s2 = choose(factSkewed, dimHuge)
    val s3 = choose(factFlat, dimHuge)
    assert(s1 == BroadcastRight, s"tiny dim must broadcast: $s1")
    assert(s2.isInstanceOf[SaltLeft], s"hot key + unique dim must salt: $s2")
    assert(s3 == Plain, s"no fit, no skew must stay plain: $s3")

    // plan evidence: each strategy pins a different physical shape...
    val p1 = JoinAdvisor(fact, dim, "k", s1).queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastHashJoin"), s"expected broadcast plan:\n$p1")
    val salted = JoinAdvisor(fact, dim, "k", s2)
    val p2 = salted.queryExecution.optimizedPlan.toString
    assert(p2.contains("_salt"), s"expected salted plan:\n$p2")
    val p3 = JoinAdvisor(fact, dim, "k", s3).queryExecution.optimizedPlan.toString
    assert(!p2.contains("BroadcastHint") && !p3.contains("_salt"))
    // ...and every strategy computes the same rows
    Seq(s1, s2, s3).foreach { s =>
      assert(JoinAdvisor(fact, dim, "k", s)
        .select("k", "payload", "attr").orderBy("payload").collect().toSeq ==
        plainRows.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2))),
        s"strategy $s changed the answer")
    }

    // collect → save → load round-trips the sidecar; collect sees the skew
    val st = JoinAdvisor.collect(fact, "k")
    assert(st.rows == 5000 && st.topKeys.head._1 == "7" && st.topKeys.head._2 == 3040)
    val p = java.nio.file.Files.createTempDirectory("advisor").toString + "/stats.json"
    JoinAdvisor.save(spark, p, st)
    assert(JoinAdvisor.load(spark, p) == st)
  }

  test("advisor auto-apply: same join, different sidecar stats, different pinned plans") {
    import graft.operators.JoinAdvisor
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("adv_auto").toString
    val factDir = s"$base/fact"; val dimDir = s"$base/dim"
    (1L to 5000L).map(i => (i % 50, s"pay_$i")).toDF("k", "payload")
      .write.mode("overwrite").parquet(factDir)
    (0L to 49L).map(i => (i, s"attr_$i")).toDF("k", "attr")
      .write.mode("overwrite").parquet(dimDir)
    def planOf(): (String, Seq[org.apache.spark.sql.Row]) = {
      val j = spark.read.parquet(factDir)
        .join(spark.read.parquet(dimDir), "k")
      (j.queryExecution.executedPlan.toString,
        j.groupBy("k").count().orderBy("k").collect().toSeq)
    }
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // kill size-based broadcasting so only the ADVISOR hint can pin it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.advisor.auto", "true")
      // stats say the dim side is tiny → broadcast hint pinned
      JoinAdvisor.analyzeTable(spark, factDir, spark.read.parquet(factDir), "k")
      JoinAdvisor.analyzeTable(spark, dimDir, spark.read.parquet(dimDir), "k")
      val (p1, rows1) = planOf()
      assert(p1.contains("BroadcastHashJoin"),
        s"sidecar-small dim must pin a broadcast:\n$p1")
      // SAME SQL, stats now claim both sides are huge → no hint, plain join
      JoinAdvisor.save(spark, s"$factDir/_advisor/k.json",
        JoinAdvisor.KeyStats(100000000L, 50, Seq(("1", 1L)), 64))
      JoinAdvisor.save(spark, s"$dimDir/_advisor/k.json",
        JoinAdvisor.KeyStats(90000000L, 50, Seq(("1", 1L)), 64))
      val (p2, rows2) = planOf()
      assert(!p2.contains("BroadcastHashJoin"),
        s"huge-stats sides must not broadcast:\n$p2")
      assert(rows1 == rows2, "strategy changed, rows must not")
      // flag off → stats ignored entirely
      spark.conf.set("spark.graft.advisor.auto", "false")
      JoinAdvisor.save(spark, s"$dimDir/_advisor/k.json",
        JoinAdvisor.KeyStats(50, 50, Seq(("1", 1L)), 16))
      val (p3, _) = planOf()
      assert(!p3.contains("BroadcastHashJoin"), "opt-in flag must gate the rule")
      // a filtered side must NOT consult row stats (cardinality changed)
      spark.conf.set("spark.graft.advisor.auto", "true")
      val jf = spark.read.parquet(factDir).filter(col("k") < 10)
        .join(spark.read.parquet(dimDir).filter(col("attr") =!= "x"), "k")
      assert(!jf.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "filter invalidates sidecar row stats")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.graft.advisor.auto", "false")
    }
  }
}
