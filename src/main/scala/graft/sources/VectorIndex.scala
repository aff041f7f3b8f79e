package graft.sources

import graft.functions.Similarity
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF vector index AT REST: the in-memory centroid-routed search of
  * SimilarityQueries (`q_knn_ivf*`, `q_knn_kmeans`) persisted as a
  * layout, so probing becomes partition PRUNING. The index is the
  * embedding table written hive-partitioned by nearest-centroid cell
  * (`cell=`), with the trained centroid table in a `_centroids` sidecar
  * (underscore-prefixed → invisible to parquet data discovery). A
  * query routes to its top-`probes` cells and reads the index with a
  * LITERAL cell filter — the scan plans PartitionFilters and never
  * opens an unprobed cell's files (plan-asserted in IndexSpec), which
  * is what turns O(corpus) per query into O(probes · corpus/cells) of
  * actual I/O at 100 TB, not just of compute.
  *
  * Determinism: training quantizes vectors ONCE to the 2²⁰ integer
  * grid (the q_knn_kmeans contract) — distances are exact integer
  * sums, centroid updates are scale-0 rounds of exact-integer ratios,
  * argmin ties break on cell id, init is the first `cells` vectors by
  * id — so the same corpus always builds the same index. Driver state
  * is bounded by cells·dim (the centroid table), never the corpus.
  */
object VectorIndex {

  val CellCol = "cell"
  private val Grid = 1048576.0d // 2^20 quantization units

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Nearest-cell assignment over broadcast centroids: exact integer
    * squared distance on the unit grid, ties to the lowest cell id.
    * Dictionary-driven loop → the documented UDF exception; one narrow
    * pass, no shuffle. */
  def assignCell(spark: SparkSession, cents: Array[Array[Long]]): Column => Column = {
    val b = spark.sparkContext.broadcast(cents)
    val f = udf { (v: Seq[Double]) =>
      val cs = b.value
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cs.length) {
        val cent = cs(c)
        var d = 0L
        var i = 0
        while (i < cent.length && i < v.length) {
          val diff = math.round(v(i) * Grid) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    c => f(asDouble(c))
  }

  /** Distributed Lloyd on the integer-unit grid. Per iteration:
    * assignment is a narrow pass over the corpus, the update is ONE
    * shuffle keyed on (cell, component) whose output — cells·dim rows —
    * is the only thing the driver ever holds. */
  def trainCentroids(emb: DataFrame, idCol: String, vecCol: String,
      cells: Int, iters: Int): Array[Array[Long]] = {
    val spark = emb.sparkSession
    var cents: Array[Array[Long]] = emb
      .orderBy(col(idCol)).limit(cells)
      .select(asDouble(col(vecCol))).collect()
      .map(_.getSeq[Double](0).map(v => math.round(v * Grid)).toArray)
    (0 until iters).foreach { _ =>
      val assigned = emb.select(
        assignCell(spark, cents)(col(vecCol)).as(CellCol),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "v")))
      val sums = assigned
        .select(col(CellCol), col("pos"), round(col("v") * Grid).cast("long").as("uq"))
        .groupBy(CellCol, "pos")
        .agg(sum("uq").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone()) // empty cells keep their centroid
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          math.round(r.getLong(2).toDouble / r.getLong(3))
      }
      cents = next
    }
    cents
  }

  /** Train + write: the embedding table lands partitioned by nearest
    * cell; the centroid table lands in the `_centroids` sidecar. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
      cells: Int, iters: Int, path: String): Unit = {
    val spark = emb.sparkSession
    val cents = trainCentroids(emb, idCol, vecCol, cells, iters)
    emb.withColumn(CellCol, assignCell(spark, cents)(col(vecCol)))
      .write.mode(SaveMode.Overwrite).partitionBy(CellCol).parquet(path)
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "c_units")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path + "/_centroids")
  }

  def loadCentroids(spark: SparkSession, path: String): Array[Array[Long]] =
    spark.read.parquet(path + "/_centroids").orderBy("cid")
      .select(col("c_units")).collect()
      .map(_.getSeq[Long](0).toArray)

  /** INCREMENTAL append: route new vectors with the index's EXISTING
    * centroids (no retrain — cells stay stable between rebuilds, the
    * standard IVF maintenance contract) and append their rows into the
    * cell partitions. One narrow assignment pass + an append-mode
    * partitioned write; untouched cells gain no files, queries need no
    * code path change, and repeated appends compose with
    * [[VectorStore.compact]]-style layout maintenance. Rebuild (retrain)
    * only when appended mass shifts the centroids enough to hurt recall
    * — the published IVF practice. */
  def append(spark: SparkSession, path: String, emb: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val cents = loadCentroids(spark, path)
    // align to the ON-DISK schema before writing: parquet append with a
    // drifted column type (double vectors into a float index) would
    // poison every later scan with a reader-side type-mismatch failure
    val stored = spark.read.parquet(path).schema
    val aligned = emb.select(stored.filterNot(_.name == CellCol)
      .map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    aligned.withColumn(CellCol, assignCell(spark, cents)(col(vecCol)))
      .write.mode(SaveMode.Append).partitionBy(CellCol).parquet(path)
  }

  /** Fold append-accumulated small files back into scan-sized cell
    * files ([[CellCompaction]] — the same maintenance face as the
    * three text-index families): only oversized cells rewrite, rows
    * and query results unchanged, `_centroids` untouched. With
    * [[driftFraction]]/[[rebuildIfDrifted]] this completes the IVF
    * maintenance loop: appends between rebuilds cost O(new rows),
    * compaction keeps per-cell file counts flat, retrain only on
    * measured recall drift. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[String] =
    CellCompaction.compact(spark, path, CellCol, targetBytes)

  /** Drift measurement for the rebuild decision the [[append]] contract
    * references: recompute each cell's mean over the CURRENT index rows
    * (exactly the Lloyd update step — one narrow pass + one
    * (cell, component) shuffle whose cells·dim output is all the driver
    * holds) and report the fraction of rows that would change cells if
    * those means replaced the stored centroids. Near 0 right after a
    * converged build; grows as appended mass pulls the true cell means
    * away from the frozen centroids — the recall-degradation proxy an
    * index operator alerts on. Two corpus passes, both narrow; no row
    * data on the driver. */
  def driftFraction(spark: SparkSession, path: String, vecCol: String): Double = {
    val stored = loadCentroids(spark, path)
    val rows = spark.read.parquet(path)
      .select(col(CellCol).cast("int").as(CellCol), asDouble(col(vecCol)).as(vecCol))
    val sums = rows
      .select(col(CellCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col(CellCol), col("pos"), round(col("v") * Grid).cast("long").as("uq"))
      .groupBy(CellCol, "pos")
      .agg(sum("uq").as("s"), count(lit(1)).as("n"))
      .collect()
    val updated = stored.map(_.clone()) // empty cells keep their centroid
    sums.foreach { r =>
      updated(r.getInt(0))(r.getInt(1)) =
        math.round(r.getLong(2).toDouble / r.getLong(3))
    }
    val total = rows.count()
    if (total == 0) 0.0
    else rows.filter(assignCell(spark, updated)(col(vecCol)) =!= col(CellCol))
      .count().toDouble / total
  }

  /** Retrain-on-drift: when [[driftFraction]] crosses `threshold`,
    * rebuild the index from its own current rows (fresh Lloyd training,
    * same cell count). The row set is pinned via `localCheckpoint`
    * BEFORE the overwrite — the rebuild reads the path it replaces.
    * Returns true iff a rebuild happened. */
  def rebuildIfDrifted(spark: SparkSession, path: String, idCol: String,
      vecCol: String, cells: Int, iters: Int, threshold: Double): Boolean = {
    val f = driftFraction(spark, path, vecCol)
    if (f <= threshold) false
    else {
      val rows = spark.read.parquet(path).drop(CellCol).localCheckpoint()
      build(rows, idCol, vecCol, cells, iters, path)
      true
    }
  }

  /** Top-`probes` cells for one query vector, by the same exact-integer
    * distance as assignment (ties to lowest cell id). */
  def probeCells(cents: Array[Array[Long]], q: Array[Double], probes: Int): Seq[Int] =
    cents.zipWithIndex.map { case (cent, cid) =>
      var d = 0L
      var i = 0
      while (i < cent.length && i < q.length) {
        val diff = math.round(q(i) * Grid) - cent(i)
        d += diff * diff
        i += 1
      }
      (d, cid)
    }.sorted.take(probes).map(_._2).toSeq

  /** Serve a batch of queries: per query route to `probes` cells, read
    * the index with a literal cell filter (partition pruning skips
    * every other cell's files), exact cosine within candidates, top-k.
    * The query batch is serving-sized — it broadcasts; the INDEX side
    * stays distributed and is never collected. */
  def query(spark: SparkSession, path: String, idCol: String, vecCol: String,
      queries: Seq[(Long, Array[Double])], probes: Int, k: Int): DataFrame = {
    val cents = loadCentroids(spark, path)
    val routed = queries.flatMap { case (qid, qv) =>
      probeCells(cents, qv, probes).map(c => (qid, c, qv.toSeq))
    }
    val cellSet = routed.map(_._2).distinct
    import spark.implicits._
    val qdf = routed.toDF("qid", CellCol, "qe")
    val cand = spark.read.parquet(path)
      .filter(col(CellCol).isin(cellSet: _*))
      .join(broadcast(qdf), Seq(CellCol))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("sim",
        Similarity.cosineIn(spark, col("qe"), asDouble(col(vecCol))))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col(idCol))
    cand.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col(idCol), col(CellCol), col("sim"), col("rk"))
      .orderBy("qid", "rk")
  }
}
