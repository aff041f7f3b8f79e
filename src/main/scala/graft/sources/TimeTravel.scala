package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table with snapshot isolation, time travel and rollback —
  * the Delta/Iceberg commit protocol reduced to its load-bearing core:
  *
  *   - data files are IMMUTABLE: each commit writes its rows to a fresh
  *     `data/v<NNNNN>/` directory and never touches earlier ones;
  *   - a snapshot is a MANIFEST (`_versions/v<NNNNN>.json`) listing the
  *     data directories visible at that version — append = previous
  *     listing + the new directory, overwrite = just the new one,
  *     rollback = re-publish an old listing as a NEW version (history
  *     is never rewritten);
  *   - a manifest is published by atomic rename from a staging name, so
  *     readers either see a complete snapshot or the previous one —
  *     never a half-written table (the same checked-rename discipline
  *     as [[VectorStore]]'s partition swap);
  *   - readers resolve a version (or latest) to its listing and read
  *     exactly those directories — old snapshots stay readable until
  *     explicitly vacuumed, which is what makes reproducible training
  *     runs possible ("train on the corpus exactly as of version 12").
  *
  * Scale posture: commit cost is O(new data) + one manifest rename —
  * append NEVER rewrites history (contrast the full-table overwrite a
  * naive pipeline does); a manifest is O(commits) strings; version
  * resolution is one small-file read on the driver, the same planning
  * cost as any table format's log replay.
  */
/** The losing writer's publish failure — two writers read the same
  * latest version and raced to the same manifest name; the loser must
  * re-read and retry ([[TimeTravel.withConflictRetry]]), never replace
  * the winner. A dedicated type so retry logic catches exactly the
  * race and nothing else. */
final class CommitConflictException(msg: String) extends java.io.IOException(msg)

object TimeTravel {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def vname(v: Long) = f"v$v%05d"
  private def manifestDir(path: String) = new Path(s"$path/_versions")
  private def dataDir(path: String, v: Long) = s"data/${vname(v)}"
  private def dvDir(v: Long) = s"dv/${vname(v)}"

  /** DV tombstone key columns: (file URI, row position within file) —
    * `_metadata.row_index` is stable per physical parquet file, which
    * is exactly why table formats key deletion vectors on it. */
  private[sources] val DvCols = Seq("_dv_fp", "_dv_ri")

  /** Versions in commit order (empty for a fresh path). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    if (!f.exists(manifestDir(path))) Seq.empty
    else f.listStatus(manifestDir(path)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  private def latest(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  /** The newest version committed AT OR BEFORE `tsMillis` — the
    * `TIMESTAMP AS OF` resolution rule, read from the manifests' own
    * publish mtimes (each commit is one atomic manifest rename, so its
    * mtime IS the commit instant). Loud when the timestamp predates
    * the first commit: silently serving a later snapshot would lie
    * about history. Driver-side O(commits) stat calls. */
  def versionAsOf(spark: SparkSession, path: String, tsMillis: Long): Long = {
    val f = fs(spark, path)
    val eligible = versions(spark, path).filter { v =>
      f.getFileStatus(new Path(manifestDir(path), s"${vname(v)}.json"))
        .getModificationTime <= tsMillis
    }
    eligible.lastOption.getOrElse(throw new IllegalArgumentException(
      s"no version at $path committed at or before epoch-millis $tsMillis"))
  }

  /** Commit tags already present in the manifest history (used for
    * idempotent streaming appends: a replayed micro-batch finds its own
    * tag and skips). */
  def tags(spark: SparkSession, path: String): Set[String] =
    versions(spark, path).flatMap { v =>
      """"tag"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(rawManifest(spark, path, v))
        .map(_.group(1))
    }.toSet

  private def rawManifest(spark: SparkSession, path: String, version: Long): String = {
    val f = fs(spark, path)
    val in = f.open(new Path(manifestDir(path), s"${vname(version)}.json"))
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** The data directories visible at `version`. */
  private[sources] def listing(spark: SparkSession, path: String, version: Long): Seq[String] = {
    val raw = rawManifest(spark, path, version)
    // manifest body: {"version":N,"dirs":["data/v00001",...]} — dirs are
    // relative, comma-split on a writer-controlled format (no user text).
    // A manifest that doesn't parse must FAIL the read, not silently
    // resolve to an empty table (every commit lists ≥1 directory).
    """"dirs"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(raw) match {
      case Some(m) if m.group(1).trim.nonEmpty =>
        m.group(1).split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
      case _ => throw new java.io.IOException(
        s"corrupt manifest ${vname(version)}.json: no dirs listing in: ${raw.take(200)}")
    }
  }

  /** Deletion-vector directories visible at `version` — merge-on-read
    * tombstones layered over the (immutable) data listing. Absent field
    * = no DVs; old manifests parse unchanged. */
  private[sources] def dvListing(spark: SparkSession, path: String, version: Long): Seq[String] =
    """"dvs"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(rawManifest(spark, path, version)) match {
      case Some(m) if m.group(1).trim.nonEmpty =>
        m.group(1).split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
      case _ => Seq.empty
    }

  // ------------------------------------------ column mapping (schema v2)

  /** One logical column of a MAPPED table: `logical` is the name the
    * user sees NOW, `physical` the immutable name data files carry
    * (fixed at column creation — rename never rewrites a file), and
    * `typeDdl` the current declared type (old-era files cast up to it
    * on read — widening). The Delta column-mapping design reduced to
    * the manifest model. */
  final case class ColMap(logical: String, physical: String, typeDdl: String)

  /** Manifest encoding of one [[ColMap]]: `logical|physical|typeDdl`
    * with any comma in the DDL (decimal(p,s)) swapped to ';' so the
    * flat manifest list parse stays one comma-split. */
  private def encodeCol(c: ColMap): String =
    s"${c.logical}|${c.physical}|${c.typeDdl.replace(",", ";")}"

  private def decodeCol(s: String): ColMap = s.split('|') match {
    case Array(l, p, t) => ColMap(l, p, t.replace(";", ","))
    case _ => throw new java.io.IOException(s"corrupt cols entry: $s")
  }

  /** The column mapping visible at `version` — None for tables that
    * never evolved past add-column (the fast single-scan paths stay
    * untouched for them). */
  private[sources] def colsListing(spark: SparkSession, path: String,
      version: Long): Option[Seq[ColMap]] =
    """"cols"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(rawManifest(spark, path, version)) match {
      case Some(m) if m.group(1).trim.nonEmpty =>
        Some(m.group(1).split(",").toSeq
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).map(decodeCol))
      case _ => None
    }

  private def encodedColsAt(spark: SparkSession, path: String, v: Option[Long]): Seq[String] =
    v.flatMap(colsListing(spark, path, _)).map(_.map(encodeCol)).getOrElse(Seq.empty)

  /** Project a LOGICAL-schema DataFrame into physical file shape for a
    * write under `cols` (rename-era appends keep writing the immutable
    * physical names; widened columns write the widened type — new
    * files are born wide, old ones cast on read). */
  private def toPhysical(df: DataFrame, cols: Seq[ColMap]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val have = df.columns.toSet
    val missing = cols.map(_.logical).filterNot(have)
    require(missing.isEmpty,
      s"write is missing mapped column(s): ${missing.mkString(", ")}")
    val extra = have.diff(cols.map(_.logical).toSet)
    require(extra.isEmpty,
      s"write carries column(s) outside the table's mapped schema: ${extra.mkString(", ")}")
    df.select(cols.map(c => col(c.logical).cast(c.typeDdl).as(c.physical)): _*)
  }

  /** Per-directory mapped scan (physical → logical, cast to declared
    * type, absent physical columns null) with optional (file, pos)
    * metadata columns — the read substrate every mapped-table path
    * shares. One plan branch per directory: a widened table's dirs
    * legitimately disagree on parquet types, which a single mixed scan
    * cannot host; directory count is bounded by commits and folds back
    * to 1 at the next OPTIMIZE. */
  private def mappedScan(spark: SparkSession, path: String, dirs: Seq[String],
      cols: Seq[ColMap], withPos: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val frames = dirs.map { d =>
      val raw = spark.read.parquet(s"$path/$d")
      val have = raw.columns.toSet
      val projected = cols.map { c =>
        (if (have(c.physical)) col(c.physical).cast(c.typeDdl)
         else lit(null).cast(c.typeDdl)).as(c.logical)
      } ++ (if (withPos)
        Seq(col("_metadata.file_path").as(DvCols.head),
          col("_metadata.row_index").as(DvCols.last))
      else Seq.empty)
      raw.select(projected: _*)
    }
    frames.reduce(_.unionByName(_))
  }

  /** Materialize the identity mapping from the CURRENT logical schema —
    * the first rename/drop/widen turns an unmapped table into a mapped
    * one (physical = logical for every existing column). */
  private def currentOrIdentityCols(spark: SparkSession, path: String,
      v: Long): Seq[ColMap] =
    colsListing(spark, path, v).getOrElse(
      read(spark, path, Some(v)).schema.fields.toSeq.map(f =>
        ColMap(f.name, f.name, f.dataType.catalogString)))

  private def publishColsChange(spark: SparkSession, path: String,
      next: Seq[ColMap]): Long = {
    val cur = latest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path"))
    val v = cur + 1
    require(next.map(_.logical).distinct.size == next.size,
      "column mapping must keep logical names unique")
    next.foreach(c => require(!c.logical.contains("|") && !c.physical.contains("|"),
      s"column names must not contain '|': ${c.logical}"))
    publish(spark, path, v, listing(spark, path, cur),
      dvs = dvListing(spark, path, cur), cols = next.map(encodeCol))
    v
  }

  /** RENAME COLUMN as a metadata-only commit: the logical name changes,
    * every data file (old and new era) keeps its immutable physical
    * name and resolves through the map. Time travel reads each version
    * with ITS OWN mapping — pre-rename snapshots still serve the old
    * name. */
  def renameColumn(spark: SparkSession, path: String, from: String, to: String): Long = {
    val cur = latest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path"))
    val cols = currentOrIdentityCols(spark, path, cur)
    require(cols.exists(_.logical == from), s"no column $from to rename")
    require(!cols.exists(_.logical == to), s"column $to already exists")
    publishColsChange(spark, path,
      cols.map(c => if (c.logical == from) c.copy(logical = to) else c))
  }

  /** DROP COLUMN as a metadata-only commit: the entry leaves the map,
    * the bytes stay in the immutable files (still served to pre-drop
    * snapshots) until OPTIMIZE rewrites and VACUUM reclaims. */
  def dropColumn(spark: SparkSession, path: String, name: String): Long = {
    val cur = latest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path"))
    val cols = currentOrIdentityCols(spark, path, cur)
    require(cols.exists(_.logical == name), s"no column $name to drop")
    require(cols.size > 1, "cannot drop the last column")
    publishColsChange(spark, path, cols.filterNot(_.logical == name))
  }

  /** Widening types the read-side cast is lossless for — the Delta
    * type-widening allow-list shape. */
  private val Widenings: Set[(String, String)] = Set(
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"), ("int", "double"), ("bigint", "double"),
    ("float", "double"))

  /** WIDEN a column's declared type as a metadata-only commit: old
    * files keep their narrow parquet type and cast up on read; new
    * appends write the wide type. Only lossless widenings are allowed
    * — anything else must be an explicit rewrite. */
  def widenColumn(spark: SparkSession, path: String, name: String,
      toDdl: String): Long = {
    val cur = latest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path"))
    val cols = currentOrIdentityCols(spark, path, cur)
    val c = cols.find(_.logical == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name to widen"))
    require(Widenings.contains((c.typeDdl, toDdl)),
      s"widening ${c.typeDdl} -> $toDdl is not lossless; " +
        s"supported: ${Widenings.map { case (a, b) => s"$a->$b" }.mkString(", ")}")
    publishColsChange(spark, path,
      cols.map(x => if (x.logical == name) x.copy(typeDdl = toDdl) else x))
  }

  /** Publish `dirs` as version `v` via write-then-atomic-rename.
    * Visible to the test package so the concurrent-publish conflict
    * (a race the public API can't interleave) is testable directly. */
  private[graft] def publish(spark: SparkSession, path: String, v: Long, dirs: Seq[String],
      tag: Option[String] = None, dvs: Seq[String] = Seq.empty,
      cols: Seq[String] = Seq.empty): Unit = {
    val f = fs(spark, path)
    f.mkdirs(manifestDir(path))
    val tagField = tag.map(t => s""","tag":"$t"""").getOrElse("")
    val dvField =
      if (dvs.isEmpty) ""
      else dvs.map("\"" + _ + "\"").mkString(""","dvs":[""", ",", "]")
    val colField =
      if (cols.isEmpty) ""
      else cols.map("\"" + _ + "\"").mkString(""","cols":[""", ",", "]")
    val body = dirs.map("\"" + _ + "\"").mkString(
      s"""{"version":$v$tagField$dvField$colField,"dirs":[""", ",", "]}")
    val staging = new Path(manifestDir(path), s".${vname(v)}.json.staging")
    val out = f.create(staging, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val target = new Path(manifestDir(path), s"${vname(v)}.json")
    // OPTIMISTIC CONCURRENCY: two writers that both read "latest = N"
    // will both try to publish N+1 — the loser must FAIL (and retry on
    // a fresh read), never silently replace the winner's commit. Local
    // rename() replaces existing targets, so check-then-rename here;
    // a real deployment backs this with an atomic create-if-absent
    // (HDFS create w/o overwrite, S3 conditional put, a lock service).
    if (f.exists(target))
      throw new CommitConflictException(
        s"concurrent commit conflict: ${vname(v)} already published — " +
          "re-read latest and retry")
    if (!f.rename(staging, target))
      throw new java.io.IOException(s"manifest publish failed for ${vname(v)}")
  }

  // --------------------------------------------- multi-writer semantics

  /** What a committed version DID relative to its predecessor — the
    * classification the conflict matrix keys on:
    *   - `Append`: directories only added (or unchanged — a pure
    *     watermark commit), deletion vectors and column mapping
    *     untouched; conflicts with nothing.
    *   - `RowLevel`: directories only added but DVs changed (delete/
    *     update/replaceWhere); the row set shrank or mutated.
    *   - `SchemaChange`: data and DVs untouched but the column MAPPING
    *     changed (rename/drop/widen DDL, or a rollback across one) —
    *     the rows are intact but their logical shape moved.
    *   - `Rewrite`: directories DROPPED (overwrite/merge/rollback/
    *     optimize/purge); the snapshot was replaced wholesale. */
  sealed trait CommitKind
  case object Append extends CommitKind
  case object RowLevel extends CommitKind
  case object SchemaChange extends CommitKind
  case object Rewrite extends CommitKind

  /** Classify version `v` against `v - 1` (the first version of a
    * table is an Append: it conflicts with nothing that could have
    * read an earlier state). Driver-side manifest reads only. A commit
    * that both rewrote data and changed the mapping (OPTIMIZE folding
    * a mapped era) classifies as the stronger Rewrite. */
  def classifyCommit(spark: SparkSession, path: String, v: Long): CommitKind = {
    val vs = versions(spark, path)
    val prev = vs.takeWhile(_ < v).lastOption
    prev match {
      case None => Append
      case Some(p) =>
        val before = listing(spark, path, p)
        val after = listing(spark, path, v).toSet
        if (before.exists(!after.contains(_))) Rewrite
        else if (dvListing(spark, path, v) != dvListing(spark, path, p)) RowLevel
        else if (colsListing(spark, path, v) != colsListing(spark, path, p))
          SchemaChange
        else Append
    }
  }

  /** Bounded OPTIMISTIC-CONCURRENCY retry around a commit operation —
    * the Delta conflict matrix reduced to the manifest model. `op`
    * must be a self-contained commit attempt that re-reads the LATEST
    * snapshot each time it runs (every library op does); on a
    * [[CommitConflictException]] the loser re-runs `op` against the
    * fresh snapshot, which is exactly serializing it AFTER the winner:
    *
    *   - append attempts (`rowLevel = false`) retry unconditionally —
    *     an append reads nothing, so nothing the winner did can
    *     invalidate it;
    *   - row-level attempts (delete/update/merge-by-predicate,
    *     `rowLevel = true`) retry only when every intervening commit
    *     was an Append, RowLevel, or SchemaChange — re-evaluating the
    *     predicate over more/less rows is the serialized semantics,
    *     and across a concurrent DDL commit the retried attempt
    *     resolves against the NEW schema: a rename/drop of a column
    *     outside the predicate is invisible to it, while a predicate
    *     whose own column was dropped or renamed fails LOUDLY at
    *     resolution (there is no silent path to the wrong rows).
    *     An intervening REWRITE replaced the snapshot the caller's
    *     intent targeted; re-applying a predicate to a wholesale-
    *     replaced table is a semantic decision, so it fails LOUDLY
    *     (Delta's ConcurrentWriteException for the same reason).
    *
    * `maxRetries` bounds livelock under sustained contention; the
    * final failure chains the conflict for the caller's own backoff. */
  def withConflictRetry(spark: SparkSession, path: String,
      rowLevel: Boolean, maxRetries: Int = 3)(op: => Long): Long = {
    var attempt = 0
    while (true) {
      val base = latest(spark, path).getOrElse(0L)
      try return op
      catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt > maxRetries) throw new java.io.IOException(
            s"commit to $path still conflicting after $maxRetries retries", e)
          val now = latest(spark, path).getOrElse(0L)
          if (rowLevel) {
            val rewrites = ((base + 1) to now)
              .filter(v => classifyCommit(spark, path, v) == Rewrite)
            if (rewrites.nonEmpty) throw new IllegalStateException(
              s"concurrent rewrite commit(s) v${rewrites.mkString(",v")} at $path " +
                "replaced the snapshot this row-level operation targeted; " +
                "re-read the table and decide whether the predicate still applies", e)
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Append with bounded auto-retry — the multi-writer face of
    * [[commitAppend]]: concurrent appends all land, each as its own
    * version, in rename-race order. */
  def commitAppendRetrying(df: DataFrame, path: String,
      tag: Option[String] = None, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, maxRetries: Int = 3): Long =
    withConflictRetry(df.sparkSession, path, rowLevel = false, maxRetries) {
      commitAppend(df, path, tag, statsCols, bloomCols)
    }

  /** Merge-on-read DELETE with bounded auto-retry: the retried attempt
    * recomputes its tombstones against the fresh snapshot (serialized
    * after the winner); an intervening rewrite fails loudly. */
  def deleteMoRRetrying(spark: SparkSession, path: String,
      condition: org.apache.spark.sql.Column, maxRetries: Int = 3): Long =
    withConflictRetry(spark, path, rowLevel = true, maxRetries) {
      deleteMoR(spark, path, condition)
    }

  private def writeData(df: DataFrame, path: String, v: Long): String = {
    val dir = dataDir(path, v)
    // overwrite: a crash between data write and manifest publish leaves
    // an orphan (invisible) dir that the retried commit must reclaim
    df.write.mode("overwrite").parquet(s"$path/$dir")
    dir
  }

  /** Append commit: new rows become visible alongside every directory
    * the previous version saw. Returns the new version number.
    * `statsCols` opts the new directory into per-file min/max/count
    * sidecars ([[readPruned]] file skipping) — collected from just the
    * freshly written files (commit stays O(new data)), published
    * BEFORE the manifest so a snapshot never sees a half-built
    * sidecar. */
  def commitAppend(df: DataFrame, path: String, tag: Option[String] = None,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val cur = latest(spark, path)
    val v = cur.getOrElse(0L) + 1
    val prev = cur.map(listing(spark, path, _)).getOrElse(Seq.empty)
    // existing tombstones carry forward: they key on (file, pos) of the
    // immutable old directories, which an append never touches
    val prevDvs = cur.map(dvListing(spark, path, _)).getOrElse(Seq.empty)
    // a mapped table's appends arrive in LOGICAL shape and write the
    // immutable physical names; the mapping itself carries forward
    val mapping = cur.flatMap(colsListing(spark, path, _))
    val dir = writeData(mapping.map(toPhysical(df, _)).getOrElse(df), path, v)
    // sidecars key on the PHYSICAL names the files carry: a caller's
    // logical statsCols translate through the era's map (the probe side
    // translates back — [[planProbes]]), so skipping keeps working
    // across renames
    def phys(c: String): String =
      mapping.flatMap(_.find(_.logical == c)).map(_.physical).getOrElse(c)
    if (statsCols.nonEmpty || bloomCols.nonEmpty)
      writeStatsFor(spark, path, dir, statsCols.map(phys), bloomCols.map(phys))
    publish(spark, path, v, prev :+ dir, tag, prevDvs,
      cols = encodedColsAt(spark, path, cur))
    v
  }

  /** Idempotent tagged append — the EXACTLY-ONCE streaming sink face:
    * if `tag`'s commit already exists (an at-least-once foreachBatch
    * replay, or a retry after a crash-after-publish), the call is a
    * no-op returning the live version; otherwise it appends with the
    * tag. Tag uniqueness is the caller's batch identity (e.g.
    * "ingest:<batchId>"). */
  def appendOnce(df: DataFrame, path: String, tag: String,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    if (tags(spark, path).contains(tag)) latest(spark, path).get
    else commitAppend(df, path, Some(tag), statsCols, bloomCols)
  }

  /** Overwrite commit: the new version sees ONLY the new rows; earlier
    * snapshots keep their files and remain readable. `statsCols` as on
    * [[commitAppend]]. */
  def commitOverwrite(df: DataFrame, path: String,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val cur = latest(spark, path)
    val v = cur.getOrElse(0L) + 1
    val mapping = cur.flatMap(colsListing(spark, path, _))
    val dir = writeData(mapping.map(toPhysical(df, _)).getOrElse(df), path, v)
    def phys(c: String): String =
      mapping.flatMap(_.find(_.logical == c)).map(_.physical).getOrElse(c)
    if (statsCols.nonEmpty || bloomCols.nonEmpty)
      writeStatsFor(spark, path, dir, statsCols.map(phys), bloomCols.map(phys))
    publish(spark, path, v, Seq(dir), cols = encodedColsAt(spark, path, cur))
    v
  }

  /** Build a FRESH table's first N commits in one parallel staging
    * pass. Byte-identical outcome to `commitOverwrite(batches.head)`
    * followed by `commitAppend(batches(i))` in order — same
    * `data/vNNNNN` directories, same stats sidecars, same cumulative
    * manifest listings — but the 2·N sequential Spark jobs (write +
    * stats per commit) run as N concurrent pairs, and the N manifests
    * publish afterwards in order (driver-side microseconds each).
    * Overlapping independent jobs is optimization guide §2.6; the
    * per-commit jobs are independent ONLY because the version slots
    * are pre-assigned 1..N, which is sound solely on an empty table —
    * hence the fresh-table guard (concurrent writers would race the
    * pre-assigned names, so this is a bulk-build tool, not a
    * multi-writer commit path; those stay on [[commitAppendRetrying]]).
    */
  def commitSeries(batches: Seq[DataFrame], path: String,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Seq[Long] = {
    require(batches.nonEmpty, "commitSeries needs at least one batch")
    val spark = batches.head.sparkSession
    require(latest(spark, path).isEmpty,
      s"commitSeries pre-assigns versions 1..N and requires a fresh table at $path")
    val vs = (1L to batches.size.toLong).toSeq
    val dirs = ParallelJobs.awaitAll(vs.zip(batches).map { case (v, b) =>
      () => {
        val dir = writeData(b, path, v)
        if (statsCols.nonEmpty || bloomCols.nonEmpty)
          writeStatsFor(spark, path, dir, statsCols, bloomCols)
        dir
      }
    })
    vs.foreach(v => publish(spark, path, v, dirs.take(v.toInt)))
    vs
  }

  /** Roll back by PUBLISHING `toVersion`'s listing as a new version —
    * an undo that is itself in the history, never a history rewrite.
    * The target's column MAPPING restores with its listing: rolling
    * back across a rename/drop/widen undoes the schema change too. */
  def rollback(spark: SparkSession, path: String, toVersion: Long): Long = {
    val v = latest(spark, path).getOrElse(0L) + 1
    publish(spark, path, v, listing(spark, path, toVersion),
      dvs = dvListing(spark, path, toVersion),
      cols = encodedColsAt(spark, path, Some(toVersion)))
    v
  }

  /** Read a snapshot: `version` = None for latest. `mergeSchema` unions
    * the listed directories' schemas (SCHEMA EVOLUTION across commits:
    * a widened append coexists with narrow history — old files surface
    * the added columns as null, old snapshots keep reading with their
    * own original schema). */
  def read(spark: SparkSession, path: String, version: Option[Long] = None,
      mergeSchema: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    val v = version.orElse(latest(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path"))
    val dirs = listing(spark, path, v)
    val dvs = dvListing(spark, path, v)
    val mapping = colsListing(spark, path, v)
    if (dirs.isEmpty) spark.emptyDataFrame
    else mapping match {
      case Some(cols) =>
        // column-mapped snapshot: per-dir physical→logical projection
        // (each version resolves through ITS OWN map — time travel
        // across a rename serves each era's names)
        val data = mappedScan(spark, path, dirs, cols, withPos = dvs.nonEmpty)
        if (dvs.isEmpty) data
        else data.join(spark.read.parquet(dvs.map(d => s"$path/$d"): _*),
          DvCols, "left_anti").drop(DvCols: _*)
      case None =>
        val data = spark.read.option("mergeSchema", mergeSchema.toString)
          .parquet(dirs.map(d => s"$path/$d"): _*)
        if (dvs.isEmpty) data
        else {
          // merge-on-read: subtract the tombstoned (file, pos) pairs. The
          // DV side is O(deleted rows) and AQE broadcasts it when small —
          // the read-amplification a MoR table pays until OPTIMIZE folds
          // the DVs back into data files.
          val withPos = data.select(col("*"),
            col("_metadata.file_path").as(DvCols.head),
            col("_metadata.row_index").as(DvCols.last))
          val dv = spark.read.parquet(dvs.map(d => s"$path/$d"): _*)
          withPos.join(dv, DvCols, "left_anti").drop(DvCols: _*)
        }
    }
  }

  /** Merge-on-read DELETE: tombstone the live rows matching `condition`
    * by (file, row-position) in a NEW deletion-vector directory — the
    * data files are never rewritten. Cost is one scan emitting only the
    * matched positions (O(matches) output); the pre-delete snapshot
    * stays time-travelable, and [[optimize]] later folds the DVs into a
    * compacted rewrite. Rows already tombstoned are skipped, so deletes
    * compose without double-counting. This is the cheap-delete half of
    * the copy-on-write/merge-on-read trade: [[merge]]/[[purge]] rewrite
    * (CoW), deleteMoR defers the rewrite to maintenance time. */
  /** Loud decline for faces that plan a single mixed physical scan and
    * so cannot host a column mapping (file skipping, the DSv2/SQL
    * relation): silently scanning physical names would serve wrong or
    * stale columns — the same reason Delta gates column mapping behind
    * reader-version features. */
  private[sources] def requireUnmapped(spark: SparkSession, path: String,
      v: Long, what: String): Unit =
    if (colsListing(spark, path, v).nonEmpty)
      throw new UnsupportedOperationException(
        s"$what does not support column-mapped tables (rename/drop/widen " +
          s"history at $path); read via TimeTravel.read")

  /** (file, pos)-annotated LOGICAL scan of a snapshot's data dirs —
    * the row-level ops' shared substrate; mapped tables project per
    * directory, plain ones keep the single mixed scan. */
  private def scanWithPos(spark: SparkSession, path: String, v: Long,
      dirs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    colsListing(spark, path, v) match {
      case Some(cols) => mappedScan(spark, path, dirs, cols, withPos = true)
      case None => spark.read.parquet(dirs.map(d => s"$path/$d"): _*)
        .select(col("*"),
          col("_metadata.file_path").as(DvCols.head),
          col("_metadata.row_index").as(DvCols.last))
    }
  }

  /** Loud resolution gate for row-level predicates/assignments: every
    * column an expression NAMES must exist in the snapshot's LOGICAL
    * schema. Spark's add-missing-references resolution would otherwise
    * reach through the logical projection into the files' physical
    * columns — a predicate on a just-dropped/renamed column must fail
    * loudly (the DDL half of the conflict matrix), never silently bind
    * to stale bytes. */
  private def requireRefsResolvable(spark: SparkSession, path: String, v: Long,
      what: String, exprs: Seq[org.apache.spark.sql.Column]): Unit = {
    // analyze each expression against a FRESH zero-row frame carrying
    // only the logical schema: a fresh lineage has no physical columns
    // for the analyzer to quietly add back, so a stale name fails here
    // and nowhere binds to the files' bytes
    val schema = read(spark, path, Some(v)).schema
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    exprs.foreach { c =>
      try { probe.select(c).queryExecution.analyzed; () }
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"$what does not resolve against the current schema of $path " +
              s"(${schema.fieldNames.mkString(", ")}) — a concurrent DDL may " +
              "have renamed or dropped a column it references; re-read the " +
              s"table and restate the operation (${e.getMessage})", e)
      }
    }
  }

  def deleteMoR(spark: SparkSession, path: String,
      condition: org.apache.spark.sql.Column): Long = {
    val cur = latest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"nothing to delete at $path"))
    requireRefsResolvable(spark, path, cur, "DELETE predicate", Seq(condition))
    val dirs = listing(spark, path, cur)
    val prevDvs = dvListing(spark, path, cur)
    val v = cur + 1
    val data = scanWithPos(spark, path, cur, dirs)
    val live =
      if (prevDvs.isEmpty) data
      else data.join(
        spark.read.parquet(prevDvs.map(d => s"$path/$d"): _*), DvCols, "left_anti")
    live.filter(condition).select(DvCols.head, DvCols.tail: _*)
      .write.mode("overwrite").parquet(s"$path/${dvDir(v)}")
    publish(spark, path, v, dirs, dvs = prevDvs :+ dvDir(v),
      cols = encodedColsAt(spark, path, Some(cur)))
    v
  }

  /** Merge-on-read UPDATE: tombstone the live rows matching `condition`
    * and append their updated copies — `sets` maps column name → new
    * value expression (unmentioned columns carry over; values are cast
    * back to the column's declared type so the table schema never
    * drifts). Both the deletion-vector directory and the new data
    * directory publish in ONE manifest rename, so a reader sees either
    * the whole update or none of it, and the pre-update snapshot stays
    * time-travelable. Returns the new version (the current one when
    * nothing matched — a no-op update does not commit).
    *
    * Scale: cost is one scan + O(matched) tombstones + O(matched) new
    * rows — the 100 TB story for the typical low-selectivity UPDATE;
    * the unmatched bulk of the table is never rewritten ([[optimize]]
    * later folds the DVs, same as [[deleteMoR]]). */
  def updateMoR(spark: SparkSession, path: String,
      condition: org.apache.spark.sql.Column,
      sets: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    import org.apache.spark.sql.functions.col
    val cur = latest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"nothing to update at $path"))
    requireRefsResolvable(spark, path, cur, "UPDATE predicate/assignment",
      condition +: sets.map(_._2))
    val dirs = listing(spark, path, cur)
    val prevDvs = dvListing(spark, path, cur)
    val mapping = colsListing(spark, path, cur)
    val v = cur + 1
    val data = scanWithPos(spark, path, cur, dirs)
    val live =
      if (prevDvs.isEmpty) data
      else data.join(
        spark.read.parquet(prevDvs.map(d => s"$path/$d"): _*), DvCols, "left_anti")
    val origCols = data.columns.filterNot(DvCols.contains).toSeq
    val setMap = sets.toMap
    val unknown = setMap.keySet.diff(origCols.toSet)
    require(unknown.isEmpty, s"UPDATE sets unknown column(s): ${unknown.mkString(", ")}")
    // checkpoint pins the matched set: tombstones and updated copies
    // must come from the SAME row set even under a flaky predicate
    val hit = live.filter(condition).localCheckpoint()
    if (hit.isEmpty) return cur
    val updated = hit.select(origCols.map { c =>
      setMap.get(c).map(_.cast(data.schema(c).dataType).as(c)).getOrElse(col(c))
    }: _*)
    // r16 (guide §2.6): tombstones and updated copies consume the SAME
    // pinned hit set and land in DISJOINT unpublished directories — run
    // the two writes as concurrent jobs (the small DV write back-fills
    // the data write's task tail); the single manifest rename below
    // still publishes both atomically
    ParallelJobs.awaitAll[Unit](Seq(
      () => hit.select(DvCols.head, DvCols.tail: _*)
        .write.mode("overwrite").parquet(s"$path/${dvDir(v)}"),
      () => mapping.map(toPhysical(updated, _)).getOrElse(updated)
        .write.mode("overwrite").parquet(s"$path/${dataDir(path, v)}")))
    publish(spark, path, v, dirs :+ dataDir(path, v), dvs = prevDvs :+ dvDir(v),
      cols = encodedColsAt(spark, path, Some(cur)))
    v
  }

  /** Partition-scoped overwrite — the Delta `replaceWhere` shape:
    * delete(condition) + append(df) in ONE commit. Live rows matching
    * `condition` are tombstoned merge-on-read style and the replacement
    * rows land in a fresh data directory; both publish in a single
    * manifest rename, so a reader sees either the whole replacement or
    * none of it. Untouched files are untouched BYTES — the scoped form
    * never rewrites data outside the predicate, which is the whole
    * point at 100 TB (a full `INSERT OVERWRITE` of a date-partitioned
    * table to refresh one day rewrites nothing but that day here).
    *
    * Loud-or-exact: every replacement row must itself satisfy
    * `condition` (Delta's replaceWhere constraint) — otherwise the
    * statement would smuggle rows into partitions it promised not to
    * touch, so rows outside the predicate fail the commit up front. */
  def replaceWhere(spark: SparkSession, path: String,
      condition: org.apache.spark.sql.Column, df: DataFrame): Long = {
    val cur = latest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"nothing to replace at $path"))
    requireRefsResolvable(spark, path, cur, "replaceWhere predicate", Seq(condition))
    val offenders = df.filter(!condition).limit(1).count()
    if (offenders > 0) throw new IllegalArgumentException(
      "replaceWhere: replacement rows must satisfy the replace condition " +
        "(a row outside the predicate would escape the declared scope)")
    val dirs = listing(spark, path, cur)
    val prevDvs = dvListing(spark, path, cur)
    val mapping = colsListing(spark, path, cur)
    val v = cur + 1
    val data = scanWithPos(spark, path, cur, dirs)
    val live =
      if (prevDvs.isEmpty) data
      else data.join(
        spark.read.parquet(prevDvs.map(d => s"$path/$d"): _*), DvCols, "left_anti")
    // r16 (guide §2.6): the tombstone write and the replacement write
    // share no state (live rows vs caller's df) and land in DISJOINT
    // unpublished directories — concurrent jobs, one atomic publish
    ParallelJobs.awaitAll[Unit](Seq(
      () => live.filter(condition).select(DvCols.head, DvCols.tail: _*)
        .write.mode("overwrite").parquet(s"$path/${dvDir(v)}"),
      () => mapping.map(toPhysical(df, _)).getOrElse(df)
        .write.mode("overwrite").parquet(s"$path/${dataDir(path, v)}")))
    publish(spark, path, v, dirs :+ dataDir(path, v), dvs = prevDvs :+ dvDir(v),
      cols = encodedColsAt(spark, path, Some(cur)))
    v
  }

  /** DESCRIBE HISTORY face: one row per committed version — its tag (if
    * any), how many data directories the snapshot sees, how many of
    * those this commit ADDED (0 ⇒ overwrite/rollback/metadata-only),
    * and its deletion-vector count. Driver-side O(commits) manifest
    * reads, no data touched — the audit surface an operator reads
    * before rolling back or vacuuming. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rows = versions(spark, path).map { v =>
      val dirs = listing(spark, path, v)
      val added = dirs.count(_ == dataDir(path, v))
      val tag = """"tag"\s*:\s*"([^"]*)"""".r
        .findFirstMatchIn(rawManifest(spark, path, v)).map(_.group(1))
      (v, tag, dirs.size, added, dvListing(spark, path, v).size)
    }
    rows.toDF("version", "tag", "n_dirs", "n_added", "n_dvs")
  }

  /** Incremental consumption of an APPEND-ONLY table: the rows committed
    * after `sinceVersion`, read from exactly the data directories the
    * newer manifests added — O(new data), no key join, no rescan of
    * history (the cheap fast path [[changeFeed]] generalizes; a
    * downstream index/aggregate consumes this per poll). If any commit
    * since `sinceVersion` was NOT a pure append (an overwrite, merge,
    * rollback or purge dropped a directory the old snapshot saw), the
    * directory diff is not the row delta — fail loudly so the consumer
    * resyncs via [[changeFeed]] instead of silently double-counting.
    * `toVersion` pins the snapshot the diff targets (default latest) —
    * a consumer that resolved "latest" BEFORE calling must pass it, or
    * a commit landing in between silently widens the delta past the
    * version mark the consumer records. */
  def readAppendsSince(spark: SparkSession, path: String, sinceVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    val cur = toVersion.orElse(latest(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path"))
    val added = appendedDirsSince(spark, path, sinceVersion, cur)
    if (added.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(added.map(d => s"$path/$d"): _*)
  }

  /** The directory diff behind [[readAppendsSince]] with its loud
    * append-only checks — shared with the streaming source face
    * ([[TimeTravelSource]]), whose micro-batches are exactly these
    * diffs between consecutive offsets. */
  private[sources] def appendedDirsSince(spark: SparkSession, path: String,
      sinceVersion: Long, toVersion: Long): Seq[String] = {
    val old = listing(spark, path, sinceVersion)
    val now = listing(spark, path, toVersion)
    val dropped = old.filterNot(now.toSet)
    if (dropped.nonEmpty) throw new IllegalStateException(
      s"table at $path diverged from append-only history since v$sinceVersion " +
        s"(dirs dropped: ${dropped.mkString(", ")}); resync with changeFeed")
    // a MoR delete keeps every dir but still changes the row set — the
    // added-dirs diff would silently miss the deletions
    if (dvListing(spark, path, toVersion) != dvListing(spark, path, sinceVersion))
      throw new IllegalStateException(
        s"deletion vectors changed since v$sinceVersion; resync with changeFeed")
    now.filterNot(old.toSet)
  }

  /** CHANGE DATA FEED: the row-level delta between two snapshots, keyed
    * on `key` (unique per snapshot) — every key classified as
    * `insert` / `delete` / `update_preimage`+`update_postimage` by one
    * co-partitioned FULL OUTER join with an md5 row-hash comparison;
    * unchanged rows are dropped in the same pass. This is the Delta CDF
    * read face recovered from plain snapshots: downstream consumers
    * (feature stores, index maintainers, [[InvertedIndex.append]]-style
    * incrementals) apply the feed instead of rescanning the table.
    *
    * Scale: both sides are table-sized, so the join shuffles on the key
    * and never broadcasts; output is O(changed rows). Column set is the
    * `to` snapshot's (schema evolution: a column added between the
    * versions surfaces as null on the preimage side). */
  def changeFeed(spark: SparkSession, path: String, key: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val after = read(spark, path, Some(toVersion))
    // align the preimage side to the `to` schema so the pre/post structs
    // unify (a column added between the versions reads as null here)
    val before0 = read(spark, path, Some(fromVersion))
    val bcols = before0.columns.toSet
    val before = before0.select(after.columns.toSeq.map(c =>
      if (bcols(c)) col(c)
      else lit(null).cast(after.schema(c).dataType).as(c)): _*)
    def pack(df: DataFrame) = {
      val cols = df.columns.sorted
        .map(c => coalesce(col(c).cast("string"), lit("\u0000null")))
      df.select(col(key).as("_k"),
        md5(concat_ws("\u0001", cols: _*)).as("_rh"),
        struct(df.columns.map(col).toSeq: _*).as("_row"))
    }
    val b = pack(before).withColumnsRenamed(Map("_rh" -> "_rh_b", "_row" -> "_row_b"))
    val a = pack(after).withColumnsRenamed(Map("_rh" -> "_rh_a", "_row" -> "_row_a"))
    b.join(a, Seq("_k"), "full_outer")
      .withColumn("_ct",
        when(col("_rh_b").isNull, "insert")
          .when(col("_rh_a").isNull, "delete")
          .when(col("_rh_b") =!= col("_rh_a"), "update"))
      .filter(col("_ct").isNotNull)
      .select(explode(
        when(col("_ct") === "insert",
          array(struct(col("_row_a").as("r"), lit("insert").as("t"))))
        .when(col("_ct") === "delete",
          array(struct(col("_row_b").as("r"), lit("delete").as("t"))))
        .otherwise(array(
          struct(col("_row_b").as("r"), lit("update_preimage").as("t")),
          struct(col("_row_a").as("r"), lit("update_postimage").as("t"))))).as("e"))
      .select(col("e.r.*"), col("e.t").as("_change_type"))
  }

  /** Compact the LIVE snapshot's accumulated directories into one
    * freshly-written directory published as a new version (the OPTIMIZE
    * half of the maintenance pair — [[vacuum]] then reclaims the old
    * dirs once no kept version references them). Row set is identical
    * by construction; `targetFiles` bounds the rewrite's output files.
    * History stays readable: this is a commit like any other. */
  def optimize(spark: SparkSession, path: String, targetFiles: Int = 1,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Long = {
    val v = latest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"nothing to optimize at $path"))
    // already compact = one data dir AND no deletion vectors to fold in
    if (listing(spark, path, v).size <= 1 && dvListing(spark, path, v).isEmpty) v
    else commitOverwrite(read(spark, path, Some(v)).coalesce(targetFiles.max(1)),
      path, statsCols, bloomCols)
  }

  /** OPTIMIZE ZORDER BY — the layout-maintenance command that composes
    * [[optimize]] with [[graft.operators.LayoutOps.zValue]]: the live
    * snapshot is rewritten range-partitioned-and-sorted by the Morton
    * interleave of two (non-negative long) columns and committed as a
    * new version, so subsequent min/max file skipping prunes on BOTH
    * dimensions (the measured 2-D effect in `q_zorder_skip`). Pending
    * deletion vectors fold in via the DV-applying read, same as
    * [[optimize]]. Rows identical by construction; history stays
    * readable; `targetFiles` bounds the rewrite like any compaction. */
  def optimizeZorder(spark: SparkSession, path: String, colA: String, colB: String,
      targetFiles: Int = 8, withStats: Boolean = false): Long = {
    import org.apache.spark.sql.functions.col
    val v = latest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"nothing to optimize at $path"))
    val z = graft.operators.LayoutOps.zValue(col(colA), col(colB))
    val clustered = read(spark, path, Some(v))
      .repartitionByRange(targetFiles.max(1), z)
      .sortWithinPartitions(z)
    // withStats: the Z-layout makes BOTH dimensions' per-file ranges
    // tight, so sidecars on (colA, colB) turn [[graft.plans.StatsPrune]]
    // into 2-D file skipping over plain WHERE clauses
    commitOverwrite(clustered, path,
      statsCols = if (withStats) Seq(colA, colB) else Nil)
  }

  /** Expectation counts from a gated commit ([[commitAppendExpect]]). */
  final case class ExpectationReport(version: Long, admitted: Long,
      quarantined: Map[String, Long])

  /** Constraint-gated append (the Delta-Live-Tables "expectations"
    * shape): every named expectation is a boolean Column; rows
    * failing ANY of them are diverted to `quarantinePath` (their own
    * versioned table, tagged with the violated names) instead of the
    * main table, and the per-expectation violation counts come back in
    * the report — data quality enforced AT THE WRITE BOUNDARY, with
    * the rejects preserved for triage rather than dropped.
    *
    * One pass computes all verdicts (the expectations ride as columns);
    * the split is two narrow filters — no shuffle beyond the commits'
    * own writes. */
  def commitAppendExpect(df: DataFrame, path: String, quarantinePath: String,
      expectations: Map[String, org.apache.spark.sql.Column]): ExpectationReport = {
    require(expectations.nonEmpty)
    import org.apache.spark.sql.functions._
    val names = expectations.keys.toSeq.sorted
    val flagged = df.withColumn("_violated",
      filter(array(names.map(n => when(!coalesce(expectations(n), lit(false)), n)): _*),
        x => x.isNotNull)).localCheckpoint()
    val good = flagged.filter(size(col("_violated")) === 0).drop("_violated")
    val bad = flagged.filter(size(col("_violated")) > 0)
      .withColumn("_violated", concat_ws(",", col("_violated")))
    val v = commitAppend(good, path)
    if (bad.isEmpty) ()
    else { commitAppend(bad, quarantinePath): Unit }
    val counts = flagged.select(explode(col("_violated")).as("n"))
      .groupBy("n").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ExpectationReport(v, good.count(), counts)
  }

  /** MERGE INTO semantics as one commit — the SQL MERGE triple over the
    * live snapshot, keyed on `key`:
    *   - matched + `deleteWhen`  → target row removed;
    *   - matched (otherwise)     → target row REPLACED by the source row;
    *   - not matched             → source row inserted
    * (a `deleteWhen`-flagged source row with no match inserts nothing).
    * Runs as pure relational algebra — one left-anti join keeps the
    * untouched target rows, the filtered source supplies the rest — and
    * publishes as a normal commit, so the pre-merge snapshot stays
    * time-travelable.
    *
    * A source column named `_delete` is merge METADATA (the usual CDC
    * feed shape: rows carry their own op flag): it can drive
    * `deleteWhen` and is dropped before the union, so the committed
    * schema is the table's.
    *
    * Scale note: this face rewrites the LIVE listing (the semantic
    * form); a 100 TB deployment scopes the rewrite with partition
    * pruning first — exactly what [[VectorStore.upsert]]'s
    * partition-scoped overwrite does for the `load_dt` layout. */
  def merge(spark: SparkSession, path: String, source: DataFrame, key: String,
      deleteWhen: org.apache.spark.sql.Column = org.apache.spark.sql.functions.lit(false)): Long = {
    val target = read(spark, path)
    val kept = target.join(source.select(key), Seq(key), "left_anti")
    val applied = source.filter(!deleteWhen).drop("_delete")
    commitOverwrite(kept.unionByName(applied).localCheckpoint(), path)
  }

  /** Right-to-be-forgotten purge: rewrite the live snapshot WITHOUT the
    * rows matching `condition`, then drop every older data directory —
    * after this, NO version (current or time-traveled) can produce the
    * purged rows. This is the documented compliance trade-off: history
    * for the whole table is truncated at the purge point, because
    * retaining any pre-purge snapshot would retain the data the purge
    * exists to destroy. Returns the new version. */
  def purge(spark: SparkSession, path: String,
      condition: org.apache.spark.sql.Column): Long = {
    val kept = read(spark, path).filter(!condition)
    // localCheckpoint pins the surviving rows before their source dirs
    // are deleted out from under the lazy plan
    val v = commitOverwrite(kept.localCheckpoint(), path)
    vacuum(spark, path, keepVersions = 1)
    // older manifests now reference deleted dirs; drop them so a
    // time-travel read fails loudly instead of half-resolving
    val f = fs(spark, path)
    versions(spark, path).dropRight(1).foreach { old =>
      f.delete(new Path(manifestDir(path), s"${vname(old)}.json"), false)
    }
    v
  }

  /** Drop data directories no LIVE version references (keeping the last
    * `keepVersions` manifests' files) — O(dropped dirs) deletes, rows
    * never read. A stats sidecar lives exactly as long as its data
    * directory. */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1): Seq[String] = {
    val f = fs(spark, path)
    val kept = versions(spark, path).takeRight(keepVersions.max(1))
    val victims = vacuumVictims(spark, path, kept)
    victims.foreach(d => f.delete(new Path(s"$path/$d"), true))
    if (victims.nonEmpty)
      manifestCache.keySet.removeIf(k => k._1 == path)
    victims
  }

  /** The directories [[vacuum]] WOULD drop if `keptVersions` were the
    * retained manifests — read-only (the dry-run face the SQL
    * `CALL graft.vacuum(…, dry_run => true)` procedure serves). */
  private[sources] def vacuumVictims(spark: SparkSession, path: String,
      keptVersions: Seq[Long]): Seq[String] = {
    val f = fs(spark, path)
    val live = keptVersions.flatMap(listing(spark, path, _)).toSet ++
      keptVersions.flatMap(dvListing(spark, path, _))
    val liveAll = live ++ live.collect {
      case d if d.startsWith("data/") => statsDirOf(d)
    }
    Seq("data", "dv", "stats").flatMap { root =>
      val rootPath = new Path(s"$path/$root")
      if (!f.exists(rootPath)) Seq.empty
      else f.listStatus(rootPath).toSeq
        .map(st => s"$root/${st.getPath.getName}")
        .filterNot(liveAll.contains)
    }.sorted
  }

  // ------------------------------------------------------- file skipping

  /** Stats sidecar for a data directory: `stats/v<NNNNN>/` mirrors
    * `data/v<NNNNN>/` and is immutable with it. */
  private def statsDirOf(dataDirRel: String): String =
    "stats/" + dataDirRel.stripPrefix("data/")

  /** One row per file of `dataDirRel` with min_/max_ per tracked
    * column, a per-file Bloom filter per `bloomCols` entry (the Delta
    * bloom-column-index shape: equality probes on columns the layout
    * was NOT clustered by, where min/max spans everything), plus the
    * row count — the add-file stats sidecar. One pass over just the
    * directory's files, map-side combined. */
  private def writeStatsFor(spark: SparkSession, path: String,
      dataDirRel: String, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, md5, min, udaf}
    val written = spark.read.parquet(s"$path/$dataDirRel")
    val bloomAgg = udaf(new graft.operators.BloomOps.BloomAggregator(
      ZoneMaps.BloomBits, ZoneMaps.BloomHashes))
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      bloomCols.map(c => bloomAgg(md5(col(c).cast("string"))).as(s"bloom_$c")) :+
      count(lit(1)).as("n_rows")
    written.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/${statsDirOf(dataDirRel)}")
  }

  /** Backfill stats sidecars for every data directory of `version`
    * (default latest) that lacks one — the maintenance face for
    * history written before opting in, or produced by [[optimize]]/
    * [[merge]] (whose rewrites don't collect stats). Returns the
    * directories it covered. */
  def collectStats(spark: SparkSession, path: String, statsCols: Seq[String],
      version: Option[Long] = None, bloomCols: Seq[String] = Nil): Seq[String] = {
    val v = version.orElse(latest(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path"))
    val f = fs(spark, path)
    val missing = listing(spark, path, v)
      .filterNot(d => f.exists(new Path(s"$path/${statsDirOf(d)}")))
    missing.foreach(d => writeStatsFor(spark, path, d, statsCols, bloomCols))
    // backfill changes an EXISTING version's sidecar coverage, which
    // the manifest-mtime cache key cannot see — drop the path's entries
    if (missing.nonEmpty)
      manifestCache.keySet.removeIf(k => k._1 == path)
    missing.sorted
  }

  /** Snapshot read with FILE SKIPPING: only files whose recorded
    * [min, max] of `statsCol` overlaps [lo, hi] are scanned, then the
    * exact residual predicate applies; directories without a stats
    * sidecar are always read (safety default — skipping is an
    * optimization, never a filter). Composes with pending deletion
    * vectors exactly like [[read]]. Returns the pruned DataFrame plus
    * files-total/files-read evidence.
    *
    * Scale: planning is one O(files) read of the snapshot's sidecars —
    * the same driver-side cost as any format's manifest pruning; with
    * commits clustered on `statsCol` (e.g. date-ordered appends), a
    * range query reads ⌈selectivity · files⌉ and history stays cheap
    * to slice. */
  def readPruned(spark: SparkSession, path: String, statsCol: String,
      lo: Long, hi: Long,
      version: Option[Long] = None): (DataFrame, ZoneMaps.PruneStats) = {
    import org.apache.spark.sql.functions.col
    val v = version.orElse(latest(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path"))
    val dirs = listing(spark, path, v)
    if (dirs.isEmpty) return (spark.emptyDataFrame, ZoneMaps.PruneStats(0, 0))
    val (toRead, st) = pruneFiles(spark, path, statsCol, lo, hi, v)
    val residual = col(statsCol) >= lo && col(statsCol) <= hi
    prunedRead(spark, path, v, toRead, residual, st)
  }

  /** The shared tail of [[readPruned]]/[[readPoint]]: scan the admitted
    * files under the logical schema (mapped tables re-project per
    * directory — r11, file skipping no longer opts out of column
    * mapping), apply the exact residual, subtract pending DVs. */
  private def prunedRead(spark: SparkSession, path: String, v: Long,
      toRead: Seq[String], residual: org.apache.spark.sql.Column,
      st: ZoneMaps.PruneStats): (DataFrame, ZoneMaps.PruneStats) = {
    import org.apache.spark.sql.functions.lit
    val dvs = dvListing(spark, path, v)
    val declared = read(spark, path, Some(v)).schema
    if (toRead.isEmpty)
      return (read(spark, path, Some(v)).filter(lit(false)), st)
    if (dvs.isEmpty)
      (scanFilesLogical(spark, path, v, toRead, declared).filter(residual), st)
    else {
      val withPos = scanFilesLogical(spark, path, v, toRead, declared,
        withPos = true).filter(residual)
      val dv = spark.read.parquet(dvs.map(d => s"$path/$d"): _*)
      (withPos.join(dv, DvCols, "left_anti").drop(DvCols: _*), st)
    }
  }

  /** Point lookup with BLOOM file skipping: read only the files whose
    * sidecar filter admits `key` (no false negatives — the residual
    * equality makes the result exact), plus every file of a directory
    * without a bloom for the column. The probe column needs NO
    * clustering: this is the Delta bloom-column-index story — a
    * `WHERE user_id = k` over a date-laid-out 100 TB table skips on
    * the sidecars where min/max spans everything. Composes with
    * pending deletion vectors like [[read]]. */
  def readPoint(spark: SparkSession, path: String, bloomCol: String,
      key: Long,
      version: Option[Long] = None): (DataFrame, ZoneMaps.PruneStats) = {
    import org.apache.spark.sql.functions.col
    val v = version.orElse(latest(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path"))
    val dirs = listing(spark, path, v)
    if (dirs.isEmpty) return (spark.emptyDataFrame, ZoneMaps.PruneStats(0, 0))
    val (toRead, st) = bloomFiles(spark, path, bloomCol, key, v)
    prunedRead(spark, path, v, toRead, col(bloomCol) === key, st)
  }

  /** The snapshot's sidecar union, COLLECTED and CACHED on the driver
    * keyed by (path, version) — a version's listing and its sidecars
    * are immutable, so one mergeSchema read + collect serves every
    * later probe of the snapshot with ZERO Spark jobs. This is what
    * keeps [[graft.plans.StatsPrune]]'s planning in the same cost
    * class as a table format's manifest pruning instead of paying
    * job-launch latency per query. Dirs tracking different column
    * sets surface the others' stats as null under the merged schema;
    * the null guard in the probes keeps those files. */
  private final case class SidecarManifest(
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[org.apache.spark.sql.Row],
      uncoveredFiles: Seq[String])

  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), SidecarManifest]()

  private def sidecarManifest(spark: SparkSession, path: String,
      v: Long): SidecarManifest = {
    if (manifestCache.size > 256) manifestCache.clear() // bounded
    // the manifest file's mtime rides in the key: a table DELETED and
    // REBUILT at the same path reaches the same version numbers with
    // different content — its fresh manifest must not hit a stale entry
    val mtime = fs(spark, path)
      .getFileStatus(new Path(manifestDir(path), s"${vname(v)}.json"))
      .getModificationTime
    manifestCache.computeIfAbsent((path, v, mtime), _ => {
      val f = fs(spark, path)
      val (covered, uncovered) = listing(spark, path, v)
        .partition(d => f.exists(new Path(s"$path/${statsDirOf(d)}")))
      val (schema, rows) =
        if (covered.isEmpty)
          (new org.apache.spark.sql.types.StructType(),
            Seq.empty[org.apache.spark.sql.Row])
        else {
          val m = spark.read.option("mergeSchema", "true")
            .parquet(covered.map(d => s"$path/${statsDirOf(d)}"): _*)
          (m.schema, m.collect().toSeq)
        }
      val uFiles =
        if (uncovered.isEmpty) Seq.empty[String]
        else spark.read.parquet(uncovered.map(d => s"$path/$d"): _*)
          .inputFiles.toSeq
      SidecarManifest(schema, rows, uFiles)
    })
  }

  /** The planning half of [[readPruned]]: the exact files a
    * [lo, hi] probe on `statsCol` must read at `version` — sidecar
    * range hits, files whose sidecar doesn't track the column, and
    * every file of an uncovered directory — with the files-total/
    * files-read evidence. Pure driver work over the cached manifest. */
  private[graft] def pruneFiles(spark: SparkSession, path: String,
      statsCol: String, lo: Long, hi: Long,
      v: Long): (Seq[String], ZoneMaps.PruneStats) =
    planProbes(spark, path, v, Seq((statsCol, lo, hi)), Nil)

  /** The planning half of [[readPoint]]: sidecar bloom admission
    * ([[graft.operators.BloomOps.admits]] — the same arithmetic the
    * write side packed with), files whose sidecar has no bloom for the
    * column, and every file of an uncovered directory. */
  private[graft] def bloomFiles(spark: SparkSession, path: String,
      bloomCol: String, key: Long,
      v: Long): (Seq[String], ZoneMaps.PruneStats) =
    planProbes(spark, path, v, Nil, Seq((bloomCol, Seq(key))))

  /** Conjunctive multi-probe planning — the substrate of
    * [[graft.plans.StatsPrune]]: a file is read only if EVERY range
    * probe's [min, max] overlaps and EVERY point probe's bloom admits
    * (each probe keeping files whose sidecar doesn't track its column
    * — intersection can only shrink what one probe admits, so a 2-D
    * `WHERE x < a AND y < b` over a Z-ordered layout prunes on BOTH
    * dimensions). */
  /** A sidecar min/max cell as its INTERNAL integral form — the same
    * unit [[graft.plans.StatsPrune]]'s literal bounds arrive in:
    * numbers as-is, DATE as epoch days, TIMESTAMP as UTC micros
    * (collected Rows surface those columns as external Java types,
    * either legacy java.sql or java.time under the java8API flag). */
  private def statLong(v: Any): Long = v match {
    case n: Number                  => n.longValue
    case d: java.sql.Date           =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong
    case d: java.time.LocalDate     => d.toEpochDay
    case t: java.sql.Timestamp      =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case i: java.time.Instant       =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
    case l: java.time.LocalDateTime =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(l)
    case other => throw new IllegalStateException(
      s"stats sidecar cell of unsupported type ${other.getClass.getName}")
  }

  /** Point probes carry a KEY SET: one key = equality, several = an
    * IN-list, where the file is kept when ANY listed key is admitted
    * (IN is a disjunction — any-of is the sound direction). Probe
    * columns arrive as LOGICAL names and re-key through the version's
    * logical→physical map (r11): sidecars carry the immutable physical
    * names, so a range predicate on a renamed column still prunes —
    * and a logical name that merely COLLIDES with some other column's
    * physical name can never match the wrong sidecar, because the
    * translation is by map entry, not by string equality. */
  private[graft] def planProbes(spark: SparkSession, path: String, v: Long,
      ranges: Seq[(String, Long, Long)],
      points: Seq[(String, Seq[Long])]): (Seq[String], ZoneMaps.PruneStats) = {
    val mi = sidecarManifest(spark, path, v)
    val toPhys: String => String = colsListing(spark, path, v) match {
      case Some(cols) =>
        val m = cols.map(c => c.logical -> c.physical).toMap
        c => m.getOrElse(c, s"__graft_unmapped_$c") // not in schema: match nothing
      case None => identity
    }
    val probes: Seq[(Seq[String], org.apache.spark.sql.Row => Boolean)] =
      ranges.map { case (c0, lo, hi) =>
        val c = toPhys(c0)
        val (mnC, mxC) = (s"min_$c", s"max_$c")
        (Seq(mnC, mxC), { (r: org.apache.spark.sql.Row) =>
          val mn = statLong(r.get(mi.schema.fieldIndex(mnC)))
          val mx = statLong(r.get(mi.schema.fieldIndex(mxC)))
          mn <= hi && mx >= lo
        })
      } ++ points.map { case (c0, keys) =>
        val bC = s"bloom_${toPhys(c0)}"
        (Seq(bC), { (r: org.apache.spark.sql.Row) =>
          val bits = r.getSeq[Long](mi.schema.fieldIndex(bC))
          keys.exists(k => graft.operators.BloomOps.admits(
            bits, k.toString, ZoneMaps.BloomBits, ZoneMaps.BloomHashes))
        })
      }
    val fileIdx = mi.schema.fieldNames.indexOf("file")
    def admittedBy(r: org.apache.spark.sql.Row,
        cols: Seq[String], keep: org.apache.spark.sql.Row => Boolean): Boolean =
      !cols.forall(mi.schema.fieldNames.contains) ||
        cols.exists(c => r.isNullAt(mi.schema.fieldIndex(c))) || keep(r)
    val selected =
      if (mi.rows.isEmpty) Seq.empty[String]
      else mi.rows.filter(r => probes.forall { case (cols, keep) =>
        admittedBy(r, cols, keep)
      }).map(_.getString(fileIdx))
    ((selected ++ mi.uncoveredFiles).sorted,
      ZoneMaps.PruneStats(mi.rows.size.toLong + mi.uncoveredFiles.size,
        selected.size.toLong + mi.uncoveredFiles.size))
  }

  /** The stats-covered columns of `version`'s sidecars (LOGICAL name →
    * sidecar type under the merged schema), empty when no directory has
    * a sidecar — [[StatsPrune]]'s eligibility probe. MAPPED snapshots
    * (r11) translate each sidecar's PHYSICAL column back through the
    * era's map: a renamed column's range predicate keeps pruning, a
    * dropped column's sidecar (physical name absent from the map)
    * surfaces to nobody, and a logical name colliding with another
    * column's physical name can't mis-match — translation is by map
    * entry, never string equality (the hazard that used to force mapped
    * tables to opt out wholesale). */
  private[graft] def statsColumns(spark: SparkSession, path: String,
      v: Long): Map[String, org.apache.spark.sql.types.DataType] = {
    val byPhys: Option[Map[String, String]] = colsListing(spark, path, v)
      .map(_.map(c => c.physical -> c.logical).toMap)
    sidecarManifest(spark, path, v).schema.fields.toSeq.flatMap {
      case sf if sf.name.startsWith("min_") =>
        val p = sf.name.stripPrefix("min_")
        byPhys match {
          case None => Some(p -> sf.dataType)
          case Some(m) => m.get(p).map(_ -> sf.dataType)
        }
      case _ => None
    }.toMap
  }

  /** The bloom-covered columns of `version`'s sidecars as LOGICAL
    * names — [[graft.plans.StatsPrune]]'s point-probe eligibility check
    * (per-file coverage is the null guard inside [[bloomFiles]]);
    * mapped snapshots translate physical→logical like
    * [[statsColumns]]. */
  private[graft] def bloomColumns(spark: SparkSession, path: String,
      v: Long): Set[String] = {
    val byPhys: Option[Map[String, String]] = colsListing(spark, path, v)
      .map(_.map(c => c.physical -> c.logical).toMap)
    sidecarManifest(spark, path, v).schema.fieldNames.toSeq.flatMap {
      case n if n.startsWith("bloom_") =>
        val p = n.stripPrefix("bloom_")
        byPhys match {
          case None => Some(p)
          case Some(m) => m.get(p)
        }
      case _ => None
    }.toSet
  }

  /** Scan a pruned FILE subset under the snapshot's LOGICAL schema —
    * the splice substrate [[graft.plans.StatsPrune]] and the pruned
    * reads share. Unmapped tables pin the declared schema over one
    * mixed scan; mapped tables project physical→logical per directory
    * (directories may disagree on parquet types after a widening),
    * optionally extending with (file, pos) for DV subtraction. */
  private[graft] def scanFilesLogical(spark: SparkSession, path: String,
      v: Long, files: Seq[String],
      declared: org.apache.spark.sql.types.StructType,
      withPos: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    colsListing(spark, path, v) match {
      case None =>
        val base = spark.read.schema(declared).parquet(files: _*)
        if (!withPos) base
        else base.select(col("*"),
          col("_metadata.file_path").as(DvCols.head),
          col("_metadata.row_index").as(DvCols.last))
      case Some(cols) =>
        files.groupBy(f => new Path(f).getParent.toString).toSeq.map {
          case (_, fs0) =>
            val raw = spark.read.parquet(fs0: _*)
            val have = raw.columns.toSet
            val projected = cols.map { c =>
              (if (have(c.physical)) col(c.physical).cast(c.typeDdl)
               else lit(null).cast(c.typeDdl)).as(c.logical)
            } ++ (if (withPos)
              Seq(col("_metadata.file_path").as(DvCols.head),
                col("_metadata.row_index").as(DvCols.last))
            else Seq.empty)
            raw.select(projected: _*)
        }.reduce(_.unionByName(_))
    }
  }
}
