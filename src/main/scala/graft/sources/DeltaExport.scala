package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** EXPORT a versioned-table snapshot AS a Delta table — the interop
  * direction [[DeltaRead]] doesn't cover: any Delta-speaking engine
  * can then read the graft table's data in place. The export writes
  * ONLY a `_delta_log` (commit 0: protocol + metaData + one `add` per
  * live parquet file, with ABSOLUTE paths — the spec explicitly allows
  * them, which is what makes this a zero-copy publish); the graft
  * table's immutable data files are never moved or rewritten.
  *
  * Loud-or-exact scope: a snapshot with pending deletion vectors or a
  * column mapping cannot be represented as reader-version-1 Delta
  * (its files alone over-serve rows / wrong names), so both decline
  * with the fix spelled out (OPTIMIZE folds DVs and rewrites mapped
  * eras into plain files, after which the export is exact).
  *
  * Scale: O(files) driver work — one manifest read plus one JSON
  * write; no data bytes touched. The export pins a VERSION, so the
  * published Delta table is a stable snapshot no later graft commit
  * shears (re-export to publish a newer version at another path).
  */
object DeltaExport {

  /** Write `_delta_log` at `targetPath` exposing `sourcePath`@`version`
    * (default latest). Returns the number of data files published. */
  def snapshot(spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None): Int = {
    val v = version.getOrElse(TimeTravel.versions(spark, sourcePath).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no versions at $sourcePath")))
    if (TimeTravel.dvListing(spark, sourcePath, v).nonEmpty)
      throw new UnsupportedOperationException(
        s"snapshot v$v of $sourcePath has pending deletion vectors; " +
          "reader-version-1 Delta cannot carry them — run TimeTravel.optimize " +
          "to fold them, then export the folded version")
    if (TimeTravel.colsListing(spark, sourcePath, v).nonEmpty)
      throw new UnsupportedOperationException(
        s"snapshot v$v of $sourcePath resolves through a column mapping; " +
          "its files carry physical names — run TimeTravel.optimize to " +
          "rewrite, then export the folded version")
    val dirs = TimeTravel.listing(spark, sourcePath, v)
    val scan = spark.read.parquet(dirs.map(d => s"$sourcePath/$d"): _*)
    val schemaJson = scan.schema.json
    val files = scan.inputFiles.sorted
    val conf = spark.sessionState.newHadoopConf()
    val esc = schemaJson.replace("\\", "\\\\").replace("\"", "\\\"")
    val actions = Seq.newBuilder[String]
    actions += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    actions +=
      (s"""{"metaData":{"id":"graft-export-v$v","format":""" +
        s"""{"provider":"parquet","options":{}},"schemaString":"$esc",""" +
        """"partitionColumns":[],"configuration":{}}}""")
    files.foreach { f =>
      val p = new Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      actions +=
        (s"""{"add":{"path":"$f","partitionValues":{},"size":${st.getLen},""" +
          s""""modificationTime":${st.getModificationTime},"dataChange":true}}""")
    }
    val logDir = new Path(s"$targetPath/_delta_log")
    val fs = logDir.getFileSystem(conf)
    fs.mkdirs(logDir)
    val target = new Path(logDir, f"${0L}%020d.json")
    if (fs.exists(target)) throw new IllegalStateException(
      s"$targetPath already carries a Delta log; export to a fresh path")
    val out = fs.create(target, false)
    try out.write((actions.result().mkString("", "\n", "\n"))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    files.length
  }
}
