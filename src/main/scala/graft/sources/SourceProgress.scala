package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Tiny consumed-progress record a v1 streaming source keeps under its
  * OWN `metadataPath` (the directory the engine hands every source for
  * exactly this purpose — the FileStreamSource move). Closes the
  * cross-restart rate-cap gap (r11/r12): the engine gives a restarted
  * source no prior offset before its first `getOffset`, so an
  * in-memory consumed marker made the first catch-up batch plan
  * uncapped. Persisting the marker at every `commit()` and re-seeding
  * from it at construction keeps `maxFilesPerTrigger` /
  * `maxManifestsPerTrigger` engaged across clean restarts.
  *
  * Written commit-driven (never ahead of the engine's own offset log),
  * so a crash between the engine's commit and this write costs at most
  * one slightly-early cap window, never an over-sized batch beyond the
  * pre-persistence behavior. One small file, atomic tmp+rename. */
private[sources] object SourceProgress {

  def write(spark: SparkSession, metadataPath: String, body: String): Unit = {
    val dir = new Path(metadataPath)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val tmp = new Path(dir, ".graft-progress.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, "graft-progress")
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"cannot persist source progress at $dst")
  }

  def read(spark: SparkSession, metadataPath: String): Option[String] = {
    val p = new Path(metadataPath, "graft-progress")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        Some(out.toString("UTF-8"))
      } finally in.close()
    }
  }
}
