package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Per-step timing probe for the multi-job fixture queries
  * (optimization-round evidence, guide §1: measure BEFORE changing).
  * The driver's Verify gate times whole queries; the expensive fixture
  * queries are SEQUENCES of maintenance jobs (build → append → compact
  * → probe), and deciding what to optimize needs the step breakdown —
  * job floor vs data work — not the total. Prints one `step,seconds`
  * line per step on stdout.
  *
  *   sbt "runMain graft.StepProbe index_compact /root/testdata/sf0.01"
  */
object StepProbe {

  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[step] $name,${(System.nanoTime() - t0) / 1e9}%.3f")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("index_compact")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session warmup outside the steps (the first job in any
    // session pays ~5s of JVM/codegen startup that is not step cost)
    Tables(spark, sfDir, "documents").write.format("noop").mode("overwrite").save()
    which match {
      case "index_compact" => indexCompact(spark, sfDir)
      case other => System.err.println(s"[step] unknown probe $other")
    }
    spark.stop()
  }

  private def indexCompact(s: SparkSession, d: String): Unit = {
    import graft.sources.InvertedIndex
    val docs = Tables(s, d, "documents")
    val dir =
      s"${System.getProperty("java.io.tmpdir")}/graft_stepprobe_p${ProcessHandle.current().pid()}"
    val fsp = new org.apache.hadoop.fs.Path(dir)
    fsp.getFileSystem(s.sessionState.newHadoopConf()).delete(fsp, true)
    time("build")(InvertedIndex.build(docs.filter(col("doc_id") % 3 === 0), dir))
    time("append1")(InvertedIndex.append(docs.filter(col("doc_id") % 3 === 1), dir))
    time("append2")(InvertedIndex.append(docs.filter(col("doc_id") % 3 === 2), dir))
    time("compact")(InvertedIndex.compact(s, dir))
    time("probe")(
      InvertedIndex.searchBm25(s, dir, Seq("vector", "hash", "join"), 25)
        .write.format("noop").mode("overwrite").save())
    fsp.getFileSystem(s.sessionState.newHadoopConf()).delete(fsp, true)
  }
}
