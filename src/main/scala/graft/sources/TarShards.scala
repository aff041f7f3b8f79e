package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** WebDataset-style tar-shard source/sink.
  *
  * The interchange layout large multimodal training runs actually read:
  * samples are files named `<key>.<ext>` stored CONSECUTIVELY in plain
  * POSIX-ustar `.tar` shards (`shard-00042.tar`), so a data loader
  * streams one shard sequentially — no random I/O, no index, any tar
  * tool can inspect it. One sample spans several extensions (e.g.
  * `000017.txt` + `000017.json`); readers regroup by key.
  *
  * Scale posture: the WRITE is one shuffle — rows are hash-routed to
  * their shard (`shardCol`), each group streams through a single
  * executor task straight into `shard-NNNNN.tar` via the Hadoop
  * FileSystem (works on file:// in tests, HDFS/object stores in
  * production). Entries are sorted by name within a shard and headers
  * carry fixed mtime/mode, so a shard's bytes are a pure function of
  * its rows — re-running the job yields byte-identical shards
  * (idempotent overwrite, diffable across runs). The READ lists shards
  * on the driver (bounded: one status per shard, not per sample) and
  * parses each shard in one task — sequential, splittable at shard
  * granularity, which is exactly the granularity training loaders use.
  * Shards are parsed from a single in-memory buffer; keep shards at
  * the WebDataset convention (≤ ~1 GiB) — the writer's job is to pick
  * a shard count that lands there.
  */
object TarShards {

  private val BlockSize = 512

  /** One POSIX-ustar header + data, padded to 512-byte blocks.
    * Deterministic: mode 0644, uid/gid 0, mtime 0. */
  private[graft] def tarEntry(name: String, data: Array[Byte]): Array[Byte] = {
    val nameBytes = name.getBytes(UTF_8)
    require(nameBytes.length <= 100,
      s"tar entry name exceeds the ustar 100-byte field: $name")
    // an empty (or NUL-leading) name would make this header look like
    // the end-of-archive block and silently truncate the shard on read
    require(nameBytes.nonEmpty && nameBytes(0) != 0,
      "tar entry name must be non-empty and not start with NUL")
    val header = new Array[Byte](BlockSize)
    def putOctal(value: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(value)
      val padded = ("0" * (len - 1 - s.length)) + s
      padded.getBytes(UTF_8).copyToArray(header, off)
      header(off + len - 1) = 0 // NUL terminator
    }
    nameBytes.copyToArray(header, 0)
    putOctal(0x1A4, 100, 8)            // mode 0644
    putOctal(0, 108, 8)                // uid
    putOctal(0, 116, 8)                // gid
    putOctal(data.length.toLong, 124, 12) // size
    putOctal(0, 136, 12)               // mtime: fixed for determinism
    header(156) = '0'                  // typeflag: regular file
    "ustar".getBytes(UTF_8).copyToArray(header, 257) // magic (+ NUL at 262)
    header(263) = '0'; header(264) = '0' // version
    // checksum: computed with the field itself as 8 spaces
    java.util.Arrays.fill(header, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += header(i) & 0xFF; i += 1 }
    val chk = java.lang.Long.toOctalString(sum)
    (("0" * (6 - chk.length)) + chk).getBytes(UTF_8).copyToArray(header, 148)
    header(154) = 0; header(155) = ' '
    val padded = (data.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new Array[Byte](BlockSize + padded)
    header.copyToArray(out, 0)
    data.copyToArray(out, BlockSize)
    out
  }

  /** Serialize entries (already in final order) into one tar stream,
    * closed by the standard two zero blocks. */
  private[graft] def writeTar(entries: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { case (name, data) => out.write(tarEntry(name, data)) }
    out.write(new Array[Byte](2 * BlockSize))
    out.toByteArray
  }

  /** Parse a tar buffer back to (name, bytes) entries, in file order.
    * Stops at the end-of-archive zero block; verifies each header
    * checksum and size bounds so a corrupt shard fails LOUDLY (a
    * silently-truncated training shard is the worst failure mode). */
  private[graft] def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + BlockSize <= bytes.length) {
      if (bytes(off) == 0) {
        // end-of-archive only if the WHOLE block is zero — a corrupt
        // header that merely starts with NUL must fail loudly, not
        // silently truncate the shard
        var z = off
        while (z < off + BlockSize && bytes(z) == 0) z += 1
        require(z == off + BlockSize,
          s"corrupt tar header at offset $off: NUL-leading but not end-of-archive")
        return out.result()
      }
      var nameEnd = off
      while (nameEnd < off + 100 && bytes(nameEnd) != 0) nameEnd += 1
      val name = new String(bytes, off, nameEnd - off, UTF_8)
      def octal(o: Int, len: Int): Long = {
        var v = 0L; var i = o
        while (i < o + len && bytes(i) != 0 && bytes(i) != ' ') {
          v = v * 8 + (bytes(i) - '0'); i += 1
        }
        v
      }
      val size = octal(off + 124, 12)
      val stored = octal(off + 148, 8)
      var sum = 0L
      var i = 0
      while (i < BlockSize) {
        sum += (if (i >= 148 && i < 156) ' '.toLong else bytes(off + i) & 0xFFL)
        i += 1
      }
      require(sum == stored, s"tar checksum mismatch at offset $off ($name)")
      require(size >= 0 && off + BlockSize + size <= bytes.length,
        s"tar entry overruns the shard at offset $off ($name, size $size)")
      out += ((name, java.util.Arrays.copyOfRange(
        bytes, off + BlockSize, off + BlockSize + size.toInt)))
      off += BlockSize + ((size.toInt + BlockSize - 1) / BlockSize * BlockSize)
    }
    out.result()
  }

  /** Write `df` as tar shards under `dir`: one `shard-NNNNN.tar` per
    * distinct `shardCol` value, each holding that shard's (`nameCol`,
    * `bytesCol`) entries sorted by name.
    *
    * One shuffle (hash-partition by shard) with a WITHIN-PARTITION sort
    * on (shard, name), then each task STREAMS its rows straight into
    * the open FS stream one entry at a time — executor memory is
    * bounded by a single entry, never a shard, so the WebDataset
    * ~1 GiB shard convention costs 1 GiB of disk, not of heap (Spark's
    * sort spills; a `groupByKey.mapGroups` formulation would instead
    * materialize the whole shard in the task). A partition can carry
    * several shards (hash collisions); the sort makes them contiguous
    * runs, closed and opened at the boundaries. */
  def write(df: DataFrame, dir: String, shardCol: String,
      nameCol: String, bytesCol: String): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    df.select(
        df.col(shardCol).cast("int").as("shard"),
        df.col(nameCol).cast("string").as("name"),
        df.col(bytesCol).cast("binary").as("bytes"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "name")
      .foreachPartition { rows: Iterator[Row] =>
        val shardFs = new Path(dir).getFileSystem(conf.value)
        var current = -1
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def closeCurrent(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
          out.close(); out = null
        }
        try {
          rows.foreach { r =>
            val shard = r.getInt(0)
            if (shard != current) {
              closeCurrent()
              out = shardFs.create(new Path(dir, f"shard-$shard%05d.tar"), true)
              current = shard
            }
            out.write(tarEntry(r.getString(1), r.getAs[Array[Byte]](2)))
          }
        } finally closeCurrent()
      }
  }

  /** Streaming export: each micro-batch becomes its own shard set
    * under `dir/batch-<id>/`. The batch id is part of the path, so an
    * at-least-once REPLAY of a batch overwrites its own files instead
    * of duplicating samples — exactly-once shards on top of Spark's
    * at-least-once foreachBatch, with no sink-side state. AvailableNow
    * drains the backlog and stops (the scheduled-export shape); read
    * the full export back with `read(spark, dir, recursive = true)`. */
  def writeStream(incoming: DataFrame, dir: String, checkpoint: String,
      shardCol: String, nameCol: String, bytesCol: String): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        write(batch, s"$dir/batch-$id", shardCol, nameCol, bytesCol)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read tar shards back as (shard_file, name, bytes) — one task per
    * shard, sequential parse. `recursive` also walks one level of
    * subdirectories (the `batch-<id>/` layout the streaming export
    * produces). */
  def read(spark: SparkSession, dir: String, recursive: Boolean = false): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    val top = fs.listStatus(dirPath)
    val shards = (top.filter(st => st.isFile).map(_.getPath) ++
        (if (recursive) top.filter(_.isDirectory)
            .flatMap(d => fs.listStatus(d.getPath).filter(_.isFile).map(_.getPath))
         else Array.empty[Path]))
      .map(_.toString).filter(_.endsWith(".tar")).sorted
    // dir-relative shard_file: batch subdirs repeat the same shard
    // file names, so the relative path is the unique identity
    val qualifiedDir = fs.makeQualified(dirPath).toString
    val schema = StructType(Seq(
      StructField("shard_file", StringType),
      StructField("name", StringType),
      StructField("bytes", BinaryType)))
    val rdd = spark.sparkContext
      .parallelize(shards.toIndexedSeq, math.max(shards.length, 1))
      .flatMap { p =>
        val path = new Path(p)
        val shardFs = path.getFileSystem(conf.value)
        val len = shardFs.getFileStatus(path).getLen
        require(len <= Int.MaxValue, s"tar shard over 2 GiB: $p")
        val buf = new Array[Byte](len.toInt)
        val in = shardFs.open(path)
        try in.readFully(0, buf) finally in.close()
        val base = shardFs.makeQualified(path).toString
          .stripPrefix(qualifiedDir).stripPrefix("/")
        parseTar(buf).map { case (n, b) => Row(base, n, b) }
      }
    spark.createDataFrame(rdd, schema)
  }
}
