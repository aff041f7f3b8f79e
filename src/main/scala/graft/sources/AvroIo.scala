package graft.sources

import java.security.MessageDigest

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro object-container source/sink (reference: rows-as-records
  * interchange beside CSV/JSONL/tar/ORC — see SURVEY.md §2.1).
  *
  * Spark's built-in `avro` format is an external module not present on
  * this classpath, but avro-core IS (Spark depends on it), so the engine
  * exposes the format through the same shard-file contract as
  * [[TarShards]]: the WRITE is one shuffle — rows hash-route to their
  * shard, each shard streams through a single executor task into
  * `part-NNNNN.avro` via the Hadoop FileSystem (file:// in tests,
  * HDFS/object stores in production), executor memory bounded by one
  * row. Avro's own container framing keeps the file splittable by sync
  * blocks; we additionally pin the 16-byte sync marker to a digest of
  * the shard id so a re-run yields byte-identical files (idempotent
  * overwrite, diffable across runs). The READ lists `*.avro` on the
  * driver (one status per shard, bounded) and decodes each file in one
  * task — the granularity training loaders consume.
  *
  * Schema is a CONTRACT, not a discovery ([[JsonIo]] stance): the
  * caller passes the Spark DDL on read; the writer derives the Avro
  * record schema from the DataFrame's. Supported leaf types are the
  * interchange set (long/int/double/float/boolean/string/binary); all
  * fields encode as `["null", T]` unions so SQL NULLs survive.
  */
object AvroIo {

  /** Avro record schema for a Spark struct — every field nullable. */
  private[graft] def avroSchema(schema: StructType): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val leaf = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroIo: unsupported column type for ${f.name}: $other " +
            "(cast to the interchange set long/int/double/float/boolean/string/binary)")
      }
      val union = Schema.createUnion(Schema.create(Schema.Type.NULL), leaf)
      fields.add(new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord("GraftRow", null, "graft", false, fields)
  }

  /** Write `df` under `dir` as one `part-NNNNN.avro` container per
    * distinct `shardCol` value, rows ordered by `orderCol` within the
    * shard (determinism: fixed row order + pinned sync marker + deflate
    * level pinned ⇒ shard bytes are a pure function of its rows). */
  def write(df: DataFrame, dir: String, shardCol: String, orderCol: String): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    // Validate FIRST (shard cast resolves, every payload type maps to
    // Avro): a rejected write must leave a prior export under `dir`
    // intact, so nothing destructive happens until the plan and the
    // schema are both known-good.
    val payload = df.schema.fieldNames.filterNot(n => n == shardCol)
    val out = df.select((Seq(col(shardCol).cast("int").as("__shard")) ++
      payload.map(col)): _*)
    val rowSchema = StructType(out.schema.fields.filter(_.name != "__shard"))
    val schemaJson = avroSchema(rowSchema).toString // Schema isn't serializable-stable; ship JSON
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    out
      .repartition(col("__shard"))
      .sortWithinPartitions("__shard", orderCol)
      .foreachPartition { rows: Iterator[Row] =>
        val schema = new Schema.Parser().parse(schemaJson)
        val shardFs = new Path(dir).getFileSystem(conf.value)
        var current = -1
        var writer: DataFileWriter[GenericRecord] = null
        def closeCurrent(): Unit = if (writer != null) { writer.close(); writer = null }
        try {
          rows.foreach { r =>
            val shard = r.getInt(0)
            if (shard != current) {
              closeCurrent()
              writer = new DataFileWriter[GenericRecord](
                new GenericDatumWriter[GenericRecord](schema))
              writer.setCodec(CodecFactory.deflateCodec(6))
              val sync = MessageDigest.getInstance("SHA-256")
                .digest(s"graft-avro-$shard".getBytes("UTF-8")).take(16)
              val stream = shardFs.create(new Path(dir, f"part-$shard%05d.avro"), true)
              writer.create(schema, stream, sync)
              current = shard
            }
            val rec = new GenericData.Record(schema)
            var i = 1
            while (i < r.length) {
              val v = r.get(i) match {
                case null            => null
                case b: Array[Byte]  => java.nio.ByteBuffer.wrap(b)
                case s: String       => s
                case other           => other
              }
              rec.put(i - 1, v)
              i += 1
            }
            writer.append(rec)
          }
        } finally closeCurrent()
      }
  }

  /** Streaming export: each micro-batch becomes its own shard set
    * under `dir/batch-<id>/` ([[TarShards.writeStream]] contract) — the
    * batch id is part of the path, so an at-least-once REPLAY of a
    * batch overwrites its own files instead of duplicating records:
    * exactly-once shards on top of foreachBatch with no sink-side
    * state. AvailableNow drains the backlog and stops; read the full
    * export back with `read(spark, dir, ddl, recursive = true)`. */
  def writeStream(incoming: DataFrame, dir: String, checkpoint: String,
      shardCol: String, orderCol: String): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        write(batch, s"$dir/batch-$id", shardCol, orderCol)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read an Avro shard directory back under the declared Spark DDL —
    * one task per container file, sequential block decode. `recursive`
    * also walks one level of subdirectories (the `batch-<id>/` layout
    * the streaming export produces). */
  def read(spark: SparkSession, dir: String, schemaDdl: String,
      recursive: Boolean = false): DataFrame = {
    val sparkSchema = StructType.fromDDL(schemaDdl)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    val top = fs.listStatus(dirPath)
    val files = (top.filter(_.isFile).map(_.getPath) ++
        (if (recursive) top.filter(_.isDirectory)
            .flatMap(d => fs.listStatus(d.getPath).filter(_.isFile).map(_.getPath))
         else Array.empty[Path]))
      .map(_.toString).filter(_.endsWith(".avro")).sorted
    val names = sparkSchema.fieldNames
    val types = sparkSchema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { p =>
        val path = new Path(p)
        val shardFs = path.getFileSystem(conf.value)
        val len = shardFs.getFileStatus(path).getLen
        require(len <= Int.MaxValue, s"avro shard over 2 GiB: $p")
        val buf = new Array[Byte](len.toInt)
        val in = shardFs.open(path)
        try in.readFully(0, buf) finally in.close()
        val reader = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(buf), new GenericDatumReader[GenericRecord]())
        val rows = Iterator.continually(reader)
          .takeWhile(_.hasNext)
          .map { rd =>
            val rec = rd.next()
            Row.fromSeq(names.indices.map { i =>
              (rec.get(names(i)), types(i)) match {
                case (null, _)                  => null
                // STRING is a contract too: only Avro's string runtime
                // shapes stringify — a mislabelled long/bytes field
                // fails loudly like every other type mismatch.
                case (v: org.apache.avro.util.Utf8, StringType) => v.toString
                case (v: String, StringType)    => v
                case (v, StringType)            => throw new IllegalArgumentException(
                  s"AvroIo: declared STRING column ${names(i)} holds " +
                    s"${v.getClass.getName} in $p (fix the DDL or the writer)")
                case (v: java.nio.ByteBuffer, BinaryType) =>
                  val b = new Array[Byte](v.remaining()); v.duplicate().get(b); b
                case (v, _)                     => v
              }
            })
          }
          .toVector
        reader.close()
        rows
      }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
