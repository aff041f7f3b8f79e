package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column surface (EXT north-star).
  *
  * Media are opaque `binary` columns plus typed metadata — the layout a
  * 100 TB training-data lake uses (content-addressed blobs inline or as
  * object-store pointers, metadata columns for pruning). The Spark-side
  * plumbing here — schema, partition-friendly batch shape, the
  * mapPartitions decode loop — is real and tested; the actual
  * image/audio codecs are NOT available in this container, so the decode
  * kernel is a clearly-marked deterministic stub (it derives fake
  * dimensions/features from the bytes) with the same signature a real
  * decoder (javacv / a Python mapInPandas worker) would have.
  */
object MultimodalOps {

  /** Typed metadata extracted without decoding: cheap, prunable. */
  def withMetadata(df: DataFrame, binCol: String, nameCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(binCol)).cast("long").as("n_bytes"),
      lower(regexp_extract(col(nameCol), "\\.([a-zA-Z0-9]+)$", 1)).as("format"),
      sha2(col(binCol), 256).as("content_id")))

  /** STUB decode kernel: a real implementation would decode the image /
    * resample the audio here; offline it derives deterministic fake
    * dimensions and an 8-bucket byte histogram. One kernel instance per
    * partition, rows processed in `batchSize` groups — the exact shape a
    * vectorized decoder wants. */
  def decodeAndFeaturize(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // real decoder: construct codec context once per partition here
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val n = bytes.length
          // ??? real decode goes here; deterministic stand-in:
          val width = 16 + (math.abs(bytes.headOption.getOrElse(0.toByte).toInt) % 64)
          val height = 16 + (n % 64)
          val hist = Array.fill(8)(0L)
          bytes.foreach(b => hist((b & 0xFF) / 32) += 1)
          val features = hist.map(h => h.toDouble / math.max(n, 1).toDouble)
          Row.fromSeq(r.toSeq ++ Seq(width, height, features.toSeq))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame/sample selection on metadata only — no decode, prunable. */
  def sampleByContentId(df: DataFrame, keepOneIn: Int): DataFrame =
    df.filter(
      conv(substring(col("media_meta.content_id"), 1, 4), 16, 10).cast("long")
        % keepOneIn === 0)
}
