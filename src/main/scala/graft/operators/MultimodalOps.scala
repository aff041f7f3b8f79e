package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column surface (EXT north-star).
  *
  * Media are opaque `binary` columns plus typed metadata — the layout a
  * 100 TB training-data lake uses (content-addressed blobs inline or as
  * object-store pointers, metadata columns for pruning). The decode
  * kernel is REAL for images: `javax.imageio` (in the JDK, fully
  * offline) decodes PNG/JPEG/BMP/GIF to pixels and featurizes an exact
  * integer luminance histogram. Bytes no reader accepts (corrupt blobs,
  * non-image media) degrade to a deterministic byte-arithmetic
  * stand-in rather than failing the job — the same
  * degrade-not-throw contract as the office parsers, flagged per row in
  * the `decoded` column so a pipeline can quarantine the failures.
  */
object MultimodalOps {

  /** Typed metadata extracted without decoding: cheap, prunable. */
  def withMetadata(df: DataFrame, binCol: String, nameCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(binCol)).cast("long").as("n_bytes"),
      lower(regexp_extract(col(nameCol), "\\.([a-zA-Z0-9]+)$", 1)).as("format"),
      sha2(col(binCol), 256).as("content_id")))

  /** Integer luminance of a packed sRGB pixel, 0..255 — BT.601 integer
    * weights (299/587/114 over 1000), exact for gray pixels. */
  private def luminance(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
    (r * 299 + g * 587 + b * 114) / 1000
  }

  /** Decode one image via ImageIO; None when no registered reader
    * accepts the bytes (corrupt input, or not an image at all). */
  private[operators] def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic PNG bytes for a solid-color image — the fixture
    * generator for decode tests and the synthetic-decode query (the
    * corpus has no real media; PNG is lossless so the decoded pixels are
    * bit-exact). JDK-only, offline. */
  def encodeSolidPng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, width, height) }
    finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode + featurize kernel: real `ImageIO` decode to pixels
    * (PNG/JPEG/BMP/GIF — every JDK-bundled reader), with width/height
    * from the decoded raster and an 8-bucket luminance histogram
    * normalized by pixel count (exact integer counts, one IEEE
    * division). Rows whose bytes no reader accepts keep the pipeline
    * alive with `decoded=false` and a deterministic byte-arithmetic
    * stand-in (first-byte dims + byte histogram ÷ n) — decode failure
    * must not kill a 100 TB ingest, and the flag lets downstream
    * quarantine instead of silently training on garbage.
    *
    * One kernel instance per partition (ImageIO's disk cache is
    * disabled once per JVM — executors must not thrash temp files),
    * rows processed in `batchSize` groups — the shape a vectorized
    * decoder wants; scanning pixels row-by-row bounds the working set
    * at O(width), not O(width·height). */
  def decodeAndFeaturize(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("decoded", BooleanType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false) // in-memory streams only, no temp files
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val (width, height, decoded, features) = decodeImage(bytes) match {
            case Some(img) =>
              val w = img.getWidth; val h = img.getHeight
              val hist = Array.fill(8)(0L)
              val rowBuf = new Array[Int](w)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, rowBuf, 0, w)
                var x = 0
                while (x < w) { hist(luminance(rowBuf(x)) / 32) += 1; x += 1 }
                y += 1
              }
              val nPix = w.toLong * h
              (w, h, true, hist.map(c => c.toDouble / math.max(nPix, 1L).toDouble))
            case None =>
              // degrade: deterministic stand-in from the raw bytes
              val n = bytes.length
              val w = 16 + (math.abs(bytes.headOption.getOrElse(0.toByte).toInt) % 64)
              val h = 16 + (n % 64)
              val hist = Array.fill(8)(0L)
              bytes.foreach(b => hist((b & 0xFF) / 32) += 1)
              (w, h, false, hist.map(c => c.toDouble / math.max(n, 1).toDouble))
          }
          Row.fromSeq(r.toSeq ++ Seq(width, height, decoded, features.toSeq))
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
