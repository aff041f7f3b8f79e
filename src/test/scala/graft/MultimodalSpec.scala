package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Tables(spark, sf, "documents")
    .select(col("doc_id"), col("text").cast("binary").as("blob"),
      concat(lit("m_"), col("doc_id"), lit(".png")).as("name"))

  test("metadata extraction is decode-free and deterministic") {
    val m = MultimodalOps.withMetadata(media, "blob", "name")
    val r = m.filter(col("doc_id") === 1).select("media_meta.*").head()
    assert(r.getAs[String]("format") == "png")
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[String]("content_id").length == 64)
  }

  test("non-image bytes degrade to the deterministic stand-in, flagged decoded=false") {
    val f = MultimodalOps.decodeAndFeaturize(media.limit(40), "blob", batchSize = 16)
    val rows = f.select(col("width"), col("height"), col("decoded"),
      size(col("features")).as("nf")).collect()
    assert(rows.length == 40)
    assert(rows.forall(_.getAs[Int]("nf") == 8))
    assert(rows.forall(!_.getAs[Boolean]("decoded")), "text bytes are not an image")
    assert(rows.forall(r => r.getAs[Int]("width") >= 16 && r.getAs[Int]("height") >= 16))
    // deterministic across runs
    val again = MultimodalOps.decodeAndFeaturize(media.limit(40), "blob", batchSize = 16)
      .select("doc_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    f.select("doc_id", "features").collect().foreach { r =>
      assert(again(r.getLong(0)) == r.getSeq[Double](1))
    }
  }

  test("real ImageIO decode: width/height/histogram come from actual pixels") {
    import spark.implicits._
    // black (lum 0 → bucket 0), mid gray 128 (→ bucket 4), white 255
    // (→ bucket 7), and a 2-color image splitting buckets 0 and 7
    val black = MultimodalOps.encodeSolidPng(5, 3, 0x000000)
    val gray = MultimodalOps.encodeSolidPng(7, 7, 0x808080)
    val white = MultimodalOps.encodeSolidPng(2, 9, 0xFFFFFF)
    val half = {
      val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 2)
        img.setRGB(x, y, if (x < 2) 0x000000 else 0xFFFFFF)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq((1L, black), (2L, gray), (3L, white), (4L, half)).toDF("id", "blob")
    val got = MultimodalOps.decodeAndFeaturize(df, "blob", batchSize = 2)
      .select("id", "width", "height", "decoded", "features")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3), r.getSeq[Double](4)))).toMap
    assert(got(1L) == ((5, 3, true, Seq(1.0, 0, 0, 0, 0, 0, 0, 0))))
    assert(got(2L) == ((7, 7, true, Seq(0, 0, 0, 0, 1.0, 0, 0, 0))))
    assert(got(3L) == ((2, 9, true, Seq(0, 0, 0, 0, 0, 0, 0, 1.0))))
    assert(got(4L) == ((4, 2, true, Seq(0.5, 0, 0, 0, 0, 0, 0, 0.5))))
  }

  test("corrupt image bytes degrade instead of failing the job") {
    import spark.implicits._
    val truncated = MultimodalOps.encodeSolidPng(8, 8, 0x123456).take(20)
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val df = Seq((1L, truncated), (2L, garbage), (3L, Array.empty[Byte])).toDF("id", "blob")
    val got = MultimodalOps.decodeAndFeaturize(df, "blob")
      .select("id", "decoded", "width").collect()
    assert(got.length == 3)
    assert(got.forall(!_.getAs[Boolean]("decoded")))
    assert(got.forall(_.getAs[Int]("width") >= 16), "stand-in dims, not a crash")
  }

  test("content-id sampling prunes without decoding") {
    val m = MultimodalOps.withMetadata(media, "blob", "name")
    val sampled = MultimodalOps.sampleByContentId(m, keepOneIn = 4).count()
    assert(sampled > 0 && sampled < media.count())
  }
}
