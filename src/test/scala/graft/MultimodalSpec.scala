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

  test("decode stub yields fixed-shape features per row") {
    val f = MultimodalOps.decodeAndFeaturize(media.limit(40), "blob", batchSize = 16)
    val rows = f.select(col("width"), col("height"), size(col("features")).as("nf")).collect()
    assert(rows.length == 40)
    assert(rows.forall(_.getAs[Int]("nf") == 8))
    assert(rows.forall(r => r.getAs[Int]("width") >= 16 && r.getAs[Int]("height") >= 16))
    // deterministic across runs
    val again = MultimodalOps.decodeAndFeaturize(media.limit(40), "blob", batchSize = 16)
      .select("doc_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    f.select("doc_id", "features").collect().foreach { r =>
      assert(again(r.getLong(0)) == r.getSeq[Double](1))
    }
  }

  test("content-id sampling prunes without decoding") {
    val m = MultimodalOps.withMetadata(media, "blob", "name")
    val sampled = MultimodalOps.sampleByContentId(m, keepOneIn = 4).count()
    assert(sampled > 0 && sampled < media.count())
  }
}
