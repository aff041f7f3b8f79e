package graft

import java.nio.file.Files

import graft.functions.{Embedders, HtmlFunctions}
import graft.pipeline.{BatchedEmbedder, DocPipeline, Ledger}
import graft.sources.VectorStore
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  private def docs = Tables(spark, sf, "documents")

  test("BatchedEmbedder (mapPartitions) ≡ Catalyst deterministic embedder") {
    val sample = docs.limit(20).select(col("doc_id"), col("text"))
    val viaExpr = sample
      .select(col("doc_id"), Embedders.deterministicEmbed(col("text"), 8).as("embedding"))
    val viaBatch = BatchedEmbedder.embed(
      sample, "text", batchSize = 7,
      () => new BatchedEmbedder.DeterministicBackend(8))
      .select(col("doc_id"), col("embedding"))
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1).toSeq
    assert(dump(viaExpr) == dump(viaBatch))
  }

  test("vector store: create, upsert (replace-by-key), delete") {
    val dir = Files.createTempDirectory("vstore").toFile
    val path = s"${dir.getAbsolutePath}/store"
    val v1 = DocPipeline.vectors(docs.limit(10), dim = 8)
    VectorStore.upsert(spark, path, v1)
    val n1 = VectorStore.read(spark, path).count()
    assert(n1 > 0)

    // re-upserting the same rows must not duplicate
    VectorStore.upsert(spark, path, v1)
    assert(VectorStore.read(spark, path).count() == n1)

    // delete one document's chunks
    val delKeys = v1.filter(col("doc_id") === 0).select("chunk_id")
    val nDel = delKeys.count()
    VectorStore.deleteWhere(spark, path, delKeys, "chunk_id")
    assert(VectorStore.read(spark, path).count() == n1 - nDel)
  }

  test("batched sink flushes per batch, one client per partition") {
    val acc = spark.sparkContext.collectionAccumulator[Int]("batches")
    VectorStore.foreachBatched(docs.limit(25).repartition(2), batchSize = 10)(
      () => "client")((_, batch) => acc.add(batch.size))(_ => ())
    val sizes = acc.value
    import scala.jdk.CollectionConverters._
    assert(sizes.asScala.map(_.toInt).sum == 25)
    assert(sizes.asScala.forall(_ <= 10))
  }

  test("ledger CDC golden scenario: only new/updated flow on rerun") {
    val dir = Files.createTempDirectory("ledger").toFile
    val path = s"${dir.getAbsolutePath}/ledger"
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2023-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2023-02-01 00:00:00")
    val state = Seq(("a.txt", t0), ("b.txt", t0)).toDF("name", "last_modified")
    Ledger.write(state, path)

    val current = Seq(("a.txt", t0), ("b.txt", t1), ("c.txt", t1))
      .toDF("name", "last_modified")
    val changed = Ledger.newAndUpdated(current, Ledger.read(spark, path))
      .select("name", "change_type").as[(String, String)].collect().toMap
    assert(changed == Map("b.txt" -> "updated", "c.txt" -> "new"))

    // post-run overwrite; rerun with identical listing -> empty delta
    Ledger.write(current, path)
    assert(Ledger.newAndUpdated(current, Ledger.read(spark, path)).isEmpty)
  }

  test("html_to_text: style dropped, anchors resolved, nested tags") {
    assert(HtmlFunctions.htmlToText(
      """<style>p{}</style><div><p>Hello <b>world</b></p><a href="http://x.io/a">link</a></div>""")
      == "Hello world link (http://x.io/a)")
    assert(HtmlFunctions.htmlToText("""<a href="kb/7">rel</a>""")
      == "rel (https://example.com/kb/7)")
    assert(HtmlFunctions.htmlToText(
      "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>")
      == "Table: \nA | B\n1 | 2\n Table ends here")
  }
}
