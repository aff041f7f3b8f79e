package graft

import graft.config.PipelineConfig
import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("TOML subset parse: sections, query knobs, unknown passthrough") {
    val cfg = PipelineConfig.parse(
      """chunk_size = 1000
        |chunk_overlap = 25
        |# comment
        |[query]
        |top_n_documents = 5
        |[kb_articles]
        |label = "kb"
        |class = "KbChunk"
        |properties = ["text", "url", "n_tokens"]
        |as_context = true
        |top_by_certainty = 0.9
        |[mystery_table]
        |weaviate_class = "MysteryChunk"
        |""".stripMargin)
    assert(cfg.chunkSize == 1000 && cfg.chunkOverlap == 25)
    assert(cfg.batchSize == 150) // reference default kept
    assert(cfg.query.topNDocuments == 5)
    val kb = cfg.collections("kb_articles")
    assert(kb.className == "KbChunk" && kb.asContext &&
      kb.properties == Seq("text", "url", "n_tokens") &&
      kb.topByCertainty.contains(0.9))
    // unknown table passes through (configgen.py:146-148) with class drift
    assert(cfg.collections("mystery_table").className == "MysteryChunk")
    assert(cfg.query.labelClassMap("kb") == "KbChunk")
  }

  test("defaults mirror the reference's pinned constants") {
    val d = PipelineConfig.Default
    assert(d.chunkSize == 2000 && d.chunkOverlap == 50 && d.batchSize == 150)
  }
}
