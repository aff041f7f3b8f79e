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

  test("load→save→load round-trip preserves semantics and canonicalizes class-key drift") {
    val cfg = PipelineConfig.parse(
      """chunk_size = 1200
        |[query]
        |top_n_documents = 7
        |[kb]
        |label = "kb"
        |class = "KbChunk"
        |properties = ["text", "url"]
        |as_context = true
        |top_by_certainty = 0.75
        |[drifty]
        |weaviate_class = "DriftChunk"
        |""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg")
    val path = dir.resolve("roundtrip.toml").toString
    PipelineConfig.save(cfg, path)
    val back = PipelineConfig.load(path)
    assert(back == cfg, "save→load must be the identity on parsed configs")
    // the drifted weaviate_class key re-serializes under canonical `class`
    val rendered = PipelineConfig.render(cfg)
    assert(rendered.contains("class = \"DriftChunk\""))
    assert(!rendered.contains("weaviate_class"))
    // quotes in values survive the escape round-trip
    val quoted = cfg.copy(collections = cfg.collections +
      ("kb" -> cfg.collections("kb").copy(label = "k\"b")))
    assert(PipelineConfig.parse(PipelineConfig.render(quoted))
      .collections("kb").label == "k\"b")
  }

  test("render rejects values the subset parser cannot round-trip") {
    val base = PipelineConfig.parse(
      """[kb]
        |label = "kb"
        |class = "KbChunk"
        |properties = ["text"]
        |""".stripMargin)
    // a comma inside an array element would silently split on reload
    val comma = base.copy(collections = base.collections +
      ("kb" -> base.collections("kb").copy(properties = Seq("a,b"))))
    assert(intercept[IllegalArgumentException] {
      PipelineConfig.render(comma)
    }.getMessage.contains("commas"))
    // a newline inside any string would break the line-based parser
    val newline = base.copy(collections = base.collections +
      ("kb" -> base.collections("kb").copy(label = "k\nb")))
    assert(intercept[IllegalArgumentException] {
      PipelineConfig.render(newline)
    }.getMessage.contains("line breaks"))
  }

  test("template generates, parses, and rejects unknown kinds loudly") {
    val t = PipelineConfig.generateTemplate()
    val cfg = PipelineConfig.parse(t)
    assert(cfg.chunkSize == 2000 && cfg.query.topNDocuments == 3)
    assert(cfg.collections("kb_articles").className == "KbChunk")
    assert(cfg.query.labelClassMap("kb") == "KbChunk")
    // template → parse → render is stable (render∘parse idempotent)
    assert(PipelineConfig.parse(PipelineConfig.render(cfg)) == cfg)
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.generateTemplate("agentic")
    }
    assert(e.getMessage.contains("rag"))
  }
}
