package graft.config

import scala.io.Source

/** Pipeline configuration (SURVEY.md §1.1-6).
  *
  * Mirrors the reference's TOML config semantics (/root/reference/
  * llmcore/cms/configgen.py): a `[query]` section with retrieval knobs
  * (QueryConfig.post_init builds a label→class map, configgen.py:122-127),
  * per-collection sections mapped through a domain→class table
  * (:138-144), and UNKNOWN sections passing through as generic configs
  * (:146-148) rather than failing.
  *
  * No TOML library ships offline, so this is a minimal parser for the
  * subset the reference's cfg.toml uses: [sections], key = "string" |
  * number | boolean | [array]. Config is control-plane only — never a
  * data-plane concern.
  */
final case class CollectionConfig(
    name: String,
    label: String,
    className: String,
    properties: Seq[String],
    asContext: Boolean,
    urlProperty: String,
    topByCertainty: Option[Double])

final case class QueryConfig(
    topNDocuments: Int,
    labelClassMap: Map[String, String])

final case class PipelineConfig(
    chunkSize: Int,
    chunkOverlap: Int,
    batchSize: Int,
    embeddingDim: Int,
    query: QueryConfig,
    collections: Map[String, CollectionConfig])

object PipelineConfig {

  val Default: PipelineConfig = PipelineConfig(
    // the reference's pinned constants (data_ingestion.py:41-42,:97; cfg.toml)
    chunkSize = 2000, chunkOverlap = 50, batchSize = 150, embeddingDim = 64,
    query = QueryConfig(topNDocuments = 3, labelClassMap = Map.empty),
    collections = Map.empty)

  def parse(toml: String): PipelineConfig = {
    var section = ""
    val sections = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[String, String]]
    toml.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
      case l if l.startsWith("[") && l.endsWith("]") =>
        section = l.substring(1, l.length - 1).trim
        sections.getOrElseUpdate(section, scala.collection.mutable.Map.empty)
      case l if l.contains("=") =>
        val Array(k, v) = l.split("=", 2)
        sections.getOrElseUpdate(section, scala.collection.mutable.Map.empty)
          .update(k.trim, v.trim)
      case _ => ()
    }

    // strip quotes and resolve \" / \\ escapes (what [[render]] emits)
    def unq(v: String): String = {
      val inner = v.stripPrefix("\"").stripSuffix("\"")
      val sb = new StringBuilder
      var i = 0
      while (i < inner.length) {
        if (inner(i) == '\\' && i + 1 < inner.length) { sb += inner(i + 1); i += 2 }
        else { sb += inner(i); i += 1 }
      }
      sb.result()
    }
    def str(s: Map[String, String], k: String, dflt: String): String =
      s.get(k).map(unq).getOrElse(dflt)
    def num(s: Map[String, String], k: String, dflt: Int): Int =
      s.get(k).flatMap(_.toIntOption).getOrElse(dflt)
    def arr(s: Map[String, String], k: String): Seq[String] =
      s.get(k).toSeq.flatMap(_.stripPrefix("[").stripSuffix("]").split(",")
        .map(v => unq(v.trim)).filter(_.nonEmpty))

    val top = sections.getOrElse("", scala.collection.mutable.Map.empty).toMap
    val querySec = sections.getOrElse("query", scala.collection.mutable.Map.empty).toMap
    // every other section is a collection — unknown sections pass through
    val collections = (sections.keySet - "" - "query").map { name =>
      val s = sections(name).toMap
      name -> CollectionConfig(
        name = name,
        label = str(s, "label", name),
        // the reference drifts between `class` and `weaviate_class`
        // (cfg.toml:30 vs :37) — accept both, preferring `class`
        className = str(s, "class", str(s, "weaviate_class", name)),
        properties = arr(s, "properties"),
        asContext = str(s, "as_context", "false").toBoolean,
        urlProperty = str(s, "url_property", "url"),
        topByCertainty = s.get("top_by_certainty").flatMap(_.toDoubleOption))
    }.toMap

    PipelineConfig(
      chunkSize = num(top, "chunk_size", Default.chunkSize),
      chunkOverlap = num(top, "chunk_overlap", Default.chunkOverlap),
      batchSize = num(top, "batch_size", Default.batchSize),
      embeddingDim = num(top, "embedding_dim", Default.embeddingDim),
      query = QueryConfig(
        topNDocuments = num(querySec, "top_n_documents", 3),
        labelClassMap = collections.values.map(c => c.label -> c.className).toMap),
      collections = collections)
  }

  def load(path: String): PipelineConfig = {
    val src = Source.fromFile(path)
    try parse(src.mkString) finally src.close()
  }

  /** Render to the same TOML subset [[parse]] reads (REF `save_config`
    * configgen.py:155-161 — every domain object dumped back to its
    * table). Collections always serialize the class under `class` (the
    * canonical spelling of the reference's `class`/`weaviate_class`
    * drift the LOADER accepts, cfg.toml:30 vs :37) and omit absent
    * optionals, so render∘parse normalizes rather than preserving
    * byte-level quirks; `parse(render(cfg)) == cfg` for any parsed or
    * well-formed config (pinned in ConfigSpec). Sections are
    * name-sorted — deterministic output for config diffing. */
  def render(cfg: PipelineConfig): String = {
    // the minimal subset parser is line-based and splits arrays on raw
    // commas — values it cannot round-trip are rejected LOUDLY here
    // rather than silently corrupted on the next load
    def q(s: String): String = {
      require(!s.exists(c => c == '\n' || c == '\r'),
        s"config string values must not contain line breaks: ${s.take(40)}…")
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }
    def qArr(s: String): String = {
      require(!s.contains(","),
        s"config array elements must not contain commas: ${s.take(40)}…")
      q(s)
    }
    val sb = new StringBuilder
    sb ++= s"chunk_size = ${cfg.chunkSize}\n"
    sb ++= s"chunk_overlap = ${cfg.chunkOverlap}\n"
    sb ++= s"batch_size = ${cfg.batchSize}\n"
    sb ++= s"embedding_dim = ${cfg.embeddingDim}\n"
    sb ++= "\n[query]\n"
    sb ++= s"top_n_documents = ${cfg.query.topNDocuments}\n"
    cfg.collections.toSeq.sortBy(_._1).foreach { case (name, c) =>
      sb ++= s"\n[$name]\n"
      sb ++= s"label = ${q(c.label)}\n"
      sb ++= s"class = ${q(c.className)}\n"
      sb ++= s"properties = [${c.properties.map(qArr).mkString(", ")}]\n"
      sb ++= s"as_context = ${c.asContext}\n"
      sb ++= s"url_property = ${q(c.urlProperty)}\n"
      c.topByCertainty.foreach(t => sb ++= s"top_by_certainty = $t\n")
    }
    sb.result()
  }

  /** REF `save_config` (configgen.py:155-161): write the rendered TOML. */
  def save(cfg: PipelineConfig, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(cfg))

  /** Starter-config template per pipeline kind (REF
    * `generate_config_template` configgen.py:77-85: a type→template
    * map, one "rag" entry, loud failure listing the supported kinds on
    * anything else). The template is itself parseable — template →
    * [[parse]] → [[render]] is the documented bootstrap path. */
  def generateTemplate(kind: String = "rag"): String = kind match {
    case "rag" =>
      """# graft pipeline configuration
        |chunk_size = 2000
        |chunk_overlap = 50
        |batch_size = 150
        |embedding_dim = 64
        |
        |[query]
        |top_n_documents = 3
        |
        |# one table per vector collection; unknown tables pass through
        |[kb_articles]
        |label = "kb"
        |class = "KbChunk"
        |properties = ["text", "title", "url", "n_tokens"]
        |as_context = true
        |url_property = "url"
        |top_by_certainty = 0.9
        |""".stripMargin
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported pipeline type: $other. Please select one of rag")
  }

  /** REF `generate_config_template`'s file form (configgen.py:77-85). */
  def saveTemplate(path: String, kind: String = "rag"): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), generateTemplate(kind))
}
