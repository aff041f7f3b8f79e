package graft.sources

/** THE scheme-normalized path key — the single definition every module
  * joins file paths on (r14 review close: the identical regex lived in
  * seven places; a future normalization fix must change exactly one).
  * Strips `scheme:/+` (and with it any authority-slash rendering
  * difference: `file:/x`, `file:///x`, `hdfs://nn/x` all key as the
  * root-slash path) so `_metadata.file_path` URIs, Hadoop Path
  * strings, and log/manifest-recorded URIs compare equal. Keys are for
  * COMPARISON only (GraftPlanApi's root match included) — never re-wrap one as a Path to touch the
  * filesystem (the r13 expire finding). */
object PathKeys {
  def normKey(p: String): String =
    p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.\\-]*:/+", "/")
}
