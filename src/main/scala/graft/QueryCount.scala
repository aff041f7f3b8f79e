package graft

/** Prints the declared-query inventory from the single source of truth
  * (`SparkEntry.queries`) — the README cites this main instead of a
  * hand-maintained count that goes stale. */
object QueryCount {
  def main(args: Array[String]): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val oracled = names.count(SparkEntry.oracleSql.contains)
    println(s"${names.size} declared queries ($oracled oracle-checked):")
    names.foreach(n => println(
      s"  $n${if (SparkEntry.oracleSql.contains(n)) "" else "  [rows-only]"}"))
  }
}
