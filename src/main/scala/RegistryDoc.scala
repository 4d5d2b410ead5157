/** Generates REGISTRY.md — the auto-derived query-registry table, so the
  * documented inventory can never drift from `SparkEntry` (regenerate
  * with `sbt "runMain RegistryDoc"`).
  */
object RegistryDoc {
  def main(args: Array[String]): Unit = {
    val oracles = graft.SparkEntry.oracleSql.keySet
    val rows = graft.SparkEntry.allDefs
      .sortBy(_.name)
      .map { d =>
        val check = if (oracles(d.name)) "DuckDB hash-match" else "rows-only (approx; spec-tested)"
        s"| `${d.name}` | $check |"
      }
    val md =
      s"""# REGISTRY — auto-generated from SparkEntry (`sbt "runMain RegistryDoc"`)
         |
         |${graft.SparkEntry.queries.size} queries; ${oracles.size} oracle-gated,
         |${graft.SparkEntry.queries.size - oracles.size} rows-only (approximate by
         |design, accuracy-tested in specs). See COVERAGE.md for the
         |operator narrative and SURVEY.md §2 for the reference inventory.
         |
         || query | correctness check |
         ||---|---|
         |${rows.mkString("\n")}
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("REGISTRY.md"), md)
    println(s"REGISTRY.md written: ${rows.size} rows")
  }
}
