/** Generates REGISTRY.md — the auto-derived query-registry table, so the
  * documented inventory can never drift from `SparkEntry` (regenerate
  * with `sbt "runMain RegistryDoc"`).
  *
  * Correctness labels come from the LATEST driver gate file
  * (CORRECTNESS_r*.json), not from the mere presence of an oracle — a
  * query that failed its hash gate must read as red until a gate run
  * proves otherwise, and a query added since the last gate reads as
  * pending.
  */
object RegistryDoc {
  def main(args: Array[String]): Unit = {
    val oracles = graft.SparkEntry.oracleSql.keySet
    // freshest gate by ROUND NUMBER, not lexicographic name (r9 would
    // sort after r10) — and the header below names the SELFCHECK overlay
    // explicitly, so it is clear which labels come from which run
    // (round-13 verdict #5: the header stamped the previous driver file
    // while the post-gate rows were actually labeled from SELFCHECK)
    val gateFiles = new java.io.File(".")
      .listFiles
      .filter(f => f.getName.matches("CORRECTNESS_r\\d+\\.json"))
      .sortBy(f => f.getName.stripPrefix("CORRECTNESS_r").stripSuffix(".json").toInt)
    val gateName = gateFiles.lastOption.map(_.getName).getOrElse("none yet")
    // tristate per query: true/false = gate verdict; absent = the gate
    // never hash-checked it (new query, or it was rows-only back then —
    // "hash_match": null)
    val gate: Map[String, Boolean] = gateFiles.lastOption
      .map { f =>
        val txt = java.nio.file.Files.readString(f.toPath)
        """"(q\w+)":\s*\{([^}]*)\}""".r
          .findAllMatchIn(txt)
          .flatMap { m =>
            """"hash_match":\s*(true|false)""".r
              .findFirstMatchIn(m.group(2))
              .map(h => m.group(1) -> (h.group(1) == "true"))
          }
          .toMap
      }
      .getOrElse(Map.empty)
    // Local-evidence overlay for queries ADDED since the last driver
    // gate: scripts/selfcheck.py writes SELFCHECK.json after a FULL
    // local gate run; those verdicts label post-gate queries instead of
    // a bare "pending" (the driver gate stays canonical — overlay
    // applies ONLY where the driver file has no verdict).
    val self: Map[String, Boolean] = {
      val f = new java.io.File("SELFCHECK.json")
      if (!f.exists) Map.empty
      else {
        val txt = java.nio.file.Files.readString(f.toPath)
        """"(q\w+)":\s*\{\s*"hash_match":\s*(true|false)""".r
          .findAllMatchIn(txt)
          .map(m => m.group(1) -> (m.group(2) == "true"))
          .toMap
      }
    }
    var nRed = 0
    var nRedLocal = 0
    var nPending = 0
    val rows = graft.SparkEntry.allDefs
      .sortBy(_.name)
      .map { d =>
        val check =
          if (!oracles(d.name)) "rows-only (approx by design; accuracy spec-tested)"
          else
            gate.get(d.name) match {
              case Some(true) => s"DuckDB hash-match (verified in $gateName)"
              case Some(false) =>
                nRed += 1; s"**ORACLE MISMATCH** in $gateName"
              case None =>
                self.get(d.name) match {
                  case Some(true) =>
                    "DuckDB hash-match (local selfcheck; added since last driver gate)"
                  case Some(false) =>
                    nRedLocal += 1; "**ORACLE MISMATCH** in local selfcheck"
                  case None =>
                    nPending += 1; "DuckDB hash-match oracle (added since last gate — pending)"
                }
            }
        s"| `${d.name}` | $check |"
      }
    val md =
      s"""# REGISTRY — auto-generated from SparkEntry (`sbt "runMain RegistryDoc"`)
         |
         |${graft.SparkEntry.queries.size} queries; ${oracles.size} oracle-gated,
         |${graft.SparkEntry.queries.size - oracles.size} rows-only (approximate by
         |design, accuracy-tested in specs). Labels: driver-gate rows read
         |from `$gateName` ($nRed mismatch); queries added SINCE that gate
         |are labeled from `SELFCHECK.json`, this repo's own full local gate
         |run ($nRedLocal mismatch, $nPending never gated anywhere). A red
         |row fixed after its gate stays red here until the next gate run
         |regenerates this file. See COVERAGE.md for the operator narrative
         |and SURVEY.md §2 for the reference inventory.
         |
         || query | correctness check |
         ||---|---|
         |${rows.mkString("\n         |")}
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("REGISTRY.md"), md)
    println(
      s"REGISTRY.md written: ${rows.size} rows ($nRed mismatch vs $gateName, " +
        s"$nRedLocal local-selfcheck mismatch, $nPending pending)")
  }
}
