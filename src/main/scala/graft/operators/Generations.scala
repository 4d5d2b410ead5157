package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** BLUE/GREEN generation pointer for immutable artifact SETS — the
  * commit machinery behind quantizer retraining (q247): an ANN index
  * is one coherent set of artifacts (coarse cells + codebook + codes)
  * whose quantizers are FROZEN once trained, so refreshing them is
  * never an in-place mutation — a retrain writes a complete NEW
  * generation directory next to the live one and swaps a pointer,
  * exactly Delta/Iceberg's pointer-commit discipline one level up
  * (TieredIndex commits a manifest per mutation; Generations commits a
  * whole artifact ROOT per retrain). Layout under one root:
  *
  * {{{
  *   CURRENT        one line: the name of the live generation dir
  *   gen-NNNNN/     a complete artifact set (coarse/ codebook/ codes/)
  * }}}
  *
  * Properties, spec-pinned (GenerationsSpec):
  *  - ATOMIC CUTOVER: [[commit]] fsyncs the pointer and swaps it with
  *    one POSIX rename — a reader resolves either the old or the new
  *    generation in full, never a half-retrained mix (a new codebook
  *    scoring old codes would be silent garbage; the generation dir
  *    makes that unrepresentable).
  *  - READERS ACROSS THE SWAP: [[commit]]'s GC keeps the newest
  *    `retain` generations (default 2 = current + previous), so a
  *    request that resolved the old generation keeps serving from it
  *    through one full retrain cycle — the same contract TieredIndex
  *    gives segment readers across a compaction.
  *  - CRASH SAFETY: a retrain killed mid-write leaves CURRENT on the
  *    old generation and the half-written dir as an un-pointed orphan
  *    (the next same-named retrain overwrites it; [[commit]] is only
  *    called after the generation is complete on disk).
  */
object Generations {

  private def currentPath(root: String) = Paths.get(root, "CURRENT")

  /** The live generation's absolute path. Fails loudly on a missing
    * pointer or a pointer at a GC'd/unwritten generation — never
    * resolves a partial artifact set.
    */
  def resolve(root: String): String = {
    val p = currentPath(root)
    require(Files.exists(p), s"Generations: $root has no CURRENT pointer")
    val gen = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim
    val dir = new java.io.File(root, gen)
    require(
      dir.isDirectory,
      s"Generations: CURRENT points at missing generation $gen under $root")
    dir.toString
  }

  /** Committed generation names, oldest first (spec observable). */
  def list(root: String): Seq[String] =
    Option(new java.io.File(root).list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("gen-")).sorted.toSeq

  /** Point CURRENT at `gen` (a complete generation dir under `root`),
    * durably: the generation tree is fsync'd (parquet writers do not
    * force their output), the pointer write is fsync'd, the swap is
    * one atomic rename, and the directory entry is forced — the same
    * ordering TieredIndex's manifest commit uses, so a power loss can
    * never persist a pointer ahead of the artifacts it names. Then
    * generations older than the newest `retain` are deleted (the GC
    * that bounds disk while keeping the previous generation alive for
    * in-flight readers).
    */
  def commit(root: String, gen: String, retain: Int = 2): Unit = {
    val dir = new java.io.File(root, gen)
    require(
      dir.isDirectory,
      s"Generations: cannot commit missing generation $gen under $root")
    TieredIndex.fsyncTree(dir)
    val tmp = Paths.get(root, "CURRENT.tmp")
    TieredIndex.writeFsync(tmp, gen.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentPath(root), StandardCopyOption.ATOMIC_MOVE): Unit
    TieredIndex.fsyncDir(root)
    // never GC the generation just committed, whatever its name sorts
    // as — a ROLLBACK commit points CURRENT at an older name, and
    // name-order GC alone would delete the live generation
    list(root).dropRight(math.max(1, retain)).filterNot(_ == gen).foreach { old =>
      graft.Engine.deleteRecursively(new java.io.File(root, old))
    }
  }
}
