package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Generations

/** The blue/green artifact-generation pointer contract (operators/
  * Generations.scala — q247's swap machinery):
  *   1. commit/resolve round-trip, atomic cutover;
  *   2. READER ACROSS THE SWAP: the previous generation's files
  *      survive one retrain cycle (retain = 2), so a request that
  *      resolved before the swap keeps serving;
  *   3. GC bounds disk: a third commit collects the oldest generation;
  *   4. ROLLBACK never self-destructs: committing an OLDER name keeps
  *      that generation alive whatever the name-order GC says;
  *   5. RETRAIN AFTER ROLLBACK (round-15 ADVICE): GC retires by
  *      pointer recency, so the next forward commit after a rollback
  *      GCs the abandoned bad generation and KEEPS the one that was
  *      serving until that instant;
  *   6. numeric generation ordering past the 5-digit convention;
  *   7. resolveAsOf answers "which generation served batch b" from
  *      the commit-mark history, and fails loudly past retention;
  *   8. the writer fence: a concurrent commit throws instead of
  *      racing the swap/GC;
  *   9. loud failures: no pointer / missing generation dirs / bad
  *      generation names.
  */
class GenerationsSpec extends AnyFunSuite {

  private def tmp(name: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_gens_$name"
    Engine.deleteRecursively(new java.io.File(d))
    new java.io.File(d).mkdirs()
    d
  }

  private def writeGen(root: String, gen: String, payload: String): Unit = {
    val d = new java.io.File(root, gen)
    d.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(d, "artifact.txt").toPath,
      payload.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  }

  private def payloadOf(path: String): String =
    new String(
      java.nio.file.Files.readAllBytes(new java.io.File(path, "artifact.txt").toPath),
      java.nio.charset.StandardCharsets.UTF_8)

  test("commit/resolve round-trip; readers across the swap; GC at the third generation") {
    val root = tmp("swap")
    writeGen(root, "gen-00000", "blue")
    Generations.commit(root, "gen-00000")
    val blue = Generations.resolve(root)
    assert(payloadOf(blue) == "blue")
    // the swap: a reader holding `blue` must stay valid through it
    writeGen(root, "gen-00001", "green")
    Generations.commit(root, "gen-00001")
    assert(payloadOf(Generations.resolve(root)) == "green")
    assert(payloadOf(blue) == "blue", "pre-swap reader lost its generation")
    // third commit: gen-00000 ages out of the retain=2 window
    writeGen(root, "gen-00002", "newer")
    Generations.commit(root, "gen-00002")
    assert(Generations.list(root) == Seq("gen-00001", "gen-00002"))
    assert(!new java.io.File(root, "gen-00000").exists)
  }

  test("rollback: committing an older generation never GCs the generation being committed") {
    val root = tmp("rollback")
    writeGen(root, "gen-00000", "old")
    Generations.commit(root, "gen-00000")
    writeGen(root, "gen-00001", "bad")
    Generations.commit(root, "gen-00001")
    // roll back to gen-00000 with retain = 1: name-order GC alone
    // would delete the live generation — the commit must protect it
    Generations.commit(root, "gen-00000", retain = 1)
    assert(payloadOf(Generations.resolve(root)) == "old")
  }

  test("an un-pointed orphan generation (crashed retrain) is GC'd by the next commit") {
    val root = tmp("orphan")
    writeGen(root, "gen-00000", "blue")
    Generations.commit(root, "gen-00000")
    // a retrain crashed after writing its dir, before its commit: the
    // dir is complete-looking but never entered the pointer history
    writeGen(root, "gen-00001", "halfway")
    writeGen(root, "gen-00002", "green")
    Generations.commit(root, "gen-00002")
    assert(payloadOf(Generations.resolve(root)) == "green")
    assert(!new java.io.File(root, "gen-00001").exists, "orphan survived GC")
    assert(new java.io.File(root, "gen-00000").isDirectory)
  }

  test("retrain after rollback: GC retires by pointer recency, not name order") {
    val root = tmp("retrain_after_rollback")
    writeGen(root, "gen-00000", "blue")
    Generations.commit(root, "gen-00000")
    writeGen(root, "gen-00001", "bad-green")
    Generations.commit(root, "gen-00001")
    // the green generation regresses: roll back to blue
    Generations.commit(root, "gen-00000")
    // ... and the NEXT forward retrain commits gen-00002. Name-order
    // GC (round-15 ADVICE) would keep {gen-00001, gen-00002} and
    // delete gen-00000 — the generation serving requests until this
    // instant. Recency GC keeps {gen-00002, gen-00000} and retires
    // the abandoned bad generation instead.
    writeGen(root, "gen-00002", "good-green")
    Generations.commit(root, "gen-00002")
    assert(payloadOf(Generations.resolve(root)) == "good-green")
    assert(
      new java.io.File(root, "gen-00000").isDirectory,
      "the previously-serving generation must survive one full cycle")
    assert(
      !new java.io.File(root, "gen-00001").exists,
      "the abandoned rolled-back-from generation is the one to GC")
  }

  test("generation order is numeric, not lexicographic") {
    val root = tmp("numeric")
    writeGen(root, "gen-99999", "older")
    Generations.commit(root, "gen-99999")
    // lexicographically 'gen-100000' < 'gen-99999'; numerically it is
    // the NEWEST — list order and GC retention must both see that
    writeGen(root, "gen-100000", "newest")
    Generations.commit(root, "gen-100000")
    assert(Generations.list(root) == Seq("gen-99999", "gen-100000"))
    writeGen(root, "gen-100001", "evennewer")
    Generations.commit(root, "gen-100001")
    assert(Generations.list(root) == Seq("gen-100000", "gen-100001"))
    assert(!new java.io.File(root, "gen-99999").exists)
  }

  test("resolveAsOf: the generation that served batch b, from commit marks") {
    val root = tmp("asof")
    writeGen(root, "gen-00000", "blue")
    Generations.commit(root, "gen-00000", retain = 4, mark = -1L)
    writeGen(root, "gen-00001", "green")
    Generations.commit(root, "gen-00001", retain = 4, mark = 2L)
    // pre-swap batches resolve blue, the swap batch and later green
    assert(payloadOf(Generations.resolveAsOf(root, 0L)) == "blue")
    assert(payloadOf(Generations.resolveAsOf(root, 1L)) == "blue")
    assert(payloadOf(Generations.resolveAsOf(root, 2L)) == "green")
    assert(payloadOf(Generations.resolveAsOf(root, 99L)) == "green")
    val ex = intercept[IllegalStateException](Generations.resolveAsOf(root, -5L))
    assert(ex.getMessage.contains("no commit at or before"), ex.getMessage)
    // age blue out (retain = 1): the as-of resolve must fail LOUDLY
    // with the retention knob, never serve a missing artifact set
    writeGen(root, "gen-00002", "newest")
    Generations.commit(root, "gen-00002", retain = 1, mark = 5L)
    val gone = intercept[IllegalArgumentException](Generations.resolveAsOf(root, 0L))
    assert(gone.getMessage.contains("retention window"), gone.getMessage)
  }

  test("rollback then resolveAsOf: an out-of-band commit is logged AT the last mark, never shadowing the marked history") {
    val root = tmp("asof_rollback")
    writeGen(root, "gen-00000", "blue")
    Generations.commit(root, "gen-00000", retain = 4, mark = -1L)
    writeGen(root, "gen-00001", "green")
    Generations.commit(root, "gen-00001", retain = 4, mark = 2L)
    // the green generation is bad — roll back with NO mark (the
    // out-of-band convention). Round-16 ADVICE: logged literally as
    // -1 this entry would match every `m <= mark` probe, answering
    // for batches green actually served; it must inherit mark 2
    // ("the pointer moved now"), keeping the log non-decreasing.
    Generations.commit(root, "gen-00000", retain = 4)
    assert(payloadOf(Generations.resolveAsOf(root, 1L)) == "blue")
    // at/after the rollback the LAST commit at mark 2 answers: blue
    assert(payloadOf(Generations.resolveAsOf(root, 2L)) == "blue")
    assert(payloadOf(Generations.resolveAsOf(root, 3L)) == "blue")
    // the next forward retrain resumes explicit marks above the log
    writeGen(root, "gen-00002", "good-green")
    Generations.commit(root, "gen-00002", retain = 4, mark = 5L)
    assert(payloadOf(Generations.resolveAsOf(root, 4L)) == "blue")
    assert(payloadOf(Generations.resolveAsOf(root, 5L)) == "good-green")
  }

  test("commit rejects a mark below the last logged mark") {
    val root = tmp("mark_order")
    writeGen(root, "gen-00000", "blue")
    Generations.commit(root, "gen-00000", mark = 3L)
    writeGen(root, "gen-00001", "green")
    val ex = intercept[IllegalArgumentException](
      Generations.commit(root, "gen-00001", mark = 1L))
    assert(ex.getMessage.contains("non-decreasing"), ex.getMessage)
    // equal marks are fine (swap + rollback within one batch)
    Generations.commit(root, "gen-00001", mark = 3L)
    assert(payloadOf(Generations.resolve(root)) == "green")
  }

  test("migration: a pre-HISTORY root's serving generation survives the first new-code commit") {
    val root = tmp("migrate")
    // a root written by pre-HISTORY code: CURRENT exists, HISTORY absent
    writeGen(root, "gen-00000", "legacy-serving")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "CURRENT"),
      "gen-00000".getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    writeGen(root, "gen-00001", "first-new-code")
    Generations.commit(root, "gen-00001", retain = 2)
    // without seeding, the keep-set is built from the single new
    // HISTORY entry and GC deletes the generation serving until this
    // instant — silent data loss under its in-flight readers
    assert(payloadOf(Generations.resolve(root)) == "first-new-code")
    assert(
      new java.io.File(root, "gen-00000").isDirectory,
      "the pre-HISTORY serving generation must survive the migration commit")
    assert(Generations.history(root).head == ("gen-00000", -1L))
  }

  test("a malformed HISTORY line fails loudly with the file and the line") {
    val root = tmp("badline")
    writeGen(root, "gen-00000", "blue")
    Generations.commit(root, "gen-00000")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "HISTORY"),
      "gen-00000 0\ngen-00001 not-a-mark\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    val ex = intercept[IllegalStateException](Generations.history(root))
    assert(ex.getMessage.contains("HISTORY"), ex.getMessage)
    assert(ex.getMessage.contains("not-a-mark"), ex.getMessage)
    assert(ex.getMessage.contains(root), ex.getMessage)
  }

  test("writer fence: a concurrent commit throws instead of racing the swap") {
    val root = tmp("fence")
    writeGen(root, "gen-00000", "blue")
    Generations.commit(root, "gen-00000")
    writeGen(root, "gen-00001", "green")
    // hold the root's writer lock as "another process" would
    import java.nio.file.StandardOpenOption._
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(root, "LOCK"), CREATE, WRITE)
    val held = ch.lock()
    try {
      val ex = intercept[IllegalStateException](Generations.commit(root, "gen-00001"))
      assert(ex.getMessage.contains("concurrent writer"), ex.getMessage)
    } finally { held.release(); ch.close() }
    // with the lock released the same commit proceeds
    Generations.commit(root, "gen-00001")
    assert(payloadOf(Generations.resolve(root)) == "green")
  }

  test("loud failures: missing pointer, missing generation dir, bad names") {
    val root = tmp("fail")
    val exNoPtr = intercept[IllegalArgumentException](Generations.resolve(root))
    assert(exNoPtr.getMessage.contains("CURRENT"), exNoPtr.getMessage)
    val exNoGen = intercept[IllegalArgumentException](
      Generations.commit(root, "gen-09999"))
    assert(exNoGen.getMessage.contains("missing generation"), exNoGen.getMessage)
    val exBadName = intercept[IllegalArgumentException](
      Generations.commit(root, "generation-one"))
    assert(exBadName.getMessage.contains("gen-NNNNN"), exBadName.getMessage)
  }
}
