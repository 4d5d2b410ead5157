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
  *   5. loud failures: no pointer / missing generation dirs.
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
    writeGen(root, "gen-00001", "bad")
    Generations.commit(root, "gen-00001")
    // roll back to gen-00000 with retain = 1: name-order GC alone
    // would delete the live generation — the commit must protect it
    Generations.commit(root, "gen-00000", retain = 1)
    assert(payloadOf(Generations.resolve(root)) == "old")
  }

  test("loud failures: missing pointer, missing generation dir") {
    val root = tmp("fail")
    val exNoPtr = intercept[IllegalArgumentException](Generations.resolve(root))
    assert(exNoPtr.getMessage.contains("CURRENT"), exNoPtr.getMessage)
    val exNoGen = intercept[IllegalArgumentException](
      Generations.commit(root, "gen-09999"))
    assert(exNoGen.getMessage.contains("missing generation"), exNoGen.getMessage)
  }
}
