package graft.mr

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the pure MapReduce building blocks. */
object MrProperties extends Properties("graft.mr") {

  /** reference semantics: Python sorted() compares by Unicode codepoint */
  private def codepointCompare(a: String, b: String): Int = {
    val x = a.codePoints.toArray
    val y = b.codePoints.toArray
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      if (x(i) != y(i)) return Integer.compare(x(i), y(i))
      i += 1
    }
    Integer.compare(x.length, y.length)
  }

  property("utf8Ordering == codepoint order") = Prop.forAll { (a: String, b: String) =>
    math.signum(MapReduceJob.utf8Ordering.compare(a, b)) == math.signum(codepointCompare(a, b))
  }

  property("utf8Ordering is reflexive and antisymmetric") = Prop.forAll { (a: String, b: String) =>
    val ab = MapReduceJob.utf8Ordering.compare(a, b)
    val ba = MapReduceJob.utf8Ordering.compare(b, a)
    MapReduceJob.utf8Ordering.compare(a, a) == 0 && math.signum(ab) == -math.signum(ba)
  }

  private val filesGen = Gen.listOf(Gen.identifier).map(_.distinct)
  private val nGen = Gen.choose(1, 16)

  property("roundRobin partitions the file list exactly") = Prop.forAll(filesGen, nGen) { (files, n) =>
    val tasks = MapReduceJob.roundRobin(files, n)
    tasks.length == n && tasks.flatten.sorted == files.sorted &&
    tasks.flatten.toSet == files.toSet
  }

  property("roundRobin assigns file i to task i % n") = Prop.forAll(filesGen, nGen) { (files, n) =>
    val tasks = MapReduceJob.roundRobin(files, n)
    files.zipWithIndex.forall { case (f, i) => tasks(i % n).contains(f) }
  }

  property("groupKey(tab) is the prefix before the first tab, tab-free") =
    Prop.forAll { (s: String) =>
      val k = MapReduceJob.groupKey(s, legacy = false)
      s.startsWith(k) && !k.contains('\t') &&
      (if (s.contains('\t')) s.charAt(k.length) == '\t' else k == s)
    }

  property("groupKey(legacy) strips at most one trailing space-word") =
    Prop.forAll { (s: String) =>
      val k = MapReduceJob.groupKey(s, legacy = true)
      s.startsWith(k) && (k == s || s.charAt(k.length) == ' ')
    }
}
