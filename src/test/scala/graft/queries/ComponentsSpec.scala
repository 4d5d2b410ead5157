package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Algorithm-level checks for the distributed connected-components
  * operator: the iterative min-propagation must agree with a plain
  * union-find on arbitrary graphs (chains, cycles, stars, forests),
  * which the q58 oracle's recursive CTE can only exercise on the shapes
  * present in the corpus.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    // canonical representative = min id in component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  test("min-propagation equals union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 5) {
      val n = 20 + rnd.nextInt(30)
      val nEdges = n / 2 + rnd.nextInt(n)
      val edges = Seq.fill(nEdges) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val expected = unionFind(n, edges)
      val got = DedupOps
        .connectedComponents(edges.toDF("id_a", "id_b"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == expected, s"trial $trial: n=$n edges=${edges.size}")
    }
  }

  test("a long chain converges (diameter >> 1)") {
    import spark.implicits._
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = DedupOps
      .connectedComponents(chain.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.size == 40 && got.values.forall(_ == 0L))
  }

  test("large-star/small-star equals union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 5) {
      val n = 20 + rnd.nextInt(30)
      val nEdges = n / 2 + rnd.nextInt(n)
      val edges = Seq.fill(nEdges) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val expected = unionFind(n, edges)
      val got = DedupOps
        .starComponents(edges.toDF("id_a", "id_b"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == expected, s"trial $trial: n=$n edges=${edges.size}")
    }
  }

  test("large-star/small-star handles a long chain (the high-diameter case)") {
    import spark.implicits._
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = DedupOps
      .starComponents(chain.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.size == 40 && got.values.forall(_ == 0L))
  }
}
