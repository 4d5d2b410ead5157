package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q183 — deterministic random walks: beyond the oracle gate (which
  * pins the exact walk table), pin the graph-validity properties the
  * SQL compare can't express directly: every step follows a real edge,
  * every walker has a complete 4-row walk, and the walk alternates
  * between the customer and supplier id spaces (bipartite invariant).
  */
class RandomWalkSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = graft.Engine.session("test")

  test("q183: walks are complete, edge-valid, and alternate id spaces") {
    val walks = graft.SparkEntry.queries("q183_random_walks")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // complete: every walker contributes exactly steps 0..3
    val byWalker = walks.groupBy(_._1)
    byWalker.foreach { case (start, rows) =>
      assert(rows.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L), s"walker $start incomplete")
      // bipartite alternation: even steps in customer space, odd in
      // supplier space (suppliers offset by 1e6)
      rows.foreach { case (_, step, node) =>
        val isSupplier = node >= 1000000L
        assert(isSupplier == (step % 2 == 1), s"walker $start step $step in wrong id space")
      }
    }

    // edge-valid: every consecutive (node, next) pair is a real edge
    val lineitem = graft.Engine.table(spark, dir, "lineitem")
    val orders = graft.Engine.table(spark, dir, "orders")
    val edgeSet = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("sp"))
      .distinct()
      .collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    byWalker.foreach { case (start, rows) =>
      val path = rows.sortBy(_._2).map(_._3)
      path.sliding(2).foreach {
        case Array(a, b) => assert(edgeSet.contains((a, b)), s"walker $start hop $a->$b not an edge")
        case _           =>
      }
    }
    graft.Engine.releaseScratch(spark)
  }
}
