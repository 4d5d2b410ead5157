package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on the relational tables — additive to the
  * reference (no graph concepts, SURVEY §2.3), standard fare for a
  * pipeline engine: the customer-supplier interaction graph from
  * lineitem x orders, ranked by power iteration.
  *
  * Scale notes (100 TB): each PageRank round is one shuffle join
  * (edges x ranks on src) + one aggregation (sum by dst) — the classic
  * Pregel-as-dataflow shape. Degrees are joined once and carried in the
  * rank table so rounds touch only (id, contribution) pairs, and each
  * round's result is localCheckpoint-ed to truncate lineage (on a
  * cluster: checkpoint to durable storage every few rounds). The
  * iteration count is fixed (5), so the oracle unrolls the same rounds
  * as CTEs.
  */
object GraphOps {

  private val iterations = 5

  /** Undirected customer-supplier edge list; supplier ids offset into
    * their own id space so the two key domains cannot collide.
    */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val pairs = Engine
      .table(s, dir, "lineitem")
      .join(
        Engine.table(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey")
      )
      .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("sp"))
      .distinct()
    pairs
      .select(col("c").as("src"), col("sp").as("dst"))
      .union(pairs.select(col("sp").as("src"), col("c").as("dst")))
  }

  val entries: Seq[QueryDef] = Seq(
    // --------------------------------------------------------------- q101
    // PageRank (damping 0.85, 5 rounds, init 1.0) over the undirected
    // customer-supplier graph: pr'(v) = 0.15 + 0.85 * sum over neighbors
    // u of pr(u)/deg(u). Undirected means no dangling mass. Rounded to 4
    // decimals so float summation order cannot flip the hash.
    QueryDef(
      "q101_pagerank",
      (s, dir) => {
        val e = edges(s, dir).localCheckpoint(eager = false)
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        // rank table carries (id, pr, deg): rounds join it to edges on
        // src, spread pr/deg to dst, and re-attach deg by joining the
        // (tiny, stable) degree table
        var pr = deg.select(col("src").as("id"), lit(1.0).as("pr"), col("deg"))
        for (i <- 1 to iterations) {
          pr = e
            .join(pr.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("src"))
            .agg((lit(0.15) + lit(0.85) * sum(col("pr") / col("deg"))).as("pr"))
            .join(deg, "src")
            .select(col("src").as("id"), col("pr"), col("deg"))
          // truncate lineage every other round (measured no slower than
          // lazy at this depth; on a cluster: reliable checkpoint every
          // ~5 rounds). Without any barrier the plan tree doubles per
          // round and re-optimizes whole at the end.
          if (i % 2 == 0) pr = pr.localCheckpoint(eager = false)
        }
        pr.select(col("id"), round(col("pr"), 4).as("pagerank")).orderBy(col("id"))
      },
      Some {
        val base =
          """WITH e0 AS (
               SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS sp
               FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
             e AS (SELECT c AS src, sp AS dst FROM e0
                   UNION ALL SELECT sp, c FROM e0),
             deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
             p0 AS (SELECT src AS id, 1.0 AS pr FROM deg)"""
        val rounds = (1 to iterations).map { i =>
          s"""p$i AS (SELECT e.dst AS id, 0.15 + 0.85 * sum(p.pr / d.d) AS pr
                FROM e JOIN p${i - 1} p ON e.src = p.id JOIN deg d ON d.src = e.src
                GROUP BY e.dst)"""
        }
        (base +: rounds).mkString(",\n") +
          s"\nSELECT id, round(pr, 4) AS pagerank FROM p$iterations ORDER BY id"
      }
    )
  )
}
