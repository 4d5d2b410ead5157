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

  /** Users co-active in >= 3 distinct (hour, event_type) slots — the
    * undirected edge list shared by q143 (triangles) and q152 (label
    * propagation). Hot-slot guard (the q52 degenerate-bucket pattern):
    * a slot with B co-active users fans out B^2 candidate pairs, so
    * slots beyond 200 users are dropped — bounded work for a bounded,
    * documented recall loss (a flash-crowd hour says little about
    * pairwise affinity anyway). The window runs on the slot
    * partitioning; no extra shuffle. Doesn't bind at test SFs (max 51
    * at sf0.1) — the oracle reproduces the cap so the gate stays exact
    * regardless.
    */
  private def coActivityEdges(s: SparkSession, dir: String): DataFrame = {
    val wSlot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h"), col("event_type"))
    val sl = Engine
      .table(s, dir, "events")
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .distinct()
      .withColumn("slot_n", count(lit(1)).over(wSlot))
      .filter(col("slot_n") <= 200)
      .drop("slot_n")
    sl
      .select(col("user_id").as("u"), col("h"), col("event_type"))
      .join(
        sl.select(col("user_id").as("v"), col("h"), col("event_type")),
        Seq("h", "event_type")
      )
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 3)
      .select(col("u"), col("v"))
      .localCheckpoint(eager = false)
  }

  /** DuckDB CTE chain producing the same `el(u, v)` edge list. */
  private val coActivitySql: String =
    """sl0 AS (
         SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type
         FROM events),
       sl AS (
         SELECT * FROM sl0
         QUALIFY count(*) OVER (PARTITION BY h, event_type) <= 200),
       pe AS (
         SELECT a.user_id AS u, b.user_id AS v, count(*) AS c
         FROM sl a JOIN sl b
           ON a.h = b.h AND a.event_type = b.event_type AND a.user_id < b.user_id
         GROUP BY 1, 2),
       el AS (SELECT u, v FROM pe WHERE c >= 3)"""

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
    ),
    // --------------------------------------------------------------- q143
    // Triangle counting with DEGREE ORIENTATION — the 100 TB triangle
    // algorithm (each undirected edge is directed from its lower-degree
    // endpoint, id tiebreak; wedges then fan out from low-degree pivots
    // only, bounding per-node wedge work by O(sqrt(m)) instead of
    // O(max_degree^2) — the difference between a celebrity node
    // generating 10^12 wedges and 10^5). Graph: users co-active in >= 3
    // distinct (hour, event_type) slots. Every triangle has exactly one
    // source-of-two-out-edges in the orientation's total order, so each
    // is found once; the oracle enumerates the same triangles the naive
    // id-ordered way — pinning that orientation loses/creates nothing.
    QueryDef(
      "q143_triangles",
      (s, dir) => {
        // co-activity edges incl. the hot-slot cap — see coActivityEdges
        val el = coActivityEdges(s, dir)
        val deg = el
          .select(col("u").as("id"))
          .union(el.select(col("v").as("id")))
          .groupBy(col("id"))
          .agg(count(lit(1)).as("d"))
        // orient each edge low-order -> high-order in the (degree, id)
        // total order; carry the dst's order key for wedge enumeration
        val de = el
          .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
          .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
          .select(
            when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
              struct(col("u").as("src"), col("v").as("dst"), col("dv").as("dd")))
              .otherwise(struct(col("v").as("src"), col("u").as("dst"), col("du").as("dd")))
              .as("e")
          )
          .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.dd").as("dd"))
          .localCheckpoint(eager = false)
        val wedges = de
          .select(col("src"), col("dst").as("b"), col("dd").as("db"))
          .join(de.select(col("src"), col("dst").as("c"), col("dd").as("dc")), "src")
          .filter(col("db") < col("dc") || (col("db") === col("dc") && col("b") < col("c")))
        val tris = wedges
          .join(
            de.select(col("dst").as("c"), col("src").as("b")),
            Seq("b", "c"),
            "left_semi"
          )
          .select(col("src").as("a"), col("b"), col("c"))
        tris
          .select(explode(array(col("a"), col("b"), col("c"))).as("user_id"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_triangles"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH $coActivitySql,
             tri AS (
               SELECT e1.u AS a, e1.v AS b, e2.v AS c
               FROM el e1 JOIN el e2 ON e1.v = e2.u
               JOIN el e3 ON e3.u = e1.u AND e3.v = e2.v),
             m AS (SELECT a AS user_id FROM tri
                   UNION ALL SELECT b FROM tri
                   UNION ALL SELECT c FROM tri)
             SELECT user_id, count(*) AS n_triangles
             FROM m GROUP BY user_id ORDER BY user_id""")
    ),
    // --------------------------------------------------------------- q152
    // Synchronous label propagation (3 rounds) over the co-activity
    // graph — the cheap community detector for corpus-level grouping
    // (domain clusters, sockpuppet rings) where connected components
    // (q58/q134) are too coarse: LPA splits a bridge-connected blob
    // into its dense cores. Deterministic: every node starts as its own
    // label; each round takes the most frequent neighbor label, ties to
    // the SMALLEST label; fixed 3 rounds (no convergence race — sync
    // rounds are reproducible, async is not). Scale shape: per round
    // ONE shuffle join (edges x labels on the neighbor id) + two
    // hash-aggs; the label table stays (id, lab) narrow, the argmax is
    // min(struct(-count, label)) — no window, no sort. The oracle
    // unrolls the same 3 rounds as CTEs with the identical tiebreak.
    QueryDef(
      "q152_label_prop",
      (s, dir) => {
        val el = coActivityEdges(s, dir)
        val e2 = el
          .select(col("u").as("a"), col("v").as("b"))
          .union(el.select(col("v").as("a"), col("u").as("b")))
          .localCheckpoint(eager = false)
        var lab = e2.select(col("a").as("id")).distinct().withColumn("lab", col("id"))
        for (_ <- 1 to 3) {
          lab = e2
            .join(lab.select(col("id").as("b"), col("lab")), "b")
            .groupBy(col("a"), col("lab"))
            .agg(count(lit(1)).as("c"))
            .groupBy(col("a").as("id"))
            .agg(min(struct((col("c") * -1).as("nc"), col("lab").as("lab"))).as("bst"))
            .select(col("id"), col("bst.lab").as("lab"))
            .localCheckpoint(eager = false)
        }
        lab
          .select(col("id").as("user_id"), col("lab").as("community"))
          .orderBy(col("user_id"))
      },
      Some {
        val rounds = (1 to 3).map { i =>
          s"""c$i AS (SELECT e2.a AS id, l.lab, count(*) AS c
                FROM e2 JOIN l${i - 1} l ON e2.b = l.id GROUP BY 1, 2),
              l$i AS (SELECT id, lab FROM c$i
                QUALIFY row_number() OVER (PARTITION BY id ORDER BY c DESC, lab) = 1)"""
        }
        s"""WITH $coActivitySql,
           e2 AS (SELECT u AS a, v AS b FROM el UNION ALL SELECT v, u FROM el),
           l0 AS (SELECT DISTINCT a AS id, a AS lab FROM e2),
           ${rounds.mkString(",\n")}
           SELECT id AS user_id, lab AS community FROM l3 ORDER BY user_id"""
      }
    ),
    // --------------------------------------------------------------- q183
    // Random-walk sampling — the DeepWalk/node2vec positive-pair
    // generator for graph-embedding training data: from every customer
    // APPEARING IN ORDERS (order-less customers have no edges and no
    // walk — the frontier is exactly the graph's customer-side nodes),
    // a 3-step walk over the customer-supplier graph, each step chosen
    // DETERMINISTICALLY as the neighbor minimizing a walker-keyed hash
    // (md5 of start|step|neighbor), so the "random" walk is exactly
    // reproducible and the oracle unrolls the same steps in SQL. Two
    // scale guards: (1) the adjacency is hash-rank-bounded to <= 32
    // neighbors per node via the bounded MinKByKey AGGREGATE (real walk
    // engines cap or alias-sample hub adjacency; unbounded, one
    // celebrity node would fan every co-walker join out by its full
    // degree — and a per-src row_number window, the round-8 form, would
    // sort that celebrity's full adjacency in ONE task; the aggregate's
    // map-side partial combine bounds every task at 32 pairs per
    // node), and (2) each step is ONE
    // hash join frontier x adj + ONE min-struct aggregate — per-round
    // cost O(frontier x <= 32), the Pregel economics of q101, with the
    // frontier never growing (one row per walker). Output: the walk
    // table (start, step, node), the corpus skip-gram pairs derive
    // from by a self-join on start.
    QueryDef(
      "q183_random_walks",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val adj = edges(s, dir)
          .select(
            col("src").cast("long"),
            md5(concat(
              lit("n|"), col("src").cast("string"), lit("|"), col("dst").cast("string")))
              .as("h"),
            col("dst").cast("long"))
          .as[(Long, String, Long)]
          .groupByKey(_._1)
          .agg(new graft.functions.MinKByKey(32).toColumn.name("nbrs"))
          .toDF("src", "nbrs")
          .select(col("src"), explode(col("nbrs")).as("p"))
          .select(col("src"), col("p._2").as("dst"))
          .localCheckpoint(eager = false) // consumed once per step
        var cur = Engine
          .table(s, dir, "orders")
          .select(col("o_custkey").as("start"))
          .distinct()
          .withColumn("node", col("start"))
        val steps = scala.collection.mutable.ArrayBuffer(
          cur.select(col("start"), lit(0L).as("step"), col("node")))
        for (t <- 1 to 3) {
          cur = cur
            .join(adj, cur("node") === adj("src"))
            .select(
              col("start"),
              col("dst"),
              md5(concat(
                lit("w|"), col("start").cast("string"), lit(s"|$t|"), col("dst").cast("string")))
                .as("h"))
            .groupBy(col("start"))
            .agg(min(struct(col("h"), col("dst"))).as("m"))
            .select(col("start"), col("m.dst").as("node"))
          steps += cur.select(col("start"), lit(t.toLong).as("step"), col("node"))
        }
        steps.reduce(_ unionAll _).orderBy(col("start"), col("step"))
      },
      Some {
        val stepCtes = (1 to 3).map { t =>
          s"""w$t AS (SELECT start, dst AS node FROM w${t - 1} w JOIN adj ON w.node = adj.src
                QUALIFY row_number() OVER (PARTITION BY start
                  ORDER BY md5('w|' || CAST(start AS VARCHAR) || '|$t|' || CAST(dst AS VARCHAR)),
                           dst) = 1)"""
        }
        val unions = (0 to 3)
          .map(t => s"SELECT start, CAST($t AS BIGINT) AS step, node FROM w$t")
          .mkString("\n           UNION ALL ")
        s"""WITH e0 AS (
             SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS sp
             FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
           e AS (SELECT c AS src, sp AS dst FROM e0 UNION ALL SELECT sp, c FROM e0),
           adj AS (SELECT src, dst FROM e
             QUALIFY row_number() OVER (PARTITION BY src
               ORDER BY md5('n|' || CAST(src AS VARCHAR) || '|' || CAST(dst AS VARCHAR)),
                        dst) <= 32),
           w0 AS (SELECT DISTINCT o_custkey AS start, o_custkey AS node FROM orders),
           ${stepCtes.mkString(",\n           ")}
           $unions
           ORDER BY start, step"""
      }
    )
  )
}
