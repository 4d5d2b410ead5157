package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator library over the TPC-H-ish star schema.
  *
  * The reference engine's only relational surface is partitioned
  * flatMap -> sort -> group-by-key -> per-group flatMap
  * (`/root/reference/mapreduce/manager/__main__.py:199-251`); this module
  * is the declarative superset a user would expect from an analytics
  * engine: scans with pushdown, filter/project, all join shapes,
  * aggregation (incl. rollup/cube), windows, top-k, set ops.
  *
  * Scale notes (100 TB): every query here is a pure Catalyst plan —
  * filters/projections push into the parquet scan, small dimension joins
  * are broadcast explicitly, large joins shuffle on their keys and AQE
  * handles skew/coalescing. No driver-side loops, no collect().
  */
object Relational {

  private def ts(lit0: String): Column = to_timestamp(lit(lit0))

  /** revenue expression used by several queries */
  private def revExpr: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val entries: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- q01
    // TPC-H Q1 shape: scan -> filter -> hash-agg (partial + final).
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        Engine
          .table(s, dir, "lineitem")
          .filter(col("l_shipdate") <= ts("1998-09-01"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(revExpr), 2).as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order")
          )
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_discount), 4) AS avg_disc,
             count(*) AS count_order
             FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus""")
    ),
    // ---------------------------------------------------------------- q02
    // Filter + project: predicates and column pruning reach the scan.
    QueryDef(
      "q02_filter_project",
      (s, dir) => {
        Engine
          .table(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
              col("l_discount") >= 0.02 && col("l_discount") <= 0.06 && col("l_quantity") < 24
          )
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            col("l_quantity"),
            col("l_extendedprice"),
            round(col("l_extendedprice") * col("l_discount"), 4).as("disc_revenue")
          )
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             round(l_extendedprice * l_discount, 4) AS disc_revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
               AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24
             ORDER BY l_orderkey, l_linenumber""")
    ),
    // ---------------------------------------------------------------- q03
    // TPC-H Q3 shape: selective dim filter -> two shuffled joins -> agg -> top-k.
    QueryDef(
      "q03_shipping_priority",
      (s, dir) => {
        val cust = Engine.table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = Engine.table(s, dir, "orders")
        val li = Engine.table(s, dir, "lineitem")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(round(sum(revExpr), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_orderdate, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
             JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             WHERE c.c_mktsegment = 'BUILDING'
             GROUP BY o_orderkey, o_orderdate
             ORDER BY revenue DESC, o_orderkey LIMIT 10""")
    ),
    // ---------------------------------------------------------------- q04
    // Broadcast hash join with a small dimension (part) — no shuffle of
    // the big fact side beyond the final aggregation.
    QueryDef(
      "q04_brand_volume",
      (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        val part = Engine.table(s, dir, "part")
        li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             GROUP BY p_brand ORDER BY p_brand""")
    ),
    // ---------------------------------------------------------------- q05
    // TPC-H Q5 shape: 6-way join; dims broadcast, facts shuffle once.
    QueryDef(
      "q05_local_supplier_volume",
      (s, dir) => {
        val region = Engine.table(s, dir, "region").filter(col("r_name") === "ASIA")
        val nation = Engine.table(s, dir, "nation")
        val cust = Engine.table(s, dir, "customer")
        val ord = Engine
          .table(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
        val li = Engine.table(s, dir, "lineitem")
        val supp = Engine.table(s, dir, "supplier")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey") && supp("s_nationkey") === cust("c_nationkey"))
          .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(revExpr), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
             JOIN customer c ON c.c_nationkey = n.n_nationkey
             JOIN orders o ON o.o_custkey = c.c_custkey
             JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
             WHERE r.r_name = 'ASIA'
               AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
             GROUP BY n_name ORDER BY revenue DESC, n_name""")
    ),
    // ---------------------------------------------------------------- q06
    // Left-semi join (EXISTS).
    QueryDef(
      "q06_semi_join",
      (s, dir) => {
        val cust = Engine.table(s, dir, "customer")
        val ord = Engine
          .table(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1998-01-01"))
        cust
          .join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
               AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01')
             ORDER BY c_custkey""")
    ),
    // ---------------------------------------------------------------- q07
    // Left-anti join (NOT EXISTS).
    QueryDef(
      "q07_anti_join",
      (s, dir) => {
        val cust = Engine.table(s, dir, "customer")
        val ord = Engine.table(s, dir, "orders").filter(col("o_orderdate") < ts("1995-04-01"))
        cust
          .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
               AND o.o_orderdate < TIMESTAMP '1995-04-01')
             ORDER BY c_custkey""")
    ),
    // ---------------------------------------------------------------- q08
    // TPC-H Q13 shape: outer join + two-level aggregation.
    QueryDef(
      "q08_cust_order_distribution",
      (s, dir) => {
        val cust = Engine.table(s, dir, "customer")
        val ord = Engine.table(s, dir, "orders")
        cust
          .join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
               SELECT c.c_custkey, count(o.o_orderkey) AS c_count
               FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
               GROUP BY c.c_custkey) t
             GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")
    ),
    // ---------------------------------------------------------------- q09
    // Window: top-N per group via row_number.
    QueryDef(
      "q09_topn_per_customer",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Engine
          .table(s, dir, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
               SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders) t
             WHERE rn <= 3 ORDER BY o_custkey, rn""")
    ),
    // ---------------------------------------------------------------- q10
    // Window: running sum over an explicit ROWS frame.
    QueryDef(
      "q10_running_qty",
      (s, dir) => {
        val w = Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Engine
          .table(s, dir, "lineitem")
          .filter(col("l_suppkey") <= 5)
          .select(
            col("l_suppkey"),
            col("l_orderkey"),
            col("l_linenumber"),
            round(sum(col("l_quantity")).over(w), 2).as("running_qty")
          )
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             round(sum(l_quantity) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
             FROM lineitem WHERE l_suppkey <= 5
             ORDER BY l_suppkey, l_orderkey, l_linenumber""")
    ),
    // ---------------------------------------------------------------- q11
    // Global top-k: Spark plans TakeOrderedAndProject (no full sort).
    QueryDef(
      "q11_topk_orders",
      (s, dir) =>
        Engine
          .table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")
    ),
    // ---------------------------------------------------------------- q12
    QueryDef(
      "q12_distinct",
      (s, dir) =>
        Engine
          .table(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             ORDER BY l_returnflag, l_linestatus""")
    ),
    // ---------------------------------------------------------------- q13
    // Set op: EXCEPT (nations with customers but no suppliers).
    QueryDef(
      "q13_except",
      (s, dir) => {
        val c = Engine.table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val su = Engine.table(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.except(su).orderBy(col("nationkey"))
      },
      Some("""SELECT nationkey FROM (
               SELECT c_nationkey AS nationkey FROM customer
               EXCEPT SELECT s_nationkey AS nationkey FROM supplier) t
             ORDER BY nationkey""")
    ),
    // ---------------------------------------------------------------- q14
    QueryDef(
      "q14_intersect",
      (s, dir) => {
        val c = Engine.table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val su = Engine.table(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.intersect(su).orderBy(col("nationkey"))
      },
      Some("""SELECT nationkey FROM (
               SELECT c_nationkey AS nationkey FROM customer
               INTERSECT SELECT s_nationkey AS nationkey FROM supplier) t
             ORDER BY nationkey""")
    ),
    // ---------------------------------------------------------------- q15
    QueryDef(
      "q15_union",
      (s, dir) => {
        val c = Engine.table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val su = Engine.table(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.union(su).distinct().orderBy(col("nationkey"))
      },
      Some("""SELECT nationkey FROM (
               SELECT c_nationkey AS nationkey FROM customer
               UNION SELECT s_nationkey AS nationkey FROM supplier) t
             ORDER BY nationkey""")
    ),
    // ---------------------------------------------------------------- q16
    // ROLLUP with nulls coalesced so both engines agree on ordering.
    QueryDef(
      "q16_rollup",
      (s, dir) =>
        Engine
          .table(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("sum_qty"),
            col("n")
          )
          .orderBy(col("rf"), col("ls")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
             round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
             FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             ORDER BY rf, ls""")
    ),
    // ---------------------------------------------------------------- q17
    QueryDef(
      "q17_cube",
      (s, dir) =>
        Engine
          .table(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n")
          )
          .orderBy(col("rf"), col("ls")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n
             FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             ORDER BY rf, ls""")
    ),
    // ---------------------------------------------------------------- q18
    // Conditional aggregation (CASE inside agg).
    QueryDef(
      "q18_conditional_agg",
      (s, dir) =>
        Engine
          .table(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).cast("long").as("n_big"),
            round(avg(when(col("o_orderstatus") === "F", col("o_totalprice"))), 4).as("avg_f_price")
          )
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
             round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS avg_f_price
             FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    ),
    // ---------------------------------------------------------------- q19
    // Scalar string function library.
    QueryDef(
      "q19_string_funcs",
      (s, dir) =>
        Engine
          .table(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_name"), 1, 10).as("name10"),
            length(col("p_name")).cast("long").as("name_len"),
            concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_name"), " ", "_").as("name_snake")
          )
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 10) AS name10,
             CAST(length(p_name) AS BIGINT) AS name_len,
             concat(p_brand, '#', p_type) AS brand_type,
             regexp_replace(p_name, ' ', '_', 'g') AS name_snake
             FROM part ORDER BY p_partkey""")
    ),
    // ---------------------------------------------------------------- q20
    // Date/time functions + group by derived keys.
    QueryDef(
      "q20_orders_by_month",
      (s, dir) =>
        Engine
          .table(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo")
          )
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("yr"), col("mo")),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
             FROM orders GROUP BY 1, 2 ORDER BY yr, mo""")
    ),
    // ---------------------------------------------------------------- q21
    QueryDef(
      "q21_having",
      (s, dir) =>
        Engine
          .table(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 5)
          .orderBy(col("l_partkey")),
      Some("""SELECT l_partkey, count(*) AS n FROM lineitem
             GROUP BY l_partkey HAVING count(*) >= 5 ORDER BY l_partkey""")
    ),
    // ---------------------------------------------------------------- q22
    // Global scalar aggregates incl. distinct count.
    QueryDef(
      "q22_scalar_agg",
      (s, dir) =>
        Engine
          .table(s, dir, "lineitem")
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            round(min(col("l_extendedprice")), 2).as("min_price"),
            round(max(col("l_extendedprice")), 2).as("max_price"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(sum(col("l_quantity")), 2).as("sum_qty")
          ),
      Some("""SELECT count(*) AS n_rows, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
             round(min(l_extendedprice), 2) AS min_price, round(max(l_extendedprice), 2) AS max_price,
             round(avg(l_extendedprice), 4) AS avg_price, round(sum(l_quantity), 2) AS sum_qty
             FROM lineitem""")
    ),
    // ---------------------------------------------------------------- q23
    // IN-subquery (planned as a semi join).
    QueryDef(
      "q23_in_subquery",
      (s, dir) => {
        val rich = Engine.table(s, dir, "customer").filter(col("c_acctbal") > 9000).select(col("c_custkey"))
        val ord = Engine.table(s, dir, "orders")
        ord
          .join(rich, ord("o_custkey") === rich("c_custkey"), "left_semi")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
             ORDER BY o_orderkey""")
    ),
    // ---------------------------------------------------------------- q24
    // Salted two-phase aggregation — the skew-mitigation pattern for hot
    // grouping keys at scale: phase 1 aggregates (key, salt) spreading a
    // hot key over 16 reducers, phase 2 merges the partials. The result
    // is identical to the plain group-by the oracle expresses; the point
    // is the plan shape (both shuffles are small and balanced).
    QueryDef(
      "q24_salted_agg",
      (s, dir) => {
        val partials = Engine
          .table(s, dir, "lineitem")
          .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(col("l_quantity")).as("partial_qty"), count(lit(1)).as("partial_n"))
        partials
          .groupBy(col("l_returnflag"))
          .agg(
            round(sum(col("partial_qty")), 2).as("sum_qty"),
            sum(col("partial_n")).cast("long").as("n")
          )
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),
    // ---------------------------------------------------------------- q25
    // Deterministic stratified sampling: every 10th row per stratum in a
    // stable position order — reproducible train/eval splits without RNG
    // (rerunning the pipeline yields the identical sample).
    QueryDef(
      "q25_stratified_sample",
      (s, dir) => {
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
        // ordering by every output column makes residual ties
        // output-identical regardless of which tied row is sampled.
        val w = Window
          .partitionBy(col("l_returnflag"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        Engine
          .table(s, dir, "lineitem")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") % 10 === 1)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
          .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM (
               SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag
                   ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS rn
               FROM lineitem) t
             WHERE rn % 10 = 1
             ORDER BY l_returnflag, l_orderkey, l_linenumber, l_quantity, l_extendedprice""")
    ),
    // ---------------------------------------------------------------- q26
    // GROUPING SETS — the general form of rollup/cube (q16/q17): three
    // explicit sets in one pass; grouping_id() disambiguates which NULLs
    // are aggregation-induced. One shuffle, same as a plain group-by.
    QueryDef(
      "q26_grouping_sets",
      (s, dir) =>
        Engine
          .table(s, dir, "lineitem")
          .groupingSets(
            Seq(
              Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")),
              Seq()
            ),
            col("l_returnflag"),
            col("l_linestatus")
          )
          .agg(
            grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 2).as("sum_qty")
          )
          .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             FROM lineitem
             GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             ORDER BY gid, l_returnflag, l_linestatus""")
    ),
    // ---------------------------------------------------------------- q27
    // RANGE-frame window: per-customer trailing-90-day spend. The frame
    // is over epoch days (identical integer semantics in both engines;
    // same-day orders are peers and always aggregate together).
    QueryDef(
      "q27_window_range",
      (s, dir) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("d"))
          .rangeBetween(-90, Window.currentRow)
        Engine
          .table(s, dir, "orders")
          .withColumn("d", unix_date(col("o_orderdate").cast("date")).cast("long"))
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            round(sum(col("o_totalprice")).over(w), 2).as("spend_90d")
          )
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, round(spend_90d, 2) AS spend_90d FROM (
               SELECT o_orderkey, o_custkey,
                 sum(o_totalprice) OVER (PARTITION BY o_custkey
                   ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS spend_90d
               FROM orders) t ORDER BY o_orderkey""")
    ),
    // ---------------------------------------------------------------- q28
    // lag/lead/ntile/percent_rank — the navigation-function family over
    // one per-customer sort (all four share the window's single shuffle).
    QueryDef(
      "q28_lag_lead",
      (s, dir) => {
        val wd = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        val wp = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
        Engine
          .table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            datediff(col("o_orderdate").cast("date"), lag(col("o_orderdate"), 1).over(wd).cast("date"))
              .cast("long")
              .as("gap_days"),
            lead(col("o_orderkey"), 1).over(wd).as("next_key"),
            ntile(4).over(wp).cast("long").as("price_quartile"),
            round(percent_rank().over(wp), 6).as("price_pr")
          )
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
               CAST(date_diff('day',
                 CAST(lag(o_orderdate, 1) OVER wd AS DATE),
                 CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days,
               lead(o_orderkey, 1) OVER wd AS next_key,
               CAST(ntile(4) OVER wp AS BIGINT) AS price_quartile,
               round(percent_rank() OVER wp, 6) AS price_pr
             FROM orders
             WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                    wp AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
             ORDER BY o_orderkey""")
    ),
    // ---------------------------------------------------------------- q29
    // Statistical aggregates: corr/covar/stddev/variance per group —
    // single-pass combinable moments (exact partial aggregation at scale).
    QueryDef(
      "q29_corr_stats",
      (s, dir) =>
        Engine
          .table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
            round(stddev_samp(col("l_discount")), 4).as("sd_discount"),
            round(var_pop(col("l_tax")), 4).as("var_tax")
          )
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
               round(stddev_samp(l_discount), 4) AS sd_discount,
               round(var_pop(l_tax), 4) AS var_tax
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),
    // ---------------------------------------------------------------- q77
    // Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL keep
    // duplicate counts, unlike q13/q14's set forms. Planned as
    // count-based generate/replicate, one shuffle each.
    QueryDef(
      "q77_multiset_ops",
      (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        val a = li.filter(col("l_quantity") < 10).select(col("l_returnflag"))
        val b = li.filter(col("l_discount") > 0.05).select(col("l_returnflag"))
        val ea = a.exceptAll(b).groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_except"))
        val ia = a.intersectAll(b).groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_intersect"))
        ea.join(ia, Seq("l_returnflag"), "full_outer")
          .select(
            col("l_returnflag"),
            coalesce(col("n_except"), lit(0L)).as("n_except"),
            coalesce(col("n_intersect"), lit(0L)).as("n_intersect")
          )
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH a AS (SELECT l_returnflag FROM lineitem WHERE l_quantity < 10),
             b AS (SELECT l_returnflag FROM lineitem WHERE l_discount > 0.05),
             e AS (SELECT l_returnflag, count(*) AS n_except
                   FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1),
             i AS (SELECT l_returnflag, count(*) AS n_intersect
                   FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1)
             SELECT coalesce(e.l_returnflag, i.l_returnflag) AS l_returnflag,
               coalesce(n_except, 0) AS n_except, coalesce(n_intersect, 0) AS n_intersect
             FROM e FULL OUTER JOIN i ON e.l_returnflag = i.l_returnflag
             ORDER BY l_returnflag""")
    ),
    // ---------------------------------------------------------------- q78
    // UNPIVOT/melt: wide measure columns to long form — the shape
    // transformation feeding generic per-metric pipelines. A narrow 1->3
    // row explode, no shuffle until the aggregate.
    QueryDef(
      "q78_unpivot",
      (s, dir) =>
        Engine
          .table(s, dir, "lineitem")
          .unpivot(
            Array(col("l_returnflag")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "measure",
            "v"
          )
          .groupBy(col("l_returnflag"), col("measure"))
          .agg(round(sum(col("v")), 2).as("total"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"), col("measure")),
      Some("""SELECT l_returnflag, measure, round(sum(v), 2) AS total, count(*) AS n FROM (
               SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS v FROM lineitem
               UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
               UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem) t
             GROUP BY l_returnflag, measure ORDER BY l_returnflag, measure""")
    ),
    // ---------------------------------------------------------------- q79
    // Time-series gap filling: per-user hourly spine via sequence() +
    // explode, left join of observed counts, zero-fill — the dense-grid
    // preparation step for downstream models. The spine generation is a
    // narrow map off a tiny aggregate; the join shuffles on (user, hour).
    QueryDef(
      "q79_gap_fill",
      (s, dir) => {
        val e = Engine
          .table(s, dir, "events")
          .filter(col("user_id") < 30)
          .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
        val spine = e
          .groupBy(col("user_id"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(col("user_id"), explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        val counts = e
          .groupBy(col("user_id"), col("h"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        spine
          .join(counts, Seq("user_id", "h"), "left")
          .select(
            col("user_id"),
            col("h").as("hour"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("sum_value"), lit(0.0)).as("sum_value")
          )
          .orderBy(col("user_id"), col("hour"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, value
               FROM events WHERE user_id < 30),
             spans AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY user_id),
             spine AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
               FROM spans),
             c AS (SELECT user_id, h, count(*) AS n, round(sum(value), 2) AS sum_value
               FROM e GROUP BY user_id, h)
             SELECT spine.user_id, spine.h AS hour,
               coalesce(c.n, 0) AS n, coalesce(c.sum_value, 0.0) AS sum_value
             FROM spine LEFT JOIN c ON spine.user_id = c.user_id AND spine.h = c.h
             ORDER BY spine.user_id, hour""")
    ),
    // ---------------------------------------------------------------- q97
    // The SQL entry point: tables registered as temp views, the query
    // expressed entirely in ANSI SQL through spark.sql — same Catalyst
    // plan as the DataFrame form, proving the engine's SQL surface. The
    // statement itself exercises CTEs, a join, a window and HAVING.
    QueryDef(
      "q97_sql_surface",
      (s, dir) => {
        Engine.table(s, dir, "orders").createOrReplaceTempView("orders_v")
        Engine.table(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql("""
          WITH spend AS (
            SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
            FROM orders_v GROUP BY o_custkey HAVING count(*) >= 3
          ),
          ranked AS (
            SELECT c.c_mktsegment, s.o_custkey AS custkey, s.n_orders, s.total,
                   CAST(row_number() OVER (PARTITION BY c.c_mktsegment
                     ORDER BY s.total DESC, s.o_custkey) AS BIGINT) AS rk
            FROM spend s JOIN customer_v c ON s.o_custkey = c.c_custkey
          )
          SELECT c_mktsegment, custkey, n_orders, total, rk FROM ranked
          WHERE rk <= 5
          ORDER BY c_mktsegment, rk
        """)
      },
      Some("""WITH spend AS (
               SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
               FROM orders GROUP BY o_custkey HAVING count(*) >= 3),
             r AS (
               SELECT c.c_mktsegment, s.o_custkey AS custkey, s.n_orders, s.total,
                 CAST(row_number() OVER (PARTITION BY c.c_mktsegment
                   ORDER BY s.total DESC, s.o_custkey) AS BIGINT) AS rk
               FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey)
             SELECT c_mktsegment, custkey, n_orders, total, rk FROM r
             WHERE rk <= 5 ORDER BY c_mktsegment, rk""")
    ),
    // --------------------------------------------------------------- q122
    // The custom Catalyst expressions through the SQL front door: a pure
    // spark.sql query calling graft_nfc and graft_dot as SQL functions
    // (registered by GraftExtensions — this query gate-proves the
    // SessionExtensions path, not just the Column API). The appended
    // decomposed "cafe" + combining-acute composes under NFC; the dot
    // product runs the codegen'd loop; both mirror exactly in DuckDB
    // (nfc_normalize; sequential list_zip sum).
    QueryDef(
      "q122_sql_native_funcs",
      (s, dir) => {
        Engine.table(s, dir, "documents").createOrReplaceTempView("documents_v")
        Engine.table(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
        val comb = "\u0301" // combining acute, kept as an escape so no
        // editor/linter can silently NFC-normalize the source literal
        // note: the graft_dot(e, e) self-dot is collapsed to
        // graft_norm2 by the RewriteSelfDot optimizer rule — this gate
        // row therefore verifies the REWRITTEN plan's values too
        s.sql(s"""
          SELECT d.doc_id,
            md5(graft_nfc(d.text || ' cafe$comb')) AS nfc_md5,
            round(graft_dot(CAST(e.embedding AS ARRAY<DOUBLE>),
                            CAST(e.embedding AS ARRAY<DOUBLE>)), 6) AS norm2,
            round(graft_norm2(CAST(e.embedding AS ARRAY<DOUBLE>)), 6) AS norm2_native
          FROM documents_v d JOIN embeddings_v e ON d.doc_id = e.vec_id
          ORDER BY d.doc_id
        """)
      },
      Some(s"""SELECT d.doc_id,
               md5(nfc_normalize(d.text || ' cafe' || chr(769))) AS nfc_md5,
               round(list_sum(list_transform(
                 list_zip(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                          list_transform(e.embedding, x -> CAST(x AS DOUBLE))),
                 x -> x[1] * x[2])), 6) AS norm2,
               round(list_sum(list_transform(
                 list_zip(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                          list_transform(e.embedding, x -> CAST(x AS DOUBLE))),
                 x -> x[1] * x[2])), 6) AS norm2_native
             FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
             ORDER BY d.doc_id""")
    ),
    // ---------------------------------------------------------------- q66
    // Band (non-equi range) join: bucket customers into balance tiers via
    // lo <= bal < hi against a tiny inline dimension. Broadcast makes the
    // non-equi join a per-row scan of 3 tiers — the right plan at any
    // scale (never a cartesian shuffle).
    QueryDef(
      "q66_band_join",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val tiers = Seq(
          ("low", -1e9, 0.0),
          ("mid", 0.0, 5000.0),
          ("high", 5000.0, 1e9)
        ).toDF("tier", "lo", "hi")
        Engine
          .table(s, dir, "customer")
          .join(broadcast(tiers), col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_bal"))
          .orderBy(col("tier"))
      },
      Some("""SELECT tier, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
             FROM (VALUES ('low', -1e9, 0.0), ('mid', 0.0, 5000.0), ('high', 5000.0, 1e9))
               AS t(tier, lo, hi)
             JOIN customer ON c_acctbal >= lo AND c_acctbal < hi
             GROUP BY tier ORDER BY tier""")
    ),
    // --------------------------------------------------------------- q146
    // Fine-grained price banding through the NATIVE interval-stab join
    // (plans/IntervalStabJoin.scala — the whole-operator Catalyst
    // extension tier: custom SparkStrategy + SparkPlan injected via
    // GraftExtensions). 1000 contiguous [k*600, (k+1)*600) bands: with
    // no equality key Spark's builtin planner can only produce
    // BroadcastNestedLoopJoin, re-evaluating 1000 range predicates per
    // order; the stab operator broadcasts the bands as a sorted index
    // and answers each order in O(log 1000 + 1). Same declarative
    // DataFrame code — the strategy rewrite is invisible to the caller,
    // which is the point of doing it in the planner. Both engines drop
    // orders outside [0, 600000) identically (inner join).
    QueryDef(
      "q146_price_bands",
      (s, dir) => {
        val bands = s
          .range(1000)
          .select(
            col("id").as("band"),
            (col("id") * 600.0).as("lo"),
            ((col("id") + 1) * 600.0).as("hi")
          )
        Engine
          .table(s, dir, "orders")
          .join(bands, col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("total_cents")
          )
          .orderBy(col("band"))
      },
      Some("""WITH b AS (
               SELECT range AS band, range * 600.0 AS lo, (range + 1) * 600.0 AS hi
               FROM range(0, 1000))
             SELECT band, count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
             FROM orders JOIN b ON o_totalprice >= lo AND o_totalprice < hi
             GROUP BY band ORDER BY band""")
    ),
    // ---------------------------------------------------------------- q67
    // Correlated EXISTS with a non-equi correlated predicate — planned as
    // a left-semi join with the extra condition in the join clause.
    QueryDef(
      "q67_exists_correlated",
      (s, dir) => {
        val c = Engine.table(s, dir, "customer")
        val o = Engine
          .table(s, dir, "orders")
          .filter(col("o_orderpriority").startsWith("1"))
        c.join(
          o,
          col("c_custkey") === col("o_custkey") && col("o_totalprice") > col("c_acctbal") * 2,
          "left_semi"
        ).select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             WHERE EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_totalprice > c.c_acctbal * 2
                 AND o.o_orderpriority LIKE '1%')
             ORDER BY c_custkey""")
    ),
    // ---------------------------------------------------------------- q68
    // Collect-set aggregation: the distinct market segments per nation as
    // a sorted joined string (sorted so the value is deterministic; string
    // so both engines hash identical scalars). Nation is broadcast.
    QueryDef(
      "q68_segment_sets",
      (s, dir) => {
        val c = Engine.table(s, dir, "customer")
        val n = Engine.table(s, dir, "nation")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
            count(lit(1)).as("n_customers")
          )
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
               count(*) AS n_customers
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name ORDER BY n_name""")
    ),
    // --------------------------------------------------------------- q114
    // Interval-overlap join via bin explode: shipments get a
    // deterministic transit interval [shipdate, shipdate + 1..20 days];
    // "which shipments are in transit during calendar week W" is an
    // overlap join, which naively is non-equi (quadratic / broadcast
    // nested loop). The scale shape: explode each interval into the
    // week bins it touches (bounded fan-out: transit/7 + 1 rows) and the
    // non-equi join becomes a plain hash aggregation on the bin key.
    // The oracle runs the naive inequality join against a generated week
    // spine — same result, different plan class.
    QueryDef(
      "q114_interval_overlap",
      (s, dir) =>
        Engine
          .table(s, dir, "lineitem")
          .select(
            col("l_quantity"),
            datediff(col("l_shipdate"), lit("1970-01-01").cast("date")).cast("long").as("sd"),
            (lit(1) + (col("l_orderkey") + col("l_linenumber")) % 20).cast("long").as("transit")
          )
          .select(
            col("l_quantity"),
            explode(expr("sequence(sd div 7, (sd + transit) div 7)")).as("week")
          )
          .groupBy(col("week"))
          .agg(count(lit(1)).as("n_in_transit"), round(sum(col("l_quantity")), 2).as("qty"))
          .orderBy(col("week")),
      Some("""WITH li2 AS (
               SELECT l_quantity,
                 CAST(date_diff('day', TIMESTAMP '1970-01-01', l_shipdate) AS BIGINT) AS sd,
                 CAST(1 + (l_orderkey + l_linenumber) % 20 AS BIGINT) AS transit
               FROM lineitem),
             w AS (SELECT unnest(generate_series(
                     (SELECT min(sd // 7) FROM li2),
                     (SELECT max((sd + transit) // 7) FROM li2))) AS week)
             SELECT week, count(*) AS n_in_transit, round(sum(l_quantity), 2) AS qty
             FROM w JOIN li2 ON li2.sd <= week * 7 + 6 AND li2.sd + transit >= week * 7
             GROUP BY week ORDER BY week""")
    )
  )
}
