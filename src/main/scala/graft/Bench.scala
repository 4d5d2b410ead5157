package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Methodology: a warmup pass first touches every table (parquet footers,
  * filesystem cache); then each query runs twice — an untimed run that
  * pays plan analysis + whole-stage-codegen compilation (a fixed ~1-3 s
  * cost that is irrelevant at scale), and a timed run measuring
  * steady-state operator throughput around a full materialization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the canonical engine session (extensions registered, AQE, task
    // retry, UTC, nanos handling) — benchmarks must measure the same
    // environment the library ships, and q122 needs the SQL-registered
    // functions
    val spark = Engine.session("bench")

    // warmup: touch every table + one shuffle to JIT common paths
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Engine.table(spark, sfDir, t).count())

    // Optional focus list for local iteration: SPARK_GRAFT_ONLY=q52,q74
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(f => f.exists(n.startsWith)) }

    // Per query: (elapsed seconds, succeeded). A query that throws is
    // reported as -1 and listed under "errors" — never as a normal time.
    val results = selected.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // codegen warmup
      Engine.releaseScratch(spark) // warmup's checkpoint blocks must not skew the timed run
      // min of two timed runs: the box shares cores with everything
      // (±25% observed), and a query's steady-state cost is the run the
      // scheduler did NOT interfere with. Cleanup stays outside the
      // timers — checkpoint blocks accumulating across the run was the
      // r2 contamination (4-12x on late queries).
      val times = (0 until 2).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        Engine.releaseScratch(spark)
        if (ok) Some(dt) else None
      }
      (name, times.sorted.headOption.getOrElse(-1.0), times.nonEmpty)
    }
    // The driver captures only the LAST ~2000 chars of stdout, so the JSON
    // line must stay compact: short keys (the qNN prefix — unique across the
    // registry) and 3-decimal seconds. Full names go to a human-readable
    // report printed BEFORE the JSON line.
    def short(name: String): String = name.takeWhile(_ != '_')
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    results.foreach { case (k, v, ok) =>
      println(s"BENCH ${k.padTo(32, ' ')} ${if (ok) fmt(v) + " s" else "ERROR"}")
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + short(k) + "\":" + (if (ok) fmt(v) else "-1")
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + short(k) + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    println(line)
    spark.stop()
  }
}
