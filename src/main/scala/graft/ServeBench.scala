package graft

import org.apache.spark.sql.functions._

/** REQUEST-GRANULARITY serving benchmark — the measured row behind the
  * probed-list pruning claim (round-13 verdict #4: the nprobe/|cells|
  * read economics were plan-pinned in PlanShapeSpec but only ever
  * MEASURED through whole-batch gates, where one scan amortizes over
  * the full 20-query contract; a production vector store serves one
  * query at a time).
  *
  * Methodology: the deep (K=256, 2-round) artifact is built (or
  * resolved from the process cache) UNTIMED, and one throwaway batch
  * serve warms footers, page cache, broadcast machinery, and codegen.
  * Then N SEQUENTIAL single-query requests run the COMPLETE two-stage
  * serve — a fresh 1-row query frame per request (a real request is a
  * new frame: the probed-set cache cannot and must not hit), the
  * bounded probed-cells driver fetch, the pushed-literal pruned codes
  * scan, ADC top-16, exact re-rank, collect() of the top-3 — with the
  * timer covering the whole request. Per-request wall times and each
  * request's pushed-literal count (= the lists it physically reads,
  * the pruning observable) are reported per nprobe operating point
  * (2 = the latency point, 4 = the q220-tuned recall point).
  *
  * Output: one JSON line per nprobe with min/mean/p50/max request
  * seconds and the pushed-literal counts; PERF.md records the sf0.1 /
  * sf1 rows. A LEXICAL section (round 15) measures the sparse half
  * the same way: single-term BM25 requests against a live postings
  * TieredIndex with epoch-cached dl/stats (q248's deployment shape),
  * the term pushed as a scan literal — verified per request.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val requests = sys.env.getOrElse("SPARK_GRAFT_REQUESTS", "20").toInt
    val spark = Engine.session("servebench")
    val S = queries.SimilarityOps
    def fmt(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)

    // untimed: artifact build/resolve + corpus frame + one warm batch
    val idx = S.buildIvfAdcIndex(spark, sfDir, k = 256, rounds = 2)
    val iv = S.ivecs(spark, sfDir)
    val warmQ = iv
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
    S.ivfadcServe(spark, idx, warmQ, iv, k = 256).count(): Unit
    val cc = spark.read.parquet(s"$idx/coarse")
    val totalCells = cc.count()

    for (nprobe <- Seq(2, 4)) {
      val times = Array.ofDim[Double](requests)
      val pushed = Array.ofDim[Int](requests)
      for (r <- 0 until requests) {
        // a FRESH frame per request — new plan, new probed-set fetch,
        // exactly what an arriving request pays
        val q1 = iv
          .filter(col("vec_id") === r)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
        val t0 = System.nanoTime()
        // count(), not collect(): same full-request materialization
        // without a driver row fetch (the repo-wide no-collect rule)
        val n = S.ivfadcServe(spark, idx, q1, iv, k = 256, nprobe = nprobe).count()
        times(r) = (System.nanoTime() - t0) / 1e9
        require(n == 3, s"request $r returned $n rows")
        // the pruning observable, re-derived untimed: the literal set
        // this request pushed to the codes scan
        pushed(r) = S.probedCcids(q1, cc, nprobe).length
      }
      val sorted = times.sorted
      println(
        s"""{"metric":"serve_per_request","unit":"sec","nprobe":$nprobe,""" +
          s""""requests":$requests,"min":${fmt(sorted.head)},""" +
          s""""p50":${fmt(sorted(requests / 2))},""" +
          s""""mean":${fmt(times.sum / requests)},"max":${fmt(sorted.last)},""" +
          s""""pushed_literals_min":${pushed.min},"pushed_literals_max":${pushed.max},""" +
          s""""cells":$totalCells,"sf":"$sfDir"}""")
    }

    // ---- LEXICAL rows: single-term BM25 requests against the live
    // postings index — the sparse half of serving measured at request
    // granularity like the dense half (round-14 verdict #7). Untimed
    // setup: the postings TieredIndex (built once per sf-dir, COMPLETE
    // marker) and the EPOCH-CACHED dl/stats frames (q248's deployment
    // shape — the per-epoch pass amortizes over every request in the
    // epoch, so a request pays only its term's pruned key-range read +
    // bounded scoring joins). Timed per request: a FRESH single-term
    // page (terms as pushed literals), full top-5 materialization.
    val R = queries.RetrievalOps
    val post = graft.operators.TieredIndex.read(
      spark, R.buildPostingsIndex(spark, sfDir))
    val dl = post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")).localCheckpoint()
    val stats = R.statsOf(dl).localCheckpoint()
    val terms = R.serveTerms
    def page(term: String) = R
      .bm25Score(R.termTfPushed(post, Seq(term)), dl, stats)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(5)
    // warm one request untimed (codegen + footer cache)
    page(terms.head).count(): Unit
    val ltimes = Array.ofDim[Double](requests)
    var lpushed = 0
    for (r <- 0 until requests) {
      val term = terms(r % terms.length)
      val t0 = System.nanoTime()
      page(term).count(): Unit
      ltimes(r) = (System.nanoTime() - t0) / 1e9
      // the pruning observable, re-derived untimed: the request's term
      // literal reached the postings scan as a pushed filter
      val p = page(term).queryExecution.executedPlan.toString
      if (p.contains(s"EqualTo(word,$term)") || p.contains(s"In(word, [$term]")) lpushed += 1
    }
    val lsorted = ltimes.sorted
    println(
      s"""{"metric":"bm25_serve_per_request","unit":"sec",""" +
        s""""requests":$requests,"min":${fmt(lsorted.head)},""" +
        s""""p50":${fmt(lsorted(requests / 2))},""" +
        s""""mean":${fmt(ltimes.sum / requests)},"max":${fmt(lsorted.last)},""" +
        s""""pushed_term_filters":$lpushed,"sf":"$sfDir"}""")

    // ---- HYBRID rows (round 16): the FUSED request end to end —
    // q244's shape at request granularity (round-15 verdict #6: the
    // two legs were priced separately, so the hybrid ablation's
    // quality gain carried no per-request cost). One hybrid request =
    // a 3-term keyword query (the terms arrive WITH the request, so
    // they go down as PUSHED LITERALS — the q248 serving shape; a
    // broadcast-join restriction cannot reach the scan and was
    // measured at 3-5x the cost here, scanning the whole postings
    // index per request) BM25-paged against the live postings with
    // epoch-cached dl/stats, PLUS the complete two-stage dense serve
    // at the q220-tuned nprobe=4, PLUS RRF fusion of the two top-20s
    // into the top-10 page — the whole request timed as one unit,
    // fresh frames per request.
    def hybridPage(r: Int) = {
      val words = (0 until 3).map(j => terms((r + j) % terms.length))
      val wL = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      val lex = R.bm25Score(R.termTfPushed(post, words), dl, stats)
        .filter(col("doc_id") =!= r)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
        .withColumn("lex_rk", row_number().over(wL).cast("long"))
        .select(col("doc_id"), col("lex_rk"))
      val q1 = iv
        .filter(col("vec_id") === r)
        .select(col("vec_id").as("qid"), col("iv").as("qiv"))
      val vec = S
        .ivfadcServe(spark, idx, q1, iv, k = 256, nprobe = 4, candN = 32, topN = 20)
        .select(col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
      R.rrfFuse(lex, vec)
    }
    hybridPage(0).count(): Unit // warm
    val htimes = Array.ofDim[Double](requests)
    for (r <- 0 until requests) {
      val t0 = System.nanoTime()
      hybridPage(r).count(): Unit
      htimes(r) = (System.nanoTime() - t0) / 1e9
    }
    val hsorted = htimes.sorted
    println(
      s"""{"metric":"hybrid_serve_per_request","unit":"sec","nprobe":4,""" +
        s""""requests":$requests,"min":${fmt(hsorted.head)},""" +
        s""""p50":${fmt(hsorted(requests / 2))},""" +
        s""""mean":${fmt(htimes.sum / requests)},"max":${fmt(hsorted.last)},""" +
        s""""sf":"$sfDir"}""")

    // ---- BATCHED HYBRID MSEARCH row (round 17): the SAME N fused
    // requests — identical terms windows, identical query vectors —
    // served in ONE plan (q263's msearch path): one pushed word-list
    // postings scan for all N lexical legs, one pushed ccid-list
    // codes scan for all N dense legs, one keyed fusion. The
    // single-request row above prices a request dominated by fixed
    // per-plan overhead; this row shows that overhead amortizing —
    // per_request here vs `mean` there IS the msearch argument.
    {
      import spark.implicits._
      val wLq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
      def msearchPage(n: Int) = {
        val pairs = R.msearchQTerms(n)
        val qterms = pairs.toDF("qid", "word")
          .select(col("qid").cast("long").as("qid"), col("word"))
        val lex = R.bm25ScoreKeyed(
          R.termTfPushed(post, pairs.map(_._2).distinct), qterms, dl, stats)
          .filter(col("qid") =!= col("doc_id"))
          .withColumn("lex_rk", row_number().over(wLq).cast("long"))
          .filter(col("lex_rk") <= 20)
          .select(col("qid"), col("doc_id"), col("lex_rk"))
        val qb = iv
          .filter(col("vec_id") < n)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
        val vec = S
          .ivfadcServe(spark, idx, qb, iv, k = 256, nprobe = 4, candN = 32, topN = 20)
          .select(col("qid"), col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
        R.rrfFuseKeyed(lex, vec)
      }
      msearchPage(requests).count(): Unit // warm
      val btimes = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        msearchPage(requests).count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      val best = btimes.min
      println(
        s"""{"metric":"hybrid_msearch_batch","unit":"sec","nprobe":4,""" +
          s""""requests":$requests,"total":${fmt(best)},""" +
          s""""per_request":${fmt(best / requests)},""" +
          s""""single_request_mean":${fmt(htimes.sum / requests)},""" +
          s""""sf":"$sfDir"}""")
    }
    Engine.releaseScratch(spark)
    spark.stop()
  }
}
