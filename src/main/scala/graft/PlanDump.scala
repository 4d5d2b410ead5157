package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Writes `plans/r18/<name>_<suffix>.txt` — the `.explain("formatted")
  * `-style executed plans backing OPTIMIZATION_r18.md's claims. For
  * plain queries the dumped plan is the query's own returned frame;
  * for the streaming lifecycles the gated frame is just a pages
  * read-back, so the dump RUNS the lifecycle (sf0.01) and then
  * captures the per-batch HYBRID SERVE PAGE plan over the work dirs it
  * leaves behind — the same reconstruction PlanShapeSpec pins, which
  * is where the round's changes (pushed term literals, candidate-
  * literal refine) show as plan diffs. Usage:
  *   runMain graft.PlanDump before|after
  * The suffix also selects the page SPELLING to capture: `before` uses
  * the broadcast-join term restriction (what the lifecycles ran before
  * this round), `after` the pushed-literal one — run the tool once on
  * the baseline commit and once on the optimized tree.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = new java.io.File("plans/r18")
    out.mkdirs(): Unit
    val spark = Engine.session("plandump")
    val S = graft.queries.SimilarityOps
    val R = graft.queries.RetrievalOps
    val T = graft.operators.TieredIndex

    def write(name: String, df: DataFrame): Unit = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r18/${name}_$suffix.txt"),
        p.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      println(s"PLANDUMP wrote $name ($suffix)")
    }

    // run a registered query so its scratch work dirs exist in THIS
    // process (scratch paths are per-process-token)
    def run(q: String): Unit = {
      SparkEntry.queries(q)(spark, dir).count(): Unit
      Engine.releaseScratch(spark)
    }

    // NOTE: Engine.releaseScratch (called by run()) unpersists EVERY
    // lazily-localCheckpointed frame, so the request frames must be
    // built FRESH after each run() — holding them across a release is
    // the documented single-writer-contract violation.
    def ivF() = S.ivecs(spark, dir)
    def q7F() = ivF()
      .filter(col("vec_id") === 7)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
    def qTermsF() = Engine.table(spark, dir, "documents")
      .filter(col("doc_id") === 7)
      .select(explode(graft.queries.Tokenize.toksExpr).as("word"))
      .distinct()

    // the fixed hybrid request's page over a lifecycle's left-behind
    // indexes — the exact per-batch composition the gates serve
    def hybridPage(work: String, annRoot: Option[String]): DataFrame = {
      val postDir = s"$work/postings"
      val wL = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      val post = T.read(spark, postDir)
      val scored =
        if (suffix == "before") R.bm25FromPostings(post, qTermsF())
        else R.bm25FromPostingsPushed(post, R.termsLiteral(qTermsF()))
      val lex = scored
        .filter(col("doc_id") =!= 7)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
        .withColumn("lex_rk", row_number().over(wL).cast("long"))
        .select(col("doc_id"), col("lex_rk"))
      val root = annRoot.getOrElse(work)
      val vec = S
        .ivfadcServe(spark, root, q7F(), ivF(), k = 16, candN = 32, topN = 20)
        .select(col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
      R.rrfFuse(lex, vec)
    }

    // 1. canonical two-stage dense serve (q216's artifact) — the
    // refine-stage change shows here in every ivfadcServe consumer
    run("q216_ivfadc_serve")
    write(
      "q216_serve",
      S.ivfadcServe(
        spark, S.buildIvfAdcIndex(spark, dir, k = 256, rounds = 2),
        ivF()
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("iv").as("qiv")),
        ivF(), k = 256))

    // 2. the live dual-index hybrid page (q250/q262 and, same
    // composition, q255/q258/q260/q261/q265)
    run("q250_hybrid_live_serve")
    write("q250_page", hybridPage(Engine.scratchDir("q250", dir).toString, None))

    // 3. the CDC-retract page — tombstone-masked reads under the fusion
    run("q255_hybrid_cdc_retract")
    write("q255_page", hybridPage(Engine.scratchDir("q255", dir).toString, None))

    // 4. the retrain-under-hybrid page against the LIVE generation
    run("q257_hybrid_retrain_swap")
    val w257 = Engine.scratchDir("q257", dir).toString
    write(
      "q257_page",
      hybridPage(w257, Some(graft.operators.Generations.resolve(s"$w257/ann"))))

    // 5. the full-CDC-matrix page against the green generation
    run("q260_hybrid_full_cdc_retrain")
    val w260 = Engine.scratchDir("q260", dir).toString
    write(
      "q260_page",
      hybridPage(w260, Some(graft.operators.Generations.resolve(s"$w260/ann"))))

    // 6. the incremental-postings BM25 top-5 (q236/q237's per-batch
    // observable — the pushed-term change landed with the inherited
    // round-17 commit, captured here for the record)
    run("q236_bm25_stream_index")
    val w236 = Engine.scratchDir("q236", dir).toString
    val post236 = T.read(spark, s"$w236/postings")
    val words236 = Seq("hash", "join", "spark")
    write(
      "q236_top5",
      if (suffix == "before")
        R.bm25FromPostings(post236, words236.toDF("word"))
          .orderBy(col("score").desc, col("doc_id")).limit(5)
      else
        R.bm25FromPostingsPushed(post236, words236)
          .orderBy(col("score").desc, col("doc_id")).limit(5))

    spark.stop()
  }

  private implicit class SeqToDF(val xs: Seq[String]) extends AnyVal {
    def toDF(colName: String): DataFrame = {
      val spark = org.apache.spark.sql.SparkSession.active
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          xs.map(x => org.apache.spark.sql.Row(x): org.apache.spark.sql.Row)
            .asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            colName, org.apache.spark.sql.types.StringType, nullable = false))))
    }
  }
}
