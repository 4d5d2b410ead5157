package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RETRIEVAL — the RAG stack's query-time surface over the corpus the
  * other modules curate and index: BM25 lexical ranking (q229) and
  * hybrid lexical+vector reciprocal-rank fusion (q230). These are the
  * two operations every production retrieval deployment composes in
  * front of an LLM (sparse first-stage + dense first-stage -> fused
  * candidates), expressed as the same oracle-gated Spark plans as the
  * rest of the engine.
  *
  * Scale notes (100 TB): BM25 is two narrow aggregations over the
  * token stream (per-doc tf for the QUERY TERMS only — the term filter
  * prunes before the shuffle — and per-term df) joined against
  * broadcast 1-row collection stats; ranking is one TopK. The fusion
  * stage joins two TOP-K LISTS (bounded, broadcast) — never the
  * corpora. Cross-engine FP determinism follows q81's rule: ranks are
  * taken over the ROUNDED score so a libm last-ulp difference in ln()
  * can never flip an order the gate hashes.
  */
object RetrievalOps {

  /** BM25 (Okapi, Lucene's always-positive idf spelling) of every doc
    * in `docs` against the query-term set `terms` (a (word) frame):
    * score(d) = sum over matched terms of
    *   ln(1 + (N - df + 0.5)/(df + 0.5))
    *     * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    * with k1 = 1.2, b = 0.75, dl = |tokens(d)|, avgdl/N over `docs`.
    * Returns (doc_id, score) with score ROUNDED to 4dp — the rank
    * consumers order by the rounded value (q81's ulp rule). ONE
    * definition site for q229 (fixed keyword query) and q230's
    * lexical leg (more-like-this terms); [[bm25Sql]] is its DuckDB
    * mirror, arithmetic textually identical so left-associative IEEE
    * evaluation matches term by term.
    */
  private def bm25Scored(docs: DataFrame, terms: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(Tokenize.toksExpr).as("word"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // integer-valued sums are exact in any accumulation order, so
    // avgdl = sum/count is bit-identical across engines
    val stats = dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).cast("double").as("n_docs"))
    val tf = tok
      .join(broadcast(terms), "word")
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "word")
      .crossJoin(broadcast(stats))
      .join(dl, "doc_id")
      .withColumn(
        "c",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * 2.2 /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("c")), 4).as("score"))
  }

  /** [[bm25Scored]]'s DuckDB mirror: CTEs tok/dl/bstats/btf/bdf ending
    * in `bscored` (doc_id, score), over document relation `docsRel`
    * (must expose doc_id + text) and term CTE `termsCte` (one `word`
    * column). A def — eager oracle interpolation rule.
    */
  private def bm25Sql(docsRel: String, termsCte: String): String =
    s"""btok AS (SELECT doc_id, unnest(${Tokenize.toksSql}) AS word FROM $docsRel),
             bterms AS ($termsCte),
             bdl AS (SELECT doc_id, count(*) AS dl FROM btok GROUP BY doc_id),
             bstats AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
               CAST(count(*) AS DOUBLE) AS n_docs FROM bdl),
             btf AS (SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf
               FROM btok JOIN bterms USING (word) GROUP BY doc_id, word),
             bdf AS (SELECT word, CAST(count(*) AS DOUBLE) AS df FROM btf GROUP BY word),
             bscored AS (SELECT t.doc_id,
                 round(sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * t.tf * 2.2
                   / (t.tf + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE) / s.avgdl))), 4) AS score
               FROM btf t JOIN bdf d USING (word) CROSS JOIN bstats s
               JOIN bdl l ON t.doc_id = l.doc_id
               GROUP BY t.doc_id)"""

  val entries: Seq[QueryDef] = Seq(
    // --------------------------------------------------------------- q229
    // BM25 LEXICAL RANKING — the sparse half of every production
    // retrieval stack (Okapi BM25, Lucene's always-positive idf),
    // gated end to end: a fixed 3-term keyword query ranks the corpus,
    // positioned top-20 with the rounded score. Plan shape at scale:
    // the term filter (a broadcast semi-join against the 3-row query)
    // prunes the token stream BEFORE the tf shuffle, df/collection
    // stats are broadcast 1-row aggregates, and the final rank is one
    // TopK over docs that matched at least one term — no corpus-wide
    // sort, no unfiltered shuffle. Ranks order by the ROUNDED score
    // (q81's rule) so libm ulp noise in ln() cannot flip the gate.
    QueryDef(
      "q229_bm25_rank",
      (s, dir) => {
        import s.implicits._
        val terms = Seq("hash", "join", "spark").toDF("word")
        // distributed top-k FIRST (TakeOrderedAndProject — never a
        // corpus-wide single-partition window), then position the 20
        // survivors
        val w = Window.orderBy(col("score").desc, col("doc_id"))
        bm25Scored(Engine.table(s, dir, "documents"), terms)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
          .withColumn("rk", row_number().over(w).cast("long"))
          .select(col("rk"), col("doc_id"), col("score"))
          .orderBy(col("rk"))
      },
      Some(s"""WITH ${bm25Sql(
          "documents",
          "SELECT unnest(['hash', 'join', 'spark']) AS word")},
             r AS (SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM bscored)
             SELECT CAST(rk AS BIGINT) AS rk, doc_id, score FROM r
             WHERE rk <= 20 ORDER BY rk""")
    ),
    // --------------------------------------------------------------- q230
    // HYBRID RETRIEVAL with RECIPROCAL-RANK FUSION — the canonical
    // two-tower RAG request ("find documents like document 7"), gated
    // in one query: the SPARSE leg runs BM25 over the indexed subset
    // (docs that carry an embedding) with the query document's own
    // distinct tokens as terms (more-like-this), the DENSE leg ranks
    // by exact integer-L2 distance from the query document's
    // embedding (micro-unit vectors — zero FP on this side), each leg
    // keeps its positioned top-20, and RRF fuses them:
    // score = sum over legs of 1/(60 + rank), the parameter-free
    // fusion every hybrid search deployment starts from (k=60, the
    // original Cormack/Clarke constant). Output: fused top-10 with
    // both legs' ranks (NULL where a doc appeared in only one leg —
    // fusion rewarding agreement is the gated observable). At scale
    // each leg is its own pruned retrieval (BM25: filtered token agg;
    // ANN: the q216 serve path would replace the brute leg) and the
    // fusion joins two 20-row broadcast lists — request cost is the
    // legs, fusion is free.
    QueryDef(
      "q230_hybrid_rrf",
      (s, dir) => {
        val docs = Engine.table(s, dir, "documents")
        val ids = Engine.table(s, dir, "embeddings").select(col("vec_id"))
        // the indexed subset: at sf0.1+ only a prefix of doc_ids carry
        // embeddings — hybrid retrieval serves what both legs cover
        val uni = docs.join(ids, docs("doc_id") === ids("vec_id"), "left_semi")
        val qTerms = uni
          .filter(col("doc_id") === 7)
          .select(explode(Tokenize.toksExpr).as("word"))
          .distinct()
        // each leg: distributed top-20 first, then position (the
        // single-partition window only ever sees 20 rows)
        val wL = Window.orderBy(col("score").desc, col("doc_id"))
        val lex = bm25Scored(uni, qTerms)
          .filter(col("doc_id") =!= 7)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
          .withColumn("lex_rk", row_number().over(wL).cast("long"))
          .select(col("doc_id"), col("lex_rk"))
        val iv = SimilarityOps.ivecs(s, dir)
        val q7 = iv.filter(col("vec_id") === 7).select(col("iv").as("qiv"))
        val wV = Window.orderBy(col("d"), col("doc_id"))
        val vec = iv
          .filter(col("vec_id") =!= 7)
          .crossJoin(broadcast(q7))
          .select(
            col("vec_id").as("doc_id"),
            graft.functions.VectorOps.l2sqLong(col("iv"), col("qiv")).as("d"))
          .orderBy(col("d"), col("doc_id"))
          .limit(20)
          .withColumn("vec_rk", row_number().over(wV).cast("long"))
          .select(col("doc_id"), col("vec_rk"))
        val wF = Window.orderBy(col("rrf").desc, col("doc_id"))
        // fusion as union + one tiny aggregate (<= 40 rows) — a FULL
        // OUTER join cannot broadcast and would sort-merge even two
        // bounded lists; this spelling is also the shape that scales
        // to N legs
        lex
          .select(col("doc_id"), col("lex_rk"), lit(null).cast("long").as("vec_rk"))
          .unionAll(
            vec.select(col("doc_id"), lit(null).cast("long").as("lex_rk"), col("vec_rk")))
          .groupBy(col("doc_id"))
          .agg(max(col("lex_rk")).as("lex_rk"), max(col("vec_rk")).as("vec_rk"))
          .withColumn(
            "rrf",
            round(
              coalesce(lit(1.0) / (col("lex_rk") + 60), lit(0.0)) +
                coalesce(lit(1.0) / (col("vec_rk") + 60), lit(0.0)),
              6))
          .withColumn("rk", row_number().over(wF).cast("long"))
          .filter(col("rk") <= 10)
          .select(col("rk"), col("doc_id"), col("rrf"), col("lex_rk"), col("vec_rk"))
          .orderBy(col("rk"))
      },
      Some(s"""WITH uni AS (
               SELECT d.doc_id, d.text FROM documents d
               WHERE d.doc_id IN (SELECT vec_id FROM embeddings)),
             ${bm25Sql(
          "uni",
          "SELECT DISTINCT unnest(" + Tokenize.toksSql + ") AS word FROM documents WHERE doc_id = 7")},
             lex AS (SELECT doc_id, lex_rk FROM (
                 SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rk
                 FROM bscored WHERE doc_id <> 7)
               WHERE lex_rk <= 20),
             t AS (SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) + 16777216) AS iv
               FROM embeddings),
             q7 AS (SELECT iv AS qiv FROM t WHERE vec_id = 7),
             vd AS (SELECT x.vec_id AS doc_id,
                 list_sum(list_transform(generate_series(1, len(x.iv)),
                   j -> (x.iv[j] - q.qiv[j]) * (x.iv[j] - q.qiv[j]))) AS d
               FROM t x CROSS JOIN q7 q WHERE x.vec_id <> 7),
             vec AS (SELECT doc_id, vec_rk FROM (
                 SELECT doc_id, row_number() OVER (ORDER BY d, doc_id) AS vec_rk FROM vd)
               WHERE vec_rk <= 20),
             fused AS (SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
                 lex.lex_rk, vec.vec_rk,
                 round(coalesce(CAST(1 AS DOUBLE) / (lex.lex_rk + 60), 0)
                   + coalesce(CAST(1 AS DOUBLE) / (vec.vec_rk + 60), 0), 6) AS rrf
               FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id),
             r AS (SELECT doc_id, rrf, lex_rk, vec_rk,
               row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk FROM fused)
             SELECT CAST(rk AS BIGINT) AS rk, doc_id, rrf,
               CAST(lex_rk AS BIGINT) AS lex_rk, CAST(vec_rk AS BIGINT) AS vec_rk
             FROM r WHERE rk <= 10 ORDER BY rk""")
    )
  )
}
