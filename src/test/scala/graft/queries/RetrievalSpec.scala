package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side invariants for the retrieval surface (q229-q236). The
  * DuckDB gate pins exact values; these pin the CONTRACTS: rank
  * monotonicity, the per-source collapse cap, the different-label
  * guarantee of mined hard negatives, SQ8's 8-bit code range, and the
  * postings-additivity fact q236's incremental index rests on.
  */
class RetrievalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = graft.Engine.session("test")

  test("q229: positioned BM25 ranking is strictly rank-ordered with positive scores") {
    val rows = graft.SparkEntry
      .queries("q229_bm25_rank")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq == (1L to 20L), "rk is 1..20 in order")
    rows.sliding(2).foreach {
      case Array((_, _, s1), (_, _, s2)) => assert(s1 >= s2, "scores descend with rank")
      case _ =>
    }
    assert(rows.forall(_._3 > 0), "BM25 with positive idf never scores <= 0")
    graft.Engine.releaseScratch(spark)
  }

  test("q231: every mined hard negative's label differs from its anchor's") {
    val neg = graft.SparkEntry
      .queries("q231_hard_negative_mining")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(neg.length == 60, "20 anchors x top-3 negatives")
    val labels = graft.Engine
      .table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    neg.foreach { case (qid, vid) =>
      assert(
        labels(qid) != labels(vid),
        s"anchor $qid (label ${labels(qid)}) mined same-label negative $vid")
      assert(qid != vid, "a vector is never its own negative")
    }
    graft.Engine.releaseScratch(spark)
  }

  test("q232: MaxSim re-rank emits 5 positioned rows per query, sims descending") {
    val rows = graft.SparkEntry
      .queries("q232_maxsim_rerank")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 25, "5 queries x top-5")
    rows.groupBy(_._1).foreach { case (qid, g) =>
      val byRk = g.sortBy(_._2)
      assert(byRk.map(_._2).toSeq == (1L to 5L), s"qid $qid ranks are 1..5")
      byRk.sliding(2).foreach {
        case Array((_, _, _, s1), (_, _, _, s2)) =>
          assert(s1 >= s2, s"qid $qid: MaxSim scores descend with rank")
        case _ =>
      }
      assert(!g.exists(_._3 == qid), s"qid $qid retrieved itself")
    }
    graft.Engine.releaseScratch(spark)
  }

  test("q233: PRF expansion keeps 20 positioned rows and never loses the seed terms") {
    val rows = graft.SparkEntry
      .queries("q233_rm3_expansion")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq == (1L to 20L))
    assert(rows.forall(_._3 > 0))
    // the expanded query is a superset of the seed terms, so every doc
    // matching a seed term still scores — the PRF top-20 can reorder
    // but can never be EMPTIER than the seed query's match set
    val seedMatched = graft.SparkEntry
      .queries("q229_bm25_rank")(spark, dir)
      .count()
    assert(seedMatched == 20, "seed ranking fills its page at this sf")
    graft.Engine.releaseScratch(spark)
  }

  test("q234: field collapse honors the 2-per-source cap") {
    val rows = graft.SparkEntry
      .queries("q234_collapsed_topk")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(rows.length == 10)
    rows.groupBy(_._2).foreach { case (src, g) =>
      assert(g.length <= 2, s"source $src holds ${g.length} > 2 of the page")
    }
    assert(rows.forall(_._3 <= 2), "src_rk never exceeds the cap")
    assert(rows.map(_._2).distinct.length >= 5, "page is actually diversified")
    graft.Engine.releaseScratch(spark)
  }

  test("q235: SQ8 integer-grid codes fit 8 bits on every dimension") {
    val iv = SimilarityOps.ivecs(spark, dir)
    val ex = iv.select(posexplode(col("iv")).as(Seq("pos", "v")))
    val st = ex
      .groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .withColumn("step", greatest(lit(1L), expr("(mx - mn + 254) div 255")))
      .withColumn("maxcode", expr("(mx - mn) div step"))
      .collect()
    assert(st.length == 64)
    st.foreach { r =>
      val maxcode = r.getAs[Long]("maxcode")
      assert(maxcode >= 0 && maxcode <= 255, s"dim ${r.getAs[Int]("pos")}: code $maxcode")
    }
    // and the served top-3 exists for every query with exact distances
    val rows = graft.SparkEntry
      .queries("q235_sq8_serve")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.length == 60, "20 queries x top-3")
    assert(rows.forall(_._3 >= 0), "exact re-rank distances are non-negative")
    graft.Engine.releaseScratch(spark)
  }

  test("q238: metrics are bounded — n_rel@10 <= 10, MRR and nDCG@10 in [0, 1]") {
    val rows = graft.SparkEntry
      .queries("q238_retrieval_metrics")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 20, "one metrics row per query")
    rows.foreach { case (qid, nrel, mrr, ndcg) =>
      assert(nrel >= 0 && nrel <= 10, s"qid $qid: n_rel10 $nrel")
      assert(mrr >= 0 && mrr <= 1, s"qid $qid: mrr $mrr")
      assert(ndcg >= 0 && ndcg <= 1 + 1e-9, s"qid $qid: ndcg $ndcg")
      // a query with no relevant in the page has BOTH metrics at 0;
      // any hit puts both strictly positive
      assert((mrr == 0) == (nrel == 0), s"qid $qid: mrr $mrr vs n_rel10 $nrel")
      assert((ndcg == 0) == (nrel == 0), s"qid $qid: ndcg $ndcg vs n_rel10 $nrel")
    }
    // the label structure is real: SOME query finds relevant neighbors
    assert(rows.exists(_._2 > 0), "vacuous corpus: no query found any relevant doc")
    graft.Engine.releaseScratch(spark)
  }

  test("q239: IVF-SQ8 serves 20 exact-re-ranked top-3s; recall holds a measured floor") {
    import org.apache.spark.sql.expressions.Window
    val rows = graft.SparkEntry
      .queries("q239_ivf_sq8_serve")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 60, "20 queries x top-3")
    assert(rows.forall(_._4 >= 0), "exact distances are non-negative")
    val served = rows.map(r => (r._1, r._3)).toSet
    assert(served.size == 60, "no duplicate (qid, vec_id) in the page")
    // recall vs the exact integer-L2 truth: coarse pruning (nprobe
    // 2/16 lists) caps recall at the q211 ceiling (52/60 at sf0.01);
    // SQ8's residual error must not collapse it. Floor pins against a
    // silent quantizer regression, with slack for the genuine
    // approximation (measured: 52/60 — residual SQ8 at a byte per dim
    // recovers the full ceiling after exact re-rank).
    val iv = SimilarityOps.ivecs(spark, dir)
    val q = iv
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
    val wB = Window.partitionBy(col("qid")).orderBy(col("d"), col("vec_id"))
    val brute = broadcast(q)
      .join(iv, col("qid") =!= col("vec_id"))
      .select(
        col("qid"), col("vec_id"),
        graft.functions.VectorOps.l2sqLong(col("qiv"), col("iv")).as("d"))
      .withColumn("rn", row_number().over(wB))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val hits = served.count(brute)
    assert(hits >= 45, s"IVF-SQ8 recall collapsed: $hits/60 vs exact truth")
    graft.Engine.releaseScratch(spark)
  }

  test("q242: every ranked doc really contains the adjacent phrase in its raw text") {
    val rows = graft.SparkEntry
      .queries("q242_phrase_rank")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._1).toSeq == (1L to rows.length), "contiguous ranks")
    rows.sliding(2).foreach {
      case Array((_, _, n1), (_, _, n2)) => assert(n1 >= n2, "phrase tf descends")
      case _ =>
    }
    // adjacency is real: the tokenizer splits on [^a-z0-9]+, so a
    // phrase match means the raw text matches table<seps>hash
    val ids = rows.map(_._2).toSet
    val texts = graft.Engine
      .table(spark, dir, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val phrase = "(?s).*\\btable[^a-z0-9]+hash\\b.*".r
    ids.foreach { id =>
      assert(
        phrase.matches(texts(id).toLowerCase),
        s"doc $id ranked for the phrase but its text has no adjacent occurrence")
    }
    graft.Engine.releaseScratch(spark)
  }

  test("postings additivity: disjoint-batch postings union to the full index (q236 core)") {
    val docs = graft.Engine.table(spark, dir, "documents")
    val whole = RetrievalOps.postingsOf(docs)
    val parts = RetrievalOps
      .postingsOf(docs.filter(col("doc_id") % 5 =!= 0))
      .unionByName(RetrievalOps.postingsOf(docs.filter(col("doc_id") % 5 === 0)))
    assert(whole.exceptAll(parts).isEmpty && parts.exceptAll(whole).isEmpty)
    graft.Engine.releaseScratch(spark)
  }
}
