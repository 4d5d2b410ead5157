package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q168 cluster-balance and q169 quality-logit invariants. */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  test("q168: every cluster samples exactly min(ceil(sqrt(n)), n) members") {
    val rows = graft.SparkEntry
      .queries("q168_cluster_balance")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5)))
    rows.groupBy(_._1).foreach { case (cluster, members) =>
      val n = members.head._2
      val quota = members.head._3
      assert(quota == math.ceil(math.sqrt(n.toDouble)).toLong, s"cluster $cluster quota")
      val sampled = members.count(_._4 == "sampled")
      assert(sampled == math.min(quota, n), s"cluster $cluster sampled $sampled of n=$n quota=$quota")
    }
  }

  test("q169: the logit is monotone in the features it rewards") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("logitfix-").toString
    val base = (1 to 30).map(i => f"word$i%02d").mkString(" ")
    Seq(
      (1L, base, "en", "s"),                         // no stopwords
      (2L, base + " the with", "en", "s"),           // +2 stopword hits
      (3L, Seq.fill(32)("word01").mkString(" "), "en", "s") // degenerate ttr
    ).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val logit = graft.SparkEntry.queries("q169_quality_logit")(s, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(logit(2L) > logit(1L), "stop-word hits must raise the score")
    assert(logit(3L) < logit(1L), "collapsed type-token ratio must lower the score")
  }
}
