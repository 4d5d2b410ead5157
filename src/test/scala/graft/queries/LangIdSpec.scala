package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q175 — profile-table language ID: the oracle gate pins the exact
  * confusion matrix; this pins the two properties the matrix alone
  * can't prove:
  *   - accuracy really is 100% on the generated corpus (every
  *     diagonal share is exactly 1,000,000 ppm);
  *   - profile trigrams are COLLISION-IMMUNE to the corpus
  *     vocabulary: a maximally adversarial document stuffed with the
  *     vocabulary words that nearly contain foreign grams ('query',
  *     'table', 'data', 'part', 'spark', plus organic 'the') is still
  *     classified by its injected tail, for every language.
  */
class LangIdSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.Engine.session("test")

  test("q175: perfect diagonal at sf0.001") {
    val rows = graft.SparkEntry.queries("q175_langid_profile")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"misclassified: $r")
      assert(r.getLong(3) == 1000000L, s"diagonal share not 1.0: $r")
    }
  }

  test("q175: vocabulary decoys cannot outvote the language tail") {
    val s = spark
    import s.implicits._
    // 'query'~'que', 'table'~'le ', 'data '~'ta ', 'spark'/'part'~'par',
    // 'value '~'ue ' — every near-collision the profiles were audited
    // against, at high density, plus genuine English stopwords
    val decoy =
      ("the query table data part spark value " * 12) + "the and of to in"
    val fixture = TextOps.langProfiles.zipWithIndex.map { case ((l, _, _), i) =>
      (i.toLong, l, decoy)
    }
    val scored = fixture
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), expr(TextOps.langAugSql).as("aug"))
      .select(
        col("doc_id") +: col("lang") +:
          TextOps.langProfiles.map { case (l, _, g) =>
            expr(TextOps.langScoreSql(g)).as(s"s_$l")
          }: _*)
      .withColumn("pred_lang", expr(TextOps.langPredSql))
      .collect()
    scored.foreach { r =>
      assert(r.getAs[String]("lang") == r.getAs[String]("pred_lang"),
        s"decoy flipped ${r.getAs[String]("lang")} -> ${r.getAs[String]("pred_lang")}")
    }
  }
}
