package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native gram-hash kernels must agree bit-for-bit with the
  * composable higher-order-function forms they replace in the
  * fingerprint pipelines — including multibyte codepoint addressing
  * (charGrams mirrors substr's codepoint semantics, not byte offsets)
  * and concat_ws's skip-null behavior.
  */
class GramHashSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  private def docs = graft.Engine
    .table(spark, "/root/testdata/sf0.001", "documents")

  test("tokenGrams equals the transform/concat_ws/md5 HOF on real documents") {
    val d = docs
      .withColumn("toks", graft.queries.Tokenize.toksExpr)
      .filter(size(col("toks")) >= 10)
    val diffs = d
      .select(
        TextHashOps.gramMd5s(col("toks"), 10).as("native"),
        expr("transform(sequence(1, size(toks) - 9), i -> md5(concat_ws(' ', slice(toks, i, 10))))")
          .as("hof")
      )
      .filter(!(col("native") <=> col("hof"))) // null-safe: a null-bearing mismatch must COUNT, not vanish
      .count()
    assert(diffs == 0)
  }

  test("charGrams equals the transform/substr/md5 HOF, multibyte text included") {
    val s = spark
    import s.implicits._
    // é/ß/中 are 2-3 UTF-8 bytes: byte-offset addressing would diverge
    val extra = Seq("héllo wörld ßtraße 中文本文 abcdefgh", "ab", "ééééé", "")
      .toDF("t")
    val fromCorpus = docs.select(lower(col("text")).as("t"))
    val d = fromCorpus.union(extra).filter(length(col("t")) >= 5)
    val diffs = d
      .select(
        TextHashOps.charGramMd5s(col("t"), 5).as("native"),
        expr("transform(sequence(1, length(t) - 4), i -> md5(substr(t, i, 5)))").as("hof")
      )
      .filter(!(col("native") <=> col("hof"))) // null-safe: a null-bearing mismatch must COUNT, not vanish
      .count()
    assert(diffs == 0)
  }

  test("slidingMin equals the transform/array_min/slice HOF on fingerprint arrays") {
    val d = docs
      .withColumn("t", lower(col("text")))
      .filter(length(col("t")) >= 8)
      .withColumn("h", TextHashOps.charGramMd5s(col("t"), 5))
    val diffs = d
      .select(
        TextHashOps.slidingMin(col("h"), 4).as("native"),
        expr("transform(sequence(1, size(h) - 3), i -> array_min(slice(h, i, 4)))").as("hof")
      )
      .filter(!(col("native") <=> col("hof"))) // null-safe: a null-bearing mismatch must COUNT, not vanish
      .count()
    assert(diffs == 0)
  }

  test("tokenGramsText equals the transform/concat HOF on real documents") {
    val d = docs
      .withColumn("toks", graft.queries.Tokenize.toksExpr)
      .filter(size(col("toks")) >= 3)
    val diffs = d
      .select(
        TextHashOps.gramsText(col("toks"), 3).as("native"),
        expr("transform(sequence(1, size(toks) - 2), i -> concat(" +
          "element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))")
          .as("hof")
      )
      .filter(!(col("native") <=> col("hof"))) // null-safe: a null-bearing mismatch must COUNT, not vanish
      .count()
    assert(diffs == 0)
  }

  test("minhashSig equals the 8x array_min/transform/md5 HOF on real shingle sets") {
    val d = docs
      .withColumn("toks", graft.queries.Tokenize.toksExpr)
      .filter(size(col("toks")) >= 3)
      .withColumn(
        "sg",
        array_distinct(expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"))
      )
    val hof = array((0 until 8).map(i =>
      array_min(expr(s"transform(sg, x -> md5(concat('$i|', x)))"))): _*)
    val diffs = d
      .select(TextHashOps.minhashSig(col("sg"), 8).as("native"), hof.as("hof"))
      .filter(!(col("native") <=> col("hof"))) // null-safe: a null-bearing mismatch must COUNT, not vanish
      .count()
    assert(diffs == 0)
  }

  test("minhashSig of an empty shingle list is all-null elements, like array_min of empty") {
    val r = spark
      .sql("""SELECT graft_minhash_sig(CAST(array() AS ARRAY<STRING>), 3) AS s,
                     array_min(CAST(array() AS ARRAY<STRING>)) AS m""")
      .head()
    assert(r.getSeq[String](0) == Seq(null, null, null) && r.isNullAt(1))
  }

  test("simhash32 equals the conv/md5-prefix + 32x aggregate/filter HOF on real shingles") {
    val d = docs
      .withColumn("toks", graft.queries.Tokenize.toksExpr)
      .filter(size(col("toks")) >= 3)
      .withColumn("sg", array_distinct(TextHashOps.gramsText(col("toks"), 3)))
      .withColumn("hs", expr("transform(sg, x -> cast(conv(substr(md5(x), 1, 8), 16, 10) as bigint))"))
    val hof = expr(
      """aggregate(sequence(0, 31), 0L,
         (acc, j) -> acc + if(2 * size(filter(hs, h -> (h div shiftleft(1L, j)) % 2 = 1)) >= size(hs),
                              shiftleft(1L, j), 0L))"""
    )
    val diffs = d
      .select(TextHashOps.simhash32(col("sg")).as("native"), hof.as("hof"))
      .filter(!(col("native") <=> col("hof"))) // null-safe: a null-bearing mismatch must COUNT, not vanish
      .count()
    assert(diffs == 0)
  }

  test("the kernels are callable from SQL with literal widths") {
    def md5of(s: String): String =
      spark.sql(s"SELECT md5('$s')").head().getString(0)
    val r = spark
      .sql("""SELECT graft_gram_md5s(array('a', 'b', 'c'), 2) AS g,
                     graft_chargram_md5s('abcd', 3) AS c,
                     graft_sliding_min(array('c', 'a', 'b'), 2) AS m""")
      .head()
    assert(r.getSeq[String](0) == Seq(md5of("a b"), md5of("b c")))
    assert(r.getSeq[String](1) == Seq(md5of("abc"), md5of("bcd")))
    assert(r.getSeq[String](2) == Seq("a", "a"))
  }

  test("short inputs yield empty arrays; null inputs yield null") {
    val r = spark
      .sql("""SELECT graft_gram_md5s(array('a'), 2) AS g,
                     graft_chargram_md5s('ab', 5) AS c,
                     graft_gram_md5s(CAST(NULL AS ARRAY<STRING>), 2) AS gn""")
      .head()
    assert(r.getSeq[String](0).isEmpty && r.getSeq[String](1).isEmpty && r.isNullAt(2))
  }
}
