package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side invariants for the selection-family queries — q179
  * (blocklist filter), q180 (language-balanced mixture), and q184
  * (CCNet perplexity terciles). The DuckDB hash gate is the oracle;
  * here we pin the semantics that gate can't express: word-boundary
  * matching on fixtures, verdict/count consistency, and the quota /
  * tercile arithmetic against the actual group sizes.
  */
class BlocklistMixtureSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = graft.Engine.session("test")

  test("q193: annealing really flattens — heads shrink, tails grow, epochs sum to ~1") {
    val rows = graft.SparkEntry
      .queries("q193_mixture_schedule")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(4))) // (epoch, weight)
    val byEpoch = rows.groupBy(_._1).toSeq.sortBy(_._1)
    assert(byEpoch.map(_._1) == Seq(1L, 2L, 3L, 4L))
    byEpoch.foreach { case (e, ws) =>
      val s = ws.map(_._2).sum
      // each weight is rounded to 6 decimals: sum within 5e-7/source of 1
      assert(math.abs(s - 1.0) <= 5e-7 * ws.length, s"epoch $e weights sum $s")
    }
    // temperature falls 1.0 -> 0.25 across epochs: the largest source's
    // share must not grow, the smallest's must not shrink (1-ulp-of-
    // rounding slack: weights are independently rounded to 6 decimals)
    val eps = 2e-6
    val maxes = byEpoch.map(_._2.map(_._2).max)
    val mins = byEpoch.map(_._2.map(_._2).min)
    assert(maxes.zip(maxes.tail).forall { case (a, b) => b <= a + eps }, s"head grew: $maxes")
    assert(mins.zip(mins.tail).forall { case (a, b) => b >= a - eps }, s"tail shrank: $mins")
    assert(maxes.head > maxes.last, "annealing had no effect — vacuous schedule")
    graft.Engine.releaseScratch(spark)
  }

  test("q179: verdict is exactly hits >= 1, and drops occur at sf0.01") {
    val df = graft.SparkEntry.queries("q179_blocklist")(spark, dir)
    val bad = df.filter(
      (col("hits") >= 1 && col("verdict") =!= "drop") ||
        (col("hits") === 0 && col("verdict") =!= "keep") ||
        col("terms") > col("hits")).count()
    assert(bad == 0)
    val drops = df.filter(col("verdict") === "drop").count()
    assert(drops > 0 && drops < df.count(), s"degenerate verdict split: $drops")
  }

  test("q179: token-exact — substrings and punctuation boundaries behave like C4") {
    import spark.implicits._
    val fix = Seq(
      (1L, "dedup is not a hit"),        // 'dup' inside a word: keep
      (2L, "a dup appears here"),        // exact token: drop
      (3L, "DUP, uppercase+punct"),      // tokenizer lowercases, splits punct: drop
      (4L, "spam and dup and spam"),     // multi-term, multi-hit: 3 hits, 2 terms
      (5L, "clean text only")
    ).toDF("doc_id", "text")
    val toks = Tokenize.toksExpr
    val out = fix
      .select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        expr("cast(size(filter(toks, x -> x IN ('dup', 'leak', 'spam'))) as bigint)").as("hits"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 0L))
  }

  test("q180: per-language sampled count is exactly ceil(sqrt(n))") {
    val df = graft.SparkEntry.queries("q180_lang_mixture")(spark, dir)
    val agg = df
      .groupBy(col("pred_lang"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("verdict") === "sampled", 1L).otherwise(0L)).as("sampled"),
        max(col("rnk")).as("max_rnk"))
      .collect()
    assert(agg.nonEmpty)
    agg.foreach { r =>
      val n = r.getAs[Long]("n")
      val sampled = r.getAs[Long]("sampled")
      val expected = math.ceil(math.sqrt(n.toDouble)).toLong
      assert(sampled == expected, s"${r.getString(0)}: $sampled != ceil(sqrt($n))")
      // the distributed rank is a permutation of 1..n per language
      assert(r.getAs[Long]("max_rnk") == n)
    }
    graft.Engine.releaseScratch(spark)
  }

  test("q184: terciles are balanced and ordered by score within each language") {
    val df = graft.SparkEntry.queries("q184_ccnet_buckets")(spark, dir)
    val sizes = df
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("lm_ppm")).as("lo"), max(col("lm_ppm")).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val langs = sizes.keys.map(_._1).toSet
    assert(langs.nonEmpty)
    langs.foreach { l =>
      // a language with < 3 docs legitimately lacks middle/tail buckets
      // — fail with a diagnostic, not a Map key error, if that happens
      // unexpectedly at this SF
      def bucket(b: String) = sizes.getOrElse(
        (l, b),
        fail(s"$l has no '$b' bucket (only ${sizes.keys.filter(_._1 == l).map(_._2)})"))
      val (nHead, headLo, _) = bucket("head")
      val (nMid, midLo, midHi) = bucket("middle")
      val (nTail, _, tailHi) = bucket("tail")
      // ceil-split terciles: sizes within 1 of each other
      val ns = Seq(nHead, nMid, nTail)
      assert(ns.max - ns.min <= 1, s"$l terciles unbalanced: $ns")
      // score ordering (>=, not >: ties may straddle a boundary):
      // every head score >= every middle score >= every tail score
      assert(headLo >= midHi, s"$l head/middle scores interleave")
      assert(midLo >= tailHi, s"$l middle/tail scores interleave")
    }
    graft.Engine.releaseScratch(spark)
  }

  test("q180 predictions agree with q175's confusion diagonal") {
    // q175 proves pred==lang everywhere at this SF; q180's per-language
    // totals must therefore match the lang column's distribution
    val mix = graft.SparkEntry.queries("q180_lang_mixture")(spark, dir)
      .groupBy(col("pred_lang")).agg(count(lit(1)).as("n"))
    val truth = graft.Engine.table(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val diff = mix
      .join(truth, mix("pred_lang") === truth("lang"))
      .filter(mix("n") =!= truth("n"))
      .count()
    assert(diff == 0)
    graft.Engine.releaseScratch(spark)
  }
}
