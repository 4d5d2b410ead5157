package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomMightContain, BpeDocTokens, BpeEncode, CharGramMd5, DotProduct, IntL2Sq, MinHashSig, NfcNormalize, Norm2, SimHash32, SlidingMinStr, TokenGramMd5, TokenGramText}

/** Session extensions registering graft's native Catalyst functions so
  * they are callable from SQL (`SELECT graft_dot(a, b)`) as well as the
  * Column API, plus the RewriteSelfDot optimizer rule (self-dot ->
  * single-pass norm). Installed by Engine.session via .withExtensions;
  * also loadable with spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (args: Seq[Expression]) => DotProduct(args(0), args(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_norm2"),
        new ExpressionInfo(classOf[Norm2].getName, "graft_norm2"),
        (args: Seq[Expression]) => Norm2(args.head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_l2sq"),
        new ExpressionInfo(classOf[IntL2Sq].getName, "graft_l2sq"),
        (args: Seq[Expression]) => IntL2Sq(args(0), args(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
        (args: Seq[Expression]) => NfcNormalize(args.head)
      )
    )
    // the gram-hash kernels take their width as a foldable int literal
    def litInt(e: Expression, fn: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(s"$fn expects a literal int width, got $other")
    }
    e.injectFunction(
      (
        FunctionIdentifier("graft_gram_md5s"),
        new ExpressionInfo(classOf[TokenGramMd5].getName, "graft_gram_md5s"),
        (args: Seq[Expression]) => TokenGramMd5(args(0), litInt(args(1), "graft_gram_md5s"))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_chargram_md5s"),
        new ExpressionInfo(classOf[CharGramMd5].getName, "graft_chargram_md5s"),
        (args: Seq[Expression]) => CharGramMd5(args(0), litInt(args(1), "graft_chargram_md5s"))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_simhash32"),
        new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
        (args: Seq[Expression]) => SimHash32(args.head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_gram_text"),
        new ExpressionInfo(classOf[TokenGramText].getName, "graft_gram_text"),
        (args: Seq[Expression]) => TokenGramText(args(0), litInt(args(1), "graft_gram_text"))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
        (args: Seq[Expression]) => MinHashSig(args(0), litInt(args(1), "graft_minhash_sig"))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_sliding_min"),
        new ExpressionInfo(classOf[SlidingMinStr].getName, "graft_sliding_min"),
        (args: Seq[Expression]) => SlidingMinStr(args(0), litInt(args(1), "graft_sliding_min"))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_bpe_encode"),
        new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe_encode"),
        (args: Seq[Expression]) => BpeEncode(args(0), args(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_bpe_doc_tokens"),
        new ExpressionInfo(classOf[BpeDocTokens].getName, "graft_bpe_doc_tokens"),
        (args: Seq[Expression]) => BpeDocTokens(args(0), args(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_bloom_contains"),
        new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
        (args: Seq[Expression]) => BloomMightContain(args(0), args(1))
      )
    )
    e.injectOptimizerRule(_ => graft.plans.RewriteSelfDot)
    // whole-operator extension (Expression -> Rule -> Strategy/SparkPlan
    // tiers all exercised): pure range-containment joins against a small
    // interval table plan as a broadcast stabbing index, O(log I + k)
    // per probe row, instead of BroadcastNestedLoopJoin's O(I)
    e.injectPlannerStrategy(s => graft.plans.IntervalStabJoin.Strat(s))
  }
}
