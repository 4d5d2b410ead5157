package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application — the one-pass greedy merge-rank encoder
  * that replaces the `replace()`-chain stand-in (queries/BpeOps.scala)
  * for real vocabulary sizes.
  *
  * The chain form nests one `replace(s, ' a  b ', ' ab ')` per rule: at
  * the shipped 16 rules that is ideal narrow codegen'd work, but at a
  * production tokenizer's ~50k merges a 50k-deep nested expression
  * breaks codegen/JVM method limits, and rule-at-a-time means 50k full
  * passes over every word. This kernel is the standard encoder shape
  * instead: a RANK MAP over the merge table, then per word repeatedly
  * (find the lowest-rank adjacent symbol pair; merge all its occurrences
  * in one greedy left-to-right pass) until no pair in the stream has a
  * rank. Cost is O(passes x word length) with passes <= merges APPLIED
  * (not merges in the table) — a 50k-rule table costs the same as a
  * 16-rule table on the same word.
  *
  * EQUALITY CONTRACT (BpeSpec pins it): on any merge table satisfying
  * the parts-before-use invariant — each rule's two symbols are single
  * characters or the product of EARLIER rules, the invariant every real
  * BPE merge list and every table learned by `Bpe.trainMerges` has by
  * construction — this encoder is symbol-for-symbol identical to the
  * sequential rule-at-a-time chain. Why: a merge only creates adjacency
  * pairs INVOLVING its freshly built (strictly longer) symbol, and that
  * symbol is only named by LATER rules; so new instances of rule r's
  * pair can never appear once rule r's pass has run, in either order of
  * processing — both algorithms consume ranks in increasing order with
  * one greedy left-to-right pass each. The DuckDB oracles keep the
  * chain spelling; the gates hold because of this equivalence.
  *
  * Merge-table encoding: `array<string>` of `'a|b'` entries in RANK
  * (table) order — the engine-wide pair spelling (q190's learned output,
  * the banding buckets). The split is at the FIRST '|', matching
  * `split(pr, '\\|')[0]/[1]`; symbols containing '|' are ambiguous under
  * this spelling everywhere in the engine, consistently. A null or
  * '|'-less entry fails fast rather than drifting. Duplicate pairs keep
  * their LOWEST rank (identical to the chain, where the later pass finds
  * nothing left to do).
  *
  * Symbols are Unicode CODE POINTS, exactly the `regexp_replace(w,
  * '(.)', ' $1 ')` wrap in both engines (Java regex and RE2 both match
  * `.` per code point).
  */
object BpeKernel {

  /** A compiled merge table: parallel (a, b) arrays in rank order plus
    * the rank lookup map, and the source elements for structural cache
    * revalidation. Immutable after construction.
    */
  final class Table(val elems: Array[UTF8String]) {
    val a: Array[String] = new Array[String](elems.length)
    val b: Array[String] = new Array[String](elems.length)
    // pair -> lowest rank; key is the table's own 'a|b' spelling
    val rank = new java.util.HashMap[String, Integer](elems.length * 2)
    locally {
      var i = 0
      while (i < elems.length) {
        require(elems(i) != null, s"bpe merge table: null entry at rank $i")
        val s = elems(i).toString
        val p = s.indexOf('|')
        require(p >= 0, s"bpe merge table: entry '$s' at rank $i has no '|'")
        a(i) = s.substring(0, p)
        b(i) = s.substring(p + 1)
        rank.putIfAbsent(s, Integer.valueOf(i)): Unit
        i += 1
      }
    }

    def sameElems(m: ArrayData): Boolean = {
      if (m.numElements() != elems.length) return false
      var i = 0
      while (i < elems.length) {
        if (m.isNullAt(i) || !m.getUTF8String(i).equals(elems(i))) return false
        i += 1
      }
      true
    }
  }

  def compile(m: ArrayData): Table = {
    val n = m.numElements()
    val elems = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // clone out of any shared/unsafe buffer — Table outlives the row
      elems(i) = if (m.isNullAt(i)) null else m.getUTF8String(i).clone()
      i += 1
    }
    new Table(elems)
  }

  /** Encode `word` in place into a fresh symbol array; returns the
    * surviving symbols. Greedy merge-rank loop as documented above.
    */
  def encode(word: String, t: Table): Array[String] = {
    // split into code points (the '(.)' wrap unit in both engines)
    val nCp = word.codePointCount(0, word.length)
    var syms = new Array[String](nCp)
    var ci = 0
    var off = 0
    while (off < word.length) {
      val cp = word.codePointAt(off)
      val w = Character.charCount(cp)
      syms(ci) = word.substring(off, off + w)
      ci += 1
      off += w
    }
    var n = nCp
    var done = n < 2
    while (!done) {
      // lowest-rank adjacent pair present
      var best = Int.MaxValue
      var i = 0
      while (i < n - 1) {
        val r = t.rank.get(syms(i) + "|" + syms(i + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // one greedy left-to-right pass merging (a, b), in place
        val pa = t.a(best)
        val pb = t.b(best)
        val merged = pa + pb
        var w = 0
        i = 0
        while (i < n) {
          if (i + 1 < n && syms(i) == pa && syms(i + 1) == pb) {
            syms(w) = merged
            i += 2
          } else {
            syms(w) = syms(i)
            i += 1
          }
          w += 1
        }
        n = w
        if (n < 2) done = true
      }
    }
    if (n == syms.length) syms else java.util.Arrays.copyOf(syms, n)
  }
}

/** Shared cache + type plumbing for the two BPE expressions. The
  * compiled table is cached per expression instance: a foldable merge
  * literal (the 16-rule table, a 50k artifact) hits the reference check
  * every row; a per-row array from a broadcast single-row join falls
  * back to a structural compare (O(table) string equals — trivial next
  * to encoding a document) and re-anchors the reference.
  */
trait BpeExprBase extends BinaryExpression {
  override def nullIntolerant: Boolean = true

  // single mutable slot (ref, table) so a racing task thread can never
  // observe a ref/table pair from two different generations
  @transient private var cached: (AnyRef, BpeKernel.Table) = _

  def tableFor(m: ArrayData): BpeKernel.Table = {
    val c = cached
    if (c != null && (c._1 eq m)) return c._2
    if (c != null && c._2.sameElems(m)) {
      cached = (m, c._2)
      return c._2
    }
    val t = BpeKernel.compile(m)
    cached = (m, t)
    t
  }

  protected def mergesTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }
}

/** `graft_bpe_encode(word, merges)` -> array<string>: the surviving BPE
  * symbols of one word under the rank-ordered merge table. See
  * [[BpeKernel]] for the contract.
  */
case class BpeEncode(left: Expression, right: Expression) extends BpeExprBase {
  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && mergesTypeOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode expects (string, array<string>), got (${left.dataType}, ${right.dataType})")

  def run(word: UTF8String, merges: ArrayData): ArrayData = {
    val syms = BpeKernel.encode(word.toString, tableFor(merges))
    val out = new Array[Any](syms.length)
    var i = 0
    while (i < syms.length) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(w: Any, m: Any): Any =
    run(w.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    defineCodeGen(ctx, ev, (w, m) => s"$ref.run($w, $m)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeEncode =
    copy(left = l, right = r)
}

/** `graft_bpe_doc_tokens(toks, merges)` -> bigint: a document's total
  * BPE token count — sum over its token array of each word's surviving
  * symbol count under the merge table. The document-level form exists
  * so the HOT PATH pays ONE cache lookup per document (not one per
  * token via a `transform` lambda) and no per-word array allocation;
  * it equals `aggregate(transform(toks, w -> size(graft_bpe_encode(w,
  * merges))), 0L, +)` exactly, including that form's null semantics: a
  * null token element nulls the document total (`size(null)` is null
  * and the sum absorbs it), so callers `coalesce` to match the DuckDB
  * oracles — exactly as they must around the chain spelling.
  */
case class BpeDocTokens(left: Expression, right: Expression) extends BpeExprBase {
  override def prettyName: String = "graft_bpe_doc_tokens"
  override def dataType: DataType = LongType
  // null on null inputs AND on a null token element
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (mergesTypeOk(left.dataType) && mergesTypeOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_doc_tokens expects (array<string>, array<string>), got (${left.dataType}, ${right.dataType})")

  /** boxed Long, or null when any token element is null */
  def run(toks: ArrayData, merges: ArrayData): java.lang.Long = {
    val t = tableFor(merges)
    val n = toks.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      total += BpeKernel.encode(toks.getUTF8String(i).toString, t).length
      i += 1
    }
    java.lang.Long.valueOf(total)
  }

  override def nullSafeEval(tk: Any, m: Any): Any =
    run(tk.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDocTokens", this, classOf[BpeDocTokens].getName)
    nullSafeCodeGen(
      ctx,
      ev,
      (tk, m) => s"""
        java.lang.Long ${ev.value}Tmp = $ref.run($tk, $m);
        if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}Tmp.longValue(); }
      """
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeDocTokens =
    copy(left = l, right = r)
}

/** Column facade for the BPE expressions. */
object BpeFns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def bpeEncode(word: Column, merges: Column): Column =
    column(BpeEncode(expression(word), expression(merges)))

  def bpeDocTokens(toks: Column, merges: Column): Column =
    column(BpeDocTokens(expression(toks), expression(merges)))
}
