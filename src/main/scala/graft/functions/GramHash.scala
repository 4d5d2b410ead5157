package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernels for the gram-hashing expressions ([[TokenGramMd5]],
  * [[CharGramMd5]], [[SlidingMinStr]]) — the hot construction loops of
  * the fingerprint pipelines (q151 winnowing, q154 novelty, q156 exact
  * substring spans).
  *
  * The composable forms (`transform(sequence(...), i -> md5(...))`
  * higher-order functions) evaluate the lambda INTERPRETED per position:
  * every element is an `element_at`/`substr`/`concat_ws`/`md5`
  * expression-tree walk with per-call allocations — measured as the
  * dominant stage of all three pipelines at sf0.1. These kernels do one
  * pass over the raw bytes per document: tokens/codepoint offsets are
  * materialized once, each gram is hashed straight from the byte
  * buffers through a thread-local MessageDigest, and the sliding min
  * uses a monotonic deque (O(n) total, not O(n*w)). Outputs are
  * BYTE-IDENTICAL to the composable forms (md5 of the same UTF-8 bytes,
  * binary string compare for the min), so swapping them into a query
  * cannot change oracle hashes.
  */
object GramHash {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".toCharArray

  private def hex32(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** md5 hex of every k-token gram joined by a single space — element i
    * (0-based) equals `md5(concat_ws(' ', slice(toks, i + 1, k)))`,
    * including concat_ws's skip-nulls semantics. Empty result when
    * fewer than k tokens (callers filter `size(toks) >= k` first; the
    * HOF form's descending-sequence quirk below k is never exercised).
    */
  def tokenGrams(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = md5Local.get()
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      md.reset()
      var first = true
      var j = i
      while (j < i + k) {
        if (tb(j) != null) {
          if (!first) md.update(' '.toByte)
          md.update(tb(j))
          first = false
        }
        j += 1
      }
      out(i) = hex32(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** md5 hex of every n-codepoint substring — element i (0-based)
    * equals `md5(substr(s, i + 1, n))` (codepoint-addressed, exactly
    * Spark's substr). Empty result when the string is shorter than n
    * codepoints. Codepoint byte offsets are computed once; each gram
    * hashes a byte slice directly.
    */
  def charGrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // offsets(c) = byte offset of codepoint c; UTF-8 continuation bytes
    // are 10xxxxxx — exactly the bytes that do NOT start a codepoint
    var chars = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) chars += 1
      b += 1
    }
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](chars + 1)
    var c = 0
    b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) { off(c) = b; c += 1 }
      b += 1
    }
    off(chars) = bytes.length
    val md = md5Local.get()
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i <= chars - n) {
      md.reset()
      md.update(bytes, off(i), off(i + n) - off(i))
      out(i) = hex32(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Every k-token gram as TEXT joined by single spaces — element i
    * (0-based) equals `concat(toks[i+1], ' ', ..., toks[i+k])`,
    * including concat's null propagation (any null token nulls the
    * gram). The shingle-construction loop of the MinHash/decontam
    * family, without the per-position interpreted lambda.
    */
  def tokenGramsText(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      var len = k - 1
      var anyNull = false
      var j = i
      while (j < i + k) {
        if (tb(j) == null) anyNull = true else len += tb(j).length
        j += 1
      }
      if (!anyNull) {
        val buf = new Array[Byte](len)
        var p = 0
        j = i
        while (j < i + k) {
          if (j > i) { buf(p) = ' '.toByte; p += 1 }
          System.arraycopy(tb(j), 0, buf, p, tb(j).length)
          p += tb(j).length
          j += 1
        }
        out(i) = UTF8String.fromBytes(buf)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over a shingle array — element i (0-based)
    * equals `array_min(transform(sg, x -> md5(concat('i|', x))))`: the
    * minimum md5 hex over the shingles, under the i-th salt prefix.
    * One pass over the shingle bytes computes ALL n families (the HOF
    * form walks the array n times with an interpreted lambda each).
    * Null shingles are skipped (md5(concat('i|', NULL)) is NULL and
    * array_min ignores nulls); an empty/all-null shingle list yields
    * null elements, exactly like array_min of an empty array.
    */
  def minhashSig(sg: ArrayData, n: Int): ArrayData = {
    val m = sg.numElements()
    val md = md5Local.get()
    val mins = new Array[UTF8String](n)
    // salt prefixes ("<digits of i>|" as bytes) hoisted out of the
    // (shingle x family) hot loop — one tiny allocation per family per
    // CALL, not per shingle
    val salts = new Array[Array[Byte]](n)
    var si = 0
    while (si < n) {
      salts(si) = (Integer.toString(si) + "|").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      si += 1
    }
    var j = 0
    while (j < m) {
      if (!sg.isNullAt(j)) {
        val xb = sg.getUTF8String(j).getBytes
        var i = 0
        while (i < n) {
          md.reset()
          md.update(salts(i))
          md.update(xb)
          val h = hex32(md.digest())
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash over a shingle array: per-bit majority vote over
    * `cast(conv(substr(md5(x), 1, 8), 16, 10) as bigint)` — the first 4
    * md5 digest bytes as an unsigned 32-bit hash. Equals the composable
    * `aggregate(sequence(0, 31), ...)` form bit-for-bit, including its
    * tie rule (2 * ones >= total sets the bit) and its null accounting
    * (a null shingle contributes to the total but never to the ones,
    * exactly like transform's null element surviving into size(hs)
    * while filter drops it). One md5 per shingle, one pass, instead of
    * 32 interpreted filter walks over the hash array.
    */
  def simhash32(sg: ArrayData): Long = {
    val m = sg.numElements()
    val md = md5Local.get()
    val ones = new Array[Int](32)
    var j = 0
    while (j < m) {
      if (!sg.isNullAt(j)) {
        md.reset()
        md.update(sg.getUTF8String(j).getBytes)
        val d = md.digest()
        val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((v >> b) & 1L) == 1L) ones(b) += 1
          b += 1
        }
      }
      j += 1
    }
    var acc = 0L
    var b = 0
    while (b < 32) {
      if (2 * ones(b) >= m) acc += 1L << b
      b += 1
    }
    acc
  }

  /** Minimum string of every w-wide sliding window — element i
    * (0-based) equals `array_min(slice(arr, i + 1, w))` under binary
    * UTF8String comparison. Monotonic-deque implementation: each
    * element enters and leaves the deque once, O(n) total. Null
    * elements are ignored like array_min ignores them (the fingerprint
    * pipelines never produce nulls; an all-null window yields null).
    */
  def slidingMin(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val vals = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      vals(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](n - w + 1)
    val dq = new Array[Int](n) // indices, increasing value order
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < n) {
      if (vals(i) != null) {
        while (tail > head && vals(dq(tail - 1)).compareTo(vals(i)) >= 0) tail -= 1
        dq(tail) = i
        tail += 1
      }
      if (head < tail && dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = if (head < tail) vals(dq(head)) else null
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait GramHashExpr extends UnaryExpression {
  def width: Int
  def kernel: String // GramHash method name, also the codegen call target

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHash.$kernel($c, $width)")
}

/** Column facade for the gram-hash kernels. */
object TextHashOps {

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  import org.apache.spark.sql.Column

  def gramMd5s(toks: Column, k: Int): Column = column(TokenGramMd5(expression(toks), k))

  /** LSH band buckets over a MinHash signature: `bands` buckets, each
    * the md5 of `rows` consecutive signature entries concatenated —
    * THE banding scheme every fuzzy-dedup operator shares (q52's 4x2
    * is bandBuckets(sig, 4, 2)). One definition, because the band
    * layout is a cross-module contract: the oracles spell the same
    * concatenation, and an edit here without an oracle edit fails the
    * hash gate loudly instead of drifting silently.
    */
  def bandBuckets(sig: Column, bands: Int, rows: Int): Column = {
    import org.apache.spark.sql.functions.{array, concat, md5}
    array((0 until bands).map { b =>
      md5(concat((b * rows until (b + 1) * rows).map(i => sig.getItem(i)): _*))
    }: _*)
  }

  /** DuckDB oracle mirror of [[minhashSig]]: the n-hash MinHash
    * signature list over a shingle-list column — each entry is the
    * list-min of seed-prefixed md5s (`md5('i|' || x)`), exactly the
    * kernel's hash family. ONE definition site: before round 9 this
    * block was copy-pasted verbatim into seven oracle strings
    * (q52-family, q167, q173, q176, q185, q187), so one edited seed in
    * one copy would silently break the cross-query no-drift guarantee
    * the shared Spark-side [[minhashSig]] exists to give.
    */
  def sigSql(sgCol: String = "sg", n: Int = 8): String =
    (0 until n)
      .map(i => s"list_min(list_transform($sgCol, x -> md5('$i|' || x)))")
      .mkString("[", ",\n                  ", "]")

  /** DuckDB oracle mirror of [[bandBuckets]] (1-based SQL indexing):
    * an `unnest` of `bands` bucket ids, each the md5 of `rows`
    * consecutive signature entries concatenated — the same band layout
    * contract, from the same definition site as [[sigSql]].
    */
  def bandBucketsSql(sigCol: String, bands: Int, rows: Int): String =
    "unnest([" + (0 until bands)
      .map { b =>
        "md5(" + (b * rows until (b + 1) * rows)
          .map(i => s"$sigCol[${i + 1}]")
          .mkString(" || ") + ")"
      }
      .mkString(", ") + "])"
  def charGramMd5s(s: Column, n: Int): Column = column(CharGramMd5(expression(s), n))
  def slidingMin(arr: Column, w: Int): Column = column(SlidingMinStr(expression(arr), w))
  def minhashSig(sg: Column, n: Int): Column = column(MinHashSig(expression(sg), n))
  def gramsText(toks: Column, k: Int): Column = column(TokenGramText(expression(toks), k))
  def simhash32(sg: Column): Column = column(SimHash32(expression(sg)))
}

/** `graft_gram_md5s(toks, k)` — see [[GramHash.tokenGrams]]. */
case class TokenGramMd5(child: Expression, width: Int) extends GramHashExpr {
  override def kernel: String = "tokenGrams"
  override def prettyName: String = "graft_gram_md5s"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if width >= 1 => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_gram_md5s expects (array<string>, k >= 1), got ($t, $width)")
  }

  override def nullSafeEval(a: Any): Any = GramHash.tokenGrams(a.asInstanceOf[ArrayData], width)

  override protected def withNewChildInternal(newChild: Expression): TokenGramMd5 =
    copy(child = newChild)
}

/** `graft_chargram_md5s(s, n)` — see [[GramHash.charGrams]]. */
case class CharGramMd5(child: Expression, width: Int) extends GramHashExpr {
  override def kernel: String = "charGrams"
  override def prettyName: String = "graft_chargram_md5s"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if width >= 1 => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_chargram_md5s expects (string, n >= 1), got ($t, $width)")
  }

  override def nullSafeEval(a: Any): Any = GramHash.charGrams(a.asInstanceOf[UTF8String], width)

  override protected def withNewChildInternal(newChild: Expression): CharGramMd5 =
    copy(child = newChild)
}

/** `graft_simhash32(sg)` — see [[GramHash.simhash32]]. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_simhash32"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_simhash32 expects array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any = GramHash.simhash32(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHash.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** `graft_gram_text(toks, k)` — see [[GramHash.tokenGramsText]]. */
case class TokenGramText(child: Expression, width: Int) extends GramHashExpr {
  override def kernel: String = "tokenGramsText"
  override def prettyName: String = "graft_gram_text"

  // concat semantics: a null token nulls its gram
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if width >= 1 => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_gram_text expects (array<string>, k >= 1), got ($t, $width)")
  }

  override def nullSafeEval(a: Any): Any = GramHash.tokenGramsText(a.asInstanceOf[ArrayData], width)

  override protected def withNewChildInternal(newChild: Expression): TokenGramText =
    copy(child = newChild)
}

/** `graft_minhash_sig(sg, n)` — see [[GramHash.minhashSig]]. */
case class MinHashSig(child: Expression, width: Int) extends GramHashExpr {
  override def kernel: String = "minhashSig"
  override def prettyName: String = "graft_minhash_sig"

  // empty/all-null shingle lists yield null min elements
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if width >= 1 => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_minhash_sig expects (array<string>, n >= 1), got ($t, $width)")
  }

  override def nullSafeEval(a: Any): Any = GramHash.minhashSig(a.asInstanceOf[ArrayData], width)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `graft_sliding_min(arr, w)` — see [[GramHash.slidingMin]]. */
case class SlidingMinStr(child: Expression, width: Int) extends GramHashExpr {
  override def kernel: String = "slidingMin"
  override def prettyName: String = "graft_sliding_min"

  // windows can be all-null in principle -> element nullability on
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if width >= 1 => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_sliding_min expects (array<string>, w >= 1), got ($t, $width)")
  }

  override def nullSafeEval(a: Any): Any = GramHash.slidingMin(a.asInstanceOf[ArrayData], width)

  override protected def withNewChildInternal(newChild: Expression): SlidingMinStr =
    copy(child = newChild)
}
