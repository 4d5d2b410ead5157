package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the GramHash kernels against independent plain-Scala
  * reference implementations (codepoint-addressed substrings, UTF-8 md5,
  * unsigned-byte string order) — randomized multibyte/astral input, no
  * Spark session needed because the kernels are pure functions.
  */
object GramHashProperties extends Properties("graft.functions.GramHash") {

  private def md5hex(s: String): String =
    MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x")
      .mkString

  // well-formed codepoints only (unpaired surrogates encode differently
  // through String vs UTF8String and never reach the kernels from Spark)
  private val cpGen: Gen[Int] = Gen.oneOf(
    Gen.choose(0x20, 0x7e),      // ASCII
    Gen.choose(0xa0, 0x2ff),     // 2-byte UTF-8
    Gen.choose(0x4e00, 0x4fff),  // 3-byte (CJK)
    Gen.choose(0x1f300, 0x1f6ff) // 4-byte (astral)
  )
  private val strGen: Gen[String] =
    Gen.listOf(cpGen).map(_.flatMap(Character.toChars(_).toSeq).mkString)
  private val toksGen: Gen[List[String]] = Gen.listOf(strGen)
  private val widthGen: Gen[Int] = Gen.choose(1, 6)

  private def arr(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(x => UTF8String.fromString(x): Any).toArray)

  private def strings(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else a.getUTF8String(i).toString)

  private def codepoints(s: String): Array[String] =
    s.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  property("charGrams = md5 of every n-codepoint substring") =
    Prop.forAll(strGen, widthGen) { (s, n) =>
      val cps = codepoints(s)
      val expect =
        if (cps.length < n) Seq.empty
        else (0 to cps.length - n).map(i => md5hex(cps.slice(i, i + n).mkString))
      strings(GramHash.charGrams(UTF8String.fromString(s), n)) == expect
    }

  property("tokenGrams = md5 of space-joined k-token windows") =
    Prop.forAll(toksGen, widthGen) { (toks, k) =>
      val expect =
        if (toks.length < k) Seq.empty
        else (0 to toks.length - k).map(i => md5hex(toks.slice(i, i + k).mkString(" ")))
      strings(GramHash.tokenGrams(arr(toks), k)) == expect
    }

  property("tokenGramsText = space-joined k-token windows") =
    Prop.forAll(toksGen, widthGen) { (toks, k) =>
      val expect =
        if (toks.length < k) Seq.empty
        else (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" "))
      strings(GramHash.tokenGramsText(arr(toks), k)) == expect
    }

  property("slidingMin = min by unsigned UTF-8 byte order over each window") =
    Prop.forAll(toksGen, widthGen) { (xs, w) =>
      val byteOrd: Ordering[String] = (a: String, b: String) => {
        val x = a.getBytes(StandardCharsets.UTF_8)
        val y = b.getBytes(StandardCharsets.UTF_8)
        val n = math.min(x.length, y.length)
        var i = 0
        var r = 0
        while (i < n && r == 0) { r = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
        if (r != 0) r else x.length - y.length
      }
      val expect =
        if (xs.length < w) Seq.empty
        else (0 to xs.length - w).map(i => xs.slice(i, i + w).min(byteOrd))
      strings(GramHash.slidingMin(arr(xs), w)) == expect
    }

  property("minhashSig = per-family min of salted md5s") =
    Prop.forAll(toksGen, Gen.choose(1, 8)) { (xs, n) =>
      val expect = (0 until n).map { i =>
        if (xs.isEmpty) null else xs.map(x => md5hex(s"$i|$x")).min
      }
      strings(GramHash.minhashSig(arr(xs), n)) == expect
    }

  property("simhash32 = per-bit majority of md5-prefix 32-bit hashes") =
    Prop.forAll(toksGen) { xs =>
      val hs = xs.map(x => java.lang.Long.parseLong(md5hex(x).take(8), 16))
      val expect = (0 until 32).map { b =>
        val ones = hs.count(h => ((h >> b) & 1L) == 1L)
        if (2 * ones >= hs.length) 1L << b else 0L
      }.sum
      GramHash.simhash32(arr(xs)) == expect
    }
}
