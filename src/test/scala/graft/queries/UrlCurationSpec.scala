package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q163/q164 on crafted fixtures: pins every canonicalization rule to an
  * exact expected string (case folding, default-port strip vs
  * non-default keep, www strip, fragment drop, trailing-slash strip,
  * tracking-param drop + param sort, registered-domain extraction), and
  * the per-domain cap to exact kept/capped counts on a skewed domain.
  */
class UrlCurationSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("urlfix-").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q163: each canonicalization rule lands its exact expected string") {
    val s = spark
    // doc_ids chosen to hit specific generator branches (mod classes)
    val dir = writeDocs(Seq(
      (0L, "t", "en", "srcA"),  // https + WWW. + :443 default(strip) + trailing / + utm + #sec
      (2L, "t", "de", "srcB"),  // Https, unsorted ?b=2&a=1 -> a=1&b=2
      (5L, "t", "fr", "srcC"),  // Https with :80 = NON-default -> port kept, domain drops it
      (10L, "t", "en", "srcD"), // HTTP with :80 = default -> stripped
      (3L, "t", "zh", "srcE")   // bare https, no port/query/frag
    ))
    val got = graft.SparkEntry.queries("q163_url_canonical")(s, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    assert(got(0L) == (("https://en.srca-press.com/en/item/0?id=0", "srca-press.com")))
    assert(got(2L) == (("https://de.srcb-press.com/de/item/2?a=1&b=2", "srcb-press.com")))
    assert(got(5L) == (("https://fr.srcc-press.com:80/fr/item/5?b=2&id=5", "srcc-press.com")))
    assert(got(10L) == (("http://en.srcd-press.com/en/item/10?a=1&b=2", "srcd-press.com")))
    assert(got(3L) == (("https://zh.srce-press.com/zh/item/3", "srce-press.com")))
  }

  test("Graft.canonicalizeUrls: the library API canonicalizes a caller-supplied url column") {
    val s = spark
    import s.implicits._
    val got = graft.Graft
      .canonicalizeUrls(Seq("HTTP://WWW.Ex.COM:80/a/?utm_x=1&b=2&a=1#frag").toDF("url"))
      .select("canon_url", "domain")
      .head()
    assert(got.getString(0) == "http://ex.com/a?a=1&b=2")
    assert(got.getString(1) == "ex.com")
  }

  test("q164: a 30-doc domain keeps exactly the cap; a 3-doc domain keeps all") {
    val s = spark
    // same (lang, source) -> same registered domain; ids 3,7,11.. avoid
    // mod-branch surprises being load-bearing (cap logic ignores them)
    val big = (0L until 30L).map(i => (i, "t", "en", "bigsite"))
    val small = (100L until 103L).map(i => (i, "t", "en", "tiny"))
    val dir = writeDocs(big ++ small)
    val rows = graft.SparkEntry.queries("q164_domain_cap")(s, dir)
      .collect().map(r => (r.getString(1), r.getString(3)))
    val byDomain = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byDomain("bigsite-press.com").count(_ == "kept") == 20)
    assert(byDomain("bigsite-press.com").count(_ == "capped") == 10)
    assert(byDomain("tiny-press.com").forall(_ == "kept"))
    assert(byDomain("tiny-press.com").size == 3)
  }
}
