package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q165 Gopher rule battery against hand-computed fixture values — the
  * corpus docs are newline/symbol-free, so the line-based and symbol
  * rules only get real coverage here: multi-line dup lines, bullet
  * starts, ellipsis ends, '#' symbols, and the degenerate all-one-word
  * repetition doc. Every expected number below is computed by hand from
  * the published integer-ppm formulas.
  */
class GopherSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  private def run(rows: Seq[(Long, String)]): Map[Long, Map[String, Any]] = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("gopherfix-").toString
    rows.map { case (i, t) => (i, t, "en", "src1") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = graft.SparkEntry.queries("q165_gopher_rules")(s, dir)
    val cols = df.columns
    df.collect().map(r => r.getLong(0) -> cols.zip(r.toSeq).toMap).toMap
  }

  test("q165: a clean 60-word doc with 2 stopwords keeps; every scalar matches by hand") {
    // 'the' + wd01..wd58 + 'with': 60 words, 239 token chars
    val clean = ("the" +: (1 to 58).map(i => f"wd$i%02d") :+ "with").mkString(" ")
    val got = run(Seq((1L, clean)))(1L)
    assert(got("verdict") == "keep")
    assert(got("n_words") == 60L)
    assert(got("mean_wlen_micro") == 239L * 1000000 / 60) // 3983333
    assert(got("symbol_ppm") == 0L)
    assert(got("alpha_ppm") == 1000000L)
    assert(got("stop_hits") == 2L)
    // all grams unique: top gram count 1, tie broken to smallest gram
    // 'the wd01' (7 chars sans space) -> 7e6 div 239
    assert(got("top2_ppm") == 7L * 1000000 / 239) // 29288
    assert(got("dup5_ppm") == 0L)
    assert(got("dup10_ppm") == 0L)
  }

  test("q165: the all-one-word doc saturates repetition rules and drops") {
    val spam = Seq.fill(60)("spam").mkString(" ")
    val got = run(Seq((2L, spam)))(2L)
    assert(got("verdict") == "drop")
    // 'spam spam' occurs 59x, 8 chars, 240 token chars
    assert(got("top2_ppm") == 59L * 8 * 1000000 / 240) // 1966666
    // every position sits under a repeated 5- and 10-gram
    assert(got("dup5_ppm") == 1000000L)
    assert(got("dup10_ppm") == 1000000L)
  }

  test("q165: duplicate lines count once-removed, by line and by chars") {
    val got = run(Seq((3L, "alpha beta\nalpha beta\ngamma delta")))(3L)
    assert(got("dup_line_ppm") == 1L * 1000000 / 3)         // 333333
    assert(got("dup_line_char_ppm") == 10L * 1000000 / 31)  // 322580
  }

  test("q165: bullets, ellipsis ends, and # symbols hit their exact ppm") {
    val text = "- first line...\n• second\nnormal # line # with hash"
    val got = run(Seq((4L, text)))(4L)
    // 7 tokens; symbols = two '#' + one '...'
    assert(got("symbol_ppm") == 3L * 1000000 / 7)   // 428571
    assert(got("bullet_ppm") == 2L * 1000000 / 3)   // 666666
    assert(got("ellipsis_ppm") == 1L * 1000000 / 3) // 333333
  }
}
