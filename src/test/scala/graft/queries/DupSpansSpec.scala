package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q156 exact repeated-substring spans on a crafted fixture: a single
  * 25-token run shared verbatim by two documents at DIFFERENT offsets,
  * surrounded by unique text. All 16 of its 10-gram alignments hit, and
  * the run-length merge must collapse them into ONE maximal span per
  * document covering exactly the shared 25 tokens — not 16 overlapping
  * spans, not a span bleeding into the unique context.
  */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  test("q156: shared 25-token run collapses to one maximal span per doc at its own offset") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("q156fix-").toString
    val shared = (1 to 25).map(i => f"shared$i%02d").mkString(" ")
    val doc1 = ((1 to 37).map(i => f"unique$i%02d").mkString(" ") + " " + shared + " tail1 tail2")
    val doc2 = ("intro1 intro2 intro3 intro4 intro5 " + shared + " " +
      (1 to 12).map(i => f"other$i%02d").mkString(" "))
    // a third doc with no overlap — must not appear in the output
    val doc3 = (1 to 60).map(i => f"filler$i%02d").mkString(" ")
    Seq((1L, doc1), (2L, doc2), (3L, doc3))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry
      .queries("q156_dup_spans")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1: shared run occupies 1-based tokens 38..62; doc2: tokens 6..30
    assert(out.toSeq == Seq((1L, 38L, 62L, 25L), (2L, 6L, 30L, 25L)), out.mkString(", "))
  }

  test("q162 scrubs exactly the token mass q157 reports as duplicated") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val frac = graft.SparkEntry
      .queries("q157_dup_fraction")(s, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val scrub = graft.SparkEntry
      .queries("q162_span_scrub")(s, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(frac.keySet == scrub.keySet)
    frac.foreach { case (id, (nToks, dup)) =>
      val (kept, scrubbed) = scrub(id)
      assert(scrubbed == dup, s"doc $id: scrubbed $scrubbed != q157 dup $dup")
      assert(kept + scrubbed == nToks, s"doc $id: $kept + $scrubbed != $nToks")
    }
    assert(frac.values.exists(_._2 > 0), "fixture has no duplicated docs — invariant vacuous")
  }

  test("q156/q157/q158 degrade cleanly on a corpus with nothing shared") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("q156solo-").toString
    // one long doc, one short doc (below the 10-token gram floor), and
    // nothing cross-document — spans must be empty, fractions zero,
    // every eligible doc still listed
    Seq(
      (1L, (1 to 40).map(i => f"solo$i%02d").mkString(" ")),
      (2L, "tiny doc")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = graft.SparkEntry.queries("q156_dup_spans")(s, dir).collect()
    assert(spans.isEmpty, spans.mkString(", "))
    val frac = graft.SparkEntry
      .queries("q157_dup_fraction")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(frac.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 0L)), frac.mkString(", "))
    val cdc = graft.SparkEntry
      .queries("q158_cdc_dedup")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(cdc.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 0L)), cdc.mkString(", "))
  }
}
