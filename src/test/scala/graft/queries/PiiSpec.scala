package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q171/q172 on crafted fixtures: span offsets re-sliced from the
  * augmented text must equal the matched strings; the decoy branch
  * (999.999.999.999, 555-12, v1.2.3) must yield zero spans; masks are
  * typed; the density rule drops short all-PII docs and keeps long
  * ones.
  */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("piifix-").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // one doc per generator branch: email(+second email), phone-paren,
  // phone-dashed, ipv4, decoy, mixed email+ip
  private val fixture = Seq(
    (0L, "alpha beta", "en", "srcA"),  // %5=0, %10=0 -> two emails
    (6L, "gamma", "fr", "srcB"),      // %5=1, %2=0 -> (555) paren phone
    (11L, "delta", "de", "srcC"),     // %5=1, %2=1 -> dashed phone
    (7L, "epsilon", "es", "srcD"),    // %5=2 -> ipv4
    (3L, "zeta", "zh", "srcE"),       // %5=3 -> decoy, zero spans
    (9L, "eta", "en", "srcF")         // %5=4 -> mixed email + ip
  )

  test("q171: every span re-slices to its matched string; decoy doc has none") {
    val s = spark
    val dir = writeDocs(fixture)
    // reconstruct aug per doc from the redact query's clean/text is
    // indirect — instead re-derive aug with the same generator branch
    // by querying spans and slicing the augmented text rebuilt below.
    val spans = graft.SparkEntry.queries("q171_pii_spans")(s, dir).collect()
    assert(!spans.exists(_.getLong(0) == 3L), "decoy doc must produce no spans")
    // doc 0: two email spans; doc 9: one email + one ipv4
    assert(spans.count(r => r.getLong(0) == 0L && r.getString(1) == "email") == 2)
    assert(spans.count(r => r.getLong(0) == 9L && r.getString(1) == "email") == 1)
    assert(spans.count(r => r.getLong(0) == 9L && r.getString(1) == "ipv4") == 1)
    assert(spans.count(r => r.getLong(0) == 6L && r.getString(1) == "phone") == 1)
    assert(spans.count(r => r.getLong(0) == 11L && r.getString(1) == "phone") == 1)
    // offsets: slice the augmented text and compare to `matched` — the
    // generator is referenced, not copied, so it cannot drift
    import org.apache.spark.sql.functions._
    val aug = graft.Engine.table(s, dir, "documents")
      .select(col("doc_id"), expr(PiiOps.piiGenSql).as("aug"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    spans.foreach { r =>
      val (id, start, end, m) = (r.getLong(0), r.getLong(3).toInt, r.getLong(4).toInt, r.getString(5))
      assert(aug(id).substring(start, end) == m, s"doc $id span [$start,$end) != $m")
    }
  }

  test("q172: typed masks land, counts are exact, decoy text is untouched") {
    val s = spark
    val dir = writeDocs(fixture)
    val rows = graft.SparkEntry.queries("q172_pii_redact")(s, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getString(1).contains("<EMAIL>") && rows(0L).getLong(2) == 2L)
    assert(rows(6L).getString(1).contains("<PHONE>") && rows(6L).getLong(3) == 1L)
    assert(rows(7L).getString(1).contains("<IP>") && rows(7L).getLong(4) == 1L)
    val decoy = rows(3L)
    assert(decoy.getString(1).contains("999.999.999.999") && decoy.getLong(5) == 0L,
      "decoy must survive unmasked with zero masked chars")
    assert(rows(9L).getString(1).contains("<EMAIL>") && rows(9L).getString(1).contains("<IP>"))
  }

  test("piiClean: overlapping matches count sequentially, never double") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // an IPv4 embedded INSIDE an email address: the email mask consumes
    // the whole thing, so n_ipv4 must be 0 and masked_chars must equal
    // the real delta — per-pattern counting over the raw text would
    // report n_ipv4 = 1 and inflate the density
    val aug = Seq((1L, "reach x.1.2.3.4@b.co or 10.0.0.1 now")).toDF("doc_id", "aug")
    val r = PiiOps.piiClean(aug).collect().head
    val clean = r.getAs[String]("clean_text")
    assert(clean == "reach <EMAIL> or <IP> now", clean)
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_ipv4") == 1L, "only the standalone IP counts")
    // masked chars = the two real match lengths: 'x.1.2.3.4@b.co' (14) + '10.0.0.1' (8)
    assert(r.getAs[Long]("masked_chars") == 22L, r.getAs[Long]("masked_chars").toString)
  }

  test("q172: density rule drops a short all-PII doc, keeps a long doc") {
    val s = spark
    // doc 10 (%5=0, %10=0): two emails over a 1-char text -> high ppm;
    // doc 20 (%5=0, %10=0): same branch over a long text -> low ppm
    val dir = writeDocs(Seq(
      (10L, "x", "en", "s"),
      (20L, "y " * 400, "en", "s")
    ))
    val rows = graft.SparkEntry.queries("q172_pii_redact")(s, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    assert(!rows(10L), "short all-PII doc must be dropped")
    assert(rows(20L), "long doc with incidental PII must be kept")
  }
}
