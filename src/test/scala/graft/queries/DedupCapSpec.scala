package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The q150 hot-bucket cap on a DEGENERATE payload fixture — the shape a
  * real image corpus produces: thousands of payloads sharing the same
  * format-header prefix, so all of them hash to ONE (bi, bv) bucket per
  * band. Without the cap that bucket fans out C(B, 2) candidate pairs
  * before the hamming filter (B = 2000 here -> 1,999,000 pairs from 2000
  * rows); with the q155-style broadcast anti-join cap the bucket is
  * dropped whole and only genuinely bounded buckets reach the self-join.
  */
class DedupCapSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  test("q150: the hot-bucket cap drops a degenerate header bucket, keeps bounded pairs") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("q150fix-").toString
    // 2000 payloads with an identical 62-byte header (tails differ only
    // past the hashed prefix -> identical ahash, one bucket of 2000 per
    // band) + one bounded near-dup pair with a DIFFERENT shared header
    val degHeader = "A" * 31 + "z" * 31
    val pairHeader = "zebra!" * 11 // 66 bytes; first 62 hashed
    val docs =
      (1L to 2000L).map(i => (i, degHeader + f"-$i%05d")) ++
        Seq((9000L, pairHeader + "-1"), (9001L, pairHeader + "-2"))
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val out = graft.SparkEntry.queries("q150_phash_neardup")(s, dir).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"degenerate fixture (2002 docs, one 2000-member bucket): ${out.length} pairs in $secs%.2f s")
    // the 2000-member degenerate bucket (> maxBucketSize 1000) is capped
    // away — none of its C(2000, 2) = 1,999,000 would-be candidate pairs
    // survive; the bounded 2-member bucket still pairs at hamming 0
    assert(out.length == 1, out.take(5).mkString(", "))
    assert(out(0).getLong(0) == 9000L && out(0).getLong(1) == 9001L && out(0).getLong(2) == 0L)
  }

  test("q187: the operating curve is monotone in the band/row trade") {
    // sharing a 4-row band implies sharing both 2-row halves, which
    // implies sharing all four 1-row bands: flagged sets are nested
    // (2x4 subset of 4x2 subset of 8x1) and the verify bill grows as
    // rows shrink — the S-curve ordering the report exists to show
    val s = graft.Engine.session("test")
    val curve = graft.SparkEntry.queries("q187_dedup_curve")(s, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (f8, p8, _) = curve("8x1")
    val (f4, p4, _) = curve("4x2")
    val (f2, p2, _) = curve("2x4")
    assert(f8 >= f4 && f4 >= f2, s"flagged not monotone: $f8 $f4 $f2")
    assert(p8 >= p4 && p4 >= p2, s"pair bill not monotone: $p8 $p4 $p2")
    assert(f8 > 0, "curve is vacuous at sf0.01")
    graft.Engine.releaseScratch(s)
  }
}
