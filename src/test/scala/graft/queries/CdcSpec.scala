package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q158 content-defined chunking on a crafted fixture: boundaries are
  * content-aligned, so a PREFIX INSERTION — which shifts every fixed
  * stride-k tile (q100's scheme) out of alignment — leaves the shared
  * suffix chunked identically and still detected as duplicated. This is
  * the rsync/LBFS property the operator exists for.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  test("q158: a prefix insertion still shares most chunk mass; unrelated text shares none") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("q158fix-").toString
    val rng = new scala.util.Random(42)
    def words(n: Int, tag: String) =
      (1 to n).map(_ => tag + rng.nextInt(5000)).mkString(" ")
    val base = words(200, "w") // ~1200 chars of shared content
    val shifted = "inserted prefix of thirty-one chars " + base
    val unrelated = words(200, "z")
    Seq((1L, base), (2L, shifted), (3L, unrelated))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry
      .queries("q158_cdc_dedup")(s, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (n1, s1, ppm1) = out(1L)
    val (n2, s2, ppm2) = out(2L)
    val (_, s3, ppm3) = out(3L)
    info(s"base: $n1 chunks, $s1 shared (${ppm1} ppm); shifted: $n2 chunks, $s2 shared (${ppm2} ppm)")
    // the insertion can only disturb chunks up to the first boundary
    // after it — the bulk of both docs' character mass must match
    assert(ppm1 > 800000L, s"base shares only $ppm1 ppm with its shifted copy")
    assert(ppm2 > 800000L, s"shifted copy shares only $ppm2 ppm")
    // the unrelated doc may share a few TINY byte-identical chunks
    // (digit/space runs both vocabularies produce — real duplicates,
    // the min-chunk-size knob production CDC adds would suppress them)
    // but never meaningful character mass
    assert(ppm3 < 30000L, s"unrelated doc shares $s3 chunks at $ppm3 ppm — not marginal")
  }
}
