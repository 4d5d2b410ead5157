package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q166 alignment geometry on a crafted fixture: an embedding equal to
  * the caption's own hashed bag-of-words vector must score exactly
  * +1000 milli-cosine (the integer pipeline is exact there: dot_micro =
  * nc*1e6, ne_micro = nc*1e6 => cos = 1), its negation exactly -1000,
  * and an orthogonal vector (mass on buckets the caption never hashes
  * to) exactly 0.
  */
class CaptionAlignSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  /** the operator's bucket function: first 4 md5 hex chars % 64 */
  private def bucket(tok: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (Integer.parseInt(hex.take(4), 16) % 64)
  }

  test("q166: parallel, anti-parallel, and orthogonal embeddings score +1000/-1000/0") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("alignfix-").toString
    val caption = "alpha beta beta gamma gamma gamma"
    val counts = new Array[Float](64)
    caption.split(" ").foreach(t => counts(bucket(t)) += 1f)
    val used = caption.split(" ").map(bucket).toSet
    val freeBucket = (0 until 64).find(!used.contains(_)).get
    val ortho = new Array[Float](64)
    ortho(freeBucket) = 3f
    Seq((1L, caption, "en", "s"), (2L, caption, "en", "s"), (3L, caption, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq(
      (1L, counts.toSeq, 0),
      (2L, counts.map(-_).toSeq, 0),
      (3L, ortho.toSeq, 0)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.SparkEntry.queries("q166_caption_align")(s, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == ((1000L, "aligned")))
    assert(got(2L) == ((-1000L, "rejected")))
    assert(got(3L) == ((0L, "aligned"))) // boundary: cos 0 passes the >= 0 gate
  }
}
