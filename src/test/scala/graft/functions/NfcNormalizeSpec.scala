package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  test("composes decomposed sequences; idempotent; null-safe; SQL-registered") {
    import spark.implicits._
    val df = Seq(
      ("café", "café"),     // e + combining acute -> é
      ("naïve", "naïve"),   // i + combining diaeresis -> ï
      ("ascii only", "ascii only"),
      ("édéjà", "édéjà") // already composed
    ).toDF("raw", "expected")
    val got = df.select(StringFns.nfc(col("raw")).as("n"), col("expected")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
    // idempotent
    val twice = df.select((StringFns.nfc(StringFns.nfc(col("raw"))) === StringFns.nfc(col("raw"))).as("ok"))
    assert(twice.collect().forall(_.getBoolean(0)))
    // null in, null out
    assert(spark.sql("SELECT graft_nfc(CAST(NULL AS STRING))").head().isNullAt(0))
    // SQL registration matches the Column API
    assert(spark.sql("SELECT graft_nfc('café')").head().getString(0) == "café")
  }

  test("interpreted eval matches codegen output") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("x́ÿ café")
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(s, org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }
}
