package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, StringType}

/** Unicode NFC normalization as a native Catalyst expression — the
  * text-canonicalization step of a multilingual corpus pipeline
  * (decomposed accents, compatibility forms, etc. hash as DIFFERENT
  * documents until normalized, silently defeating exact dedup).
  *
  * A Scala UDF here would box to String per row and opaque the plan;
  * this expression stays inside whole-stage codegen (one static call on
  * the UTF8String) and is registered for SQL as `graft_nfc` via
  * GraftExtensions. Matches DuckDB's `nfc_normalize` for the oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"graft_nfc expects string, got $other")
    }

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code.
    * Fast path: NFC-normalized input (all ASCII is) returns the input
    * UTF8String untouched — no decode/encode round-trip on the 99% of a
    * real corpus that is already composed.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
