package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two array<double> columns.
  *
  * The composable form (`aggregate(zip_with(a, b, *), 0d, +)`) allocates
  * an intermediate array per row and evaluates the lambda interpreted;
  * this expression is a single codegen'd loop over the unsafe array
  * data — the shape you want when scoring millions of candidate pairs.
  * Summation is sequential left-to-right, bit-identical to the
  * composable form (and to the explicit-formula DuckDB oracles) on
  * equal-length inputs. On UNEQUAL lengths the result is NULL — the same
  * answer the composable form gives (zip_with pads the shorter array
  * with null, so its sum is null), keeping the two forms interchangeable
  * on malformed inputs too.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  // NULL on length mismatch even when both inputs are non-null.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $s = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $s += $a.getDouble($i) * $b.getDouble($i);
        |  }
        |  ${ev.value} = $s;
        |}
        """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
