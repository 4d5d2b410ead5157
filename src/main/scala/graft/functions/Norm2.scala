package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native squared L2 norm over an array<double> column: one codegen'd
  * pass, one array access per element. `graft_dot(x, x)` computes the
  * same value but generates TWO unsafe-array reads per element (the
  * codegen treats left and right as independent children); the
  * RewriteSelfDot optimizer rule collapses deterministic self-dots to
  * this expression, so `VectorOps.norm2` keeps its composable
  * definition and every norm in the engine gets the single-read loop.
  * Accumulation is left-to-right `v*v` adds — bit-identical to
  * DotProduct(x, x) and to the DuckDB oracles' explicit formula.
  */
case class Norm2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_norm2 expects array<double>, got $other")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
        |int $n = $a.numElements();
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $v = $a.getDouble($i);
        |  $s += $v * $v;
        |}
        |${ev.value} = $s;
        """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Norm2 =
    copy(child = newChild)
}
