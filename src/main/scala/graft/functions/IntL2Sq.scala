package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst squared L2 distance over two array<bigint> columns:
  * sum_j (a_j - b_j)^2, in Long arithmetic.
  *
  * This is the hot inner loop of the exact-integer k-means assignment
  * (q147/q148) and the engine's other integer-vector distances: the
  * composable form (`aggregate(sequence(1, size(a)), 0L, ...)` with two
  * `element_at` calls per term) evaluates the lambda interpreted —
  * measured ~10 us per 64-dim evaluation, which at (vectors x
  * centroids) volume turns the Lloyd assign into the plan's dominant
  * stage. This expression is one codegen'd loop over the unsafe array
  * data. Overflow wraps in Long exactly like the composable form (the
  * micro-unit encoding keeps diffs < 2^23, so 64-dim sums stay < 2^53
  * — far from wrapping). NULL on length mismatch, and NULL when either
  * array contains a NULL element — matching the replaced HOF, where a
  * null element poisons the `aggregate` accumulator to NULL. (The
  * producing `transform(cast(...))` expressions are typed
  * containsNull=true even though the data never holds nulls, so the
  * check must be per-element at runtime, not a rejection in
  * checkInputDataTypes.)
  */
case class IntL2Sq(left: Expression, right: Expression) extends BinaryExpression {

  // NULL on length mismatch even when both inputs are non-null.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
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
        val d = ctx.freshName("d")
        s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  long $s = 0L;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    long $d = $a.getLong($i) - $b.getLong($i);
        |    $s += $d * $d;
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $s; }
        |}
        """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntL2Sq =
    copy(left = newLeft, right = newRight)
}
