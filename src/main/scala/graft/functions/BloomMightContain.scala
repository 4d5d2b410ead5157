package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst bloom-filter membership probe:
  * `graft_bloom_contains(filterBytes, key)` over a FOLDABLE serialized
  * `org.apache.spark.util.sketch.BloomFilter` and a long key.
  *
  * This is the 100 TB join-pruning primitive (the same shape Catalyst's
  * InjectRuntimeFilter synthesizes internally, exposed as a first-class
  * function): build the filter over the small side's keys in one pass
  * (`df.stat.bloomFilter` — mergeable partial sketches, bounded memory),
  * then drop non-matching probe rows AT THE SCAN, before they pay the
  * shuffle. No false negatives ever, so `prefilter + exact join` is
  * value-identical to the exact join alone; false positives only cost
  * wasted shuffle, bounded by the configured fpp.
  *
  * The filter argument must be foldable (a literal / broadcast-sized
  * byte array): it is deserialized ONCE per expression instance — at
  * codegen time on the executor, not per row. A UDF doing
  * `bloom.mightContain` costs a Scala-function dispatch plus boxing per
  * row and blocks whole-stage codegen; this expression is a single
  * virtual call inside the generated loop.
  *
  * SIZE CEILING: the serialized filter rides the plan as a Literal AND
  * the generated code's reference array, so every task binary carries
  * ~2 copies of it. That is the right trade to ~100 MB (a few 1e8 keys
  * at 1% fpp) — beyond that, ship the filter ONCE per executor as a
  * broadcast variable probed from a deserialize-once helper (the
  * mapPartitions escape hatch), or raise fpp / shard the filter; a
  * 1.2 GB filter (1e9 keys) as a plan literal would serialize twice
  * per task binary and evict the codegen cache.
  */
case class BloomMightContain(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) if left.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (BinaryType, LongType) =>
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects a FOLDABLE serialized bloom filter (deserialized once, not per row)")
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (binary, bigint), got ($l, $r)")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  // Deserialized once per instance (per task after executor-side
  // deserialization of the plan); readFrom is a cheap array copy.
  // Option, not a bare val: a NULL binary literal must flow through the
  // expression's normal null semantics (result NULL), not NPE at
  // deserialization — doGenCode runs this eagerly at codegen time.
  @transient private lazy val filter: Option[BloomFilter] =
    Option(left.eval(null).asInstanceOf[Array[Byte]])
      .map(b => BloomFilter.readFrom(new ByteArrayInputStream(b)))

  override def nullSafeEval(filterBytes: Any, key: Any): Any =
    filter.get.mightContainLong(key.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (_, key) =>
        filter match {
          case Some(f) =>
            val ref = ctx.addReferenceObj("bloom", f, classOf[BloomFilter].getName)
            s"${ev.value} = $ref.mightContainLong($key);"
          // null filter literal: nullSafeCodeGen's guard already set
          // isNull before this body runs (left evaluates to null), so
          // the body is unreachable — emit nothing executable.
          case None => s"${ev.isNull} = true;"
        }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the bloom probe. */
object BloomOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Serialize a driver-built filter for embedding as a literal. */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    bos.toByteArray
  }

  /** `mightContainLong(key)` against a driver-built filter, codegen'd. */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    column(BloomMightContain(Literal(filterBytes, BinaryType), expression(key)))
}
