package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns using codegen'd higher-order
  * functions (no UDFs): dot product, norms, cosine similarity.
  *
  * The accumulation is sequential left-to-right (`aggregate`), which both
  * keeps results deterministic and matches the explicit-formula DuckDB
  * oracles. At 100 TB these run inside whole-stage codegen over the
  * scan — no shuffle, no JVM boxing beyond the array itself.
  */
object VectorOps {

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** codegen'd native loop (graft.functions.DotProduct) */
  def dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))

  /** the composable higher-order-function form — same value bit-for-bit,
    * kept for cross-checking the native expression in tests
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** codegen'd exact-integer squared L2 over array<bigint>
    * (graft.functions.IntL2Sq) — the k-means/PQ hot loop
    */
  def l2sqLong(a: Column, b: Column): Column = column(IntL2Sq(expression(a), expression(b)))

  /** cosine = dot / sqrt(|a|^2 * |b|^2) — formula mirrored in oracles. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / sqrt(norm2(a) * norm2(b))
}
