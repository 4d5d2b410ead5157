package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's per-stratum DISTRIBUTED rank — the one shape every
  * quota/selection/bucketing operator uses instead of a bare
  * `row_number() OVER (PARTITION BY stratum ORDER BY ...)`: a stratum
  * key with few distinct values (language, source, domain) would
  * funnel the corpus through that many single-task window sorts at
  * 100 TB. Here the rows range-exchange on (strata ++ order) so one
  * stratum SPANS partitions, each partition ranks locally, and a tiny
  * broadcast (stratum x partition) offset table lifts local ranks to
  * global ones — identical ranks, shuffle-parallel sort.
  *
  * Returns the input columns plus `rnk` (1-based global rank within
  * the stratum, dense over rows, deterministic given a total `order`)
  * and `n` (stratum row count). Those two names are RESERVED, as are
  * the internal `__gr_*` working names: the call fails fast if the
  * input already has any of them (silent overwrite was the round-7
  * canonicalizeUrls advice bug — not repeated here, in either form).
  *
  * Invariants this helper owns (previously hand-copied at each site):
  * partition-id order must agree with range order (spark_partition_id
  * on the ranged child), the offset window excludes the current
  * partition (rowsBetween(unboundedPreceding, -1) + coalesce 0), and
  * the offsets table is explicitly broadcast.
  */
object Ranks {

  def distributedRank(
      df: DataFrame,
      strata: Seq[String],
      order: Seq[Column],
      partitions: Int = 32): DataFrame = {
    require(
      !df.columns.contains("rnk") && !df.columns.contains("n"),
      "distributedRank reserves output columns 'rnk' and 'n'")
    require(
      !df.columns.exists(_.startsWith("__gr_")),
      "distributedRank reserves internal working columns '__gr_*'")
    val sCols = strata.map(col)
    val ranged = df
      .repartitionByRange(partitions, sCols ++ order: _*)
      .withColumn("__gr_pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("__gr_pid") +: sCols: _*).orderBy(order: _*)
    val local = ranged.withColumn("__gr_local", row_number().over(wLoc).cast("long"))
    val wOff = Window
      .partitionBy(sCols: _*)
      .orderBy(col("__gr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wN = Window.partitionBy(sCols: _*)
    val offsets = local
      .groupBy(col("__gr_pid") +: sCols: _*)
      .agg(count(lit(1)).as("__gr_pn"))
      .withColumn("__gr_off", coalesce(sum(col("__gr_pn")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("__gr_pn")).over(wN))
      .select((col("__gr_pid") +: sCols) ++ Seq(col("__gr_off"), col("n")): _*)
    local
      .join(broadcast(offsets), "__gr_pid" +: strata)
      .withColumn("rnk", col("__gr_local") + col("__gr_off"))
      .drop("__gr_pid", "__gr_local", "__gr_off")
  }

  /** The distributed sibling for running SUMS (q89 token budget, q129
    * sequence packing): exact global prefix sum of `value` in `order`,
    * via the same range-exchange + local-window + broadcast-offsets
    * shape. `inclusive = true` gives sum(rows <= current), `false` the
    * exclusive "everything BEFORE this row" start offset. Output: the
    * input columns plus `psum` (reserved name, fail-fast on clash).
    */
  def distributedPrefixSum(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      inclusive: Boolean,
      partitions: Int = 32): DataFrame = {
    require(!df.columns.contains("psum"), "distributedPrefixSum reserves output column 'psum'")
    require(
      !df.columns.exists(_.startsWith("__gr_")),
      "distributedPrefixSum reserves internal working columns '__gr_*'")
    val ranged = df
      .repartitionByRange(partitions, order: _*)
      .withColumn("__gr_pid", spark_partition_id())
    val frameEnd = if (inclusive) Window.currentRow else -1L
    val wLoc = Window
      .partitionBy(col("__gr_pid"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val local = ranged
      .withColumn("__gr_local", coalesce(sum(value).over(wLoc), lit(0L)))
    // per-partition totals: one row per partition — the offset window
    // sorts ~`partitions` rows, never the data
    val wOff = Window.orderBy(col("__gr_pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("__gr_pid"))
      .agg(sum(value).as("__gr_pt"))
      .withColumn("__gr_off", coalesce(sum(col("__gr_pt")).over(wOff), lit(0L)))
      .select(col("__gr_pid"), col("__gr_off"))
    local
      .join(broadcast(offsets), "__gr_pid")
      .withColumn("psum", col("__gr_local") + col("__gr_off"))
      .drop("__gr_pid", "__gr_local", "__gr_off")
  }
}
