package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Whole-operator Catalyst extension (SURVEY §7.2 tier (c): custom
  * LogicalPlan pattern -> SparkStrategy -> SparkPlan) for the
  * "interval stab" band join: an inner join whose condition is a pure
  * range containment `lo <= p AND p < hi` (any mix of strict/inclusive
  * bounds, either operand order) against a SMALL interval relation,
  * with NO equi-conjunct.
  *
  * Why Spark needs help here: with no equality key, the builtin planner
  * can only produce BroadcastNestedLoopJoin, which evaluates the range
  * predicate against EVERY interval for EVERY probe row — O(P * I).
  * The right algorithm for static intervals is an index: sort the
  * intervals by lower bound once, binary-search each probe point for
  * the last candidate (O(log I)), and walk backward only while the
  * running-maximum upper bound still covers the point — O(log I + k)
  * per row, the classic stabbing query. At 100 TB the probe side
  * streams through executors untouched; only the tiny interval table
  * is broadcast, exactly like a broadcast hash join.
  *
  * Safety guards (when the strategy declines and Spark's planner takes
  * over): non-inner joins, streaming inputs, any equality conjunct
  * between the sides (a hash join on the equality key beats scanning
  * per-key interval lists), both sides above the broadcast threshold,
  * or bound/point types that differ or are not orderable atomics.
  * Residual non-range conjuncts are kept and evaluated per candidate.
  *
  * The reference has no joins at all (SURVEY §2.3) — this is north-star
  * surface, registered through `GraftExtensions.injectPlannerStrategy`
  * and gate-verified by q66/q146 against DuckDB's own inequality join.
  */
object IntervalStabJoin {

  /** One normalized range bound: `point` compared against `bound`,
    * `inclusive` true for <= / >=.
    */
  private final case class Bound(point: Expression, bound: Expression, inclusive: Boolean)

  private def asLower(e: Expression): Option[Bound] = e match {
    case LessThanOrEqual(b, p)    => Some(Bound(p, b, inclusive = true))  // b <= p
    case LessThan(b, p)           => Some(Bound(p, b, inclusive = false)) // b < p
    case GreaterThanOrEqual(p, b) => Some(Bound(p, b, inclusive = true))  // p >= b
    case GreaterThan(p, b)        => Some(Bound(p, b, inclusive = false)) // p > b
    case _                        => None
  }

  private def asUpper(e: Expression): Option[Bound] = e match {
    case LessThanOrEqual(p, b)    => Some(Bound(p, b, inclusive = true))  // p <= b
    case LessThan(p, b)           => Some(Bound(p, b, inclusive = false)) // p < b
    case GreaterThanOrEqual(b, p) => Some(Bound(p, b, inclusive = true))  // b >= p
    case GreaterThan(b, p)        => Some(Bound(p, b, inclusive = false)) // b > p
    case _                        => None
  }

  /** The planner strategy. Tried before Spark's builtin join strategies
    * (extension strategies run first); returning Nil falls through.
    */
  /** Orderable atomic types the index supports. Comparisons use
    * Catalyst's interpreted ordering for the type — the same ordering
    * `BinaryComparison.eval` uses — so SQL semantics (-0.0 == 0.0 and
    * NaN-greatest for Float/Double, collation-aware strings) match the
    * builtin join this plan replaces by construction. Complex types are
    * out of scope.
    */
  private def comparableAtomic(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
        BooleanType | TimestampType | TimestampNTZType | DateType | BinaryType => true
    case _: DecimalType => true
    case _: StringType => true
    case _ => false
  }

  final case class Strat(session: SparkSession) extends SparkStrategy with PredicateHelper {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case Join(left, right, Inner, Some(cond), _)
          if !left.isStreaming && !right.isStreaming =>
        val conjuncts = splitConjunctivePredicates(cond)
        // an equality between the sides means a hash join is the better
        // plan — stand down
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) => spansBoth(a, b, left, right)
          case EqualNullSafe(a, b) => spansBoth(a, b, left, right)
          case _ => false
        }
        if (hasEqui) return Nil
        val threshold = SQLConf.get.autoBroadcastJoinThreshold
        if (threshold <= 0) return Nil
        // try every (lower, upper) conjunct pair sharing the same point
        val pairs = for {
          l <- conjuncts; lo <- asLower(l).toSeq
          u <- conjuncts; if u ne l
          up <- asUpper(u).toSeq
          if lo.point.semanticEquals(up.point)
        } yield (l, u, lo, up)
        pairs.collectFirst(Function.unlift { case (l, u, lo, up) =>
          plan0(left, right, conjuncts.filterNot(c => (c eq l) || (c eq u)), lo, up, threshold)
        }).toSeq.flatten
      case _ => Nil
    }

    private def spansBoth(a: Expression, b: Expression,
        left: LogicalPlan, right: LogicalPlan): Boolean =
      // both operands must actually touch opposite sides — a literal or
      // single-sided equality is a filter, not a join key, and must not
      // make the strategy stand down
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))

    private def plan0(
        left: LogicalPlan,
        right: LogicalPlan,
        rest: Seq[Expression],
        lo: Bound,
        up: Bound,
        threshold: Long): Option[Seq[SparkPlan]] = {
      val tOk = lo.point.dataType == lo.bound.dataType &&
        lo.point.dataType == up.bound.dataType &&
        comparableAtomic(lo.point.dataType) &&
        lo.point.deterministic && lo.bound.deterministic && up.bound.deterministic
      if (!tOk) return None
      def refs(e: Expression, p: LogicalPlan) = e.references.subsetOf(p.outputSet)
      val small = (p: LogicalPlan) => p.stats.sizeInBytes <= threshold
      // probe = the side the point comes from; build = the interval side
      if (refs(lo.point, left) && refs(lo.bound, right) && refs(up.bound, right) && small(right))
        Some(Seq(IntervalStabJoinExec(
          planLater(left), planLater(right), probeIsLeft = true,
          lo.point, lo.bound, up.bound, lo.inclusive, up.inclusive, rest)))
      else if (refs(lo.point, right) && refs(lo.bound, left) && refs(up.bound, left) && small(left))
        Some(Seq(IntervalStabJoinExec(
          planLater(right), planLater(left), probeIsLeft = false,
          lo.point, lo.bound, up.bound, lo.inclusive, up.inclusive, rest)))
      else None
    }
  }
}

/** Physical interval-stab join. The build (interval) side is collected
  * to the driver (bounded by the broadcast threshold, like any
  * broadcast join), sorted by lower bound with a running maximum of
  * upper bounds, and broadcast; each probe partition binary-searches
  * per row and walks back only while the max-upper prefix still covers
  * the point. Interpreted (non-codegen) evaluation: the per-row cost is
  * O(log I + k) comparisons on the broadcast index, not the O(I)
  * predicate evaluations BroadcastNestedLoopJoin pays.
  */
final case class IntervalStabJoinExec(
    probe: SparkPlan,
    build: SparkPlan,
    probeIsLeft: Boolean,
    point: Expression,
    lo: Expression,
    hi: Expression,
    loInclusive: Boolean,
    hiInclusive: Boolean,
    extraCond: Seq[Expression])
    extends BinaryExecNode {

  // BinaryExecNode wiring: left/right must mirror the logical join's
  // child order so output attribute order matches Join's contract
  override def left: SparkPlan = if (probeIsLeft) probe else build
  override def right: SparkPlan = if (probeIsLeft) build else probe
  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    if (probeIsLeft) copy(probe = newLeft, build = newRight)
    else copy(probe = newRight, build = newLeft)

  // The operator is a per-partition map over the probe side: rows are
  // neither moved nor reordered, so the probe child's partitioning and
  // ordering survive. Propagating them (as BroadcastHashJoinExec does
  // for its streamed side) lets a downstream aggregation on probe-side
  // keys skip an avoidable exchange.
  override def outputPartitioning: Partitioning = probe.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = probe.outputOrdering

  // Catalyst's interpreted ordering for the point/bound type — the same
  // ordering BinaryComparison evaluates with, so the index agrees with
  // the builtin join on every edge the JVM's boxed Comparable gets
  // wrong: -0.0 == 0.0 for Float/Double (Double.compareTo orders
  // -0.0 < 0.0), and non-binary string collations (UTF8String.compareTo
  // is binary). Derived from the serializable DataType on each side of
  // the wire; the Ordering instance itself never crosses it.
  private def sqlOrdering(): Ordering[Any] =
    TypeUtils.getInterpretedOrdering(point.dataType)

  override protected def doExecute(): RDD[InternalRow] = {
    val ord = sqlOrdering()
    val loEval = BindReferences.bindReference(lo, build.output)
    val hiEval = BindReferences.bindReference(hi, build.output)
    // inner-join semantics: a NULL bound can never satisfy a comparison
    val intervals = build.executeCollect().iterator.flatMap { r =>
      val l = loEval.eval(r)
      val h = hiEval.eval(r)
      if (l == null || h == null) None else Some((l, h, r))
    }.toArray.sortWith((x, y) => ord.compare(x._1, y._1) < 0)
    val n = intervals.length
    val los = intervals.map(_._1)
    val his = intervals.map(_._2)
    val rows = intervals.map(_._3)
    // maxHi(i) = max of his(0..i): the backward-walk stop condition
    val maxHi = new Array[Any](n)
    var i = 0
    var run: Any = null
    while (i < n) {
      if (run == null || ord.compare(his(i), run) > 0) run = his(i)
      maxHi(i) = run
      i += 1
    }
    val bc = sparkContext.broadcast((los, his, maxHi, rows))
    val probeOut = probe.output
    val buildOut = build.output
    val pointExpr = point
    val extra = extraCond
    val flip = !probeIsLeft
    val outAttrs = output
    val pointType = point.dataType
    probe.execute().mapPartitionsWithIndex { (pidx, iter) =>
      val (blos, bhis, bmax, brows) = bc.value
      val m = blos.length
      val pOrd = TypeUtils.getInterpretedOrdering(pointType)
      val pEval = BindReferences.bindReference(pointExpr, probeOut)
      // joined attribute order follows the ORIGINAL logical join
      val joined = new JoinedRow
      val inAttrs = if (flip) buildOut ++ probeOut else probeOut ++ buildOut
      val pred = if (extra.isEmpty) null
        else Predicate.create(extra.reduce(And), inAttrs)
      if (pred != null) pred.initialize(pidx)
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      proj.initialize(pidx)
      def lowerOk(l: Any, p: Any): Boolean = {
        val c = pOrd.compare(l, p); if (loInclusive) c <= 0 else c < 0
      }
      def upperOk(h: Any, p: Any): Boolean = {
        val c = pOrd.compare(p, h); if (hiInclusive) c <= 0 else c < 0
      }
      iter.flatMap { row =>
        val p = pEval.eval(row)
        if (p == null || m == 0) Iterator.empty
        else {
          // rightmost index whose lower bound admits p
          var a = 0; var b = m // search window [a, b)
          while (a < b) {
            val mid = (a + b) >>> 1
            if (lowerOk(blos(mid), p)) a = mid + 1 else b = mid
          }
          val start = a - 1
          new Iterator[InternalRow] {
            private var idx = start
            private var nextRow: InternalRow = null
            private def advance(): Unit = {
              nextRow = null
              while (nextRow == null && idx >= 0 && upperOk(bmax(idx), p)) {
                if (upperOk(bhis(idx), p)) {
                  val j = if (flip) joined(brows(idx), row) else joined(row, brows(idx))
                  // copy: this iterator computes the following row in
                  // next() — handing out the shared projection buffer
                  // would invalidate the previous row before the
                  // consumer reads it
                  if (pred == null || pred.eval(j)) nextRow = proj(j).copy()
                }
                idx -= 1
              }
            }
            advance()
            override def hasNext: Boolean = nextRow != null
            override def next(): InternalRow = {
              val r = nextRow; advance(); r
            }
          }
        }
      }
    }
  }
}
