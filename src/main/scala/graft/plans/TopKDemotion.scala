package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, CurrentRow, EqualTo, Expression, FrameLessOffsetWindowFunction, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Auto-rewrite rule: demotes a `row_number() <= k` window filter to a
  * map-side [[LogicalPartialTopK]] prune in shapes Spark's own
  * `InferWindowGroupLimit` DECLINES.
  *
  * Spark 4.1's native rule fires only when every window expression in
  * the node is "expanding" — frame exactly ROWS UNBOUNDED
  * PRECEDING..CURRENT ROW and not size-based (its
  * `isExpandingWindow`). That covers the rank function itself and
  * running aggregates. What it still declines is any expression with
  * a SUB-PREFIX frame — `lag(x, n)` (frame `-n..-n`), a trailing
  * moving aggregate (`ROWS 5 PRECEDING..CURRENT ROW`), a
  * prefix-exclusive running total (`..1 PRECEDING`) — even though the
  * filter still caps the partition at k rows:
  *
  * {{{
  *   SELECT ... row_number() OVER w AS rn,
  *              lag(x, 1)    OVER w AS prev_x,   -- frame -1..-1
  *              sum(x)       OVER (w ROWS UNBOUNDED..CURRENT) AS run
  *   WHERE rn <= k
  * }}}
  *
  * gets NO group limit from Spark, and the full input crosses the
  * exchange. Yet pruning is semantically safe for the whole family:
  * for any row with true rank j <= k, its strict prefix in the
  * partition order is exactly the j-1 better-ranked rows, ALL of
  * which survive a per-partition top-k prune (a row in the global
  * top-k is in the local top-k of whichever partition holds it), in
  * the same relative order. Hence ANY window frame contained in the
  * prefix — `UNBOUNDED PRECEDING <= lower <= upper <= CURRENT ROW`,
  * ROWS-based — evaluates over the identical row set before and after
  * the prune. Rows outside the true top-k see >= k retained
  * better-ranked rows, compute rank > k, and are filtered as before.
  *
  * Safety gates, checked per Window node:
  *  - the filter carries a `rn <= k` / `rn < k+1` / `rn = k` conjunct
  *    on an attribute produced by a RowNumber window expression;
  *  - every window expression's frame is ROWS-based with both bounds
  *    at or before CURRENT ROW (UnboundedPreceding / CurrentRow /
  *    negative literal offsets), and shares the node's (partition,
  *    order);
  *  - every window function is RowNumber, an AggregateExpression, or
  *    a backward frameless-offset function (`lag`; `lead` is rejected
  *    by its positive-offset frame). `rank`/`dense_rank` are EXCLUDED
  *    — under order ties they admit more than k rows, which a
  *    k-bounded heap prune would drop. RANGE frames are EXCLUDED —
  *    a RANGE frame includes order-value PEERS of the current row,
  *    and a peer beyond position k is pruned;
  *  - at least one expression has a frame OTHER than exact
  *    UNBOUNDED..CURRENT — on the all-expanding shape the native rule
  *    fires, and which rule runs first is a Spark batch-order detail
  *    (in 4.1 user-provided rules run before the infer-group-limit
  *    batch, so firing there would stack both prunes). Restricting to
  *    the sub-prefix shapes partitions the space: native handles what
  *    it can, this rule handles exactly what it can't, never both;
  *  - partition and order are non-empty and deterministic (empty
  *    partition = global top-k, already Spark's TakeOrderedAndProject);
  *  - `1 <= k <= MaxK` (mirrors the native group-limit threshold
  *    default — the heap holds k rows per key per batch);
  *  - the child is not already pruned (LogicalPartialTopK /
  *    WindowGroupLimit), which also makes the rule idempotent under
  *    the optimizer's fixed-point batch.
  *
  * Wiring mirrors [[PartialTopKStrategy]]: injected via
  * `GraftExtensions` (injectOptimizerRule) for extension-built
  * sessions, or imperatively through [[TopKDemotion.ensureRegistered]]
  * (experimental.extraOptimizations) for plain sessions. The strategy
  * must also be registered — the rule only rewrites the logical plan.
  */
object TopKDemotion extends Rule[LogicalPlan] with PredicateHelper {

  /** Cap on demoted k — same default as Spark's
    * `spark.sql.window.group.limit.threshold`. */
  val MaxK: Int = 1000

  /** Frame bound at or before the current row. */
  private def atOrBeforeCurrent(bound: Expression): Boolean = bound match {
    case UnboundedPreceding | CurrentRow => true
    case Literal(v: Int, _) => v <= 0
    case Literal(v: Long, _) => v <= 0L
    case _ => false
  }

  /** ROWS frame entirely contained in the row's prefix. */
  private def prefixContainedFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, lower, upper) =>
        atOrBeforeCurrent(lower) && atOrBeforeCurrent(upper)
      case _ => false
    }

  /** The exact expanding frame the NATIVE rule handles. */
  private def expandingFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }

  private def prefixComputableFn(fn: Expression): Boolean =
    fn.isInstanceOf[RowNumber] || fn.isInstanceOf[AggregateExpression] ||
      fn.isInstanceOf[FrameLessOffsetWindowFunction]

  /** k from one `rn <= k`-shaped conjunct of the filter condition. */
  private def rankLimit(cond: Expression, rnAttrs: AttributeSet): Option[Int] = {
    val ks = splitConjunctivePredicates(cond).collect {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if rnAttrs.contains(a) => k
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if rnAttrs.contains(a) => k
      case LessThan(a: Attribute, IntegerLiteral(k)) if rnAttrs.contains(a) => k - 1
      case GreaterThan(IntegerLiteral(k), a: Attribute) if rnAttrs.contains(a) => k - 1
      case EqualTo(a: Attribute, IntegerLiteral(k)) if rnAttrs.contains(a) => k
      case EqualTo(IntegerLiteral(k), a: Attribute) if rnAttrs.contains(a) => k
    }
    if (ks.isEmpty) None else Some(ks.min)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(wexprs, partitionSpec, orderSpec, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          partitionSpec.forall(_.deterministic) &&
          orderSpec.forall(_.deterministic) &&
          !child.isInstanceOf[LogicalPartialTopK] &&
          !child.isInstanceOf[WindowGroupLimit] =>
      val specs = wexprs.collect {
        case Alias(WindowExpression(fn, spec), _) => (fn, spec)
      }
      val allPrefixComputable = specs.length == wexprs.length && specs.forall {
        case (fn, spec) =>
          prefixContainedFrame(spec) && spec.partitionSpec == partitionSpec &&
            spec.orderSpec == orderSpec && prefixComputableFn(fn)
      }
      // fire ONLY where the native rule cannot: at least one frame the
      // native isExpandingWindow check rejects
      val nativeDeclines = specs.exists { case (_, spec) => !expandingFrame(spec) }
      val rnAttrs = AttributeSet(wexprs.collect {
        case a @ Alias(WindowExpression(_: RowNumber, spec), _)
            if expandingFrame(spec) => a.toAttribute
      })
      if (allPrefixComputable && nativeDeclines && rnAttrs.nonEmpty) {
        rankLimit(cond, rnAttrs) match {
          case Some(k) if k >= 1 && k <= MaxK =>
            f.copy(child = w.copy(child =
              LogicalPartialTopK(partitionSpec, orderSpec, k, child)))
          case _ => f
        }
      } else f
  }

  /** Idempotent imperative registration for sessions built without
    * `spark.sql.extensions` (Verify/Bench) — the optimizer twin of
    * [[PartialTopK.ensureRegistered]]. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(TopKDemotion)) {
      spark.experimental.extraOptimizations = cur :+ TopKDemotion
    }
  }
}
