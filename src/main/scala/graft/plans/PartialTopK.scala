package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator extension (SURVEY §2 option (c)): per-key
  * partial top-k pruning BEFORE the window shuffle.
  *
  * Each input partition keeps only its local top-k rows per key (a
  * bounded heap per key, O(keys·k) memory), so the exchange that
  * follows carries at most `partitions × k` rows per key instead of
  * all of them — the same partial/final split Spark already applies
  * to aggregates, extended to ranked selection. Correctness: a row in
  * the global top-k of its key is necessarily in the local top-k of
  * whichever partition holds it, for ANY partitioning of the input, so
  * re-ranking the pruned stream yields exactly the unpruned answer
  * (asserted row-for-row in PlansSpec, and by the DuckDB oracle on the
  * unpruned formulation).
  *
  * Relationship to Spark's native `InferWindowGroupLimit` (3.5+):
  * for the pure `row_number().over(w) <= k` FILTER pattern, Spark
  * already inserts a Partial `WindowGroupLimitExec` below the
  * exchange, so no custom rewrite duplicates that case. Where the
  * native rule DECLINES — a running aggregate sharing the Window node
  * with the ranking function — [[TopKDemotion]] rewrites the filter
  * to this prune (see its scaladoc for the decline analysis and
  * safety argument). What this operator adds: (a) it is a
  * standalone API usable on ANY DataFrame — e.g. pruning the build
  * side of a join or a pipeline stage with no window filter for the
  * optimizer to infer from; (b) `WindowGroupLimitExec` requires a
  * partition-local Sort below it (O(n log n) on every map partition),
  * while the heap prune consumes UNSORTED input in O(n log k) — at
  * 100 TB the map-side sort of the full fact table is the dominant
  * cost the heap path avoids.
  *
  * Wiring: [[LogicalPartialTopK]] (logical) is planned by
  * [[PartialTopKStrategy]] into [[PartialTopKExec]] (physical).
  * The strategy registers either via the session extension point
  * (`graft.functions.GraftExtensions` → injectPlannerStrategy) or
  * imperatively through [[PartialTopK.ensureRegistered]] for sessions
  * built without extensions.
  */
case class LogicalPartialTopK(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    maxKeys: Int = PartialTopKExec.DefaultMaxKeys) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(maxKeys > 0, s"maxKeys must be positive, got $maxKeys")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPartialTopK =
    copy(child = newChild)
}

object PartialTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LogicalPartialTopK(keys, order, k, child, maxKeys) =>
      PartialTopKExec(keys, order, k, planLater(child), maxKeys) :: Nil
    case _ => Nil
  }
}

case class PartialTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    maxKeys: Int = PartialTopKExec.DefaultMaxKeys) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, sortOrder, limit, childOutput, keyCap) =
      (keys, order, k, child.output, maxKeys)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // codegen'd comparator over the requested sort order
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // Bounded binary heap per key, worst-of-the-kept at the head
      // (reverse order): exactly k rows live per key — no 2k sort
      // spikes — and a row that can't beat the current worst is
      // REJECTED WITHOUT COPYING, so the common case (row outside the
      // running top-k) is one comparison, zero allocation.
      val groups = scala.collection.mutable.HashMap
        .empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      def drain(): Iterator[InternalRow] = {
        val out = groups.valuesIterator.flatMap { heap =>
          val arr = heap.toArray(new Array[InternalRow](heap.size))
          java.util.Arrays.sort(arr, ord)
          arr.iterator
        }.toArray.iterator
        groups.clear()
        out
      }
      // Memory guard for adversarial key cardinality: when a partition
      // holds more than maxKeys distinct keys, the current batch is
      // FLUSHED downstream and pruning restarts. Batch-local pruning
      // stays correct for any batching: a row suppressed in its batch
      // had >= k better same-key rows IN THAT BATCH, all of which are
      // emitted, so every key's true global top-k always survives —
      // a flush only trades pruning ratio, never correctness. Memory
      // is thus O(maxKeys * k) regardless of input cardinality.
      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private def advance(): Boolean = {
          while (!pending.hasNext && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            groups.get(key) match {
              case Some(heap) =>
                if (heap.size < limit) heap.offer(row.copy())
                else if (ord.compare(row, heap.peek()) < 0) {
                  heap.poll(); heap.offer(row.copy())
                }
              case None =>
                // cap hit: flush the current batch downstream, then
                // admit the new key into a fresh batch
                if (groups.size == keyCap) pending = drain()
                val heap = new java.util.PriorityQueue[InternalRow](
                  limit + 1, ord.reverse)
                heap.offer(row.copy())
                groups.update(key.copy(), heap)
            }
          }
          if (!pending.hasNext && groups.nonEmpty) pending = drain()
          pending.hasNext
        }
        override def hasNext: Boolean = advance()
        override def next(): InternalRow =
          if (advance()) pending.next()
          else throw new NoSuchElementException("empty iterator")
      }
    }, preservesPartitioning = true)
  }
}

object PartialTopKExec {
  /** Key-cardinality cap per partition batch — 1M keys × k rows is a
    * few hundred MB worst case at typical row widths; beyond it the
    * operator degrades gracefully (less pruning) instead of OOMing. */
  val DefaultMaxKeys: Int = 1 << 20
}

object PartialTopK {
  /** Idempotent imperative registration for sessions built without
    * `spark.sql.extensions` (Verify/Bench). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(PartialTopKStrategy)) {
      spark.experimental.extraStrategies = cur :+ PartialTopKStrategy
    }
  }

  /** Wraps `df` in a partial per-key top-k prune. Keys and sort
    * columns are resolved BY NAME against df's analyzed output into
    * plain catalyst attributes/SortOrders — no Column-node conversion,
    * so the physical operator's captured expressions are pure catalyst
    * and task-serializable. `ascending = false` means descending. */
  def partialTopK(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int,
      maxKeys: Int = PartialTopKExec.DefaultMaxKeys): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    val sortOrder = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftPlanBridge.ofRows(df.sparkSession,
      LogicalPartialTopK(keyCols.map(attr), sortOrder, k, plan, maxKeys))
  }
}
