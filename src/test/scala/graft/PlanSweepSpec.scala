package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global anti-pattern sweep: EVERY declared query's physical plan is
  * checked for the three shapes that kill 100 TB runs — an unkeyed
  * CartesianProduct, a BroadcastNestedLoopJoin outside the short
  * list of queries where a broadcast-sized NLJ is the intended design,
  * and an UNPARTITIONED WindowExec whose input is not
  * aggregate-bounded (a global window over raw rows funnels the whole
  * dataset through one task). A regression that drops a join key,
  * un-broadcasts a side, or windows over row-scale input fails here
  * by name, not in a production run.
  */
class PlanSweepSpec extends AnyFunSuite with SparkFixture {

  /** Queries whose plans legitimately contain a BNLJ: a theta join
    * with a broadcast-sized build side, and crossJoins carrying a
    * broadcast tiny side (query vectors / a 1-row count). */
  private val bnljIntended = Set(
    "join_theta", "sim_cosine_topk", "sim_pq", "text_tfidf",
    "text_heavy_hitters",
    "text_bm25", // bm25's crossJoin carries a broadcast 1-row (n_docs, avgdl)
    "sim_maxsim", // crossJoin carries the broadcast 12-row query token bag
    "sim_crossmodal", // crossJoin carries the broadcast 10-row centroid dim
    "pipeline_temperature", // crossJoin carries a broadcast 1-row Σw total
    "pipeline_curriculum", // crossJoin carries a broadcast 1-row n_total
    "agg_ttest", // a<b theta self-join of the broadcast 5-row moment table
    "agg_chisq", // |langs|×|sources| grid from broadcast tiny aggregates
    "infer_knn", // crossJoin carries the broadcast 10-row query side
    "sim_recall_eval", // inherits sim_cosine_topk's broadcast query crossJoin as its ground-truth side
    "infer_naive_bayes", // crossJoins carry the broadcast 1-row vocab size / |langs|-row dim
    "text_collocations", // crossJoin carries the broadcast 1-row bigram total
    "agg_kmv_jaccard", // ta<tb theta self-join of the broadcast |types|-row frame (the agg_ttest pattern)
    "profile_dq_rules", // crossJoin of the two broadcast 1-row metric aggregates
    "stream_dq_gate", // same assembly as profile_dq_rules over the merged counter state
    "agg_basket", // crossJoin carries the broadcast 1-row order total
    "agg_apportion", // crossJoins carry broadcast 1-row total/leftover frames
    "pipeline_snapshot_diff", // crossJoin carries the broadcast 1-row cutoff pair
    "agg_decay", // crossJoin carries the broadcast 1-row corpus "now"
    "profile_drift", // crossJoins carry broadcast 1-row midpoint/total frames
    "stream_basket", // basketAssemble's broadcast 1-row order total (shared with agg_basket)
    "sample_balance", // crossJoin carries the broadcast 1-row minority count
    "agg_rfm", // crossJoins carry broadcast 1-row day-max/threshold frames
    "stream_rfm", // rfmAssemble's broadcast 1-row frames (shared with agg_rfm)
    "infer_train", // the LAST GD iteration's broadcast 1-row weight crossJoin — visible in the declared plan since the r12 tail-checkpoint trim (it always ran per-iteration; the checkpoint only hid it from this sweep)
    "win_cusum", // crossJoin carries the broadcast 1-row drift constant
    "sim_mmr", // broadcast 1-row query + broadcast 16-row pool pairwise join
    "agg_hhi", // crossJoin carries the broadcast 1-row revenue total
    "agg_pareto") // crossJoins carry broadcast 1-row total/count frames

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.window.WindowExec
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec

  // AQE hides subtrees behind stage/reuse wrappers; traverse through
  // them or any structural audit silently goes vacuous
  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case o => o.children
  }
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: kids(p).flatMap(flatten)
  /** True if a LEAF (scan) is reachable without passing an aggregate
    * or a constant limit — i.e. the subtree's row count is
    * input-scale, not group-scale/constant-bounded. */
  private def rawReach(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => false
    case _: org.apache.spark.sql.execution.GlobalLimitExec => false
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => false
    case _: org.apache.spark.sql.execution.CollectLimitExec => false
    case l if kids(l).isEmpty => true
    case o => kids(o).exists(rawReach)
  }

  test("no CartesianProduct; BNLJ only where intended; global windows only over aggregates") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val physical = fn(spark, sf).queryExecution.executedPlan
        val plan = physical.toString
        val cart = if (plan.contains("CartesianProduct"))
          Some(s"$name: CartesianProduct") else None
        val bnlj = if (plan.contains("BroadcastNestedLoopJoin") && !bnljIntended(name))
          Some(s"$name: unexpected BroadcastNestedLoopJoin") else None
        // shape-based global-window triage (r6 verdict item 6): the
        // documented bounded-frame pattern ALWAYS windows over a
        // groupBy output (#buckets/#days rows); an unpartitioned
        // window whose child subtree reaches a scan without passing
        // an aggregate would funnel raw rows through one task
        val win = flatten(physical).collect {
          case w: WindowExec if w.partitionSpec.isEmpty && rawReach(w.child) =>
            s"$name: unpartitioned WindowExec over non-aggregated input"
        }
        cart ++ bnlj ++ win
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the intended BNLJ queries still broadcast (not a plain nested loop)") {
    bnljIntended.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name degraded to CartesianProduct")
    }
  }
}
