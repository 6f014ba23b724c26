package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global anti-pattern sweep: EVERY declared query's physical plan is
  * checked for the two shapes that kill 100 TB runs — an unkeyed
  * CartesianProduct, and a BroadcastNestedLoopJoin outside the short
  * list of queries where a broadcast-sized NLJ is the intended design.
  * A regression that drops a join key or un-broadcasts a side fails
  * here by name, not in a production run.
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
    "infer_knn") // crossJoin carries the broadcast 10-row query side

  test("no query plans a CartesianProduct; BNLJ only where intended") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val cart = if (plan.contains("CartesianProduct")) Some(s"$name: CartesianProduct") else None
        val bnlj = if (plan.contains("BroadcastNestedLoopJoin") && !bnljIntended(name))
          Some(s"$name: unexpected BroadcastNestedLoopJoin") else None
        cart ++ bnlj
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
