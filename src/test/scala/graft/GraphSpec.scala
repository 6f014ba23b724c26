package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the iterative-graph and gap-fill operators. */
class GraphSpec extends AnyFunSuite with SparkFixture {

  test("graph_pagerank covers every node and respects fixed-point bounds") {
    val pr = operators.GraphQueries.graphPagerank(spark, sf).cache()
    val nCust = Tables.t(spark, sf, "customer").count()
    val nSupp = Tables.t(spark, sf, "supplier").count()
    assert(pr.count() == nCust + nSupp, "one rank row per node")
    val row = pr.agg(min("pr"), max("pr"), sum("pr")).head()
    val base = operators.GraphQueries.PrScale * 15 / 100
    assert(row.getLong(0) >= base, "every rank carries at least the teleport base")
    // integer arithmetic only drops mass (floor division + dangling
    // nodes) — total can never exceed the initial mass
    assert(row.getLong(2) <= (nCust + nSupp) * operators.GraphQueries.PrScale)
    // the graph is non-trivial at sf0.001: ranks must actually differ
    assert(pr.select("pr").distinct().count() > 1, "degenerate: all ranks equal")
    pr.unpersist()
  }

  test("graph_pagerank is deterministic across runs") {
    val a = operators.GraphQueries.graphPagerank(spark, sf).collect()
    val b = operators.GraphQueries.graphPagerank(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("pipeline_gapfill emits a dense per-user calendar with no unfilled days") {
    val g = operators.WindowQueries.pipelineGapfill(spark, sf).cache()
    // dense calendar: row count per user == span length in days
    val spanCheck = g.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        (datediff(max(to_date(col("day"))), min(to_date(col("day")))) + 1).as("span"))
      .filter(col("rows") =!= col("span"))
    assert(spanCheck.count() == 0, "calendar has holes or duplicates")
    assert(g.filter(col("n_filled").isNull).count() == 0,
      "forward fill left a null (leading gap should be impossible)")
    // observed days keep their exact count
    assert(g.filter(col("n_obs").isNotNull)
      .filter(col("n_obs") =!= col("n_filled")).count() == 0)
    // at least one genuine gap day exists in the fixture, else the
    // query proves nothing
    assert(g.filter(col("n_obs").isNull).count() > 0, "fixture has no gaps")
    g.unpersist()
  }
}
