package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated-subquery SQL surface. The point at scale is what
  * Catalyst does to these shapes: a naive engine executes the inner
  * query once per outer row (O(n) scans); Spark DECORRELATES them into
  * joins + aggregates — one pass over each input regardless of outer
  * cardinality. PlanSweepSpec's cartesian/BNLJ sweep covers both
  * queries; SubquerySpec asserts the rewritten plans are join-shaped
  * with no per-row subquery left.
  */
object SubqueryQueries {

  /** Correlated scalar-aggregate predicate: orders kept when their
    * customer's total order COUNT (the correlated subquery) meets a
    * threshold. Integer comparison — no FP boundary risk. Catalyst
    * rewrites the per-row subquery into ONE aggregate over orders
    * joined back on the correlation key. */
  def sqlCorrelatedAgg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_sq")
    s.sql(
      """SELECT o_custkey, count(*) AS n_orders,
        |  min(o_orderkey) AS first_order
        |FROM graft_orders_sq o
        |WHERE (SELECT count(*) FROM graft_orders_sq o2
        |       WHERE o2.o_custkey = o.o_custkey) >= 5
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
  }

  /** LATERAL correlated subquery with ORDER BY + LIMIT: top-2 orders
    * per customer, written the way an analyst writes it. Catalyst
    * decorrelates the limit into a per-key window rewrite — the same
    * physical shape as topk_per_key, reached from SQL. Rounded price
    * ordering with an o_orderkey tie-break keeps both engines' ranking
    * identical. */
  def sqlLateralTopk(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_customer_sq")
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_sq")
    s.sql(
      """SELECT c.c_custkey, l.o_orderkey,
        |  CAST(floor(l.o_totalprice * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
        |    AS price
        |FROM graft_customer_sq c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM graft_orders_sq o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        |WHERE c.c_custkey < 200
        |ORDER BY c.c_custkey, price DESC, l.o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_correlated_agg" -> sqlCorrelatedAgg,
    "sql_lateral_topk" -> sqlLateralTopk)

  val oracleSql: Map[String, String] = Map(
    "sql_correlated_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  min(o_orderkey) AS first_order
        |FROM orders o
        |WHERE (SELECT count(*) FROM orders o2
        |       WHERE o2.o_custkey = o.o_custkey) >= 5
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "sql_lateral_topk" ->
      """SELECT c.c_custkey, l.o_orderkey,
        |  CAST(floor(l.o_totalprice * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
        |    AS price
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l ON TRUE
        |WHERE c.c_custkey < 200
        |ORDER BY c.c_custkey, price DESC, l.o_orderkey""".stripMargin)
}
