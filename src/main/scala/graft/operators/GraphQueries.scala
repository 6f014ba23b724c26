package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames (beyond-reference surface;
  * companion to DedupQueries' connected components).
  *
  * PageRank over the bipartite customer↔supplier transaction graph
  * (an edge per distinct (customer, supplier) trading pair, both
  * directions). The classic "entity importance" signal for training-
  * data curation: which sources/entities dominate a corpus.
  *
  * Scale: the edge build is one orders⋈lineitem shuffle join + a
  * distinct; each of the [[PrIters]] iterations is one equi-join of
  * edges against the current rank vector (Spark auto-broadcasts the
  * rank side while it fits; at 100 TB both sides hash-partition on the
  * same key so the shuffle is reused) followed by one groupBy(dst) —
  * the canonical O(iters)-shuffle iterative shape. Edges are cached:
  * they are re-read every iteration and must not re-execute the
  * upstream join. The driver never holds data, only the loop counter.
  *
  * Determinism: fixed-point INTEGER arithmetic — ranks scaled by
  * [[PrScale]], per-edge contribution `rank div outdeg`, damping
  * `0.85·sum` applied as `(85·sum) div 100`. Integer sums are
  * associative, so partition order cannot perturb a single bit and
  * the DuckDB oracle (same unrolled arithmetic) matches exactly.
  * Dangling-node mass is dropped identically on both engines.
  */
object GraphQueries {

  val PrScale = 1000000000L // rank fixed-point scale (1.0 == 1e9)
  val PrIters = 3

  /** Node ids: customers ↦ 2·key, suppliers ↦ 2·key+1 (disjoint). */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      .join(t(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
      .union(pairs.select(col("p").as("src"), col("c").as("dst")))
      .cache()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = t(s, dir, "customer").select((col("c_custkey") * 2).as("node"))
      .union(t(s, dir, "supplier").select((col("s_suppkey") * 2 + 1).as("node")))
    var ranks = nodes.withColumn("pr", lit(PrScale))
    for (_ <- 1 to PrIters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("pr div deg")).as("contrib"))
      ranks = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(PrScale * 15 / 100) +
            expr("(85 * coalesce(contrib, CAST(0 AS BIGINT))) div 100")).as("pr"))
    }
    ranks.orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> graphPagerank)

  val oracleSql: Map[String, String] = Map(
    // same fixed-point arithmetic, iterations unrolled; // is BIGINT
    // floor division exactly like Spark's div (all values positive)
    "graph_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS c,
        |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT c AS src, p AS dst FROM pairs
        |          UNION ALL SELECT p, c FROM pairs),
        |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |nodes AS (SELECT CAST(c_custkey * 2 AS BIGINT) AS node FROM customer
        |          UNION ALL
        |          SELECT CAST(s_suppkey * 2 + 1 AS BIGINT) FROM supplier),
        |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
        |c1 AS (SELECT e.dst AS node, sum(r.pr // d.deg) AS contrib
        |       FROM edges e JOIN r0 r ON r.node = e.src
        |       JOIN outdeg d ON d.src = e.src GROUP BY e.dst),
        |r1 AS (SELECT n.node,
        |         CAST(150000000 + (85 * coalesce(c1.contrib, 0)) // 100 AS BIGINT) AS pr
        |       FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
        |c2 AS (SELECT e.dst AS node, sum(r.pr // d.deg) AS contrib
        |       FROM edges e JOIN r1 r ON r.node = e.src
        |       JOIN outdeg d ON d.src = e.src GROUP BY e.dst),
        |r2 AS (SELECT n.node,
        |         CAST(150000000 + (85 * coalesce(c2.contrib, 0)) // 100 AS BIGINT) AS pr
        |       FROM nodes n LEFT JOIN c2 ON c2.node = n.node),
        |c3 AS (SELECT e.dst AS node, sum(r.pr // d.deg) AS contrib
        |       FROM edges e JOIN r2 r ON r.node = e.src
        |       JOIN outdeg d ON d.src = e.src GROUP BY e.dst),
        |r3 AS (SELECT n.node,
        |         CAST(150000000 + (85 * coalesce(c3.contrib, 0)) // 100 AS BIGINT) AS pr
        |       FROM nodes n LEFT JOIN c3 ON c3.node = n.node)
        |SELECT node, pr FROM r3 ORDER BY node""".stripMargin)
}
