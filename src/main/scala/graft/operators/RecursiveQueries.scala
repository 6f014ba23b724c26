package graft.operators

import graft.Tables
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Recursive-query surface (Spark 4's `WITH RECURSIVE`, executed as
  * an iterative union-loop — a genuinely distinct physical operator
  * from every join/agg/window in the suite).
  *
  * Scope note: Spark 4.1 supports only UNION ALL recursion (no
  * UNION-distinct), so cycle-safe transitive closure over a symmetric
  * graph — the dedup_components shape — is not yet expressible here;
  * the iterative min-label / star loops remain the scalable answer for
  * that. What IS safely expressible is linear recursion over an
  * ACYCLIC successor relation, where each row extends at most one way
  * and total work is bounded by input size, not path count.
  */
object RecursiveQueries {

  /** Chain-walk depth cap: recursion runs exactly this many extension
    * rounds, and the oracle mirrors it as least(len, cap). Bounds both
    * the number of iterative jobs and worst-case state. */
  val MaxChainDepth = 12

  /** Per-user session chains via RECURSIVE SQL: each user's events
    * form a time-ordered successor DAG (next event of the same user
    * within the 30-min session gap); anchors are events with no
    * qualifying predecessor, and the recursion walks anchor → next →
    * next, carrying a depth counter capped at [[MaxChainDepth]].
    * Output per user: chain count and capped depth totals — the same
    * session statistics win_sessionize derives with windows, computed
    * by the union-loop operator instead (the oracle replays the
    * windowed formulation, proving the two agree).
    *
    * Scale: the successor relation is one window pass (per-user sort);
    * every event belongs to exactly ONE chain at exactly one depth, so
    * all recursion frontiers together hold ≤ |events| rows — linear
    * recursion, no path explosion, and the per-round join keys on
    * (user_id, event_id). The cap bounds rounds independently of a
    * pathological always-active user. */
  def sqlRecursiveChain(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // r15 (guide §2.4 — remove repeated shuffles/passes): the nbr/succ
    // CTEs used to live INSIDE the recursive SQL, and Spark 4.1's
    // UnionLoop re-plans + re-executes the recursive term's whole
    // subtree EVERY iteration — the r14 plan shows the events scan →
    // Exchange(user_id) → Sort → Window(lead,lead) pipeline under the
    // loop's join (plans/r15/sql_recursive_chain_before.txt, ops
    // 10–15), i.e. up to MaxChainDepth full window passes over events
    // for one query (JobCountProbe: 30 jobs). The successor relation
    // is LOOP-INVARIANT, so it is derived once here and materialized:
    //   - nbr: ONE window pass, eagerly checkpointed (two consumers —
    //     succ and anchors — the multi-consumer checkpoint rule);
    //   - succ: the per-iteration join side, re-checkpointed
    //     REPARTITIONED on the join key with AQE off (the coreEdges
    //     partition pin) so at scale every iteration's walk⋈succ plans
    //     ZERO exchange on the |events|-sized succ side — only the
    //     shrinking frontier moves per round;
    //   - anchors: a narrow filter over the nbr blocks, read once by
    //     the loop's anchor term.
    // The recursion itself — the UnionLoop operator this query exists
    // to exercise — is untouched, and the oracle (the windowed replay)
    // is character-identical, so the hash proves the rewrite.
    val byTime = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val nbr = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts_s"),
        lead("event_id", 1).over(byTime).as("next_id"),
        lead("ts_s", 1).over(byTime).as("next_ts"),
        lag("ts_s", 1).over(byTime).as("prev_ts"))
      .localCheckpoint(true)
    val succ = nbr
      .filter(col("next_ts") - col("ts_s") <= WindowQueries.SessionGapS)
      .select("user_id", "event_id", "next_id")
    val succPinned = Tables.withConf(s, "spark.sql.adaptive.enabled", "false") {
      succ.repartition(col("user_id"), col("event_id")).localCheckpoint(true)
    }
    succPinned.createOrReplaceTempView("graft_rec_succ")
    nbr.filter(col("prev_ts").isNull ||
        col("ts_s") - col("prev_ts") > WindowQueries.SessionGapS)
      .select("user_id", "event_id")
      .createOrReplaceTempView("graft_rec_anchors")
    s.sql(
      s"""WITH RECURSIVE
         |walk(user_id, anchor_id, cur_id, depth) AS (
         |  SELECT user_id, event_id, event_id, CAST(1 AS BIGINT)
         |  FROM graft_rec_anchors
         |  UNION ALL
         |  SELECT w.user_id, w.anchor_id, s.next_id, w.depth + 1
         |  FROM walk w
         |  JOIN graft_rec_succ s
         |    ON w.user_id = s.user_id AND w.cur_id = s.event_id
         |  WHERE w.depth < $MaxChainDepth),
         |chains AS (
         |  SELECT user_id, anchor_id, max(depth) AS len
         |  FROM walk GROUP BY user_id, anchor_id)
         |SELECT user_id, count(*) AS n_chains,
         |  sum(len) AS sum_depth, max(len) AS max_depth
         |FROM chains GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_recursive_chain" -> sqlRecursiveChain)

  val oracleSql: Map[String, String] = Map(
    // the windowed replay: session event-counts capped exactly like the
    // walk's depth limit — recursion must reproduce the window math
    "sql_recursive_chain" ->
      s"""WITH e AS (SELECT user_id, event_id,
         |    epoch_ns(ts) // 1000000000 AS ts_s FROM events),
         |b AS (SELECT user_id, event_id, ts_s,
         |    CASE WHEN ts_s - lag(ts_s) OVER w > ${WindowQueries.SessionGapS}
         |         THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
         |s AS (SELECT user_id,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM b),
         |c AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2)
         |SELECT user_id, count(*) AS n_chains,
         |  CAST(sum(least(n, $MaxChainDepth)) AS BIGINT) AS sum_depth,
         |  CAST(max(least(n, $MaxChainDepth)) AS BIGINT) AS max_depth
         |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin)
}
