package graft.operators

import graft.Fp
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY §2B). Absent from the reference; mandated
  * by the north star.
  *
  * Scale: window partitioning shuffles once on the partition key; the
  * per-partition sort is the dominant cost. Partition keys (customer,
  * user) have bounded cardinality-per-key so no single partition
  * explodes; skewed keys would be handled by AQE.
  *
  * Determinism: every ORDER BY inside a window carries a unique
  * integer tie-break key so frame contents (and therefore running
  * sums) are identical between Spark and DuckDB.
  */
object WindowQueries {

  /** Top-3 orders per customer by totalprice (row_number ≤ 3). */
  def winRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Running revenue per customer in orderdate order. ROWS frame +
    * unique tie-break ⇒ sequential, deterministic FP accumulation. */
  def winRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("running", Fp.r4(sum("o_totalprice").over(w)))
      .select("o_custkey", "o_orderkey", "running")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE-frame window (frame bounded by VALUE, not row count):
    * per customer, revenue of all orders in the 30 days up to and
    * including each order. Unlike a ROWS frame, ties on the order key
    * (same-day orders) are ALL in-frame regardless of their physical
    * order, so the sum is insensitive to Spark-vs-DuckDB sort
    * nondeterminism among peers; r4 absorbs accumulation-order drift.
    * Epoch-seconds ordering key keeps the range arithmetic integral. */
  def winRange(s: SparkSession, dir: String): DataFrame = {
    // NTZ → TIMESTAMP → BIGINT epoch seconds (session tz is UTC;
    // a direct NTZ→BIGINT cast is rejected)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 0)
    t(s, dir, "orders")
      .withColumn("sum_30d", Fp.r4(sum("o_totalprice").over(w)))
      .select("o_custkey", "o_orderkey", "sum_30d")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Event-to-event gap in seconds per user (lag). Time math on
    * `ts_s` (floor-seconds BIGINT) so ns-vs-us precision cannot
    * diverge from the oracle. */
  def winLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    t(s, dir, "events")
      .withColumn("delta_s", col("ts_s") - lag("ts_s", 1).over(w))
      .select("user_id", "event_id", "delta_s")
      .orderBy("user_id", "event_id")
  }

  /** ntile + first/last over per-customer order history. */
  def winNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
    val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("first_order", first("o_orderkey").over(wFrame))
      .withColumn("last_order", last("o_orderkey").over(wFrame))
      .select("o_custkey", "o_orderkey", "quartile", "first_order", "last_order")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Rank-ratio window functions (percent_rank, cume_dist): identical
    * (rank−1)/(n−1) and rank/n definitions in both engines; unique
    * tie-break key ⇒ identical ranks; ratios of small ints r4'd. */
  def winPercent(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_totalprice"), asc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("pr", Fp.r4(percent_rank().over(w)))
      .withColumn("cd", Fp.r4(cume_dist().over(w)))
      .select("o_custkey", "o_orderkey", "pr", "cd")
      .orderBy("o_custkey", "o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_percent" -> winPercent,
    "win_rank" -> winRank,
    "win_running" -> winRunning,
    "win_range" -> winRange,
    "win_lag" -> winLag,
    "win_ntile" -> winNtile)

  val oracleSql: Map[String, String] = Map(
    "win_percent" ->
      """SELECT o_custkey, o_orderkey,
        |  floor((percent_rank() OVER w) * 10000.0 + 0.5) / 10000.0 + 0.0 AS pr,
        |  floor((cume_dist() OVER w) * 10000.0 + 0.5) / 10000.0 + 0.0 AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_range" ->
      """SELECT o_custkey, o_orderkey,
        |  floor((sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY epoch_ns(o_orderdate) // 1000000000
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5)
        |    / 10000.0 AS sum_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_ntile" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  first_value(o_orderkey) OVER wf AS first_order,
        |  last_value(o_orderkey) OVER wf AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) x
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  floor((sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0 AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_lag" ->
      """SELECT user_id, event_id,
        |  (epoch_ns(ts) // 1000000000)
        |    - lag(epoch_ns(ts) // 1000000000)
        |      OVER (PARTITION BY user_id ORDER BY event_id) AS delta_s
        |FROM events ORDER BY user_id, event_id""".stripMargin)
}
