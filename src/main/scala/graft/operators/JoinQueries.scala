package graft.operators

import graft.Fp
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joins (SURVEY §2B). The reference's only join is the 10-row
  * label→name dict lookup (R24, ipynb:367-379); the engine provides
  * the full relational join surface.
  *
  * Scale strategy per join:
  *  - dims (region, nation, part-subset) are `broadcast()` → no shuffle
  *  - fact⋈fact (orders⋈customer, orders⋈lineitem) shuffle on the join
  *    key; at 100 TB AQE picks shuffled-hash vs sort-merge and handles
  *    skew; both sides shuffle ONCE per key thanks to Catalyst reusing
  *    the exchange across join+agg on the same key.
  *  - the theta join pre-filters both sides so the unavoidable
  *    nested-loop stays on a broadcast-sized build side.
  */
object JoinQueries {

  /** nation ⋈ region, both tiny: BroadcastHashJoinExec, zero shuffle. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
      .orderBy("n_nationkey")
  }

  /** orders ⋈ customer (fact⋈dim at scale → shuffle join), revenue per
    * nation key. */
  def joinShuffle(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_nationkey")
      .agg(Fp.r4(sum("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_nationkey")
  }

  /** TPC-H-Q3-shaped 3-way join + agg + top-10. Ordering key is the
    * ROUNDED revenue so Spark and DuckDB rank identically despite FP
    * summation order. */
  def joinMulti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(o("o_orderkey"), o("o_orderdate"))
      .agg(Fp.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue"))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"),
        col("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  /** Customers with at least one order — left-semi (EXISTS). */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Customers with no 1995 orders — left-anti (NOT EXISTS). (An
    * unfiltered anti would return 0 rows on this data — every customer
    * has orders — which tests nothing.) */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1995)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-outer orders→lineitem; count(l_orderkey) skips nulls so
    * orders with no lines show n_items=0 while n_rows=1. */
  def joinOuter(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_outer")
      .groupBy(o("o_orderkey"))
      .agg(count(l("l_orderkey")).as("n_items"), count(lit(1)).as("n_rows"))
      .orderBy("o_orderkey")
  }

  /** Theta/band join: lineitems whose extendedprice falls in a
    * multiplicative band of the part's retail price. Both sides
    * pre-filtered; small side broadcast → BroadcastNestedLoopJoin. */
  def joinTheta(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .filter(col("p_partkey") % 100 === 0)
      .select("p_partkey", "p_retailprice")
    val l = t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 2000)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    l.join(broadcast(p),
        l("l_extendedprice") >= p("p_retailprice") &&
          l("l_extendedprice") < p("p_retailprice") * 3)
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n_lines"))
      .orderBy("p_partkey")
  }

  val RangeBinS = 21600L // 6-hour bins
  val RangeBase = 1704067200L // 2024-01-01T00:00:00Z, events' epoch

  /** Pure interval-containment join (NO equi key) made scale-safe by
    * BINNING: each interval explodes into the 6-hour bins it covers,
    * each event maps to its bin, and the join becomes a broadcast
    * EQUI-join on the bin id followed by the exact containment filter.
    * Without the bin key Spark can only BroadcastNestedLoopJoin this
    * (every event × every interval — join_theta's shape, fine for a
    * broadcast-sized build side but quadratic work); with it, each
    * event is probed against only the intervals overlapping its bin.
    * The 40 intervals are integer constants (irregular 61777 s stride,
    * 20000 s length, overlapping bins irregularly), so the DuckDB
    * oracle replays containment exactly with a plain range join.
    * Plan-shape asserted in RelationalSpec: BroadcastHashJoin, no BNLJ. */
  def joinRangeBinned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ivals = (0 until 40).map { i =>
      val st = RangeBase + i * 61777L
      (i, st, st + 20000L)
    }.toDF("ival_id", "start_s", "end_s")
    // `div` (integer division) — SQL `/` on BIGINT yields DOUBLE
    val binned = ivals.withColumn("bin",
      explode(sequence(expr(s"start_s div $RangeBinS"),
        expr(s"(end_s - 1) div $RangeBinS"))))
    t(s, dir, "events")
      .select(col("ts_s"), col("value"),
        expr(s"ts_s div $RangeBinS").as("bin"))
      .join(broadcast(binned), "bin")
      .filter(col("ts_s") >= col("start_s") && col("ts_s") < col("end_s"))
      .groupBy("ival_id")
      .agg(count(lit(1)).as("n_events"), Fp.r4(sum("value")).as("sum_value"))
      .orderBy("ival_id")
  }

  /** Interval × interval OVERLAP join — the general form of
    * [[joinRangeBinned]]'s point-in-interval shape (genomics interval
    * intersection, outage-vs-session attribution). Overlap
    * (`a.start < b.end && b.start < a.end`, half-open) has no equi
    * key, so the naive plan is a nested loop over |sessions|×|windows|.
    * Binning restores an equi-join: BOTH interval sets explode into
    * the 6-hour bins they touch, the join keys on bin, the exact
    * predicate filters, and — the step the point-in-interval case
    * doesn't need — a pair that co-occupies several bins is collapsed
    * by a pair-level `distinct()` BEFORE aggregation, or every shared
    * bin would double-count. Fan-out is (length/bin + 1) per interval,
    * so the shuffle scales with total interval-bins, never pairs².
    * Sessions are the REAL derived intervals from
    * [[WindowQueries.concurrencySessions]]; per maintenance window the
    * query reports distinct overlapping sessions and total overlap
    * seconds (all-integer ⇒ exact oracle). */
  def joinIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ivals = (0 until 40).map { i =>
      val st = RangeBase + i * 61777L
      (i, st, st + 20000L)
    }.toDF("ival_id", "ival_start", "ival_end")
    val ivalsB = ivals.withColumn("bin",
      explode(sequence(expr(s"ival_start div $RangeBinS"),
        expr(s"(ival_end - 1) div $RangeBinS"))))
    val sessB = WindowQueries.concurrencySessions(s, dir)
      .withColumn("bin",
        explode(sequence(expr(s"start_s div $RangeBinS"),
          expr(s"(end_s - 1) div $RangeBinS"))))
    sessB.join(broadcast(ivalsB), "bin")
      .filter(col("start_s") < col("ival_end") && col("ival_start") < col("end_s"))
      .select("user_id", "session_id", "ival_id",
        "start_s", "end_s", "ival_start", "ival_end")
      .distinct()
      .groupBy("ival_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(least(col("end_s"), col("ival_end"))
          - greatest(col("start_s"), col("ival_start"))).as("overlap_s"))
      .orderBy("ival_id")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): plain
    * equi-joins silently DROP rows whose key is NULL on either side —
    * the classic data-loss bug when a "key" is really an optional
    * attribute. Both sides pre-aggregate per nullable key (null when
    * key mod 10 == 7, a deterministic subset), then join null-safely:
    * the NULL groups MATCH each other and survive as a row. Still a
    * hash-joinable condition (null-safe equality has a well-defined
    * hash), so the plan stays a broadcast/shuffle hash join, not a
    * nested loop — asserted via the global PlanSweepSpec. */
  def joinNullsafe(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .groupBy(nullif(col("o_orderkey") % 10, lit(7L)).as("k"))
      .agg(count(lit(1)).as("n_orders"))
    val l = t(s, dir, "lineitem")
      .groupBy(nullif(col("l_orderkey") % 10, lit(7L)).as("k"))
      .agg(count(lit(1)).as("n_lines"))
    o.join(l, o("k") <=> l("k"))
      .select(o("k").as("k"), col("n_orders"), col("n_lines"))
      .orderBy(asc_nulls_first("k"))
  }

  /** As-of join: for each purchase event, the latest order of the same
    * customer at-or-before the event time. Spark has no native as-of
    * join; expressed as inequality join + per-event row_number, which
    * at scale AQE executes as a broadcast of the filtered event side
    * or a shuffled range join. Tie-break on o_orderkey for
    * determinism. */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    val w = Window.partitionBy("event_id")
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    e.join(o, e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "o_orderkey")
      .orderBy("event_id")
  }

  /** FORWARD as-of join with a staleness tolerance — the other half of
    * the as-of semantics family (join_asof is backward/unbounded): for
    * each purchase, the EARLIEST click of the same user strictly after
    * it but within 24 h, purchases without one kept with NULLs (the
    * merge-asof direction='forward', tolerance=24h shape). Equality on
    * user_id bounds the candidate set per row and keeps the plan a
    * hash join with a residual range filter — never a nested loop;
    * a keyless variant would use the time-binned pattern
    * (join_range_binned). Tie-break on (c_ts, click_id); all integer
    * ns math, so the oracle replays exactly. */
  def joinAsofFwd(s: SparkSession, dir: String): DataFrame = {
    val TolNs = 86400L * 1000000000L
    val e = t(s, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ns")
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts_ns").as("c_ts"))
    val w = Window.partitionBy("event_id").orderBy(asc("c_ts"), asc("click_id"))
    val matched = p.join(c,
        p("user_id") === c("c_user") && c("c_ts") > p("ts_ns") &&
          c("c_ts") <= p("ts_ns") + TolNs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("click_id"),
        expr("(c_ts - ts_ns) div 1000000").as("gap_ms"))
    p.join(matched, Seq("event_id"), "left")
      .select("event_id", "user_id", "click_id", "gap_ms")
      .orderBy("event_id")
  }

  /** NEAREST as-of join, completing the direction family (join_asof =
    * backward/unbounded, join_asof_fwd = forward/24 h): for each
    * purchase, the signup of the same user with the smallest |Δt|
    * within ±24 h, either direction (merge-asof direction='nearest').
    * Tie on |Δt| (an earlier and a later signup equidistant) resolves
    * to the EARLIER event, then event_id — a total order, so the
    * picked row is deterministic. Same scale shape as the other two:
    * user_id equality bounds candidates, hash join + residual range
    * filter, per-purchase row_number, never a nested loop. */
  def joinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val TolNs = 86400L * 1000000000L
    val e = t(s, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ns")
    val g = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"),
        col("ts_ns").as("s_ts"))
    val w = Window.partitionBy("event_id")
      .orderBy(asc("adelta"), asc("s_ts"), asc("signup_id"))
    val matched = p.join(g,
        p("user_id") === g("s_user") &&
          g("s_ts") >= p("ts_ns") - TolNs && g("s_ts") <= p("ts_ns") + TolNs)
      .withColumn("adelta", abs(col("s_ts") - col("ts_ns")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("signup_id"),
        expr("(s_ts - ts_ns) div 1000000").as("delta_ms"))
    p.join(matched, Seq("event_id"), "left")
      .select("event_id", "user_id", "signup_id", "delta_ms")
      .orderBy("event_id")
  }

  /** Bucketed co-located join: both fact sides written bucketed+sorted
    * on the join key, so the SortMergeJoin needs NO Exchange on either
    * side (asserted in RelationalSpec) — the pre-partitioning strategy
    * that removes the dominant shuffle for repeated fact⋈fact joins at
    * 100 TB. Bucket tables are written once per (session, sfDir) into
    * the JVM tmpdir; the logical result is identical to join_shuffle's
    * oracle. */
  def joinBucketed(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_buckets_$tag"
    def bucketed(name: String, key: String, table: String): Unit =
      if (!s.catalog.tableExists(table)) {
        t(s, dir, name).write
          .bucketBy(8, key).sortBy(key)
          .option("path", s"$base/$table")
          .mode("overwrite").saveAsTable(table)
      }
    bucketed("orders", "o_custkey", s"graft_orders_b_$tag")
    bucketed("customer", "c_custkey", s"graft_customer_b_$tag")
    val o = s.table(s"graft_orders_b_$tag")
    val c = s.table(s"graft_customer_b_$tag")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_nationkey")
      .agg(Fp.r4(sum("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_nationkey")
  }

  val SaltBuckets = 8

  /** Salted skew join: lineitem⋈supplier on l_suppkey with the fact
    * side salted (key, salt=hash%8) and the dim side exploded ×8 — the
    * manual skew-mitigation pattern for when one key dominates a
    * shuffle (AQE skew-join handles moderate skew; salting is the
    * deliberate version for pathological keys). Result is logically
    * identical to the unsalted join, which is what the oracle checks. */
  def joinSalted(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(SaltBuckets)))
    val sup = t(s, dir, "supplier")
      .withColumn("salt", explode(array((0 until SaltBuckets).map(lit(_)): _*)))
    l.join(sup, l("l_suppkey") === sup("s_suppkey") && l("salt") === sup("salt"))
      .groupBy("s_nationkey")
      .agg(Fp.r4(sum("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("s_nationkey")
  }

  /** ExistenceJoin: an IN-subquery under OR can't be a plain semi join
    * (the other disjunct must still pass rows), so Catalyst plans an
    * ExistenceJoin — a semi-join variant emitting an `exists` flag that
    * feeds the disjunction (asserted in RelationalSpec). At scale this
    * is one hash join on o_custkey instead of a correlated per-row
    * probe. */
  def joinExistence(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_cust_ex")
    t(s, dir, "orders").createOrReplaceTempView("graft_ord_ex")
    s.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM graft_cust_ex
        |WHERE c_mktsegment = 'MACHINERY'
        |   OR c_custkey IN (SELECT o_custkey FROM graft_ord_ex
        |                    WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** MERGE/upsert semantics via full-outer join + coalesce: a base
    * snapshot merged with a change set — matched rows take the update,
    * unmatched-left rows survive, unmatched-right rows insert, and the
    * action column labels which case fired (the audit column a real
    * MERGE emits). Both sides are derived deterministically from
    * orders so the oracle sees identical inputs. Scale: one shuffle on
    * the merge key; with both sides bucketed on the key the exchange
    * disappears entirely (join_bucketed proves that plan). */
  def joinMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val updates = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") * 1.1).as("new_price"),
        lit("U").as("new_status"))
    base.join(updates, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        Fp.r4(coalesce(col("new_price"), col("o_totalprice"))).as("price"),
        coalesce(col("new_status"), col("o_orderstatus")).as("status"),
        when(col("new_price").isNotNull && col("o_totalprice").isNotNull, "updated")
          .when(col("o_totalprice").isNull, "inserted")
          .otherwise("kept").as("action"))
      .orderBy("o_orderkey")
  }

  /** Sets the runtime-Bloom-filter confs (thresholds test-sized down —
    * at 100 TB the production defaults of 10 MB creation side / 10 GB
    * application side fire on exactly this shape), runs `body`, and
    * restores the previous conf state so no other query's plan is
    * perturbed. Conf-scoped because runtime filter injection is an
    * optimizer decision, not a DataFrame-level hint. */
  def withBloomConfs[A](s: SparkSession)(body: => A): A = {
    val conf = s.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // keep a shuffle join: broadcast joins don't take runtime filters,
      // and the 100 TB shape this models has a dim above the threshold
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  /** The join shape runtime Bloom pruning exists for: a selective dim
    * filter (suppliers of one nation) joined to the full fact table.
    * The optimizer builds a Bloom filter from the filtered dim and
    * injects it into the LINEITEM scan, dropping ~96% of fact rows
    * BEFORE the shuffle — at 100 TB the difference between shuffling
    * the whole fact table and shuffling the ~4% that can join.
    * Plan injection asserted in ScaleSpec on this exact dataflow. */
  def bloomJoinShape(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice")
    val dim = t(s, dir, "supplier")
      .filter(col("s_nationkey") === 3)
      .select("s_suppkey")
    big.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_lines"),
        Fp.r4(sum("l_extendedprice")).as("revenue"))
      .orderBy("s_suppkey")
  }

  /** [[bloomJoinShape]] executed under [[withBloomConfs]]: the eager
    * localCheckpoint forces execution while the runtime-filter confs
    * are active, then the confs are restored — the declared query
    * really runs the Bloom-pruned plan, and session state leaks to no
    * other query. Pruning cannot change the result (a Bloom filter
    * only drops rows the join would drop), which is exactly what the
    * oracle hash-check proves. */
  def joinBloomPruned(s: SparkSession, dir: String): DataFrame =
    withBloomConfs(s) { bloomJoinShape(s, dir).localCheckpoint(true) }

  /** Dynamic partition pruning (DPP): lineitem physically partitioned
    * by ship month (83 partitions), joined to a month-dim carrying a
    * quarter attribute, dim filtered on the QUARTER — a predicate no
    * static pruner can push into the fact scan because the
    * month↔quarter mapping lives in the dim. At planning time Spark
    * injects a DynamicPruningExpression into the fact scan's partition
    * filters (asserted in ScaleSpec): the dim's surviving join keys —
    * reusing the broadcast the join needs anyway — prune the fact to
    * 3 of 83 partitions BEFORE any fact I/O. At 100 TB this is the
    * difference between scanning one quarter and scanning seven years;
    * it composes with join_bloom_pruned (row-level) as the
    * partition-level half of runtime filtering. Both side tables are
    * written once per (tmpdir, sfDir), untimed in Bench's setup phase
    * like join_bucketed's buckets. */
  def joinDpp(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_dpp_$tag"
    val factPath = s"$base/li_by_month"
    val dimPath = s"$base/months"
    if (!new java.io.File(s"$factPath/_SUCCESS").exists()) {
      val withYm = t(s, dir, "lineitem")
        .withColumn("ship_ym", date_format(col("l_shipdate"), "yyyy-MM"))
      withYm
        .select("l_orderkey", "l_quantity", "l_extendedprice", "ship_ym")
        .write.partitionBy("ship_ym").mode("overwrite").parquet(factPath)
      withYm
        .select(col("ship_ym").as("m_ym"),
          concat(year(col("l_shipdate")), lit("-Q"),
            quarter(col("l_shipdate"))).as("m_quarter"))
        .distinct()
        .coalesce(1).write.mode("overwrite").parquet(dimPath)
    }
    val fact = s.read.parquet(factPath)
    val dim = s.read.parquet(dimPath)
    fact.join(dim, fact("ship_ym") === dim("m_ym"))
      .filter(col("m_quarter") === "1996-Q1")
      .groupBy("ship_ym")
      .agg(count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("ship_ym")
  }

  /** Join strategy HINT surface: `hint("shuffle_hash")` forces a
    * ShuffledHashJoin (asserted in RelationalSpec) where the
    * cost model would pick sort-merge. SHJ skips the sort on BOTH
    * sides — the right call when the build side's per-partition slice
    * fits in memory and the probe side is large: at 100 TB that's a
    * per-partition hash map over customer slices vs two full
    * fact-table sorts. The hint is advisory metadata on the logical
    * plan: same join result, same single shuffle per side, different
    * physical operator — which is exactly what the oracle (plain
    * join) checks. */
  def joinHintShj(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer").hint("shuffle_hash")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("c_mktsegment")
  }

  /** POINT-IN-TIME TEMPORAL JOIN against the SCD2 dimension history
    * (pipeline_scd2's output) — the feature-store correctness query:
    * for every purchase, the user's state interval active at t =
    * purchase−1s ("what was the user doing just before buying"). A
    * training pipeline that joins features without PIT semantics leaks
    * the future into the label; this operator is the leak-free shape.
    *
    * Scale: the MERGE formulation, not the join+rank asof shape —
    * dimension changes and probes union into one frame, ONE hash
    * shuffle on user_id + one per-user sort, and `last(state ignore
    * nulls)` over the interleaved ordering resolves every probe in a
    * single window pass. The join+rank asof (join_asof) fans out
    * probe × all-earlier-candidates before pruning; for a dimension
    * with a long history per key the merge shape does |probes|+|dims|
    * work per key instead. Ordering (t, is_probe, tie) puts a change
    * AT t before a probe AT t (valid_from inclusive) and orders
    * same-second changes by event id — exactly the zero-length-
    * interval semantics of the SCD2 build. The ORACLE deliberately
    * replays the INTERVAL formulation (valid_from ≤ t < valid_to over
    * the rebuilt history), so the hash proves merge ≡ interval
    * semantics rather than both engines running the same plan. */
  def joinTemporal(s: SparkSession, dir: String): DataFrame = {
    val dims = WindowQueries.pipelineScd2(s, dir)
    val probes = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), (col("ts_s") - 1).as("t"))
    val d = dims.select(col("user_id"), col("valid_from").as("t"),
      lit(0).as("is_probe"), col("first_event_id").as("tie"),
      col("event_type").as("state"), col("valid_from"),
      lit(null).cast("long").as("event_id"))
    val p = probes.select(col("user_id"), col("t"),
      lit(1).as("is_probe"), col("event_id").as("tie"),
      lit(null).cast("string").as("state"),
      lit(null).cast("long").as("valid_from"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy("t", "is_probe", "tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.unionByName(p)
      .withColumn("cur_state", last(col("state"), ignoreNulls = true).over(w))
      .withColumn("cur_from", last(col("valid_from"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1 && col("cur_state").isNotNull)
      .select(col("event_id"), col("user_id"), col("t"),
        col("cur_state").as("state"), col("cur_from").as("valid_from"))
      .orderBy("event_id")
  }

  /** join_fuzzy — edit-distance-≤1 similarity join between a "dirty"
    * vocabulary and the clean catalog vocabulary, via SymSpell-style
    * deletion-neighborhood blocking.
    *
    * The dirty side is derived deterministically (every 7th part
    * contributes its first name-word with one hash-selected character
    * deleted — the text_pii_scrub "inject the defect so the operator
    * is provably exercised" pattern); the corpus also carries NATURAL
    * ed-1 pairs (red/rod, cold/old), so matches are not only the
    * injected ones.
    *
    * Scale: a similarity join must never compare |V|² pairs. For
    * max-ed 1, keys(w) = {w} ∪ {w minus one char} is a COMPLETE
    * blocking: if ed(a,b) ≤ 1 then a and b share a key (equal → w;
    * insert/delete → the shorter word itself; substitution at i →
    * both i-deletions agree). Both vocabularies explode into ≤ len+1
    * short-string keys, candidates come from one equi-join on the
    * key, and only candidates pay a levenshtein verify. Per-key
    * populations are bounded by the alphabet (26 same-length words
    * per deletion key), so the join never quadratically blows up.
    * The ORACLE is the brute-force |V_dirty|×|V_clean| cross join —
    * the hash proves the blocking loses no pair. */
  /** Identity + all single-char deletions of the word in column `w` —
    * the SymSpell max-ed-1 blocking key set; array_union dedups so a
    * repeated character can't emit the same key twice from one word.
    * Shared with DedupQueries.pipelineEntityResolution. */
  private[graft] def fuzzyDelKeys(w: String) = expr(
    s"""array_union(array($w), transform(sequence(1, length($w)),
       |  i -> concat(substring($w, 1, i - 1), substring($w, i + 1))))"""
      .stripMargin)

  /** The clean part-name vocabulary with occurrence counts. */
  private[graft] def fuzzyCleanVocab(part: DataFrame): DataFrame = part
    .select(explode(split(col("p_name"), " ")).as("w"))
    .groupBy("w").agg(count(lit(1)).as("n_parts"))

  /** The deterministically-typo'd vocabulary: every 7th part
    * contributes its first name-word with one hash-selected character
    * deleted (the text_pii_scrub "inject the defect so the operator is
    * provably exercised" pattern). */
  private[graft] def fuzzyDirtyVocab(part: DataFrame): DataFrame = part
    .filter(col("p_partkey") % 7 === 0)
    .select(expr("element_at(split(p_name, ' '), 1)").as("fw"),
      col("p_partkey"))
    .withColumn("k", expr("CAST((p_partkey div 7) % length(fw) AS INT) + 1"))
    .select(expr("concat(substring(fw, 1, k - 1), substring(fw, k + 1))")
      .as("dw"))
    .groupBy("dw").agg(count(lit(1)).as("n_dirty"))

  def joinFuzzy(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val clean = fuzzyCleanVocab(part)
    val dirty = fuzzyDirtyVocab(part)
    val cand = dirty.select(col("dw"), explode(fuzzyDelKeys("dw")).as("key"))
      .join(clean.select(col("w"), explode(fuzzyDelKeys("w")).as("key")), "key")
      .select("dw", "w").distinct()
      .filter(levenshtein(col("dw"), col("w")) <= 1)
    cand
      .join(broadcast(dirty), "dw").join(broadcast(clean), "w")
      .select(col("dw").as("dirty_w"), col("w").as("clean_w"),
        levenshtein(col("dw"), col("w")).cast("long").as("ed"),
        col("n_dirty"), col("n_parts"))
      .orderBy("dirty_w", "clean_w")
  }

  /** pipeline_snapshot_diff — CDC-style diff of the per-user state
    * between two snapshot instants T1 < T2 (the 2% and 50% points of
    * the observed time range, derived in-plan so both engines compute
    * the identical cutoffs; T1 sits early because the user base is
    * fully onboarded within the first ~6% of the range — a later T1
    * would leave the "added" class vacuously empty): which users were
    * added, which changed state, which are unchanged.
    *
    * Scale: the naive shape materializes both snapshots and full-outer
    * joins them — two scans plus a join shuffle. Here both snapshot
    * states come out of ONE groupBy over one scan via conditional
    * max(struct(ts_ns, event_id, event_type)) aggregates (the struct's
    * leading columns make the argmax total-ordered and partition-order
    * independent), so the diff costs a single user_id shuffle with
    * map-side combine and no join at all. The oracle replays the
    * two-snapshot LEFT JOIN formulation — the hash proves
    * one-pass-conditional-agg ≡ snapshot-join semantics. */
  def pipelineSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select("user_id", "event_type", "ts_s", "ts_ns", "event_id")
    val cuts = e.agg(min("ts_s").as("lo"), max("ts_s").as("hi"))
      .select(expr("lo + (hi - lo) div 50").as("t1"),
        expr("lo + (hi - lo) div 2").as("t2"))
    def stateAt(cut: org.apache.spark.sql.Column) =
      max(when(col("ts_s") <= cut,
        struct(col("ts_ns"), col("event_id"), col("event_type"))))
    e.crossJoin(broadcast(cuts))
      .groupBy("user_id")
      .agg(stateAt(col("t1")).as("s1"), stateAt(col("t2")).as("s2"))
      .select(col("user_id"), col("s1.event_type").as("v1"),
        col("s2.event_type").as("v2"))
      .filter(col("v2").isNotNull) // all-future users are in neither snapshot
      .withColumn("class",
        when(col("v1").isNull, lit("added"))
          .when(col("v1") === col("v2"), lit("unchanged"))
          .otherwise(lit("changed")))
      .groupBy("class")
      .agg(count(lit(1)).as("n_users"), sum("user_id").as("user_id_sum"))
      .orderBy("class")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_fuzzy" -> joinFuzzy,
    "pipeline_snapshot_diff" -> pipelineSnapshotDiff,
    "join_temporal" -> joinTemporal,
    "join_hint_shj" -> joinHintShj,
    "join_dpp" -> joinDpp,
    "join_bloom_pruned" -> joinBloomPruned,
    "join_merge_upsert" -> joinMergeUpsert,
    "join_existence" -> joinExistence,
    "join_bucketed" -> joinBucketed,
    "join_salted" -> joinSalted,
    "join_broadcast" -> joinBroadcast,
    "join_shuffle" -> joinShuffle,
    "join_multi" -> joinMulti,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_outer" -> joinOuter,
    "join_theta" -> joinTheta,
    "join_asof" -> joinAsof,
    "join_asof_fwd" -> joinAsofFwd,
    "join_asof_nearest" -> joinAsofNearest,
    "join_range_binned" -> joinRangeBinned,
    "join_interval_overlap" -> joinIntervalOverlap,
    "join_nullsafe" -> joinNullsafe)

  val oracleSql: Map[String, String] = Map(
    // brute-force |Vd|×|Vc| levenshtein join — the hash proves the
    // deletion-neighborhood blocking loses no ed≤1 pair
    "join_fuzzy" ->
      """WITH clean AS (SELECT w, count(*) AS n_parts FROM (
        |    SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
        |  GROUP BY w),
        |dirty AS (SELECT dw, count(*) AS n_dirty FROM (
        |    SELECT substr(fw, 1, k - 1) || substr(fw, k + 1) AS dw
        |    FROM (SELECT string_split(p_name, ' ')[1] AS fw,
        |        CAST((p_partkey // 7) % length(string_split(p_name, ' ')[1])
        |          AS INTEGER) + 1 AS k
        |      FROM part WHERE p_partkey % 7 = 0))
        |  GROUP BY dw)
        |SELECT d.dw AS dirty_w, c.w AS clean_w,
        |  CAST(levenshtein(d.dw, c.w) AS BIGINT) AS ed,
        |  d.n_dirty, c.n_parts
        |FROM dirty d JOIN clean c ON levenshtein(d.dw, c.w) <= 1
        |ORDER BY dirty_w, clean_w""".stripMargin,
    // the two-snapshot LEFT JOIN formulation — a different algorithm
    // than the Spark one-pass conditional aggregate, same semantics
    "pipeline_snapshot_diff" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_ns(ts) AS ts_ns,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s
        |  FROM events),
        |b AS (SELECT min(ts_s) AS lo, max(ts_s) AS hi FROM e),
        |cut AS (SELECT lo + (hi - lo) // 50 AS t1,
        |    lo + (hi - lo) // 2 AS t2 FROM b),
        |s1 AS (SELECT user_id, event_type AS v1 FROM (
        |    SELECT user_id, event_type, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts_ns DESC, event_id DESC)
        |      AS rn FROM e, cut WHERE ts_s <= t1) WHERE rn = 1),
        |s2 AS (SELECT user_id, event_type AS v2 FROM (
        |    SELECT user_id, event_type, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts_ns DESC, event_id DESC)
        |      AS rn FROM e, cut WHERE ts_s <= t2) WHERE rn = 1),
        |cls AS (SELECT s2.user_id,
        |    CASE WHEN s1.user_id IS NULL THEN 'added'
        |      WHEN s1.v1 = s2.v2 THEN 'unchanged'
        |      ELSE 'changed' END AS class
        |  FROM s2 LEFT JOIN s1 ON s1.user_id = s2.user_id)
        |SELECT class, count(*) AS n_users,
        |  CAST(sum(user_id) AS BIGINT) AS user_id_sum
        |FROM cls GROUP BY class ORDER BY class""".stripMargin,
    // the INTERVAL formulation over the rebuilt SCD2 history — a
    // different algorithm than the Spark merge-window, same semantics
    "join_temporal" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s FROM events),
        |ch AS (SELECT user_id, event_id, event_type, ts_s,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) AS prev FROM e),
        |chg AS (SELECT * FROM ch
        |  WHERE prev IS NULL OR prev <> event_type),
        |d AS (SELECT user_id, event_type, ts_s AS valid_from,
        |    lead(ts_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) AS valid_to FROM chg),
        |p AS (SELECT event_id, user_id, ts_s - 1 AS t FROM e
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.t,
        |  d.event_type AS state, d.valid_from
        |FROM p JOIN d ON d.user_id = p.user_id
        |  AND d.valid_from <= p.t
        |  AND (d.valid_to IS NULL OR p.t < d.valid_to)
        |ORDER BY p.event_id""".stripMargin,
    // the hint changes the physical operator, never the result
    "join_hint_shj" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // DPP is pure pruning — the result is the quarter-filtered
    // aggregate over the original table, which is what DuckDB replays
    "join_dpp" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_ym,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM lineitem
        |WHERE year(l_shipdate) = 1996 AND quarter(l_shipdate) = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the Bloom filter is pure pruning — the joined/aggregated result
    // is the plain filtered join, which is what DuckDB replays
    "join_bloom_pruned" ->
      """SELECT s_suppkey, count(*) AS n_lines,
        |  floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    // same single IEEE multiply then r4 on both engines
    "join_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |upd AS (SELECT o_orderkey,
        |    o_totalprice * CAST(1.1 AS DOUBLE) AS new_price,
        |    'U' AS new_status
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT o_orderkey,
        |  floor(coalesce(new_price, o_totalprice) * 10000.0 + 0.5) / 10000.0
        |    AS price,
        |  coalesce(new_status, o_orderstatus) AS status,
        |  CASE WHEN new_price IS NOT NULL AND o_totalprice IS NOT NULL
        |         THEN 'updated'
        |       WHEN o_totalprice IS NULL THEN 'inserted'
        |       ELSE 'kept' END AS action
        |FROM base FULL OUTER JOIN upd USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "join_existence" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE c_mktsegment = 'MACHINERY'
        |   OR c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    // IS NOT DISTINCT FROM is the portable spelling of <=>; NULL
    // groups must match and survive
    "join_nullsafe" ->
      """WITH o AS (SELECT nullif(o_orderkey % 10, 7) AS k,
        |    count(*) AS n_orders FROM orders GROUP BY 1),
        |l AS (SELECT nullif(l_orderkey % 10, 7) AS k,
        |    count(*) AS n_lines FROM lineitem GROUP BY 1)
        |SELECT o.k, n_orders, n_lines
        |FROM o JOIN l ON o.k IS NOT DISTINCT FROM l.k
        |ORDER BY o.k NULLS FIRST""".stripMargin,
    // plain inequality joins on the oracle side — DuckDB's IEJoin takes
    // the overlap predicate directly; Spark's binning + pair distinct is
    // a pruning strategy that cannot change the result
    "join_interval_overlap" ->
      """WITH i AS (SELECT CAST(i AS INTEGER) AS ival_id,
        |    1704067200 + i*61777 AS ival_start,
        |    1704067200 + i*61777 + 20000 AS ival_end
        |  FROM range(40) t(i)),
        |e AS (SELECT user_id, event_id,
        |    epoch_ns(ts) // 1000000000 AS ts_s FROM events),
        |b AS (SELECT user_id, event_id, ts_s,
        |    CASE WHEN ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |s AS (SELECT user_id, ts_s,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM b),
        |sess AS (SELECT user_id, session_id,
        |    min(ts_s) AS start_s, max(ts_s) + 1 AS end_s
        |  FROM s GROUP BY 1, 2)
        |SELECT ival_id, count(*) AS n_sessions,
        |  CAST(sum(least(sess.end_s, i.ival_end)
        |         - greatest(sess.start_s, i.ival_start)) AS BIGINT) AS overlap_s
        |FROM sess JOIN i
        |  ON sess.start_s < i.ival_end AND i.ival_start < sess.end_s
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_range_binned" ->
      """WITH i AS (SELECT CAST(i AS INTEGER) AS ival_id,
        |    1704067200 + i*61777 AS start_s,
        |    1704067200 + i*61777 + 20000 AS end_s
        |  FROM range(40) t(i)),
        |e AS (SELECT epoch_ns(ts) // 1000000000 AS ts_s, value FROM events)
        |SELECT ival_id, count(*) AS n_events,
        |  floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
        |FROM e JOIN i ON e.ts_s >= i.start_s AND e.ts_s < i.end_s
        |GROUP BY ival_id ORDER BY ival_id""".stripMargin,
    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
        |JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey""".stripMargin,
    "join_salted" ->
      """SELECT s_nationkey,
        |  floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "join_bucketed" ->
      """SELECT c_nationkey,
        |  floor((sum(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "join_shuffle" ->
      """SELECT c_nationkey, floor((sum(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "join_multi" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND year(o_orderdate) = 1995)
        |ORDER BY c_custkey""".stripMargin,
    "join_outer" ->
      """SELECT o_orderkey, count(l_orderkey) AS n_items, count(*) AS n_rows
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "join_theta" ->
      """SELECT p_partkey, count(*) AS n_lines
        |FROM (SELECT l_extendedprice FROM lineitem WHERE l_orderkey < 2000) l
        |JOIN (SELECT p_partkey, p_retailprice FROM part WHERE p_partkey % 100 = 0) p
        |  ON l.l_extendedprice >= p.p_retailprice
        | AND l.l_extendedprice < p.p_retailprice * 3
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,
    "join_asof_fwd" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_ns(ts) AS ts_ns FROM events),
        |p AS (SELECT event_id, user_id, ts_ns FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS c_user, event_id AS click_id,
        |        ts_ns AS c_ts FROM e WHERE event_type = 'click'),
        |m AS (SELECT p.event_id, c.click_id,
        |        (c.c_ts - p.ts_ns) // 1000000 AS gap_ms,
        |        row_number() OVER (PARTITION BY p.event_id
        |                           ORDER BY c.c_ts, c.click_id) AS rn
        |      FROM p JOIN c ON c.c_user = p.user_id
        |        AND c.c_ts > p.ts_ns
        |        AND c.c_ts <= p.ts_ns + 86400000000000)
        |SELECT p.event_id, p.user_id, m.click_id, m.gap_ms
        |FROM p LEFT JOIN m ON m.event_id = p.event_id AND m.rn = 1
        |ORDER BY p.event_id""".stripMargin,
    "join_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_ns(ts) AS ts_ns FROM events),
        |p AS (SELECT event_id, user_id, ts_ns FROM e
        |      WHERE event_type = 'purchase'),
        |g AS (SELECT user_id AS s_user, event_id AS signup_id,
        |        ts_ns AS s_ts FROM e WHERE event_type = 'signup'),
        |m AS (SELECT p.event_id, g.signup_id,
        |        (g.s_ts - p.ts_ns) // 1000000 AS delta_ms,
        |        row_number() OVER (PARTITION BY p.event_id
        |          ORDER BY abs(g.s_ts - p.ts_ns), g.s_ts, g.signup_id) AS rn
        |      FROM p JOIN g ON g.s_user = p.user_id
        |        AND g.s_ts >= p.ts_ns - 86400000000000
        |        AND g.s_ts <= p.ts_ns + 86400000000000)
        |SELECT p.event_id, p.user_id, m.signup_id, m.delta_ms
        |FROM p LEFT JOIN m ON m.event_id = p.event_id AND m.rn = 1
        |ORDER BY p.event_id""".stripMargin,
    "join_asof" ->
      """SELECT event_id, user_id, o_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey
        |   AND o.o_orderdate <= date_trunc('second', e.ts)
        |  WHERE e.event_type = 'purchase') x
        |WHERE rn = 1 ORDER BY event_id""".stripMargin)
}
