package graft.operators

import graft.Fp
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregations (SURVEY §2B; reference ops R20/R22/R25 —
  * accuracy agg ipynb:301-305, confusion-matrix pivot ipynb:380).
  *
  * Scale notes: all grouped aggregates compile to HashAggregateExec
  * with partial (map-side) + final phases, so the shuffle carries one
  * row per (partition × group), not per input row. Doubles rounded to
  * 4 decimals AFTER aggregation for FP-stable oracle hashing.
  */
object AggQueries {

  /** TPC-H-Q1-shaped hash aggregate over lineitem. */
  def aggHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Fp.r4(sum("l_quantity")).as("sum_qty"),
        Fp.r4(sum("l_extendedprice")).as("sum_base_price"),
        Fp.r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        Fp.r4(avg("l_quantity")).as("avg_qty"),
        Fp.r4(avg("l_extendedprice")).as("avg_price"),
        Fp.r4(avg("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** count(distinct) per group — Catalyst plans the distinct via
    * Expand + two-phase aggregate; at scale the partial distinct
    * happens before the shuffle. */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_items"))
      .orderBy("l_suppkey")

  /** HLL approximate distinct users with a DRIVER-VISIBLE invariant
    * (the agg_approx_quantile sandwich pattern): the engine-private
    * estimate is published as `abs(approx − exact) ≤ 5% · exact`
    * alongside the exact distinct count, both computed in the SAME
    * single aggregate — so the oracle (which can express the exact
    * count but not the HLL value) hash-checks a deterministically-true
    * boolean instead of recording `no_oracle`. rsd = 0.01 puts the
    * estimate ~1% from exact, 5 standard deviations inside the band.
    * The exact countDistinct is verification scaffolding: at 100 TB
    * the production call is the approx alone (one pass, bounded
    * sketch memory, no Expand); the raw-estimate path stays covered
    * by PropertySpec's global ±5% self-check. */
  /** HLL estimate next to the exact count, published as the sandwich
    * invariant. Mixing a distinct agg (the exact count) with
    * non-distinct aggs in ONE aggregate plans an Expand — the input
    * fans ×2 through the shuffle. HLL is insensitive to duplicates,
    * so pre-aggregating to (event_type, user_id) pairs first yields
    * the IDENTICAL estimate while replacing the Expand with two
    * narrow hash aggregates (the first map-side-combined on the pair
    * key): n_users = pair count, n = Σ per-pair counts. */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("ap"),
        count(lit(1)).as("n_users"),
        sum("cnt").as("n"))
      .select(col("event_type"),
        (abs(col("ap") - col("n_users")) <= lit(0.05) * col("n_users"))
          .as("within_band"),
        col("n_users"), col("n"))
      .orderBy("event_type")

  /** Revenue by (nation, mktsegment) with ROLLUP subtotal rows.
    * Null ordering pinned to NULLS FIRST to match Spark's asc default
    * (DuckDB defaults to NULLS LAST — oracle says NULLS FIRST
    * explicitly). */
  def aggRollup(s: SparkSession, dir: String): DataFrame = {
    // SQL form: the DataFrame rollup trips Spark's ambiguous-self-join
    // detector on the joined frame (dataset-id metadata), while the
    // SQL path resolves cleanly. BROADCAST hint keeps nation local.
    t(s, dir, "customer").createOrReplaceTempView("graft_customer")
    t(s, dir, "nation").createOrReplaceTempView("graft_nation")
    t(s, dir, "orders").createOrReplaceTempView("graft_orders")
    s.sql(
      """SELECT /*+ BROADCAST(graft_nation) */ n_name, c_mktsegment,
        |  floor(sum(o_totalprice) * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |    / CAST(10000.0 AS DOUBLE) AS revenue, count(*) AS n_orders
        |FROM graft_orders
        |JOIN graft_customer ON o_custkey = c_custkey
        |JOIN graft_nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin)
  }

  /** CUBE over (event_type, year) on events. */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("yr", year(col("ts")))
      .cube("event_type", "yr")
      .agg(count(lit(1)).as("n"),
        Fp.r4(sum("value")).as("sum_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("yr"))

  /** Confusion-matrix shape (reference R25, ipynb:380): label vs a
    * deterministic predicted bucket (vec_id % 10), pivoted to a dense
    * 10×10 count matrix with zero fill. */
  def aggPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .withColumn("pred", (col("vec_id") % 10).cast("int"))
      .groupBy("label")
      .pivot("pred", 0 to 9)
      .count()
      .na.fill(0L)
      .orderBy("label")

  /** Reference R22 verbatim shape (ipynb:303-305): accuracy as the
    * mean of an equality predicate — single-row aggregate. */
  def aggAccuracy(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .agg(
        Fp.r4(avg(when(col("label") === (col("vec_id") % 10), 1.0).otherwise(0.0)))
          .as("accuracy"),
        count(lit(1)).as("n"))

  /** Exact interpolated percentiles per group (median + p90). Spark's
    * `percentile` and DuckDB's `quantile_cont` share the same linear-
    * interpolation definition; r4 absorbs FP association drift. */
  def aggQuantile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        Fp.r4(expr("percentile(o_totalprice, 0.5)")).as("p50"),
        Fp.r4(expr("percentile(o_totalprice, 0.9)")).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Discrete percentiles (percentile_disc / quantile_disc): returns
    * an ACTUAL data value, not an interpolation — the SQL-standard
    * WITHIN GROUP form. Exact across engines because both pick the
    * same element of the sorted group; r4 only normalizes the double
    * representation. */
  def aggQuantileDisc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        Fp.r4(expr(
          "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")).as("p50d"),
        Fp.r4(expr(
          "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")).as("p90d"))
      .orderBy("o_orderpriority")

  /** Moment statistics per group (sample stddev/variance). Both
    * engines compute the same estimator; partial-merge order differs,
    * so r4 is what makes the hash comparable. */
  def aggStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        Fp.r4(stddev_samp(col("l_extendedprice"))).as("sd_price"),
        Fp.r4(var_samp(col("l_quantity"))).as("var_qty"),
        Fp.r4(min("l_extendedprice")).as("min_price"),
        Fp.r4(max("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag")

  /** Nested-type aggregation: per-order lineitems collected into a
    * SORTED array of structs, then fields projected back out — the
    * document-assembly shape (one training example from N detail rows)
    * that pure scalar aggregates can't express. sort_array orders
    * structs lexicographically by field, matching the oracle's
    * list(... ORDER BY ln, qty); output is scalars so the driver
    * hash-compare stays array-free. */
  def aggCollectStruct(s: SparkSession, dir: String): DataFrame = {
    val items = sort_array(collect_list(
      struct(col("l_linenumber").as("ln"), col("l_quantity").as("qty"))))
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 2000)
      .groupBy("l_orderkey")
      .agg(items.as("items"))
      .select(col("l_orderkey"),
        size(col("items")).as("n_items"),
        element_at(col("items"), 1).getField("ln").as("first_ln"),
        Fp.r4(element_at(col("items"), 1).getField("qty")).as("first_qty"),
        element_at(col("items"), -1).getField("ln").as("last_ln"))
      .orderBy("l_orderkey")
  }

  /** Deterministic MODE (most frequent value per group): Spark's
    * builtin mode() breaks ties arbitrarily, so both engines compute
    * it as count + row_number with a value tie-break — identical
    * rankings by construction. Two-phase count then a tiny window over
    * (group × distinct-value) rows. */
  def aggMode(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("yr").orderBy(desc("cnt"), asc("o_orderpriority"))
    t(s, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy("yr", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("yr", "o_orderpriority", "cnt")
      .orderBy("yr")
  }

  /** Approximate percentile (t-digest style, like approx_count_distinct
    * for cardinality): the sketch path when the exact sort-based
    * percentile is too expensive. Implementation-specific estimates ⇒
    * self-checked (AggSpec: within the documented accuracy band of the
    * exact percentile), no DuckDB oracle. */
  /** Approximate percentile (KLL/GK-style sketch) with a DRIVER-VISIBLE
    * invariant: the approx median must land inside the EXACT discrete
    * [p45, p55] quantile sandwich. approx_percentile(…, 1000) bounds
    * rank error at n/1000 (≈0.1% of the group), far inside the ±5%
    * band, so `p50_in_band` is deterministically true — and the oracle
    * replays exactly that invariant, turning the engine-private sketch
    * value into a hash-checkable row instead of an unverifiable
    * `no_oracle` artifact. The raw sketch output itself stays covered
    * by the sketch self-checks (SketchSpec). */
  def aggApproxQuantile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap"),
        expr("percentile_disc(0.45) WITHIN GROUP (ORDER BY o_totalprice)").as("lo"),
        expr("percentile_disc(0.55) WITHIN GROUP (ORDER BY o_totalprice)").as("hi"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        (col("ap") >= col("lo") && col("ap") <= col("hi")).as("p50_in_band"),
        col("n"))
      .orderBy("o_orderpriority")

  /** Explicit GROUPING SETS — finer control than rollup/cube: totals
    * by (flag,status), by flag alone, and grand total, skipping the
    * by-status-alone set. */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  floor(sum(l_quantity) * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |    / CAST(10000.0 AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM graft_lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** Ordered funnel: per user, the earliest view / click / purchase
    * timestamps, kept only when they occur in funnel order — the
    * conversion-analysis aggregate every event pipeline ships. One
    * groupBy(user) with three conditional mins (single shuffle), then a
    * 5-row summary: stage reached × users, using integer epoch seconds
    * end-to-end so the oracle is exact. */
  def aggFunnel(s: SparkSession, dir: String): DataFrame = {
    val stageTs = t(s, dir, "events")
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts_s"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts_s"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts_s"))).as("t_purchase"))
    val stage = when(col("t_view").isNull, lit(0))
      .when(col("t_click").isNull || col("t_click") < col("t_view"), lit(1))
      .when(col("t_purchase").isNull || col("t_purchase") < col("t_click"), lit(2))
      .otherwise(lit(3))
    stageTs.withColumn("stage", stage)
      .groupBy("stage")
      .agg(count(lit(1)).as("n_users"), sum("user_id").as("user_id_sum"))
      .orderBy("stage")
  }

  /** max_by / min_by (argmax/argmin) per nation: which supplier holds
    * the extreme account balance. The ordering key is a (acctbal,
    * suppkey) struct so ties — impossible-to-rule-out on a double
    * column — resolve deterministically on both engines. One two-phase
    * hash aggregate; at scale each partial keeps a single champion row
    * per group, so the shuffle carries one row per (partition, group). */
  def aggMinmaxBy(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .groupBy("s_nationkey")
      .agg(
        max_by(col("s_name"), struct(col("s_acctbal"), col("s_suppkey"))).as("richest"),
        min_by(col("s_name"), struct(col("s_acctbal"), col("s_suppkey"))).as("poorest"),
        Fp.r4(max("s_acctbal")).as("max_bal"),
        Fp.r4(min("s_acctbal")).as("min_bal"))
      .orderBy("s_nationkey")

  /** Conditional / boolean aggregates: count_if, bool_and (every),
    * bool_or (any) — the "data-quality flags" aggregate shape. All
    * integer/boolean, so the oracle is exact. */
  def aggCountIf(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        count_if(col("value") > 50.0).as("n_high"),
        count_if(col("user_id") % 2 === 0).as("n_even_user"),
        bool_and(col("value") >= 0.0).as("all_nonneg"),
        bool_or(col("value") > 99.0).as("any_extreme"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Bitwise aggregates (bit_and/bit_or/bit_xor) — set-membership
    * fingerprints over integer keys; exact on both engines. */
  def aggBitagg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        bit_and(col("user_id")).as("band"),
        bit_or(col("user_id")).as("bor"),
        bit_xor(col("user_id")).as("bxor"))
      .orderBy("event_type")

  /** Bivariate statistics per group: Pearson correlation and
    * covariance between quantity and extended price. Co-moment
    * merging is order-sensitive in the last ulp (same exposure as
    * agg_stats' stddev, green through sf0.1); r4 rounding absorbs it. */
  def aggCorr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        Fp.r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
        Fp.r4(covar_pop(col("l_quantity"), col("l_extendedprice"))).as("cov_pop"),
        Fp.r4(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("cov_samp"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Daily OHLC bars per event_type — the time-series resample every
    * metrics/finance pipeline runs (open/high/low/close + volume).
    * Open/close are made deterministic under second-level ts ties by
    * ordering on (ts_ns, event_id): ONE window sort per (type, bar)
    * partition yields rn and the partition count, and the groupBy that
    * follows reuses the same hash partitioning — a single exchange for
    * the whole bar computation (AQE coalesces the reused exchange).
    * Sum-of-doubles is order-sensitive in the last ulp; Fp.r4 absorbs
    * it (the agg_stats pattern). */
  def aggOhlc(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events")
      .withColumn("bar", expr("ts_s div 86400"))
      .select("event_type", "bar", "ts_ns", "event_id", "value")
    val w = W.partitionBy("event_type", "bar").orderBy("ts_ns", "event_id")
    val wAll = W.partitionBy("event_type", "bar")
    e.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy("event_type", "bar")
      .agg(
        min(when(col("rn") === 1, col("value"))).as("open"),
        max("value").as("high"),
        min("value").as("low"),
        min(when(col("rn") === col("n"), col("value"))).as("close"),
        count(lit(1)).as("n_events"),
        Fp.r4(sum("value")).as("volume"))
      .orderBy("event_type", "bar")
  }

  /** Audience overlap matrix — |users(A) ∩ users(B)| for every pair of
    * event types (the segment-overlap report): one distinct
    * (type, user) projection (map-side partial distinct), then a
    * self-join ON user_id with type_a < type_b and a count per pair.
    * The join key is the USER, so each user contributes only its own
    * type-pairs (≤ k² rows for k event types) — never a cross of
    * audiences; output is k·(k−1)/2 rows at any scale. */
  def aggOverlap(s: SparkSession, dir: String): DataFrame = {
    val tu = t(s, dir, "events").select("event_type", "user_id").distinct()
    val a = tu.select(col("event_type").as("type_a"), col("user_id"))
    val b = tu.select(col("event_type").as("type_b"), col("user_id"))
    a.join(b, Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_both"), sum("user_id").as("user_id_sum"))
      .orderBy("type_a", "type_b")
  }

  /** Top-k frequent VALUES per profiled column — the other half of the
    * data-profiling pair (profile_stats gives shape, this gives
    * content: the values a schema-inference or drift monitor shows).
    * Same explode-to-(cname, val) unpivot as profile_stats, one
    * (cname, val) count, then a per-column top-3 with a value
    * tie-break. The per-column rank partitions are column-count many
    * (tiny), and the count aggregate partial-combines map-side, so
    * the shuffle carries one row per distinct value, not per row. */
  def profileTopvalues(s: SparkSession, dir: String): DataFrame = {
    val kvs = Seq(
      struct(lit("event_type").as("cname"), col("event_type").as("val")),
      struct(lit("user_mod").as("cname"),
        (col("user_id") % 10).cast("string").as("val")),
      struct(lit("dow").as("cname"),
        expr("CAST((ts_s div 86400) % 7 AS STRING)").as("val")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cname").orderBy(desc("c"), asc("val"))
    t(s, dir, "events")
      .select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.cname").as("cname"), col("kv.val").as("val"))
      .groupBy("cname", "val").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("cname", "rk", "val", "c")
      .orderBy("cname", "rk")
  }

  /** Time-BOUNDED conversion funnel — agg_funnel with conversion
    * windows (the strict product-analytics form): first view, then
    * first click within 24 h OF THAT VIEW, then first purchase within
    * 7 d OF THAT CLICK. Unbounded funnels (agg_funnel) overcount:
    * a purchase weeks later is not a conversion. Each stage is one
    * user_id-keyed min-aggregate joined to the previous stage — all
    * joins co-partition on user_id so the exchanges are reused, and
    * stage state per user is one timestamp. Exact integer seconds ⇒
    * exact oracle. */
  def aggFunnelWindow(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select("user_id", "event_type", "ts_s")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_s").as("t_view"))
    val fc = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts_s") > col("t_view") &&
        col("ts_s") <= col("t_view") + 86400L)
      .groupBy("user_id").agg(min("ts_s").as("t_click"))
    val fp = e.filter(col("event_type") === "purchase")
      .join(fc, "user_id")
      .filter(col("ts_s") > col("t_click") &&
        col("ts_s") <= col("t_click") + 7L * 86400L)
      .groupBy("user_id").agg(min("ts_s").as("t_purchase"))
    v.join(fc, Seq("user_id"), "left").join(fp, Seq("user_id"), "left")
      .withColumn("stage",
        when(col("t_purchase").isNotNull, lit(3))
          .when(col("t_click").isNotNull, lit(2))
          .otherwise(lit(1)))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_users"), sum("user_id").as("user_id_sum"))
      .orderBy("stage")
  }

  /** Cohort retention matrix — users bucketed by first-seen day, then
    * distinct-active counts per (cohort, day-offset ≤ 7): the product-
    * analytics staple. Two narrow projections of events: the cohort
    * side is a per-user min (one shuffle on user_id) and the activity
    * side a per-(user, day) distinct that co-partitions with it on
    * user_id — Catalyst reuses the hash partitioning for the join —
    * before the final small (cohort, offset) aggregate. All integer
    * math; output is bounded by days × 8 offsets regardless of event
    * volume. */
  def aggRetention(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), expr("ts_s div 86400").as("day"))
    val cohort = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    val active = e.distinct()
    active.join(cohort, "user_id")
      .withColumn("offset", col("day") - col("cohort_day"))
      .filter(col("offset") <= 7)
      .groupBy("cohort_day", "offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "offset")
  }

  /** Mergeable HLL sketches (DataSketches): per-(type, half) sketches
    * built independently, then UNIONED and estimated — the incremental
    * pattern that matters at 100 TB: daily/partition sketches persist
    * as bytes and merge without rescanning history, which
    * approx_count_distinct (single-pass) cannot do. The merged
    * estimate is engine-private, so (agg_approx_quantile pattern) the
    * query publishes the INVARIANT — merged estimate within ±5% of
    * the exact per-type distinct (default lgConfigK=12 ⇒ ~1.6%
    * relative error, 3σ inside the band) — plus the exact count and
    * sketch count, all DuckDB-expressible. The exact side is a
    * broadcast join of 5 rows; at scale the production path is the
    * sketch pipeline alone (PropertySpec keeps the raw-estimate ±5%
    * self-check). */
  def aggSketchUnion(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val merged = e
      .groupBy(col("event_type"), (col("event_id") % 2).as("half"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sketches"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("ap"))
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
    merged.join(broadcast(exact), "event_type")
      .select(col("event_type"), col("n_sketches"),
        (abs(col("ap") - col("n_users")) <= lit(0.05) * col("n_users"))
          .as("union_in_band"),
        col("n_users"))
      .orderBy("event_type")
  }

  /** Column-profiling pass (the data-quality first step of any
    * training-data pipeline): per column of events — row count, null
    * count, exact distinct count, and the string-form length range.
    * Shape matters at scale: several `count(distinct col)`s in ONE
    * aggregate plan an Expand (input × columns duplication feeding a
    * single-point aggregate); melting to (column, value) pairs feeds
    * a two-level aggregate instead — the first shuffle is bounded by
    * the DISTINCT value count per column (map-side partial combine),
    * the second touches one row per (column, value). Values are
    * profiled as strings (bigint/date/varchar string forms are
    * engine-identical); the double column is excluded — float
    * formatting is not oracle-portable. */
  def profileStats(s: SparkSession, dir: String): DataFrame = {
    val kvs = Seq(
      struct(lit("event_id").as("cname"),
        col("event_id").cast("string").as("val")),
      struct(lit("user_id").as("cname"),
        col("user_id").cast("string").as("val")),
      struct(lit("event_type").as("cname"),
        col("event_type").as("val")),
      struct(lit("day").as("cname"),
        col("ts").cast("date").cast("string").as("val")),
      struct(lit("props").as("cname"), col("props").as("val")))
    t(s, dir, "events")
      .select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.cname").as("cname"), col("kv.val").as("val"))
      .groupBy("cname", "val").agg(count(lit(1)).as("c"))
      .groupBy("cname")
      .agg(sum("c").as("n_rows"),
        coalesce(sum(when(col("val").isNull, col("c"))), lit(0L)).as("n_null"),
        count(col("val")).as("n_distinct"),
        min(length(col("val"))).as("min_len"),
        max(length(col("val"))).as("max_len"))
      .orderBy("cname")
  }

  /** One-pass pairwise Pearson CORRELATION MATRIX over the four
    * lineitem measures — the profiling step that decides which
    * features are redundant before a model ever trains. ONE scan +
    * one SINGLE-ROW aggregate computes all 14 shared moments (4 sums,
    * 4 sum-of-squares, 6 cross-products, map-side combined to one row
    * per partition), then a 1-row array explode reshapes them into
    * the 6 (pair, corr) rows — the naive alternative runs a separate
    * corr() pass per pair and scans 6×, and even a pair-unpivot
    * shuffles 6×|T| rows where this shuffles 14 numbers.
    *
    * Exactness (vs [[aggCorr]], which accepts last-ulp co-moment
    * noise and rounds it away): measures convert to integer CENTS
    * first and all five moments accumulate as DECIMAL(38,0) — exact
    * at any row count and partition order; int64 sums of squared
    * price cents overflow past ~10⁵ rows. The closed-form
    *   corr = (n·Σxy − ΣxΣy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
    * then evaluates in ONE double expression with the identical op
    * sequence in DuckDB (whose HUGEINT sums cast to the same
    * doubles), so the result is bit-identical before Fp.r4 even
    * applies. */
  def profileCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val names = Seq("qty", "price", "disc", "tax")
    val colOf = Map(
      "qty" -> "l_quantity", "price" -> "l_extendedprice",
      "disc" -> "l_discount", "tax" -> "l_tax")
    def cents(n: String) =
      expr(s"CAST(floor(${colOf(n)} * 100 + 0.5) AS BIGINT)")
    val pairs = Seq("qty" -> "price", "qty" -> "disc", "qty" -> "tax",
      "price" -> "disc", "price" -> "tax", "disc" -> "tax")
    val dec = "decimal(38,0)"
    // every moment the 6 pairs need, in ONE single-row aggregate over
    // one scan — nothing input-sized ever shuffles (the first cut of
    // this query exploded each row to its 6 pairs and shuffled 6×|T|
    // rows into a 6-key aggregate; the moments are shared, so compute
    // them once and reshape the 1-row result instead)
    val base = t(s, dir, "lineitem")
      .select(names.map(n => cents(n).as(n)): _*)
    val moments: Seq[Column] =
      names.flatMap(n => Seq(
        sum(col(n).cast(dec)).cast("double").as(s"s_$n"),
        sum((col(n) * col(n)).cast(dec)).cast("double").as(s"ss_$n"))) ++
        pairs.map { case (a, b) =>
          sum((col(a) * col(b)).cast(dec)).cast("double").as(s"sp_${a}_$b") }
    val m = base.agg(count(lit(1)).as("n"), moments: _*)
    val nD = col("n").cast("double")
    val rows = pairs.map { case (a, b) =>
      val num = nD * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      val den = sqrt((nD * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")) *
        (nD * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")))
      struct(lit(s"${a}_$b").as("pair"), Fp.r4(num / den).as("corr"))
    }
    m.select(col("n"), explode(array(rows: _*)).as("kv"))
      .select(col("kv.pair").as("pair"), col("n"), col("kv.corr").as("corr"))
      .orderBy("pair")
  }

  /** COUNT-MIN SKETCH frequency estimation — the mergeable
    * heavy-hitter sketch (Cormode–Muthukrishnan) every streaming
    * frequency pipeline runs: [[CmsDepth]] hash rows × [[CmsWidth]]
    * counters, estimate(key) = min over rows of its counter. Width is
    * deliberately SMALLER than the key cardinality so collisions are
    * real and the min-over-rows actually earns its keep; the CMS
    * one-sided-error invariant (never underestimates) rides along as
    * a column. Unlike the HLL queries (engine-private register
    * layout ⇒ sandwich oracle), a CMS with pinned integer hash seeds
    * is REPLAYABLE — the oracle rebuilds the identical sketch and the
    * estimates hash-match bit-exactly.
    *
    * Scale: the build is ONE (row, bucket) groupBy — ≤ depth·width
    * cells on the shuffle regardless of input size, map-side combined;
    * cell-wise addition makes sketches mergeable across partitions,
    * days, or streams. The probe joins the broadcast cell table. */
  val CmsDepth = 4
  val CmsWidth = 64
  val CmsP = 2147483647L // 2³¹−1, Mersenne
  private val cmsSeeds: Seq[(Long, Long)] =
    Seq((40503L, 17L), (104729L, 97L), (65521L, 1009L), (48611L, 8191L))
  private[graft] def cmsBucket(i: Int, key: String): String = {
    val (a, b) = cmsSeeds(i)
    s"((($key) * $a + $b) % $CmsP) % $CmsWidth"
  }
  private[graft] def cmsCells(key: String) = (0 until CmsDepth).map(i =>
    struct(lit(i).as("r"), expr(cmsBucket(i, key)).as("b")))

  /** Per-batch (or whole-input) sketch cell counts. */
  private[graft] def cmsSketch(keyed: DataFrame): DataFrame =
    keyed.select(explode(array(cmsCells("user_id"): _*)).as("c"))
      .groupBy(col("c.r").as("r"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Probe a (r, b, cnt) sketch for the user_id < 10 keys and attach
    * the exact counts + the one-sided-error invariant — shared by the
    * batch query and stream_cms (whose merged state must probe
    * identically). */
  private[graft] def cmsProbe(sketch: DataFrame, events: DataFrame): DataFrame = {
    val probes = events.filter(col("user_id") < 10)
    val est = probes.distinct()
      .select(col("user_id"), explode(array(cmsCells("user_id"): _*)).as("c"))
      .select(col("user_id"), col("c.r").as("r"), col("c.b").as("b"))
      .join(broadcast(sketch), Seq("r", "b"))
      .groupBy("user_id").agg(min("cnt").as("est"))
    val exact = probes.groupBy("user_id").agg(count(lit(1)).as("exact"))
    est.join(exact, "user_id")
      .select(col("user_id"), col("est"), col("exact"),
        (col("est") >= col("exact")).as("never_under"))
      .orderBy("user_id")
  }

  def aggCmsEstimate(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"))
    cmsProbe(cmsSketch(e), e)
  }

  /** Oracle generated from the same seed table — the constants can't
    * drift between engines. */
  private[graft] def cmsOracleSql: String = {
    def cellUnion(src: String, key: String, withKey: Boolean): String =
      (0 until CmsDepth).map { i =>
        val k = if (withKey) s"$key, " else ""
        s"SELECT $k$i AS r, ${cmsBucket(i, key)} AS b FROM $src"
      }.mkString("\n|  UNION ALL ")
    s"""WITH u AS (SELECT user_id FROM events),
       |cells AS (
       |  ${cellUnion("u", "user_id", withKey = false)}),
       |sketch AS (SELECT r, b, count(*) AS cnt FROM cells GROUP BY 1, 2),
       |p AS (SELECT DISTINCT user_id FROM u WHERE user_id < 10),
       |pc AS (
       |  ${cellUnion("p", "user_id", withKey = true)}),
       |est AS (SELECT user_id, CAST(min(cnt) AS BIGINT) AS est
       |        FROM pc JOIN sketch USING (r, b) GROUP BY 1),
       |ex AS (SELECT user_id, count(*) AS exact
       |       FROM u WHERE user_id < 10 GROUP BY 1)
       |SELECT user_id, est, exact, est >= exact AS never_under
       |FROM est JOIN ex USING (user_id) ORDER BY user_id""".stripMargin
  }

  /** BLOOM filter membership sketch — the fourth sketch in the family
    * (HLL: cardinality, CMS: frequency, KMV: distinct/Jaccard, Bloom:
    * MEMBERSHIP): k=[[CmsDepth]] pinned hashes (same seed table as
    * CMS — one constant family to audit) into [[CmsDepth]] rows of
    * [[BloomBits]] bits each (the blocked-Bloom layout; bits stored
    * as present (r, b) rows, ≤ depth·bits rows total at ANY input
    * scale). The reference set is the PURCHASER DENYLIST among the
    * first 64 user ids — small vs m so collisions are real but not
    * saturating; probes sweep user_id < 512, so both true members
    * and hash-collision FALSE POSITIVES provably appear, while the
    * one-sided-error invariant (member ⇒ in_bloom, no false
    * negatives) rides as a column. Bit sets are closed under UNION
    * (OR) — stream_bloom merges per-batch bits by distinct and
    * probes through this same code + oracle.
    *
    * Scale: build = one explode + distinct on ≤ depth·bits cells
    * (map-side combined); probe joins the BROADCAST bit table. */
  val BloomBits = 128
  private[graft] def bloomBucket(i: Int, key: String): String = {
    val (a, b) = cmsSeeds(i)
    s"((($key) * $a + $b) % $CmsP) % $BloomBits"
  }
  private[graft] def bloomCells(key: String) = (0 until CmsDepth).map(i =>
    struct(lit(i).as("r"), expr(bloomBucket(i, key)).as("b")))

  /** The reference ("denylist") keys: purchasers among user_id < 64. */
  private[graft] def bloomRefKeys(events: DataFrame): DataFrame = events
    .filter(col("event_type") === "purchase" && col("user_id") < 64)
    .select("user_id").distinct()

  /** Distinct set bits of the reference keys' cells. */
  private[graft] def bloomBuild(keys: DataFrame): DataFrame =
    keys.select(explode(array(bloomCells("user_id"): _*)).as("c"))
      .select(col("c.r").as("r"), col("c.b").as("b")).distinct()

  /** Probe user_id < 512 against a (r, b) bit set — shared by the
    * batch query and stream_bloom's merged state. */
  private[graft] def bloomProbe(bits: DataFrame, events: DataFrame): DataFrame = {
    val probes = events.filter(col("user_id") < 512)
      .select("user_id").distinct()
    val hits = probes
      .select(col("user_id"), explode(array(bloomCells("user_id"): _*)).as("c"))
      .select(col("user_id"), col("c.r").as("r"), col("c.b").as("b"))
      .join(broadcast(bits), Seq("r", "b"))
      .groupBy("user_id").agg(count(lit(1)).as("k_hits"))
    val members = bloomRefKeys(events).withColumn("is_member", lit(true))
    probes
      .join(hits, Seq("user_id"), "left_outer")
      .join(broadcast(members), Seq("user_id"), "left_outer")
      .select(col("user_id"),
        (coalesce(col("k_hits"), lit(0L)) === CmsDepth).as("in_bloom"),
        coalesce(col("is_member"), lit(false)).as("is_member"))
      .withColumn("no_false_negative", !col("is_member") || col("in_bloom"))
      .orderBy("user_id")
  }

  def aggBloom(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select("user_id", "event_type")
    bloomProbe(bloomBuild(bloomRefKeys(e)), e)
  }

  /** Oracle generated from the same seed table. */
  private[graft] def bloomOracleSql: String = {
    def cellUnion(src: String, key: String, withKey: Boolean): String =
      (0 until CmsDepth).map { i =>
        val k = if (withKey) s"$key, " else ""
        s"SELECT $k$i AS r, ${bloomBucket(i, key)} AS b FROM $src"
      }.mkString("\n|  UNION ALL ")
    s"""WITH ref AS (SELECT DISTINCT user_id FROM events
       |  WHERE event_type = 'purchase' AND user_id < 64),
       |bits AS (SELECT DISTINCT r, b FROM (
       |  ${cellUnion("ref", "user_id", withKey = false)})),
       |p AS (SELECT DISTINCT user_id FROM events WHERE user_id < 512),
       |pc AS (
       |  ${cellUnion("p", "user_id", withKey = true)}),
       |h AS (SELECT user_id, count(*) AS k_hits
       |      FROM pc JOIN bits USING (r, b) GROUP BY 1)
       |SELECT p.user_id,
       |  coalesce(h.k_hits, 0) = $CmsDepth AS in_bloom,
       |  (ref.user_id IS NOT NULL) AS is_member,
       |  (ref.user_id IS NULL) OR coalesce(h.k_hits, 0) = $CmsDepth
       |    AS no_false_negative
       |FROM p LEFT JOIN h USING (user_id)
       |  LEFT JOIN ref ON ref.user_id = p.user_id
       |ORDER BY p.user_id""".stripMargin
  }

  /** agg_rfm — RFM (recency / frequency / monetary) customer
    * segmentation over orders: the classic CRM scoring grid. Each
    * customer's R (days since last order, vs the in-plan corpus max
    * day), F (order count) and M (lifetime cents) are cut into three
    * bands at the discrete 33rd/66th percentiles of the CUSTOMER
    * distribution (percentile_disc — exact order statistics shared
    * bit-for-bit with DuckDB's quantile_disc, the agg_quantile_disc
    * precedent), then the population is counted per (r, f, m) cell.
    *
    * Scale: one custkey groupBy (map-side combined), a 1-row day max
    * and a 1-row six-threshold percentile frame broadcast back, and
    * a ≤27-cell final aggregate. All integer (epoch days, cents). */
  /** Orders projected to (custkey, epoch day, cents) — shared with
    * stream_rfm's chunk staging. */
  private[graft] def rfmOrders(o: DataFrame): DataFrame =
    o.select(col("o_custkey"),
      expr("(unix_micros(cast(o_orderdate as timestamp)) div 1000000) div 86400")
        .as("day"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))

  /** Per-customer (last_day, f, m) — the mergeable RFM state: max and
    * sums are associative, so per-batch states merge into exactly the
    * one-shot aggregate (stream_rfm's contract). */
  private[graft] def rfmState(o: DataFrame): DataFrame =
    o.groupBy("o_custkey").agg(max("day").as("last_day"),
      count(lit(1)).as("f"), sum("cents").as("m"))

  /** Threshold + scoring assembly from the per-customer state and the
    * 1-row corpus day max — shared verbatim with stream_rfm. */
  private[graft] def rfmAssemble(per: DataFrame, nowDay: DataFrame): DataFrame = {
    val rfm = per.crossJoin(broadcast(nowDay))
      .withColumn("r", col("now_day") - col("last_day"))
    val th = rfm.agg(
      expr("percentile_disc(0.33) WITHIN GROUP (ORDER BY r)").as("r33"),
      expr("percentile_disc(0.66) WITHIN GROUP (ORDER BY r)").as("r66"),
      expr("percentile_disc(0.33) WITHIN GROUP (ORDER BY f)").as("f33"),
      expr("percentile_disc(0.66) WITHIN GROUP (ORDER BY f)").as("f66"),
      expr("percentile_disc(0.33) WITHIN GROUP (ORDER BY m)").as("m33"),
      expr("percentile_disc(0.66) WITHIN GROUP (ORDER BY m)").as("m66"))
    def band(v: String, lo: String, hi: String, bestLow: Boolean) = {
      val (b3, b1) = if (bestLow) (3L, 1L) else (1L, 3L)
      when(col(v) <= col(lo), lit(b3))
        .when(col(v) <= col(hi), lit(2L)).otherwise(lit(b1))
    }
    rfm.crossJoin(broadcast(th))
      .select(col("o_custkey"),
        band("r", "r33", "r66", bestLow = true).as("r_score"),
        band("f", "f33", "f66", bestLow = false).as("f_score"),
        band("m", "m33", "m66", bestLow = false).as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        sum("o_custkey").as("custkey_sum"))
      .orderBy("r_score", "f_score", "m_score")
  }

  def aggRfm(s: SparkSession, dir: String): DataFrame = {
    val o = rfmOrders(t(s, dir, "orders"))
    rfmAssemble(rfmState(o), o.agg(max("day").as("now_day")))
  }

  /** K-MINIMUM-VALUES (bottom-k) distinct sketch — the third
    * cardinality sketch next to HLL (agg_approx_distinct) and bitmap
    * (agg_bitmap_distinct), and the one with a property the others
    * lack here: with a PINNED integer hash the whole sketch is
    * REPLAYABLE, so the oracle hash-checks the estimate itself, not a
    * sandwich band (Bar-Yossef et al.'s KMV / Beyer et al.'s
    * "distinct sampling" estimator: keep the K smallest hash values;
    * est = (K−1)·M ∕ h₍K₎ for hash space [0, M)).
    *
    * The sketched key is the (user_id, epoch-day) ACTIVITY PAIR per
    * event type — per-type daily-active cardinalities, the metric HLL
    * dashboards track. ak = user_id·10⁵ + day is injective (epoch
    * days < 10⁵ until year 2243), and because [[KmvM]] is prime with
    * multiplier coprime to it and ak < M, distinct keys map to
    * DISTINCT hashes — the bottom-k multiset is a true set, no dedup
    * pass needed. The ak < M precondition bounds user_id ≤ ~21,473
    * (and keeps the a·ak product far inside int64); FixtureSpec pins
    * the bound against the driver corpus, and a deployment with wider
    * ids would widen the pack (a 61-bit Mersenne field) rather than
    * silently alias.
    *
    * Scale: the distinct on (type, ak) pairs is the only data-scale
    * shuffle (narrow pair rows, map-side combined); per-type bottom-K
    * is a rank window that Spark 4's InferWindowGroupLimit rewrites
    * to a per-partition group limit — each map task keeps K rows per
    * type, never a full sort (the same native rewrite win_rank
    * documents). The K·|types| sketch rows then aggregate to one row
    * per type. Mergeability (union of bottom-k sets → re-take
    * bottom-k) is exercised pairwise by [[aggKmvJaccard]]. */
  val KmvK = 64
  val KmvM = 2147483647L // 2³¹−1 prime hash space
  val KmvA = 1103515245L // coprime to KmvM ⇒ injective on [0, M)
  val KmvB = 12345L
  private[graft] val kmvHashSqlSpark =
    s"(ak * $KmvA + $KmvB) % $KmvM"
  /** The activity key: (user, epoch-day) packed injectively. Shared
    * with stream_kmv's per-batch sketching. */
  private[graft] val kmvAkSqlSpark = "user_id * 100000 + (ts_s div 86400)"
  /** Distinct (event_type, activity-key) pairs — the sketched set. */
  private[graft] def kmvKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), expr(kmvAkSqlSpark).as("ak"))
      .distinct()
  /** Per-type bottom-K hash sketch (event_type, h). */
  private[graft] def kmvBottom(keys: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("h")
    keys.withColumn("h", expr(kmvHashSqlSpark))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
      .select("event_type", "h")
  }

  /** Turn a per-type bottom-K sketch into the published estimate row,
    * with exact counts from `keys` as verification scaffolding —
    * shared by the batch query and stream_kmv (whose merged state
    * must assemble identically). */
  private[graft] def kmvAssemble(bottom: DataFrame, keys: DataFrame): DataFrame = {
    val num = (KmvK - 1).toLong * KmvM // (K−1)·M, precomputed: 63·(2³¹−1)
    val sk = bottom.groupBy("event_type")
      .agg(count(lit(1)).as("k_in"), max("h").as("kth"))
    val ex = keys.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
    sk.join(ex, "event_type")
      // a sketch holding fewer than K values saw the WHOLE set — the
      // estimate is exact by construction
      .withColumn("est", when(col("k_in") < KmvK, col("k_in"))
        .otherwise(expr(s"CAST($num AS BIGINT) div kth")))
      .select("event_type", "k_in", "kth", "est", "n_exact")
      .orderBy("event_type")
  }

  def aggKmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val keys = kmvKeys(s, dir).localCheckpoint(true)
    kmvAssemble(kmvBottom(keys), keys)
  }

  /** KMV JACCARD between every event-type pair — sketch-space set
    * overlap (Broder's classic resemblance estimator on bottom-k
    * sketches): merge two types' sketches, re-take the K smallest of
    * the union (bottom-k is closed under union — the mergeability
    * that lets 1000 executors sketch independently), and count how
    * many of those K live in BOTH input sketches; Ĵ = n_both ∕ K.
    * The exact Jaccard over the same activity sets rides along for
    * comparison — at 100 TB only the sketch path runs (K·|types|
    * rows), the exact path here is verification scaffolding like
    * agg_approx_distinct's exact count. All-integer and pinned-hash
    * ⇒ the estimate itself hash-checks against the DuckDB replay.
    *
    * Plan shape: the type-pair grid is a theta self-join of the
    * |types|-row distinct frame (broadcast BNLJ on a 5-row side — the
    * agg_ttest pattern, allow-listed); the sketch/exact sides then
    * attach via equi-joins only. */
  def aggKmvJaccard(s: SparkSession, dir: String): DataFrame = {
    val keys = kmvKeys(s, dir).localCheckpoint(true)
    val bot = kmvBottom(keys).localCheckpoint(true) // K·|types| rows
    val types = bot.select("event_type").distinct()
    val tp = broadcast(types.withColumnRenamed("event_type", "ta"))
      .join(types.withColumnRenamed("event_type", "tb"),
        col("ta") < col("tb"))
    // union-of-sketches with membership flags, dedup'd per hash
    val inA = tp.join(bot.withColumnRenamed("event_type", "ta"), "ta")
      .select(col("ta"), col("tb"), col("h"),
        lit(1L).as("fa"), lit(0L).as("fb"))
    val inB = tp.join(bot.withColumnRenamed("event_type", "tb"), "tb")
      .select(col("ta"), col("tb"), col("h"),
        lit(0L).as("fa"), lit(1L).as("fb"))
    val u = inA.unionByName(inB)
      .groupBy("ta", "tb", "h")
      .agg(max("fa").as("fa"), max("fb").as("fb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ta", "tb").orderBy("h")
    val est = u.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("k_merged"),
        sum(col("fa") * col("fb")).as("n_both"))
      .withColumn("jac_est_pct",
        expr("(100 * n_both) div k_merged"))
    // exact overlap on the same activity sets (agg_overlap's shape)
    val nAll = keys.groupBy("event_type").agg(count(lit(1)).as("n"))
    val common = keys.as("x")
      .join(keys.as("y"),
        col("x.ak") === col("y.ak") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"),
        col("y.event_type").as("tb"))
      .agg(count(lit(1)).as("common"))
    est.join(common, Seq("ta", "tb"))
      .join(nAll.select(col("event_type").as("ta"), col("n").as("na")), "ta")
      .join(nAll.select(col("event_type").as("tb"), col("n").as("nb")), "tb")
      .withColumn("jac_exact_pct",
        expr("(100 * common) div (na + nb - common)"))
      .select("ta", "tb", "k_merged", "n_both", "jac_est_pct",
        "common", "jac_exact_pct")
      .orderBy("ta", "tb")
  }

  /** Shared oracle fragments: the DuckDB replay of [[kmvKeys]] and
    * [[kmvBottom]] (`//` ≡ Spark's `div` — both truncate toward
    * zero; ak and h are nonnegative anyway). */
  private def kmvKeysCte: String =
    s"""k AS (SELECT DISTINCT event_type,
       |    user_id * 100000 +
       |      (CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400) AS ak
       |  FROM events),
       |b AS (SELECT event_type, h FROM (
       |    SELECT event_type, (ak * $KmvA + $KmvB) % $KmvM AS h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY
       |        (ak * $KmvA + $KmvB) % $KmvM) AS rn
       |    FROM k) x WHERE rn <= $KmvK)""".stripMargin
  private[graft] def kmvDistinctOracleSql: String =
    s"""WITH ${kmvKeysCte},
       |sk AS (SELECT event_type, count(*) AS k_in, max(h) AS kth
       |       FROM b GROUP BY 1),
       |ex AS (SELECT event_type, count(*) AS n_exact FROM k GROUP BY 1)
       |SELECT event_type, k_in, kth,
       |  CAST(CASE WHEN k_in < $KmvK THEN k_in
       |    ELSE ${(KmvK - 1).toLong * KmvM} // kth END AS BIGINT) AS est,
       |  n_exact
       |FROM sk JOIN ex USING (event_type) ORDER BY event_type""".stripMargin
  private[graft] def kmvJaccardOracleSql: String =
    s"""WITH ${kmvKeysCte},
       |tp AS (SELECT x.event_type AS ta, y.event_type AS tb
       |       FROM (SELECT DISTINCT event_type FROM b) x,
       |            (SELECT DISTINCT event_type FROM b) y
       |       WHERE x.event_type < y.event_type),
       |u AS (SELECT ta, tb, h,
       |    max(CASE WHEN src = 'a' THEN 1 ELSE 0 END) AS fa,
       |    max(CASE WHEN src = 'b' THEN 1 ELSE 0 END) AS fb
       |  FROM (
       |    SELECT tp.ta, tp.tb, b.h, 'a' AS src
       |      FROM tp JOIN b ON b.event_type = tp.ta
       |    UNION ALL
       |    SELECT tp.ta, tp.tb, b.h, 'b' AS src
       |      FROM tp JOIN b ON b.event_type = tp.tb) s
       |  GROUP BY 1, 2, 3),
       |m AS (SELECT ta, tb, count(*) AS k_merged,
       |    CAST(sum(fa * fb) AS BIGINT) AS n_both
       |  FROM (SELECT ta, tb, h, fa, fb,
       |      row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
       |    FROM u) x WHERE rn <= $KmvK GROUP BY 1, 2),
       |nall AS (SELECT event_type, count(*) AS n FROM k GROUP BY 1),
       |cmn AS (SELECT x.event_type AS ta, y.event_type AS tb,
       |    count(*) AS common
       |  FROM k x JOIN k y ON x.ak = y.ak
       |    AND x.event_type < y.event_type
       |  GROUP BY 1, 2)
       |SELECT m.ta, m.tb, m.k_merged,
       |  m.n_both, (100 * m.n_both) // m.k_merged AS jac_est_pct,
       |  cmn.common,
       |  (100 * cmn.common) // (a.n + bb.n - cmn.common) AS jac_exact_pct
       |FROM m
       |JOIN cmn ON cmn.ta = m.ta AND cmn.tb = m.tb
       |JOIN nall a ON a.event_type = m.ta
       |JOIN nall bb ON bb.event_type = m.tb
       |ORDER BY m.ta, m.tb""".stripMargin

  /** DECLARATIVE DATA-QUALITY RULE EVALUATION (the Deequ/Great-
    * Expectations pattern): a rule set — completeness, uniqueness,
    * domain membership, range conformance — evaluated against the
    * event stream in ONE pass, each rule published as (metric,
    * threshold, passed). This is the admission gate a 100 TB ingest
    * runs before data reaches training: checks must share a single
    * scan, never one pass per rule.
    *
    * Metrics are integer BASIS POINTS (10000·hits div n) — exact on
    * both engines, no FP ratios. All non-distinct rules fold into one
    * map-side-combined aggregate; uniqueness pre-deduplicates
    * event_id first (count-distinct via a narrow distinct, avoiding
    * the Expand a mixed distinct/non-distinct aggregate plans — the
    * agg_approx_distinct lesson). The two 1-row results meet in a
    * broadcast crossJoin (allow-listed BNLJ, the pipeline_temperature
    * pattern) and a constant-width explode reshapes to one row per
    * rule. The strict 100-range rule is deliberately calibrated to
    * FAIL on the driver corpus — a rule engine that only ever passes
    * demonstrates nothing. */
  /** The sum-style rule counters — a single row, each counter a plain
    * commutative sum, so per-batch counter rows MERGE by addition
    * (shared with stream_dq_gate, whose whole state is this one row). */
  private[graft] def dqMetrics(e: DataFrame): DataFrame =
    e.agg(
      count(lit(1)).as("n"),
      count(col("props")).as("n_props"),
      sum(when(col("value") >= 0, 1L).otherwise(0L)).as("n_nonneg"),
      sum(when(col("value") >= 0 && col("value") < 100, 1L)
        .otherwise(0L)).as("n_r100"),
      sum(when(col("event_type").isin(
        "click", "view", "purchase", "signup", "error"), 1L)
        .otherwise(0L)).as("n_domain"))

  /** Assemble the published rule rows from the counter row `m` and the
    * 1-row distinct count `u` — shared with stream_dq_gate. */
  private[graft] def dqAssemble(m: DataFrame, u: DataFrame): DataFrame = {
    // integer `div`, matching the oracle's `//` — a double division
    // here would be exact only while 10000·hits fits a double mantissa
    def rule(hitsCol: String, thresholdBp: Long, name: String) =
      struct(lit(name).as("rule"),
        expr(s"(10000 * $hitsCol) div n").as("metric_bp"),
        lit(thresholdBp).as("threshold_bp"))
    m.crossJoin(broadcast(u))
      .select(explode(array(
        rule("n_props", 9999L, "completeness_props"),
        rule("n_uniq", 10000L, "uniqueness_event_id"),
        rule("n_domain", 10000L, "domain_event_type"),
        rule("n_nonneg", 10000L, "range_value_nonneg"),
        rule("n_r100", 9500L, "range_value_lt100"))).as("r"))
      .select(col("r.rule").as("rule"), col("r.metric_bp").as("metric_bp"),
        col("r.threshold_bp").as("threshold_bp"),
        (col("r.metric_bp") >= col("r.threshold_bp")).as("passed"))
      .orderBy("rule")
  }

  /** Exact distinct event_id count via a narrow pre-dedup (avoids the
    * mixed-distinct Expand). */
  private[graft] def dqUniq(e: DataFrame): DataFrame =
    e.select("event_id").distinct().agg(count(lit(1)).as("n_uniq"))

  def profileDqRules(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    dqAssemble(dqMetrics(e), dqUniq(e))
  }

  private[graft] def dqRulesOracleSql: String =
    """WITH m AS (SELECT count(*) AS n,
      |    count(props) AS n_props,
      |    CAST(sum(CASE WHEN value >= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_nonneg,
      |    CAST(sum(CASE WHEN value >= 0 AND value < 100 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_r100,
      |    CAST(sum(CASE WHEN event_type IN
      |      ('click','view','purchase','signup','error') THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_domain
      |  FROM events),
      |u AS (SELECT count(DISTINCT event_id) AS n_uniq FROM events),
      |r AS (
      |  SELECT 'completeness_props' AS rule,
      |    (10000 * n_props) // n AS metric_bp,
      |    CAST(9999 AS BIGINT) AS threshold_bp FROM m
      |  UNION ALL SELECT 'uniqueness_event_id',
      |    (10000 * n_uniq) // n, 10000 FROM m, u
      |  UNION ALL SELECT 'domain_event_type',
      |    (10000 * n_domain) // n, 10000 FROM m
      |  UNION ALL SELECT 'range_value_nonneg',
      |    (10000 * n_nonneg) // n, 10000 FROM m
      |  UNION ALL SELECT 'range_value_lt100',
      |    (10000 * n_r100) // n, 9500 FROM m)
      |SELECT rule, metric_bp, threshold_bp,
      |  metric_bp >= threshold_bp AS passed
      |FROM r ORDER BY rule""".stripMargin

  /** Higher-moment distribution profile per event_type: mean,
    * variance, SKEWNESS and EXCESS KURTOSIS — the shape statistics a
    * data-quality monitor alarms on (a kurtosis jump = heavy-tail
    * corruption long before the mean moves). Spark's built-in
    * skewness/kurtosis and DuckDB's disagree on the estimator
    * (population vs sample-adjusted) AND on co-moment accumulation
    * order, so neither is oracle-stable; instead the four raw power
    * sums Σx..Σx⁴ accumulate EXACTLY (integer cents; x³ ≤ ~10¹⁵
    * stays in int64 for cent values ≤ ~10⁵, x⁴ goes through
    * DECIMAL(38,0) — HUGEINT on the DuckDB side), and the central-
    * moment formulas evaluate in ONE double expression with
    * identical text on both engines ([[momentsFormula]]), making the
    * result bit-exact before Fp.r4. One map-side-combinable hash
    * aggregate; nothing input-sized shuffles. */
  def aggMoments(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val m = t(s, dir, "events")
      .select(col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("x"))
      .withColumn("x2", col("x") * col("x"))
      .withColumn("x3", col("x2") * col("x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        count(lit(1)).cast("double").as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum(col("x2").cast(dec)).cast("double").as("sxx"),
        sum(col("x3").cast(dec)).cast("double").as("sx3"),
        sum((col("x2").cast("decimal(19,0)") *
          col("x2").cast("decimal(19,0)")).cast(dec))
          .cast("double").as("sx4"))
    m.select(Seq(col("event_type"), col("n_rows")) ++
        momentsFormula.map { case (name, f) => Fp.r4(expr(f)).as(name) }: _*)
      .orderBy("event_type")
  }

  /** The central-moment formulas, shared VERBATIM between the Spark
    * projection and the DuckDB oracle so every double op runs in the
    * same order on both engines. Inputs are the double-cast exact
    * power sums (sx..sx4) and the double row count n. Kurtosis is
    * excess (normal = 0). */
  private val momentsFormula: Seq[(String, String)] = {
    val mean = "(sx / n)"
    val m2 = s"(sxx / n - $mean * $mean)"
    val m3 = s"(sx3 / n - 3.0 * $mean * (sxx / n) + 2.0 * $mean * $mean * $mean)"
    val m4 = s"(sx4 / n - 4.0 * $mean * (sx3 / n) " +
      s"+ 6.0 * $mean * $mean * (sxx / n) " +
      s"- 3.0 * $mean * $mean * $mean * $mean)"
    Seq(
      "mean_cents" -> mean,
      "var_cents" -> m2,
      "skew" -> s"($m3 / ($m2 * sqrt($m2)))",
      "kurt" -> s"($m4 / ($m2 * $m2) - 3.0)")
  }

  /** Per-group ordinary-least-squares aggregates (regr_slope /
    * regr_intercept / regr_r2 / regr_count — price vs quantity per
    * returnflag): the built-in regression family rides the same
    * two-phase HashAggregate as any sum (partial moment sums
    * map-side). Same FP posture as [[aggCorr]]: round AFTER the
    * aggregate so accumulation-order noise dies before hashing. */
  def aggRegression(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        Fp.r4(regr_slope(col("l_extendedprice"), col("l_quantity"))).as("slope"),
        Fp.r4(regr_intercept(col("l_extendedprice"), col("l_quantity"))).as("icept"),
        Fp.r4(regr_r2(col("l_extendedprice"), col("l_quantity"))).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag")

  /** Fixed-width histogram of order totalprice ([[profileStats]]'s
    * numeric companion — the distribution half of a column profile).
    * INTEGER bucketing from the first step: totalprice (a 2-decimal
    * value stored as double) → cents via floor(x·100 + 0.5) — the
    * value is within ~1e-7 of an integer, so the +0.5 floor lands the
    * identical BIGINT on both engines (a bare CAST would not: Spark
    * truncates where DuckDB rounds) — then bucket = cents div
    * 25_000_00. One two-phase aggregate; ~25 bucket keys on the
    * shuffle regardless of input size. */
  def profileHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).as("cents"))
      .groupBy(expr("cents div 2500000").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("cents").as("min_cents"),
        max("cents").as("max_cents"),
        sum("cents").as("sum_cents"))
      .orderBy("bucket")

  /** Ordered string aggregation — `listagg(...) WITHIN GROUP`
    * (ANSI SQL:2023, Spark 4.0+): per region, the ordered
    * comma-joined nation list plus member count. Group cardinality is
    * bounded by the dim (25 nations / 5 regions), so the concatenated
    * payload stays dim-sized at any fact scale; the agg itself rides
    * the standard two-phase HashAggregate. The WITHIN GROUP ordering
    * makes the result deterministic — unordered listagg would be
    * partition-order-dependent and unhashable. */
  def aggListagg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("graft_nation_la")
    t(s, dir, "region").createOrReplaceTempView("graft_region_la")
    s.sql(
      """SELECT r.r_name,
        |  listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
        |    AS nations,
        |  count(*) AS n_nations
        |FROM graft_region_la r JOIN graft_nation_la n
        |  ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin)
  }

  /** UNPIVOT (melt): wide measure columns to long (measure, value)
    * rows — the relational-surface operator behind every "stats per
    * column" report. Uses `Dataset.unpivot`, which plans an Expand
    * (×3 row multiplication here): the honest semantic cost of melt
    * when the MELT ITSELF is the query. When only per-column
    * aggregates are wanted, profile_stats shows the no-Expand
    * two-level formulation — the two queries bracket the trade.
    * Sums are integer cents (exact, order-independent); min/max of
    * doubles are order-independent by definition. */
  def aggUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
        col("l_tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "v")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v") * 100 + lit(0.5)).cast("long")).as("cents"),
        min("v").as("min_v"), max("v").as("max_v"))
      .orderBy("measure")

  /** EXACT distinct counts via bitmap aggregation (Spark 3.5 bitmap
    * functions): ids bucketed by bitmap_bucket_number, one RoaringBit-
    * map-style bytes value per (group, bucket) built map-side by
    * bitmap_construct_agg, popcounts summed per group. Same answer as
    * count(DISTINCT) — the oracle — but the shuffle carries ~4 KB
    * bitmap blocks instead of every distinct id row, and bitmaps
    * OR-merge associatively, so partial aggregation does real work
    * (count-distinct's partial phase can only dedup within a
    * partition). The bitmap-index pattern for high-cardinality exact
    * distincts at 100 TB. */
  def aggBitmapDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority").as("pri"), col("o_custkey").as("id"))
      .groupBy(col("pri"), expr("bitmap_bucket_number(id)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(id))").as("bm"))
      .groupBy("pri")
      .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
      .orderBy("pri")

  /** grouping()/grouping_id() over a CUBE: the only way a consumer of
    * multi-level aggregates can distinguish "NULL because this level
    * aggregates the column away" from a genuine NULL group value.
    * The oracle recomputes gid as the explicit bit formula
    * 2·grouping(status) + grouping(priority), pinning Spark's
    * grouping_id bit order (first column = MSB) against first
    * principles rather than trusting two engines to share a
    * convention. Rides the same Expand+aggregate as agg_cube. */
  def aggGroupingId(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_gid")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
        |    AS gid,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  count(*) AS n
        |FROM graft_orders_gid
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** Welch's t-test between every pair of event types on `value` —
    * the A/B-test significance primitive. One pass computes exact
    * integer moments per type (n, Σcents, Σcents² — all BIGINT, no FP
    * accumulation order anywhere); the 5×5 moment table self-joins
    * (a < b) driver-free into 10 pairs and the t statistic / Welch–
    * Satterthwaite df are each ONE fixed double expression over exact
    * integers, so Spark and DuckDB agree bit-for-bit before r4. At
    * 100 TB the scan is the only big stage (partial-aggregated,
    * 5-row result); Σcents² would move to DECIMAL(38,0) there — at
    * bench SF it is < 2⁵³ so BIGINT↔double stays exact. */
  def aggTtest(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("q"))
    val a = m.select(col("event_type").as("type_a"), col("n").as("na"),
      col("s").as("sa"), col("q").as("qa"))
    val b = m.select(col("event_type").as("type_b"), col("n").as("nb"),
      col("s").as("sb"), col("q").as("qb"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .withColumn("va", expr(
        "(cast(qa as double) - cast(sa as double) * sa / na) / (na - 1)"))
      .withColumn("vb", expr(
        "(cast(qb as double) - cast(sb as double) * sb / nb) / (nb - 1)"))
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        Fp.r4(expr("(cast(sa as double) / na - cast(sb as double) / nb)" +
          " / sqrt(va / na + vb / nb) ")).as("t_stat"),
        Fp.r4(expr("(va / na + vb / nb) * (va / na + vb / nb)" +
          " / (va * va / (cast(na as double) * na * (na - 1))" +
          "  + vb * vb / (cast(nb as double) * nb * (nb - 1)))")).as("welch_df"))
      .orderBy("type_a", "type_b")
  }

  /** χ² independence test of lang × source on documents, per-cell
    * contributions over the FULL grid (zero cells included — they
    * carry expected mass). Observed counts, row/col totals and N are
    * exact integers from three tiny aggregates of one scan; expected
    * count and the cell contribution are single fixed double
    * expressions (numerator (O·N − R·C)² computed in double to dodge
    * BIGINT overflow at scale). The grid is |langs|×|sources| — all
    * joins broadcast; no total row, because a cross-cell double sum
    * would reintroduce accumulation-order nondeterminism. */
  def aggChisq(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rows = d.groupBy("lang").agg(count(lit(1)).as("r"))
    val cols = d.groupBy("source").agg(count(lit(1)).as("c"))
    val n = d.select(count(lit(1)).as("n"))
    rows.crossJoin(broadcast(cols)).join(cells, Seq("lang", "source"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n))
      .select(col("lang"), col("source"), col("o"),
        Fp.r4(expr("cast(r as double) * c / n")).as("expected"),
        Fp.r4(expr(
          "(cast(o as double) * n - cast(r as double) * c)" +
          " * (cast(o as double) * n - cast(r as double) * c)" +
          " / (cast(r as double) * c * n)")).as("contrib"))
      .orderBy("lang", "source")
  }

  /** Z-score anomaly flagging — the monitoring primitive: events
    * whose value sits ≥ 3σ from their type's mean. Exact BIGINT
    * moments per type (same one-pass shape as agg_ttest) broadcast
    * back onto the scan — 5 moment rows against the full event
    * stream, so the events themselves NEVER shuffle: scan → broadcast
    * hash join → filter, the cheapest possible anomaly pass at
    * 100 TB. z is one fixed double expression over exact integers
    * (identical tree in DuckDB); the ≥3 cut compares the r4-ROUNDED
    * z so the boundary is engine-identical by construction. */
  def aggZscore(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val m = c.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        sum(col("cents") * col("cents")).as("q"))
    c.join(broadcast(m), "event_type")
      .withColumn("z", Fp.r4(expr(
        "(cast(cents as double) - cast(s as double) / n)" +
        " / sqrt((cast(q as double) - cast(s as double) * s / n) / (n - 1))")))
      .filter(abs(col("z")) >= 3.0)
      .select("event_id", "event_type", "value", "z")
      .orderBy("event_id")
  }

  /** First-order Markov transition matrix of user behavior — the
    * sequence-modeling staple: for each user's event stream in time
    * order, count (previous type → type) transitions, then the
    * transition probability per source state. ONE window pass (lag
    * over the user_id shuffle — same single-exchange shape as
    * win_lag) into a 25-cell aggregate; the probability is a single
    * division over exact counts. Row-transition boundary: each
    * user's first event has no predecessor and contributes nothing
    * (lag NULL filtered). Deterministic total order via (ts_ns,
    * event_id). */
  def aggTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(asc("ts_ns"), asc("event_id"))
    val tr = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
    val totals = tr.groupBy("prev_type").agg(sum("n").as("row_total"))
    tr.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("event_type"), col("n"),
        Fp.r4(col("n").cast("double") / col("row_total")).as("p"))
      .orderBy("prev_type", "event_type")
  }

  /** The whole events-analytics suite as ONE query — the dashboard
    * refresh job: bounded funnel, retention-by-offset, daily actives,
    * and per-type anomaly counts, emitted as a long-format metrics
    * table (section, key, n, v). The point is PLAN SHARING: the
    * narrow events projection is localCheckpointed ONCE and feeds all
    * four consumers — without it each UNION branch re-scans and
    * re-derives the source (the pipeline_end_to_end lesson). Every
    * metric is exact integers, so the UNION replays exactly; day keys
    * are zero-padded so string ordering equals numeric ordering. */
  def analyticsEndToEnd(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts_s"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .localCheckpoint(true)
    // 1. bounded funnel (agg_funnel_window's chain)
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_s").as("t_view"))
    val fc = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts_s") > col("t_view") && col("ts_s") <= col("t_view") + 86400L)
      .groupBy("user_id").agg(min("ts_s").as("t_click"))
    val fp = e.filter(col("event_type") === "purchase").join(fc, "user_id")
      .filter(col("ts_s") > col("t_click") && col("ts_s") <= col("t_click") + 604800L)
      .groupBy("user_id").agg(min("ts_s").as("t_purchase"))
    val funnel = v.join(fc, Seq("user_id"), "left").join(fp, Seq("user_id"), "left")
      .withColumn("stage",
        when(col("t_purchase").isNotNull, lit(3))
          .when(col("t_click").isNotNull, lit(2)).otherwise(lit(1)))
      .groupBy("stage")
      .agg(count(lit(1)).as("n"), sum("user_id").as("v"))
      .select(lit("funnel").as("section"),
        col("stage").cast("string").as("key"), col("n"), col("v"))
    // 2. retention actives per day-offset 0..7
    val days = e.select(col("user_id"), expr("ts_s div 86400").as("day")).distinct()
    val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    val retention = days.join(cohort, "user_id")
      .withColumn("off", col("day") - col("cohort_day"))
      .filter(col("off") <= 7)
      .groupBy("off")
      .agg(count(lit(1)).as("n")) // (user, off) rows are distinct by construction
      .select(lit("retention").as("section"),
        col("off").cast("string").as("key"), col("n"), lit(0L).as("v"))
    // 3. daily actives + volume
    val daily = e.withColumn("day", expr("ts_s div 86400"))
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("n"), count(lit(1)).as("v"))
      .select(lit("daily").as("section"),
        lpad(col("day").cast("string"), 8, "0").as("key"), col("n"), col("v"))
    // 4. per-type anomaly counts (agg_zscore's rule)
    val m = e.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("cents").as("sm"),
        sum(col("cents") * col("cents")).as("q"))
    val anomaly = e.join(broadcast(m), "event_type")
      .withColumn("z", Fp.r4(expr(
        "(cast(cents as double) - cast(sm as double) / cnt)" +
        " / sqrt((cast(q as double) - cast(sm as double) * sm / cnt) / (cnt - 1))")))
      .groupBy("event_type")
      .agg(sum(when(abs(col("z")) >= 3.0, 1L).otherwise(0L)).as("n"),
        count(lit(1)).as("v"))
      .select(lit("anomaly").as("section"), col("event_type").as("key"),
        col("n"), col("v"))
    funnel.unionByName(retention).unionByName(daily).unionByName(anomaly)
      .orderBy("section", "key")
  }

  /** Activity heatmap — the (day-of-week × hour-of-day) count grid
    * every ops dashboard draws. Both coordinates come from PURE
    * INTEGER epoch math, NOT calendar functions: dow = (days+4) % 7
    * (1970-01-01 was a Thursday; 0 = Sunday), hour = (s mod 86400)
    * div 3600 — so the two engines cannot disagree on locale/ISO
    * week conventions (Spark's dayofweek is 1=Sunday, DuckDB's dow
    * is 0=Sunday; neither is used). One grouped aggregate, output
    * bounded at 168 rows forever; id-sum checksum pins membership. */
  def aggHeatmap(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        expr("(ts_s div 86400 + 4) % 7").as("dow"),
        expr("(ts_s % 86400) div 3600").as("hour"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"))
      .orderBy("dow", "hour")

  /** Day-over-day percent change of daily volume — the trend line on
    * the same dashboard. The raw events collapse map-side to one row
    * per day (calendar-bounded at any corpus size), then ONE ordered
    * window pass computes the lag; pct is a single double expression
    * over the two exact counts. The single-partition window on the
    * daily frame is safe by construction — its input is already
    * aggregate-bounded, the same argument as agg_autocorr. The first
    * day has no predecessor and is dropped — a NULL pct would ride on
    * engine-specific NULL-vs-NaN parquet round-trips for no semantic
    * gain. */
  def winPctChange(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    t(s, dir, "events")
      .groupBy(expr("ts_s div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .filter(col("prev_n").isNotNull)
      .select(col("day"), col("n"), col("prev_n"),
        Fp.r4(expr(
          "100.0 * (n - cast(prev_n as double)) / prev_n")).as("pct"))
      .orderBy("day")
  }

  /** Benford first-digit audit of the value column — the classic
    * fabricated-data screen: natural multi-scale quantities follow
    * P(d) = log10(1+1/d); a synthetic or truncated source shows up
    * as a flat histogram. The observed side is EXACT (first digit
    * via integer division by a power of 10 — no string formatting,
    * whose scientific-notation thresholds differ between engines,
    * and no floor(log10(·)) either — libm could disagree by one ulp
    * exactly AT powers of ten, flipping the digit); instead a
    * GENERATED integer CASE chain over the 19 BIGINT magnitudes,
    * rendered once for Spark (`div`) and once for DuckDB (`//`) so
    * the formula cannot drift. Expected share is a per-row constant
    * expression. Zero-cent events have no leading digit and are
    * excluded deterministically. */
  def benfordDigitSql(divOp: String): String = {
    val cases = (18 to 1 by -1).map { k =>
      val p = "1" + "0" * k
      s"WHEN cents >= $p THEN cents $divOp $p"
    }.mkString(" ")
    s"(CASE $cases ELSE cents END)"
  }

  def aggBenford(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .withColumn("d", expr(benfordDigitSql("div")))
      .groupBy("d")
      .agg(count(lit(1)).as("n"))
      .withColumn("expected_pct",
        Fp.r4(expr("100.0 * log10(1.0 + 1.0 / d)")))
      .orderBy("d")

  /** Median absolute deviation per event type — the robust scale
    * estimate that z-scores (agg_zscore) can't give you when the
    * distribution has heavy tails: MAD ignores outliers entirely.
    * Two discrete-median passes (percentile_disc picks an ACTUAL data
    * value, so everything stays exact BIGINT — no interpolation, no
    * FP): median of cents per type, broadcast back onto the scan
    * (the events never shuffle — same spine as agg_zscore), then the
    * discrete median of |x − med|. Both engines share the
    * percentile_disc definition agg_quantile_disc already proves. */
  def aggMad(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val med = c.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long").as("med"))
    c.join(broadcast(med), "event_type")
      .withColumn("ad", abs(col("cents") - col("med")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("med").as("median_cents"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)")
          .cast("long").as("mad_cents"))
      .orderBy("event_type")
  }

  /** Winsorized mean per event type — the outlier-clipped average
    * that pairs with agg_mad in the robust-stats toolkit: values are
    * CLAMPED to the [p05, p95] discrete-percentile band before the
    * mean, so a single fat-fingered 1000× event moves the estimate by
    * at most the clip bound. Discrete percentiles keep the bounds
    * exact BIGINT data values; the clamped sum is exact BIGINT; only
    * the final division is double (r4). Same broadcast-moments spine
    * as agg_zscore/agg_mad — the event stream never shuffles. */
  def aggWinsorized(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val b = c.groupBy("event_type")
      .agg(expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)")
        .cast("long").as("lo"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
          .cast("long").as("hi"))
    c.join(broadcast(b), "event_type")
      .withColumn("w", greatest(col("lo"), least(col("hi"), col("cents"))))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("lo").as("lo"), max("hi").as("hi"),
        sum("w").as("sw"))
      .select(col("event_type"), col("n"), col("lo"), col("hi"),
        Fp.r4(expr("cast(sw as double) / n")).as("wmean"))
      .orderBy("event_type")
  }

  /** Gini–Simpson diversity of the language mix per source — the
    * corpus-composition monitor (is a source collapsing to one
    * language?). D = 1 − Σcᵢ²/n²: unlike Shannon entropy this needs
    * NO logs, so it stays a single double expression over exact
    * BIGINT counts — no cross-row FP accumulation anywhere. Two
    * grouped aggregates, output bounded by |sources|. */
  def aggDiversity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_langs"), sum("c").as("n_docs"),
        sum(col("c") * col("c")).as("ss"))
      .select(col("source"), col("n_langs"), col("n_docs"),
        Fp.r4(expr(
          "1.0 - cast(ss as double) / (cast(n_docs as double) * n_docs)"))
          .as("simpson"))
      .orderBy("source")

  /** Gini coefficient of event value per type — the inequality /
    * concentration metric (is 1% of events carrying 90% of the
    * value?). Formula over the ASC-sorted values with rank i:
    * G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx). One exchange on event_type
    * (window rank + aggregate co-partition, Catalyst reuses it);
    * Σi·xᵢ and Σx are exact BIGINT — i·x ≤ n·maxcents ≈ 10⁶·10⁴ per
    * term, sums < 2⁶³ far beyond bench SF — so G is ONE fixed double
    * expression over exact integers. Ties in cents contribute
    * x·Σi over the tied block regardless of within-block order, so
    * the event_id tie-break pins determinism without affecting G. */
  def aggGini(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(asc("cents"), asc("event_id"))
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("total"),
        sum(col("i") * col("cents")).as("iw"))
      .select(col("event_type"), col("n"), col("total"),
        Fp.r4(expr("(2.0 * iw - (n + 1.0) * total)" +
          " / (cast(n as double) * total)")).as("gini"))
      .orderBy("event_type")
  }

  /** Lag-k serial correlation (k = 1..3) of the daily event-count
    * series — the seasonality probe. Defined as the Pearson
    * correlation of the (x_d, x_{d+k}) pairs where BOTH days exist,
    * so gaps drop pairs deterministically instead of imputing. The
    * raw events collapse to ONE bounded row per day before anything
    * else (map-side partial count), so the lag self-join runs on a
    * calendar-bounded frame — at 100 TB the series is still ≤ a few
    * thousand rows; localCheckpoint materializes it once for both
    * join legs. All six moments are exact BIGINT; r is one fixed
    * double expression. explode(array(1,2,3)) fans the lags without
    * a cross join (keeps the BNLJ sweep clean). */
  def aggAutocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(expr("ts_s div 86400").as("day"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true)
    val left = daily
      .withColumn("k", explode(array(lit(1), lit(2), lit(3))))
    left.join(
        daily.select(col("day").as("day2"), col("x").as("y")),
        col("day2") === col("day") + col("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("k"), col("n"),
        Fp.r4(expr(
          "(n * cast(sxy as double) - cast(sx as double) * sy)" +
          " / (sqrt(n * cast(sxx as double) - cast(sx as double) * sx)" +
          "  * sqrt(n * cast(syy as double) - cast(sy as double) * sy))"))
          .as("r"))
      .orderBy("k")
  }

  /** agg_basket — market-basket co-occurrence mining over orders:
    * which part-brand pairs are bought together more often than
    * independence predicts (support + lift, the A-Priori / FP-growth
    * first pass every recommender pipeline runs).
    *
    * Scale: the naive shape self-joins the (order, brand) relation on
    * orderkey — a fact⋈fact shuffle whose output is Σ basket². Here
    * baskets collapse to ONE sorted set per order in a single
    * map-side-combined groupBy (basket size is bounded by order width,
    * ~7 brands, never corpus scale), pairs are emitted per basket with
    * an index-lambda (a<b once, no dedup pass), and the pair counts
    * aggregate over ≤ |brands|² = 300 keys. Brand marginals and the
    * order total ride back in as broadcast micro-dims. Support is
    * SF-relative (≥ 0.1% of orders) so the query is scale-invariant.
    * lift_bp = (10⁴·n_ab·N) div (n_a·n_b) is exact int64 up to ~3·10⁹
    * orders; beyond that widen to the decimal(38) product.
    * The ORACLE replays the naive self-join — the hash proves the
    * per-basket pair emit equals the relational formulation. */
  /** Per-order sorted brand sets — the basket frame both the batch
    * query and the streaming twin derive their deltas from. */
  private[graft] def basketSets(li: DataFrame, partDim: DataFrame): DataFrame =
    li.join(broadcast(partDim), col("l_partkey") === col("p_partkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))

  /** a<b pair emit per basket via an index lambda — basket-width-
    * bounded, never the Σbasket² relational self-join. */
  private[graft] def basketPairs(baskets: DataFrame): DataFrame =
    baskets.select(explode(expr(
      """flatten(transform(bs, (a, i) ->
        |  transform(slice(bs, i + 2, size(bs)), b ->
        |    named_struct('ba', a, 'bb', b))))""".stripMargin)).as("p"))
      .groupBy(col("p.ba").as("ba"), col("p.bb").as("bb"))
      .agg(count(lit(1)).as("n_ab"))

  /** Final support/lift assembly from (ba,bb,n_ab) pair counts, (b,n)
    * brand marginals and the 1-row order total — shared verbatim with
    * stream_basket so the twins cannot drift on the formulas. */
  private[graft] def basketAssemble(pairs: DataFrame, marg: DataFrame,
      nOrders: DataFrame): DataFrame =
    pairs.crossJoin(broadcast(nOrders))
      .filter(col("n_ab") * 1000 >= col("n_orders"))
      .join(broadcast(marg.select(col("b").as("ba"), col("n").as("n_a"))), "ba")
      .join(broadcast(marg.select(col("b").as("bb"), col("n").as("n_b"))), "bb")
      .select(col("ba"), col("bb"), col("n_ab"), col("n_a"), col("n_b"),
        expr("(10000 * n_ab) div n_orders").as("support_bp"),
        expr("(10000 * n_ab * n_orders) div (n_a * n_b)").as("lift_bp"))
      .orderBy("ba", "bb")

  /** agg_basket's oracle — the naive relational self-join formulation;
    * shared verbatim by stream_basket (incremental-equals-batch). */
  private[graft] val basketOracleSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey, p_brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
      |m AS (SELECT p_brand, count(*) AS n FROM b GROUP BY p_brand),
      |c AS (SELECT x.p_brand AS ba, y.p_brand AS bb, count(*) AS n_ab
      |  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
      |    AND x.p_brand < y.p_brand
      |  GROUP BY 1, 2)
      |SELECT c.ba, c.bb, c.n_ab, ma.n AS n_a, mb.n AS n_b,
      |  (10000 * c.n_ab) // no.n_orders AS support_bp,
      |  (10000 * c.n_ab * no.n_orders) // (ma.n * mb.n) AS lift_bp
      |FROM c CROSS JOIN no
      |  JOIN m ma ON ma.p_brand = c.ba
      |  JOIN m mb ON mb.p_brand = c.bb
      |WHERE c.n_ab * 1000 >= no.n_orders
      |ORDER BY ba, bb""".stripMargin

  def aggBasket(s: SparkSession, dir: String): DataFrame =
    aggBasket(s, dir, lazyCheckpoint = true)

  /** `lazyCheckpoint = false` keeps the pre-r16 eager basket
    * materialization — the AbProbe counterpart for the checkpoint
    * laziness A/B (see the note below). */
  private[graft] def aggBasket(s: SparkSession, dir: String,
      lazyCheckpoint: Boolean): DataFrame = {
    // materialized once: the basket frame feeds pair emit, brand
    // marginals AND the order total (r8 — uncheckpointed, the
    // lineitem⋈part + collect_set groupBy ran three times).
    // r16 (VERDICT r15 item 4; the r14 components() lazy-checkpoint
    // lesson): the checkpoint is LAZY — the first consumer (the
    // n_orders broadcast build) is the action that computes and saves
    // the basket partitions, so the eager stand-alone materialization
    // job disappears (AbProbe, sf0.1 local[32]: 11 → 10 jobs, warm
    // wall 1.596 → 1.385 s min-of-3, shuffle bytes identical; same
    // plan shapes otherwise).
    val baskets = basketSets(
      t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
      t(s, dir, "part").select("p_partkey", "p_brand"))
      .localCheckpoint(!lazyCheckpoint)
    basketAssemble(
      basketPairs(baskets),
      baskets.select(explode(col("bs")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("n")),
      baskets.agg(count(lit(1)).as("n_orders")))
  }

  /** agg_decay — recency-weighted popularity: each event contributes
    * weight 2¹⁴ halved once per elapsed half-life (7 days) since the
    * corpus "now" (the max observed timestamp, derived in-plan) — the
    * trending-score / freshness-ranking aggregate every feed and
    * search ranker maintains. Exponential decay done entirely in
    * INTEGER bit-shifts: 16384 >> min(age_halflives, 63) — exact on
    * both engines (a pow(0.5, age/λ) double would be libm-dependent),
    * with the shift capped at 63 because Java's >> wraps the shift
    * amount mod 64 while DuckDB saturates — uncapped, a >9-decade-old
    * event would DISAGREE between the engines, not just lose
    * precision.
    *
    * Scale: one scan, one map-side-combined groupBy to the
    * |event_type|-row frame; the 1-row "now" rides in broadcast. */
  def aggDecay(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select("event_type", "ts_s")
    e.crossJoin(broadcast(e.agg(max("ts_s").as("now_s"))))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("shiftright(16384L, " +
          "CAST(least((now_s - ts_s) div 604800, 63) AS INT))"))
          .as("decay_score"))
      .orderBy("event_type")
  }

  /** profile_drift — PSI (population stability index) distribution
    * drift between the first and second half of the observed time
    * range, per event type: the train/serve-skew monitor every ML
    * platform runs before trusting a model on current traffic.
    *
    * Determinism: the reference/current shares are computed as exact
    * integer BASIS POINTS first (p_bp = 10⁴·n_ref div t_ref), so the
    * only FP steps are one subtraction and one ln of a ratio of two
    * identical integers — a single fixed expression, Fp.r4-rounded
    * (the text_tfidf ln-ulp posture). Per-type contributions only; a
    * cross-type FP total would be accumulation-order nondeterministic
    * (the agg_chisq lesson). Types with a zero basis-point share on
    * either side are excluded (ln undefined) — with add-1-smoothed
    * counts at real scale that never fires; here the raw counts are
    * published so the exclusion is auditable.
    *
    * Scale: one scan, conditional two-sided counts in one groupBy
    * (no second scan for the reference window), totals broadcast. */
  def profileDrift(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select("event_type", "ts_s")
    val mid = e.agg(min("ts_s").as("lo"), max("ts_s").as("hi"))
      .select(expr("lo + (hi - lo) div 2").as("mid"))
    val g = e.crossJoin(broadcast(mid))
      .groupBy("event_type")
      .agg(sum(when(col("ts_s") <= col("mid"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("ts_s") > col("mid"), 1L).otherwise(0L)).as("n_cur"))
    g.crossJoin(broadcast(g.agg(sum("n_ref").as("t_ref"),
        sum("n_cur").as("t_cur"))))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        expr("(10000 * n_ref) div t_ref").as("p_bp"),
        expr("(10000 * n_cur) div t_cur").as("q_bp"))
      .filter(col("p_bp") > 0 && col("q_bp") > 0)
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        col("p_bp"), col("q_bp"),
        Fp.r4(expr("((CAST(p_bp AS DOUBLE) - q_bp) / 10000.0)" +
          " * ln(CAST(p_bp AS DOUBLE) / q_bp)")).as("psi_contrib"))
      .orderBy("event_type")
  }

  /** agg_paths — user-journey mining: each user's first three events
    * (totally ordered by (ts_ns, event_id)) concatenated into a path
    * string like "view>click>purchase", counted across users — the
    * onboarding-funnel / journey-analysis query every product
    * analytics suite ships.
    *
    * Scale: the rn ≤ 3 literal filter rides Spark 4's native
    * InferWindowGroupLimit rewrite (map tasks keep ≤ 3 rows per user
    * before the exchange), the per-user path groupBy REUSES the
    * window's user_id partitioning (no second exchange), and the
    * final path count is map-side combined over ≤ |types|³+|types|²
    * +|types| keys. Ordering inside collect_list is pinned by
    * array_sort on the (rn, type) struct — collect_list alone is
    * partition-order nondeterministic. */
  def aggPaths(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ns", "event_id")
    t(s, dir, "events").select("user_id", "event_type", "ts_ns", "event_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("user_id")
      .agg(expr("""array_join(transform(
        |  array_sort(collect_list(struct(rn, event_type))),
        |  x -> x.event_type), '>')""".stripMargin).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_users"), min("user_id").as("min_user"))
      .orderBy("path")
  }

  /** agg_hhi — Herfindahl–Hirschman market-concentration index over
    * part brands (by lineitem revenue cents): HHI = Σ shareᵢ² with
    * shares in basis points, plus the CR4 top-4 concentration ratio —
    * the antitrust/market-structure summary statistic. All integer:
    * share_bp = (10⁴·rev) div total, HHI = Σ share_bp² (≤ 10⁸, exact),
    * CR4 from the 4 largest shares (ranked with a brand tie-break).
    *
    * Scale: one brand groupBy (broadcast part dim, map-side combined),
    * a broadcast 1-row total, and all windows over the ≤|brands|-row
    * aggregate. */
  def aggHhi(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem").select("l_partkey", "l_extendedprice")
      .join(broadcast(t(s, dir, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"))
    val shares = rev.crossJoin(broadcast(rev.agg(sum("rev").as("tot"))))
      .select(col("p_brand"), col("rev"),
        expr("(10000 * rev) div tot").as("share_bp"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("share_bp"), asc("p_brand"))
    shares.withColumn("rk", row_number().over(w))
      .agg(count(lit(1)).as("n_brands"),
        sum(expr("share_bp * share_bp")).as("hhi"),
        sum(when(col("rk") <= 4, col("share_bp")).otherwise(0L)).as("cr4_bp"),
        max(when(col("rk") === 1, col("p_brand"))).as("top_brand"))
  }

  /** agg_pareto — the 80/20 concentration question: how many of the
    * highest-spending customers cover 80% of total revenue? Customers
    * ranked by exact cents (custkey tie-break), running share over
    * the ranked CUSTOMER aggregate (entity-bounded frame, never
    * lineitem rows), answer = first rank whose cumulative share
    * reaches 8000 bp. Published: that head count, the total customer
    * count, its share of customers in bp, and the cumulative revenue
    * share actually reached — the "how concentrated is my revenue"
    * dashboard number. All integer. */
  def aggPareto(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("rev"), asc("o_custkey"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = per.crossJoin(broadcast(per.agg(sum("rev").as("tot"))))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("rev"), asc("o_custkey"))))
      .withColumn("cum_rev", sum("rev").over(w))
      // 10⁴·Σcents stays in int64 up to ~$9·10¹² total revenue
      .withColumn("cum_bp", expr("(10000 * cum_rev) div tot"))
    ranked.filter(col("cum_bp") >= 8000)
      .agg(min("rk").as("n_head"))
      .crossJoin(broadcast(per.agg(count(lit(1)).as("n_customers"))))
      .join(ranked.select(col("rk").as("n_head"), col("cum_bp")), "n_head")
      .select(col("n_head"), col("n_customers"),
        // widen before the multiply: int 10⁴·n_head wraps past 214k heads
        expr("(CAST(10000 AS BIGINT) * n_head) div n_customers")
          .as("head_share_bp"),
        col("cum_bp").as("rev_share_bp"))
  }

  /** Seats to apportion in agg_apportion — large enough that every
    * event type earns a floor share and remainders actually differ. */
  val ApportionSeats = 10000L

  /** agg_apportion — largest-remainder (Hamilton) apportionment:
    * divide a fixed integer budget of [[ApportionSeats]] slots across
    * event types proportionally to their counts, with the classic
    * floor-then-distribute-remainders rule — the exact-integer
    * allocation every quota sampler / budget splitter needs (a naive
    * round() both over- and under-shoots the total; this one sums to
    * the budget BY CONSTRUCTION).
    *
    * Scale: one map-side-combined groupBy to the |event_type|-row
    * frame; the total and the remainder-rank window both run over that
    * bounded aggregate (the documented bounded-frame window pattern),
    * never over events. Ties on remainder break by type name so the
    * allocation is total-ordered and engine-independent. */
  def aggApportion(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "events").groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val q = g.crossJoin(broadcast(g.agg(sum("n").as("nn"))))
      .select(col("event_type"), col("n"),
        expr(s"($ApportionSeats * n) div nn").as("floor_seats"),
        expr(s"($ApportionSeats * n) % nn").as("rem"))
    val leftover = q.agg((lit(ApportionSeats) - sum("floor_seats")).as("lo"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("rem"), asc("event_type"))
    q.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(w))
      .select(col("event_type"), col("n"), col("floor_seats"),
        when(col("rk") <= col("lo"), 1L).otherwise(0L).as("extra"))
      .withColumn("seats", col("floor_seats") + col("extra"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_basket" -> aggBasket,
    "agg_apportion" -> aggApportion,
    "agg_decay" -> aggDecay,
    "profile_drift" -> profileDrift,
    "agg_paths" -> aggPaths,
    "agg_bloom" -> aggBloom,
    "agg_rfm" -> aggRfm,
    "agg_hhi" -> aggHhi,
    "agg_pareto" -> aggPareto,
    "analytics_end_to_end" -> analyticsEndToEnd,
    "agg_gini" -> aggGini,
    "agg_autocorr" -> aggAutocorr,
    "agg_mad" -> aggMad,
    "agg_diversity" -> aggDiversity,
    "agg_heatmap" -> aggHeatmap,
    "agg_winsorized" -> aggWinsorized,
    "win_pct_change" -> winPctChange,
    "agg_benford" -> aggBenford,
    "agg_transitions" -> aggTransitions,
    "agg_zscore" -> aggZscore,
    "agg_ttest" -> aggTtest,
    "agg_chisq" -> aggChisq,
    "agg_bitmap_distinct" -> aggBitmapDistinct,
    "agg_grouping_id" -> aggGroupingId,
    "agg_unpivot" -> aggUnpivot,
    "agg_listagg" -> aggListagg,
    "agg_regression" -> aggRegression,
    "profile_histogram" -> profileHistogram,
    "profile_stats" -> profileStats,
    "profile_corr_matrix" -> profileCorrMatrix,
    "agg_moments" -> aggMoments,
    "agg_cms_estimate" -> aggCmsEstimate,
    "agg_kmv_distinct" -> aggKmvDistinct,
    "agg_kmv_jaccard" -> aggKmvJaccard,
    "profile_dq_rules" -> profileDqRules,
    "agg_sketch_union" -> aggSketchUnion,
    "agg_ohlc" -> aggOhlc,
    "agg_retention" -> aggRetention,
    "agg_funnel_window" -> aggFunnelWindow,
    "profile_topvalues" -> profileTopvalues,
    "agg_overlap" -> aggOverlap,
    "agg_minmax_by" -> aggMinmaxBy,
    "agg_countif" -> aggCountIf,
    "agg_bitagg" -> aggBitagg,
    "agg_corr" -> aggCorr,
    "agg_funnel" -> aggFunnel,
    "agg_grouping_sets" -> aggGroupingSets,
    "agg_collect_struct" -> aggCollectStruct,
    "agg_quantile" -> aggQuantile,
    "agg_quantile_disc" -> aggQuantileDisc,
    "agg_mode" -> aggMode,
    "agg_approx_quantile" -> aggApproxQuantile,
    "agg_stats" -> aggStats,
    "agg_hash" -> aggHash,
    "agg_distinct" -> aggDistinct,
    "agg_approx_distinct" -> aggApproxDistinct,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "agg_pivot" -> aggPivot,
    "agg_accuracy" -> aggAccuracy)

  val oracleSql: Map[String, String] = Map(
    // the naive relational self-join formulation — the hash proves the
    // per-basket pair emit equals it
    "agg_basket" -> basketOracleSql,
    "agg_apportion" ->
      s"""WITH g AS (SELECT event_type, count(*) AS n
         |  FROM events GROUP BY event_type),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM g),
         |q AS (SELECT event_type, n,
         |    ($ApportionSeats * n) // nn AS floor_seats,
         |    ($ApportionSeats * n) % nn AS rem
         |  FROM g CROSS JOIN tot),
         |lo AS (SELECT $ApportionSeats - CAST(sum(floor_seats) AS BIGINT)
         |    AS lo FROM q),
         |r AS (SELECT q.*, lo.lo, row_number() OVER (
         |    ORDER BY rem DESC, event_type) AS rk FROM q CROSS JOIN lo)
         |SELECT event_type, n, floor_seats,
         |  CAST(CASE WHEN rk <= lo THEN 1 ELSE 0 END AS BIGINT) AS extra,
         |  floor_seats + CAST(CASE WHEN rk <= lo THEN 1 ELSE 0 END AS BIGINT)
         |    AS seats
         |FROM r ORDER BY event_type""".stripMargin,
    // ordered string_agg replays the array_sort'd collect_list
    "agg_paths" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns,
        |    event_id FROM events),
        |r AS (SELECT user_id, event_type, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts_ns, event_id) AS rn FROM e),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn)
        |    AS path FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, count(*) AS n_users, min(user_id) AS min_user
        |FROM p GROUP BY path ORDER BY path""".stripMargin,
    // integer bit-shift decay — exact, no pow(), shift saturated at 63
    // on both engines (Java >> wraps mod 64, DuckDB saturates)
    "agg_decay" ->
      """WITH e AS (SELECT event_type,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s FROM events),
        |m AS (SELECT max(ts_s) AS now_s FROM e)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(16384 AS BIGINT)
        |    >> CAST(least((now_s - ts_s) // 604800, 63) AS INTEGER))
        |    AS BIGINT) AS decay_score
        |FROM e CROSS JOIN m
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // integer basis points first; the single ln is Fp.r4-rounded
    "profile_drift" ->
      """WITH e AS (SELECT event_type,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s FROM events),
        |b AS (SELECT min(ts_s) + (max(ts_s) - min(ts_s)) // 2 AS mid FROM e),
        |g AS (SELECT event_type,
        |    CAST(sum(CASE WHEN ts_s <= mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ref,
        |    CAST(sum(CASE WHEN ts_s > mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_cur
        |  FROM e CROSS JOIN b GROUP BY event_type),
        |tt AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
        |    CAST(sum(n_cur) AS BIGINT) AS t_cur FROM g),
        |p AS (SELECT event_type, n_ref, n_cur,
        |    (10000 * n_ref) // t_ref AS p_bp,
        |    (10000 * n_cur) // t_cur AS q_bp
        |  FROM g CROSS JOIN tt)
        |SELECT event_type, n_ref, n_cur, p_bp, q_bp,
        |  floor(((CAST(p_bp AS DOUBLE) - q_bp) / 10000.0)
        |    * ln(CAST(p_bp AS DOUBLE) / q_bp) * 10000.0 + 0.5) / 10000.0
        |    AS psi_contrib
        |FROM p WHERE p_bp > 0 AND q_bp > 0
        |ORDER BY event_type""".stripMargin,
    // pinned-hash blocked Bloom: bits and probes replay bit-exactly
    "agg_bloom" -> bloomOracleSql,
    // integer basis-point shares; HHI exact in int64
    "agg_hhi" ->
      """WITH rev AS (SELECT p_brand,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        |tt AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM rev),
        |sh AS (SELECT p_brand, (10000 * rev) // tot AS share_bp,
        |    row_number() OVER (ORDER BY (10000 * rev) // tot DESC,
        |      p_brand) AS rk
        |  FROM rev CROSS JOIN tt)
        |SELECT count(*) AS n_brands,
        |  CAST(sum(share_bp * share_bp) AS BIGINT) AS hhi,
        |  CAST(sum(CASE WHEN rk <= 4 THEN share_bp ELSE 0 END) AS BIGINT)
        |    AS cr4_bp,
        |  max(CASE WHEN rk = 1 THEN p_brand END) AS top_brand
        |FROM sh""".stripMargin,
    // ranked cumulative shares over the customer aggregate
    "agg_pareto" ->
      """WITH per AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM orders GROUP BY o_custkey),
        |tt AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM per),
        |r AS (SELECT rev,
        |    row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
        |    CAST(sum(rev) OVER (ORDER BY rev DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_rev, tot
        |  FROM per CROSS JOIN tt),
        |r2 AS (SELECT CAST(rk AS INTEGER) AS rk,
        |    (10000 * cum_rev) // tot AS cum_bp FROM r),
        |h AS (SELECT CAST(min(rk) AS INTEGER) AS n_head FROM r2
        |  WHERE cum_bp >= 8000),
        |n AS (SELECT count(*) AS n_customers FROM per)
        |SELECT h.n_head, n.n_customers,
        |  (10000 * h.n_head) // n.n_customers AS head_share_bp,
        |  r2.cum_bp AS rev_share_bp
        |FROM h CROSS JOIN n JOIN r2 ON r2.rk = h.n_head""".stripMargin,
    // exact discrete percentile thresholds + integer day/cent math
    "agg_rfm" ->
      """WITH o AS (SELECT o_custkey,
        |    (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |per AS (SELECT o_custkey, max(day) AS last_day, count(*) AS f,
        |    CAST(sum(cents) AS BIGINT) AS m FROM o GROUP BY o_custkey),
        |nd AS (SELECT max(day) AS now_day FROM o),
        |rfm AS (SELECT per.*, now_day - last_day AS r
        |  FROM per CROSS JOIN nd),
        |th AS (SELECT quantile_disc(r, 0.33) AS r33,
        |    quantile_disc(r, 0.66) AS r66,
        |    quantile_disc(f, 0.33) AS f33, quantile_disc(f, 0.66) AS f66,
        |    quantile_disc(m, 0.33) AS m33, quantile_disc(m, 0.66) AS m66
        |  FROM rfm),
        |sc AS (SELECT o_custkey,
        |    CAST(CASE WHEN r <= r33 THEN 3 WHEN r <= r66 THEN 2 ELSE 1 END
        |      AS BIGINT) AS r_score,
        |    CAST(CASE WHEN f <= f33 THEN 1 WHEN f <= f66 THEN 2 ELSE 3 END
        |      AS BIGINT) AS f_score,
        |    CAST(CASE WHEN m <= m33 THEN 1 WHEN m <= m66 THEN 2 ELSE 3 END
        |      AS BIGINT) AS m_score
        |  FROM rfm CROSS JOIN th)
        |SELECT r_score, f_score, m_score, count(*) AS n_customers,
        |  CAST(sum(o_custkey) AS BIGINT) AS custkey_sum
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "agg_cms_estimate" -> cmsOracleSql,
    // pinned-hash bottom-k sketches: the estimates REPLAY bit-exactly
    "agg_kmv_distinct" -> kmvDistinctOracleSql,
    "agg_kmv_jaccard" -> kmvJaccardOracleSql,
    "profile_dq_rules" -> dqRulesOracleSql,
    // exact HUGEINT power sums -> the shared momentsFormula text
    "agg_moments" -> {
      val cols = momentsFormula.map { case (name, f) =>
        s"${Fp.r4Sql(f)} AS $name" }.mkString(",\n|  ")
      s"""WITH c AS (SELECT event_type,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
         |  FROM events),
         |p AS (SELECT event_type, x, x * x AS x2, x * x * x AS x3 FROM c),
         |m AS (SELECT event_type, count(*) AS n_rows,
         |    CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(x) AS DOUBLE) AS sx,
         |    CAST(sum(x2) AS DOUBLE) AS sxx,
         |    CAST(sum(x3) AS DOUBLE) AS sx3,
         |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS sx4
         |  FROM p GROUP BY event_type)
         |SELECT event_type, n_rows,
         |  $cols
         |FROM m ORDER BY event_type""".stripMargin
    },
    // same 6-pair unpivot; HUGEINT sums cast to the same doubles and
    // the corr closed form evaluates with the identical op sequence
    "profile_corr_matrix" ->
      """WITH c AS (SELECT
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc,
        |    CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax
        |  FROM lineitem),
        |p AS (
        |  SELECT 'qty_price' AS pair, qty AS x, price AS y FROM c
        |  UNION ALL SELECT 'qty_disc', qty, disc FROM c
        |  UNION ALL SELECT 'qty_tax', qty, tax FROM c
        |  UNION ALL SELECT 'price_disc', price, disc FROM c
        |  UNION ALL SELECT 'price_tax', price, tax FROM c
        |  UNION ALL SELECT 'disc_tax', disc, tax FROM c),
        |m AS (SELECT pair, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy
        |  FROM p GROUP BY pair)
        |SELECT pair, n,
        |  floor(((CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
        |           * (CAST(n AS DOUBLE) * syy - sy * sy)))
        |    * 10000.0 + 0.5) / 10000.0 AS corr
        |FROM m ORDER BY pair""".stripMargin,
    // discrete p05/p95 bounds stay exact BIGINT; clamp + sum exact,
    // one double division
    "agg_winsorized" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |b AS (SELECT event_type,
        |    CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS lo,
        |    CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS hi
        |  FROM e GROUP BY 1),
        |m AS (SELECT e.event_type, count(*) AS n,
        |    max(b.lo) AS lo, max(b.hi) AS hi,
        |    CAST(sum(greatest(b.lo, least(b.hi, e.cents))) AS BIGINT) AS sw
        |  FROM e JOIN b USING (event_type) GROUP BY 1)
        |SELECT event_type, n, lo, hi,
        |  floor((CAST(sw AS DOUBLE) / n) * 10000.0 + 0.5) / 10000.0
        |    AS wmean
        |FROM m ORDER BY event_type""".stripMargin,
    // pure integer epoch math: dow = (days+4) % 7, hour from mod —
    // no calendar functions on either engine
    "agg_heatmap" ->
      """WITH e AS (SELECT event_id,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s FROM events)
        |SELECT (ts_s // 86400 + 4) % 7 AS dow,
        |  (ts_s % 86400) // 3600 AS hour,
        |  count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM e GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin,
    // lag over the bounded daily frame; the first observed day is
    // DROPPED (WHERE prev_n IS NOT NULL below, matching the Spark
    // side) to avoid NULL-vs-NaN round-trip divergence on pct
    "win_pct_change" ->
      """WITH e AS (SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT)
        |    AS ts_s FROM events),
        |d AS (SELECT ts_s // 86400 AS day, count(*) AS n
        |  FROM e GROUP BY 1),
        |l AS (SELECT day, n, lag(n, 1) OVER (ORDER BY day) AS prev_n
        |  FROM d)
        |SELECT day, n, prev_n,
        |  floor((100.0 * (n - CAST(prev_n AS DOUBLE)) / prev_n)
        |    * 10000.0 + 0.5) / 10000.0 AS pct
        |FROM l WHERE prev_n IS NOT NULL ORDER BY day""".stripMargin,
    // identical generated digit CASE chain, `//` rendering
    "agg_benford" ->
      s"""WITH c AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
        |    AS cents FROM events),
        |p AS (SELECT ${benfordDigitSql("//")} AS d
        |  FROM c WHERE cents > 0)
        |SELECT d, count(*) AS n,
        |  floor((100.0 * log10(1.0 + 1.0 / d)) * 10000.0 + 0.5)
        |    / 10000.0 AS expected_pct
        |FROM p GROUP BY d ORDER BY d""".stripMargin,
    // discrete medians stay exact BIGINT; same percentile_disc
    // definition agg_quantile_disc proves
    "agg_mad" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |m AS (SELECT event_type,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS med
        |  FROM e GROUP BY 1)
        |SELECT e.event_type, count(*) AS n, max(m.med) AS median_cents,
        |  CAST(percentile_disc(0.5)
        |    WITHIN GROUP (ORDER BY abs(e.cents - m.med)) AS BIGINT)
        |    AS mad_cents
        |FROM e JOIN m USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // no logs: Simpson over exact integer counts, one double expression
    "agg_diversity" ->
      """WITH c AS (SELECT source, lang, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |m AS (SELECT source, count(*) AS n_langs,
        |    CAST(sum(c) AS BIGINT) AS n_docs,
        |    CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM c GROUP BY 1)
        |SELECT source, n_langs, n_docs,
        |  floor((1.0 - CAST(ss AS DOUBLE)
        |         / (CAST(n_docs AS DOUBLE) * n_docs)) * 10000.0 + 0.5)
        |    / 10000.0 AS simpson
        |FROM m ORDER BY source""".stripMargin,
    // same ASC-(cents, event_id) ranking; exact integer moments, one
    // double expression
    "agg_gini" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY cents, event_id) AS i FROM e),
        |m AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS total,
        |    CAST(sum(i * cents) AS BIGINT) AS iw
        |  FROM r GROUP BY 1)
        |SELECT event_type, n, total,
        |  floor(((2.0 * iw - (n + 1.0) * total)
        |         / (CAST(n AS DOUBLE) * total)) * 10000.0 + 0.5)
        |    / 10000.0 AS gini
        |FROM m ORDER BY event_type""".stripMargin,
    // pairs where both days exist; six exact BIGINT moments
    "agg_autocorr" ->
      """WITH ev AS (SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT)
        |    AS ts_s FROM events),
        |d AS (SELECT ts_s // 86400 AS day, count(*) AS x
        |  FROM ev GROUP BY 1),
        |p AS (SELECT k.k, a.x AS x, b.x AS y
        |  FROM d a, (VALUES (1), (2), (3)) k(k), d b
        |  WHERE b.day = a.day + k.k),
        |m AS (SELECT k, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1)
        |SELECT k, n,
        |  floor(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
        |    / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
        |     * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)))
        |    * 10000.0 + 0.5) / 10000.0 AS r
        |FROM m ORDER BY k""".stripMargin,
    // four exact-integer sections unioned; day keys zero-padded so
    // string order == numeric order
    "analytics_end_to_end" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |v AS (SELECT user_id, min(ts_s) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |fc AS (SELECT e.user_id, min(e.ts_s) AS t_click
        |       FROM e JOIN v USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts_s > v.t_view
        |         AND e.ts_s <= v.t_view + 86400 GROUP BY e.user_id),
        |fp AS (SELECT e.user_id, min(e.ts_s) AS t_purchase
        |       FROM e JOIN fc USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts_s > fc.t_click
        |         AND e.ts_s <= fc.t_click + 604800 GROUP BY e.user_id),
        |funnel AS (SELECT 'funnel' AS section,
        |    CAST(CASE WHEN fp.user_id IS NOT NULL THEN 3
        |              WHEN fc.user_id IS NOT NULL THEN 2 ELSE 1 END
        |      AS VARCHAR) AS key,
        |    count(*) AS n, CAST(sum(v.user_id) AS BIGINT) AS v
        |  FROM v LEFT JOIN fc USING (user_id) LEFT JOIN fp USING (user_id)
        |  GROUP BY 2),
        |days AS (SELECT DISTINCT user_id, ts_s // 86400 AS day FROM e),
        |cohort AS (SELECT user_id, min(day) AS cohort_day
        |  FROM days GROUP BY user_id),
        |retention AS (SELECT 'retention' AS section,
        |    CAST(day - cohort_day AS VARCHAR) AS key,
        |    count(*) AS n, CAST(0 AS BIGINT) AS v
        |  FROM days JOIN cohort USING (user_id)
        |  WHERE day - cohort_day <= 7 GROUP BY 2),
        |daily AS (SELECT 'daily' AS section,
        |    lpad(CAST(ts_s // 86400 AS VARCHAR), 8, '0') AS key,
        |    count(DISTINCT user_id) AS n, count(*) AS v
        |  FROM e GROUP BY 2),
        |m AS (SELECT event_type, count(*) AS cnt,
        |    CAST(sum(cents) AS BIGINT) AS sm,
        |    CAST(sum(cents * cents) AS BIGINT) AS q
        |  FROM e GROUP BY 1),
        |anomaly AS (SELECT 'anomaly' AS section, e.event_type AS key,
        |    CAST(sum(CASE WHEN abs(
        |        floor(((CAST(cents AS DOUBLE) - CAST(sm AS DOUBLE) / cnt)
        |          / sqrt((CAST(q AS DOUBLE) - CAST(sm AS DOUBLE) * sm / cnt)
        |                 / (cnt - 1))) * 10000.0 + 0.5) / 10000.0) >= 3.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n,
        |    count(*) AS v
        |  FROM e JOIN m USING (event_type) GROUP BY 2)
        |SELECT * FROM (
        |  SELECT * FROM funnel UNION ALL SELECT * FROM retention
        |  UNION ALL SELECT * FROM daily UNION ALL SELECT * FROM anomaly)
        |ORDER BY section, key""".stripMargin,
    // same lag-over-(ts, id) ordering; counts exact, one division
    "agg_transitions" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_ns(ts) AS ts_ns FROM events),
        |l AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts_ns, event_id) AS prev_type FROM e),
        |tr AS (SELECT prev_type, event_type, count(*) AS n
        |  FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total
        |  FROM tr GROUP BY 1)
        |SELECT tr.prev_type, tr.event_type, tr.n,
        |  floor((CAST(tr.n AS DOUBLE) / tot.row_total) * 10000.0 + 0.5)
        |    / 10000.0 AS p
        |FROM tr JOIN tot USING (prev_type)
        |ORDER BY prev_type, event_type""".stripMargin,
    // same fixed expression tree; the >=3 cut compares the ROUNDED z
    "agg_zscore" ->
      """WITH c AS (SELECT event_id, event_type, value,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |m AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(sum(cents * cents) AS BIGINT) AS q
        |  FROM c GROUP BY 1),
        |j AS (SELECT c.event_id, c.event_type, c.value,
        |    floor(((CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n)
        |      / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
        |             / (n - 1))) * 10000.0 + 0.5) / 10000.0 AS z
        |  FROM c JOIN m ON m.event_type = c.event_type)
        |SELECT event_id, event_type, value, z FROM j
        |WHERE abs(z) >= 3.0 ORDER BY event_id""".stripMargin,
    // identical expression trees over exact integer moments — every
    // double op happens in the same order in both engines
    "agg_ttest" ->
      """WITH m AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
        |  FROM (SELECT event_type,
        |      CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events)
        |  GROUP BY event_type),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.n AS na, a.s AS sa, a.q AS qa,
        |    b.n AS nb, b.s AS sb, b.q AS qb
        |  FROM m a JOIN m b ON a.event_type < b.event_type),
        |v AS (SELECT *,
        |    (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1)
        |      AS va,
        |    (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1)
        |      AS vb
        |  FROM p)
        |SELECT type_a, type_b, na, nb,
        |  floor(((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
        |    / sqrt(va / na + vb / nb)) * 10000.0 + 0.5) / 10000.0
        |    AS t_stat,
        |  floor(((va / na + vb / nb) * (va / na + vb / nb)
        |    / (va * va / (CAST(na AS DOUBLE) * na * (na - 1))
        |     + vb * vb / (CAST(nb AS DOUBLE) * nb * (nb - 1))))
        |    * 10000.0 + 0.5) / 10000.0 AS welch_df
        |FROM v ORDER BY type_a, type_b""".stripMargin,
    // full grid incl. zero cells; per-cell only (no cross-cell FP sum)
    "agg_chisq" ->
      """WITH cells AS (SELECT lang, source, count(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, count(*) AS r FROM documents GROUP BY 1),
        |c AS (SELECT source, count(*) AS c FROM documents GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT r.lang, c.source, COALESCE(cells.o, 0) AS o,
        |  floor((CAST(r.r AS DOUBLE) * c.c / n.n) * 10000.0 + 0.5)
        |    / 10000.0 AS expected,
        |  floor(((CAST(COALESCE(cells.o, 0) AS DOUBLE) * n.n
        |            - CAST(r.r AS DOUBLE) * c.c)
        |         * (CAST(COALESCE(cells.o, 0) AS DOUBLE) * n.n
        |            - CAST(r.r AS DOUBLE) * c.c)
        |         / (CAST(r.r AS DOUBLE) * c.c * n.n)) * 10000.0 + 0.5)
        |    / 10000.0 AS contrib
        |FROM r CROSS JOIN c
        |  LEFT JOIN cells ON cells.lang = r.lang AND cells.source = c.source
        |  CROSS JOIN n
        |ORDER BY 1, 2""".stripMargin,
    // open/close deterministic under ts ties via (ts_ns, event_id)
    // ordering; bar = floor-seconds div 86400, both truncating
    "agg_ohlc" ->
      s"""WITH e AS (SELECT event_type, value, event_id,
         |    epoch_ns(ts) AS ts_ns,
         |    (epoch_ns(ts) // 1000000000) // 86400 AS bar
         |  FROM events),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY event_type, bar
         |                       ORDER BY ts_ns, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type, bar) AS n
         |  FROM e)
         |SELECT event_type, bar,
         |  min(CASE WHEN rn = 1 THEN value END) AS open,
         |  max(value) AS high, min(value) AS low,
         |  min(CASE WHEN rn = n THEN value END) AS close,
         |  count(*) AS n_events,
         |  ${Fp.r4Sql("sum(value)")} AS volume
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // exact integer cohort math; epoch // 86400 truncation matches div
    "agg_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_both, CAST(sum(a.user_id) AS BIGINT) AS user_id_sum
        |FROM tu a JOIN tu b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "profile_topvalues" ->
      """WITH kv AS (
        |  SELECT 'event_type' AS cname, event_type AS val FROM events
        |  UNION ALL
        |  SELECT 'user_mod', CAST(user_id % 10 AS VARCHAR) FROM events
        |  UNION ALL
        |  SELECT 'dow', CAST(((epoch_ns(ts) // 1000000000) // 86400) % 7
        |    AS VARCHAR) FROM events),
        |cnt AS (SELECT cname, val, count(*) AS c FROM kv GROUP BY 1, 2),
        |r AS (SELECT cname, val, c,
        |        row_number() OVER (PARTITION BY cname
        |                           ORDER BY c DESC, val) AS rk
        |      FROM cnt)
        |SELECT cname, CAST(rk AS INTEGER) AS rk, val, c
        |FROM r WHERE rk <= 3 ORDER BY cname, rk""".stripMargin,
    "agg_funnel_window" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s FROM events),
        |v AS (SELECT user_id, min(ts_s) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |fc AS (SELECT e.user_id, min(e.ts_s) AS t_click
        |       FROM e JOIN v USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts_s > v.t_view
        |         AND e.ts_s <= v.t_view + 86400 GROUP BY e.user_id),
        |fp AS (SELECT e.user_id, min(e.ts_s) AS t_purchase
        |       FROM e JOIN fc USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts_s > fc.t_click
        |         AND e.ts_s <= fc.t_click + 604800 GROUP BY e.user_id)
        |SELECT CASE WHEN fp.user_id IS NOT NULL THEN 3
        |            WHEN fc.user_id IS NOT NULL THEN 2 ELSE 1 END AS stage,
        |  count(*) AS n_users, CAST(sum(v.user_id) AS BIGINT) AS user_id_sum
        |FROM v LEFT JOIN fc USING (user_id) LEFT JOIN fp USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_retention" ->
      """WITH e AS (SELECT user_id,
        |    (epoch_ns(ts) // 1000000000) // 86400 AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day
        |  FROM e GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT cohort_day, day - cohort_day AS "offset",
        |  count(DISTINCT user_id) AS n_users
        |FROM active JOIN cohort USING (user_id)
        |WHERE day - cohort_day <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // bitmap popcount must equal the exact distinct count
    "agg_bitmap_distinct" ->
      """SELECT o_orderpriority AS pri,
        |  count(DISTINCT o_custkey) AS n_distinct
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // gid re-derived from the explicit bit formula — checks Spark's
    // grouping_id bit order, not a shared engine convention
    "agg_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(2 * grouping(o_orderstatus) + grouping(o_orderpriority)
        |    AS BIGINT) AS gid,
        |  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
        |  count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin,
    // melt replayed as UNION ALL — same (measure, value) multiset
    "agg_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, count(*) AS n,
        |  CAST(sum(CAST(floor(v * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  min(v) AS min_v, max(v) AS max_v
        |FROM m GROUP BY measure ORDER BY measure""".stripMargin,
    "agg_listagg" ->
      """SELECT r.r_name,
        |  string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
        |  count(*) AS n_nations
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
    "profile_histogram" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |    AS cents
        |  FROM orders)
        |SELECT cents // 2500000 AS bucket, count(*) AS n,
        |  min(cents) AS min_cents, max(cents) AS max_cents,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "profile_stats" ->
      """WITH m AS (
        |  SELECT 'event_id' AS cname, CAST(event_id AS VARCHAR) AS val FROM events
        |  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
        |  UNION ALL SELECT 'event_type', event_type FROM events
        |  UNION ALL SELECT 'day', CAST(CAST(ts AS DATE) AS VARCHAR) FROM events
        |  UNION ALL SELECT 'props', props FROM events),
        |g AS (SELECT cname, val, count(*) AS c FROM m GROUP BY 1, 2)
        |SELECT cname, CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(CASE WHEN val IS NULL THEN c END), 0) AS BIGINT)
        |    AS n_null,
        |  count(val) AS n_distinct,
        |  CAST(min(length(val)) AS INTEGER) AS min_len,
        |  CAST(max(length(val)) AS INTEGER) AS max_len
        |FROM g GROUP BY cname ORDER BY cname""".stripMargin,
    // DuckDB arg_max/arg_min reject struct ordering keys, so the
    // deterministic (acctbal, suppkey) tie-break is emulated with
    // row_number windows — semantics identical to the Spark max_by/
    // min_by over a struct key
    "agg_minmax_by" ->
      """WITH rk AS (SELECT s_nationkey, s_name, s_acctbal,
        |    row_number() OVER (PARTITION BY s_nationkey
        |      ORDER BY s_acctbal DESC, s_suppkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY s_nationkey
        |      ORDER BY s_acctbal ASC, s_suppkey ASC) AS rmin
        |  FROM supplier)
        |SELECT s_nationkey,
        |  max(CASE WHEN rmax = 1 THEN s_name END) AS richest,
        |  min(CASE WHEN rmin = 1 THEN s_name END) AS poorest,
        |  floor(max(s_acctbal) * 10000.0 + 0.5) / 10000.0 AS max_bal,
        |  floor(min(s_acctbal) * 10000.0 + 0.5) / 10000.0 AS min_bal
        |FROM rk GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "agg_countif" ->
      """SELECT event_type,
        |  count(*) FILTER (WHERE value > 50.0) AS n_high,
        |  count(*) FILTER (WHERE user_id % 2 = 0) AS n_even_user,
        |  bool_and(value >= 0.0) AS all_nonneg,
        |  bool_or(value > 99.0) AS any_extreme,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_bitagg" ->
      """SELECT event_type,
        |  bit_and(user_id) AS band,
        |  bit_or(user_id) AS bor,
        |  bit_xor(user_id) AS bxor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_regression" ->
      """SELECT l_returnflag,
        |  floor(regr_slope(l_extendedprice, l_quantity) * 10000.0 + 0.5) / 10000.0 AS slope,
        |  floor(regr_intercept(l_extendedprice, l_quantity) * 10000.0 + 0.5) / 10000.0 AS icept,
        |  floor(regr_r2(l_extendedprice, l_quantity) * 10000.0 + 0.5) / 10000.0 AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_corr" ->
      """SELECT l_returnflag,
        |  floor(corr(l_quantity, l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS corr_qp,
        |  floor(covar_pop(l_quantity, l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS cov_pop,
        |  floor(covar_samp(l_quantity, l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS cov_samp,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // integer epoch seconds end-to-end (events ts_s convention)
    "agg_funnel" ->
      """WITH s AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |        THEN epoch_ns(ts) // 1000000000 END) AS t_view,
        |    min(CASE WHEN event_type = 'click'
        |        THEN epoch_ns(ts) // 1000000000 END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase'
        |        THEN epoch_ns(ts) // 1000000000 END) AS t_purchase
        |  FROM events GROUP BY user_id),
        |st AS (SELECT user_id,
        |    CASE WHEN t_view IS NULL THEN 0
        |         WHEN t_click IS NULL OR t_click < t_view THEN 1
        |         WHEN t_purchase IS NULL OR t_purchase < t_click THEN 2
        |         ELSE 3 END AS stage
        |  FROM s)
        |SELECT stage, count(*) AS n_users,
        |  CAST(sum(user_id) AS BIGINT) AS user_id_sum
        |FROM st GROUP BY stage ORDER BY stage""".stripMargin,
    // list(... ORDER BY ln, qty) mirrors sort_array's lexicographic
    // struct order; struct fields accessed positionally on both sides
    "agg_collect_struct" ->
      """WITH g AS (SELECT l_orderkey,
        |    list({'ln': l_linenumber, 'qty': l_quantity}
        |         ORDER BY l_linenumber, l_quantity) AS items
        |  FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_orderkey)
        |SELECT l_orderkey, CAST(len(items) AS INTEGER) AS n_items,
        |  items[1].ln AS first_ln,
        |  floor((items[1].qty) * 10000.0 + 0.5) / 10000.0 AS first_qty,
        |  items[-1].ln AS last_ln
        |FROM g ORDER BY l_orderkey""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_mode" ->
      """SELECT yr, o_orderpriority, cnt FROM (
        |  SELECT yr, o_orderpriority, cnt,
        |    row_number() OVER (PARTITION BY yr
        |      ORDER BY cnt DESC, o_orderpriority) AS rn
        |  FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |          o_orderpriority, count(*) AS cnt
        |        FROM orders GROUP BY 1, 2) g) x
        |WHERE rn = 1 ORDER BY yr""".stripMargin,
    // sketch-family oracles: the estimate is engine-private; each
    // query publishes the INVARIANT (estimate within band of exact),
    // so the oracle's expected boolean is constant-true and the
    // exact counts replay in DuckDB directly
    "agg_approx_distinct" ->
      """SELECT event_type, true AS within_band,
        |  count(DISTINCT user_id) AS n_users, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_sketch_union" ->
      """SELECT event_type, count(DISTINCT event_id % 2) AS n_sketches,
        |  true AS union_in_band, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the sketch value is engine-private; the oracle checks the
    // published INVARIANT — approx p50 inside the exact [p45, p55]
    // sandwich — which must hold, so the expected column is constant
    "agg_approx_quantile" ->
      """SELECT o_orderpriority, true AS p50_in_band, count(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_quantile_disc" ->
      """SELECT o_orderpriority,
        |  floor((quantile_disc(o_totalprice, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50d,
        |  floor((quantile_disc(o_totalprice, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90d
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_quantile" ->
      """SELECT o_orderpriority,
        |  floor((quantile_cont(o_totalprice, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor((quantile_cont(o_totalprice, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        |  floor((stddev_samp(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS sd_price,
        |  floor((var_samp(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS var_qty,
        |  floor((min(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS min_price,
        |  floor((max(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        |  floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS sum_base_price,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 AS sum_disc_price,
        |  floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        |  floor((avg(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
        |  floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinct" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "agg_rollup" ->
      """SELECT n_name, c_mktsegment,
        |  floor((sum(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT event_type, CAST(year(ts) AS INTEGER) AS yr, count(*) AS n,
        |  floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
        |FROM events
        |GROUP BY CUBE (event_type, year(ts))
        |ORDER BY event_type NULLS FIRST, yr NULLS FIRST""".stripMargin,
    "agg_pivot" ->
      """SELECT label,
        |  count(CASE WHEN vec_id % 10 = 0 THEN 1 END) AS "0",
        |  count(CASE WHEN vec_id % 10 = 1 THEN 1 END) AS "1",
        |  count(CASE WHEN vec_id % 10 = 2 THEN 1 END) AS "2",
        |  count(CASE WHEN vec_id % 10 = 3 THEN 1 END) AS "3",
        |  count(CASE WHEN vec_id % 10 = 4 THEN 1 END) AS "4",
        |  count(CASE WHEN vec_id % 10 = 5 THEN 1 END) AS "5",
        |  count(CASE WHEN vec_id % 10 = 6 THEN 1 END) AS "6",
        |  count(CASE WHEN vec_id % 10 = 7 THEN 1 END) AS "7",
        |  count(CASE WHEN vec_id % 10 = 8 THEN 1 END) AS "8",
        |  count(CASE WHEN vec_id % 10 = 9 THEN 1 END) AS "9"
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "agg_accuracy" ->
      """SELECT floor((avg(CASE WHEN label = vec_id % 10
        |    THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)) * 10000.0 + 0.5) / 10000.0
        |  AS accuracy, count(*) AS n
        |FROM embeddings""".stripMargin)
}
