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

  /** Time-series gap-fill + forward-fill: per-user daily event counts
    * resampled onto each user's own [first, last] day span (sequence +
    * explode generates the calendar — bounded by span, never rows²),
    * missing days null-filled by the calendar left join, then
    * forward-filled with last(ignoreNulls) over a ROWS frame. The
    * first calendar day is always observed, so no leading nulls. All
    * integer counts ⇒ exact oracle. Scale: one agg shuffle + one join
    * on (user, day) + one window on user — same key, and per-user
    * spans are bounded (≤31 days here), so no partition explodes. */
  def pipelineGapfill(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_obs"))
    val cal = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left_outer")
      .withColumn("n_filled", last(col("n_obs"), ignoreNulls = true).over(w))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_obs"), col("n_filled"))
      .orderBy("user_id", "day")
  }

  /** Batch sessionization (gaps-and-islands): a session breaks after
    * [[SessionGapS]] idle seconds; session id = running count of
    * breaks. The batch twin of stream_session — same 30-min gap —
    * computed with two windows over the SAME (user, time) partition
    * key, so Spark plans ONE shuffle + one sort reused by both.
    * All-integer (ts_s, counts) ⇒ exact oracle. */
  val SessionGapS = 1800L
  def winSessionize(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("brk",
        when(col("ts_s") - lag("ts_s", 1).over(byTime) > SessionGapS, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_id", sum("brk").over(running))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_s").as("start_s"),
        (max("ts_s") - min("ts_s")).as("dur_s"))
      .orderBy("user_id", "session_id")
  }

  /** Row-pattern detection (the MATCH_RECOGNIZE shape, expressed with
    * a lead() chain): STRICTLY ADJACENT view → click conversions per
    * user within one hour — unlike agg_funnel's earliest-times
    * ordering, adjacency means no other event may interrupt the pair,
    * and one user can match many times. A fixed-length pattern over an
    * ordered partition compiles to one window pass + a filter — no
    * self-joins, no per-row regex engine; the shuffle is the same
    * single (user) exchange every window query pays. (Longer patterns
    * chain more leads over the SAME sort — a 3-step variant matched
    * zero rows at the gate SF on this synthetic data, so the declared
    * query uses the 2-step form that exercises every mechanism with
    * non-trivial output.) */
  def winPattern(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_s"))
      .withColumn("t1", lead("event_type", 1).over(w))
      .withColumn("ts1", lead("ts_s", 1).over(w))
      .filter(col("event_type") === "view" && col("t1") === "click" &&
        col("ts1") - col("ts_s") <= 3600L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_matches"),
        min("event_id").as("first_match_event"),
        min(col("ts1") - col("ts_s")).as("fastest_gap_s"))
      .orderBy("user_id")
  }

  /** Half-open session intervals [start_s, end_s) per (user, session)
    * under the [[SessionGapS]] gap rule — the sweep input shared by
    * [[winConcurrency]] and its incremental streaming twin
    * (`graft.streaming.StreamQueries.streamConcurrency`). */
  def concurrencySessions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("brk",
        when(col("ts_s") - lag("ts_s", 1).over(
          Window.partitionBy("user_id").orderBy("ts_s", "event_id")) > SessionGapS, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_id", sum("brk").over(
        Window.partitionBy("user_id").orderBy("ts_s", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts_s").as("start_s"), (max("ts_s") + 1).as("end_s"))

  /** Peak CONCURRENCY per day (how many user sessions are active at
    * once — the ops metric behind capacity planning), computed as a
    * sweep-line over the [[winSessionize]] session intervals with a
    * TWO-LEVEL DISTRIBUTED PREFIX SUM: a naive sweep needs one global
    * running sum (a single-task window — the anti-scale shape), so
    * instead endpoint deltas (+1 at start, −1 at end, half-open
    * [start, end+1) intervals) sweep LOCALLY inside day bins, and each
    * bin's carry-in offset comes from a running sum over the per-bin
    * totals — a #bins-row frame, negligible at any corpus size. Ties
    * at one (t, delta) are interchangeable rows (same delta), so the
    * per-row sums are order-independent as a set and the daily max is
    * exact. Output: (day_bin, peak) — bit-exact integers.
    *
    * The oracle replays the logically-identical single global window;
    * the two-level decomposition is exactly associative so the values
    * agree (the same argument as the integer training loops).
    *
    * SEMANTICS (deliberate, oracle-mirrored): the per-day peak is the
    * max of concurrency sampled AT ENDPOINT ROWS falling in that day —
    * the day a level CHANGES. A day with no endpoints emits no row,
    * and a level carried in from a prior day is reported on the day it
    * was established, not re-reported daily. For a true daily-peak
    * calendar, emit one (t = bin·86400, delta 0) probe row per active
    * bin before the sweep; the concurrency math is unchanged. */
  def winConcurrency(s: SparkSession, dir: String): DataFrame = {
    val DayS = 86400L
    val sessions = concurrencySessions(s, dir)
    // both endpoints emitted in ONE pass over the sessionize subtree
    // (r8: the union-of-two-projections shape re-ran the events
    // window + groupBy per branch, and the endpoint frame itself
    // feeds both the local sweep and the bin offsets — four
    // potential recomputes; explode + one checkpoint makes it one)
    val endpoints = sessions.select(explode(array(
        struct(col("start_s").as("t"), lit(1L).as("delta")),
        struct(col("end_s").as("t"), lit(-1L).as("delta")))).as("e"))
      .select(col("e.t").as("t"), col("e.delta").as("delta"))
      .withColumn("bin", expr(s"t div $DayS"))
      .localCheckpoint(true)
    val local = endpoints.withColumn("run",
      sum("delta").over(Window.partitionBy("bin").orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = endpoints.groupBy("bin").agg(sum("delta").as("tot"))
      .withColumn("off",
        coalesce(sum("tot").over(Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bin", "off")
    local.join(broadcast(offsets), "bin")
      .groupBy(col("bin").as("day_bin"))
      .agg(max(col("off") + col("run")).as("peak"))
      .orderBy("day_bin")
  }

  /** Chunk width for [[winSessionizeSalted]] — 6 h of events per salt
    * bucket, 12× the session gap so boundary merges stay rare. */
  val SessionChunkS = 21600L

  /** SKEW-HARDENED sessionize: [[winSessionize]] partitions by
    * user_id alone, so one pathological user (a bot with 100 M events)
    * serializes an entire task at 100 TB. Here the per-user stream is
    * SALTED by coarse time chunk ([[SessionChunkS]]) — the same
    * two-level decomposition win_concurrency uses for day bins:
    *
    *  1. sessionize LOCALLY inside each (user, chunk) window — the
    *     hot user's events spread over #chunks parallel tasks;
    *  2. collapse each local session to one summary row (start, end,
    *     count) — events never cross the second shuffle;
    *  3. merge ACROSS chunk boundaries over the per-user summary rows
    *     (#local-sessions ≪ #events): a chunk's first session joins
    *     the previous chunk's last when the boundary gap ≤ gap.
    *
    * Within a chunk, consecutive local sessions are separated by
    * > gap by construction, so only boundary merges exist, and the
    * boundary gap equals the event gap the unsalted form tests (a
    * session's end IS its last event). Result is bit-identical to
    * win_sessionize — the oracle replays the UNSALTED formulation, so
    * the hash check proves the decomposition, not a shared plan. */
  def winSessionizeSalted(s: SparkSession, dir: String): DataFrame = {
    val byChunk = Window.partitionBy("user_id", "chunk")
      .orderBy("ts_s", "event_id")
    val local = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts_s"),
        expr(s"ts_s div $SessionChunkS").as("chunk"))
      .withColumn("brk",
        when(col("ts_s") - lag("ts_s", 1).over(byChunk) > SessionGapS, 1L)
          .otherwise(lit(0L)))
      .withColumn("lsid", sum("brk").over(
        byChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "chunk", "lsid")
      .agg(count(lit(1)).as("n"),
        min("ts_s").as("start_s"), max("ts_s").as("end_s"))
    // distinct local sessions of one user never share a start_s
    // (chunks cover disjoint time ranges; in-chunk sessions are
    // disjoint), so start_s totally orders the summary rows
    val byUser = Window.partitionBy("user_id").orderBy("start_s")
    local
      .withColumn("gbrk",
        when(col("start_s") - lag("end_s", 1).over(byUser) > SessionGapS, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_id", sum("gbrk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(sum("n").as("n_events"), min("start_s").as("start_s"),
        (max("end_s") - min("start_s")).as("dur_s"))
      .orderBy("user_id", "session_id")
  }

  /** SCD2 history build: per user, collapse consecutive identical
    * event_types, then emit validity intervals [valid_from, valid_to)
    * with lead() — the slowly-changing-dimension shape every warehouse
    * ingest needs. Change detection and interval close are two window
    * passes over the same (user, time) key ⇒ one shuffle. Integer
    * epoch seconds; open intervals end NULL. */
  def pipelineScd2(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val changes = t(s, dir, "events")
      .withColumn("prev_type", lag("event_type", 1).over(byTime))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    changes
      .withColumn("valid_to", lead("ts_s", 1).over(byTime))
      .select(col("user_id"), col("event_id").as("first_event_id"),
        col("event_type"), col("ts_s").as("valid_from"), col("valid_to"))
      .orderBy("user_id", "valid_from", "first_event_id")
  }

  /** Frame-edge value functions (first_value / last_value /
    * nth_value) over a full-extent ROWS frame: per customer in
    * orderdate order, the earliest price, the latest price, and the
    * second order's key, carried on every row. The unique
    * (o_orderdate, o_orderkey) ordering makes frame EDGES engine-
    * deterministic; all three functions share one window ⇒ one
    * shuffle + one sort. */
  def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    val full = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first("o_totalprice").over(full).as("first_price"),
        last("o_totalprice").over(full).as("last_price"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Share-of-total analytics (the RATIO_TO_REPORT shape): each
    * nation's share of its region's total customer account balance,
    * plus the integer-cents gap to the region leader. Aggregate FIRST,
    * window second — the windows run over the 25-row aggregated frame,
    * never the fact table, so the only fact-sized shuffle is the
    * two-phase groupBy. Balances are summed as integer cents (exact,
    * associative); the share is one double division of two exact
    * integers, r4-rounded on both engines. */
  def winShare(s: SparkSession, dir: String): DataFrame = {
    val byNation = t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(sum(floor(col("c_acctbal") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
    val w = Window.partitionBy("n_regionkey")
    byNation
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey"), col("n_name"), col("cents"),
        Fp.r4(col("cents") / sum("cents").over(w)).as("share"),
        (max("cents").over(w) - col("cents")).as("gap_cents"))
      .orderBy("n_regionkey", "n_name")
  }

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands window: distinct active days, `day − dense-rank`
    * island key (constant within a run of consecutive days, strictly
    * monotone across gaps), island lengths, max per user. One shuffle
    * on user_id reused by the window AND both aggregations; state per
    * user is its distinct-day list, bounded by the calendar. All
    * integers ⇒ exact oracle. */
  def winStreaks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    t(s, dir, "events")
      .select(col("user_id"), expr("ts_s div 86400").as("day"))
      .distinct()
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"), min("day").as("streak_start"))
      .groupBy("user_id")
      .agg(max("len").as("max_streak"),
        count(lit(1)).as("n_streaks"),
        min("streak_start").as("first_day"))
      .orderBy("user_id")
  }

  /** Rolling 7-day windowed quantiles per event_type at day
    * granularity — the moving-percentile monitor (p50/p90 of the last
    * week, recomputed daily). A naive per-ROW range-frame percentile
    * recomputes an O(frame) exact quantile for every event (percentile
    * is not subtractable — no incremental frame update exists), an
    * O(n·frame) blowup.
    *
    * r16 (VERDICT r15 item 3, guide §2.1 — shuffle fewer bytes): the
    * r8 shape fanned every EVENT out to the ≤7 target days containing
    * it and ran one groupBy — one exchange, but it moved every value
    * ×7 (percentile partial states hold the full multiset, so map-side
    * aggregation batches rows without shrinking bytes). This shape
    * pre-aggregates to the (type, day) grid FIRST — one events×1
    * exchange into day value-arrays — then a range-frame window
    * (RANGE 6 PRECEDING .. CURRENT) over the ~|days|-row grid merges
    * each day's ≤7 arrays and selects the discrete quantiles directly
    * from the sorted multiset: element_at(sorted, ceil(q·n)) is
    * exactly percentile_disc (smallest v with cume ≥ q; the ceil is
    * INTEGER arithmetic — (n+1) div 2, (9n+9) div 10 — because a
    * 0.9·n double rounds the wrong way on exact multiples). Total
    * movement drops from events×7 to events×2 (values cross once as
    * collect_list partials, once as day arrays into the per-type
    * window), and the ×7 blowup happens only on the aggregated grid,
    * post-shuffle. A/B at sf0.1 (AbProbe, local[32]): 9.31 → 0.92 MB
    * shuffled (the ×7 percentile buffers also carried ~40 B of
    * per-value OpenHashMap serialization overhead; the day arrays are
    * packed doubles), warm wall 2.102 → 0.920 s min-of-3, jobs 4 → 5
    * (the window adds one AQE stage over the 150-row grid); the
    * explode-×7 shape is kept below as [[winRollingQuantileFanout]]
    * for the probe and the equivalence test. Days with no events of their OWN fall out for
    * free — the day grid only has rows for days with events (the r8
    * n_own conditional count is subsumed). The oracle (quantile_disc,
    * the semi-join formulation) is untouched — the hash proves the
    * rewrite. */
  def winRollingQuantile(s: SparkSession, dir: String): DataFrame = {
    val perDay = t(s, dir, "events")
      .select(col("event_type"), expr("ts_s div 86400").as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(collect_list(col("value")).as("vs"))
    val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    perDay
      .select(col("event_type"), col("day"),
        array_sort(flatten(collect_list(col("vs")).over(w))).as("win"))
      .select(col("event_type"), col("day"),
        size(col("win")).cast("long").as("n_window"),
        Fp.r4(expr("element_at(win, CAST((size(win) + 1) div 2 AS INT))"))
          .as("p50d"),
        Fp.r4(expr("element_at(win, CAST((9L * size(win) + 9) div 10 AS INT))"))
          .as("p90d"))
      .orderBy("event_type", "day")
  }

  /** The r8 explode-×7 formulation of [[winRollingQuantile]] — each
    * event fans out to the ≤7 target days whose window contains it, one
    * groupBy computes percentile_disc per (type, day). Kept (undeclared)
    * as the A/B counterpart and the equivalence-test subject; see the
    * r16 note above for why the day-grid window replaced it. */
  private[graft] def winRollingQuantileFanout(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"), expr("ts_s div 86400").as("day"), col("value"))
    e.withColumn("target_day", explode(sequence(col("day"), col("day") + 6)))
      .groupBy(col("event_type"), col("target_day").as("day"))
      .agg(
        count(lit(1)).as("n_window"),
        sum(when(col("day") === col("target_day"), 1L).otherwise(0L))
          .as("n_own"),
        Fp.r4(expr(
          "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")).as("p50d"),
        Fp.r4(expr(
          "percentile_disc(0.9) WITHIN GROUP (ORDER BY value)")).as("p90d"))
      .filter(col("n_own") > 0).drop("n_own")
      .orderBy("event_type", "day")
  }

  /** Distribution-position windows: cume_dist (fraction of the
    * customer's orders priced at-or-below this one) and the runner-up
    * order key via nth_value over the FULL frame. cume_dist counts
    * VALUE peers, so it is tie-insensitive; nth_value reads a totally
    * ordered frame (price desc, key asc — unique by key), so both are
    * deterministic across engines. Same single shuffle on o_custkey
    * as every other customer window; frames never leave the partition. */
  def winCumeDist(s: SparkSession, dir: String): DataFrame = {
    val wc = Window.partitionBy("o_custkey").orderBy(asc("o_totalprice"))
    val wf = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        Fp.r4(cume_dist().over(wc)).as("cd"),
        nth_value(col("o_orderkey"), 2).over(wf).as("runner_up"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Bounded exponentially-weighted moving average (α = 1/2, 8-tap)
    * of each user's event values in time order. A true EWMA is a
    * sequential recurrence — O(n) per partition but unsplittable; the
    * 8-tap truncation (weights 128,64,…,1 — the tail beyond 8 lags is
    * < 1/255 of the mass) turns it into a FIXED linear combination of
    * the last 8 values, i.e. EIGHT lag() columns over ONE window: a
    * single user_id exchange, no join, no fan-out — each lag is O(1)
    * per row inside the same window pass. (The fan-out-×8 groupBy
    * formulation — winRollingQuantile's trick — also works but needs
    * a join back to real positions whose plan broadcasts an
    * event-count-sized side; lags express the same math with strictly
    * less movement. Fan-out remains the right shape when the frame
    * aggregate is NOT a fixed linear form, e.g. a quantile.) Missing
    * lags at a user's start drop out of both numerator and
    * denominator (weights renormalize over available taps). Integer
    * cents × integer weights ⇒ exact sums; the single double division
    * happens once per output row ⇒ exact oracle. */
  def winEwma(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts_ns"), asc("event_id"))
    val taps = (0 to 7).map { k =>
      val c = if (k == 0) col("cents") else lag(col("cents"), k).over(w)
      (c, 1L << (7 - k))
    }
    val num = taps.map { case (c, wt) =>
      when(c.isNotNull, c * lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    val den = taps.map { case (c, wt) =>
      when(c.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .select(col("user_id"), col("event_id"),
        Fp.r4(num / den / lit(100.0)).as("ewma"))
      .orderBy("user_id", "event_id")
  }

  /** rank() vs dense_rank() on genuine ties — the one window-function
    * pair the suite hadn't exercised, and the divergence only ties
    * expose: after a k-way tie rank() skips k−1 positions while
    * dense_rank() doesn't. Ranked substrate is the per-(type, day)
    * count frame — small integers that collide reliably at every SF
    * (raw cents turned out tie-free at the extremes) — so the skip
    * actually fires; WindowSpec-style divergence is asserted in
    * PropertySpec. Both ranks are functions of the COUNT alone, so no
    * tie-break is needed for determinism, and the dense_rank ≤ 5 cut
    * keeps every day of the top-5 distinct counts (a value-complete,
    * engine-stable set). The events collapse map-side to the bounded
    * daily frame before the one event_type window exchange. */
  def winDenseRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(desc("n"))
    t(s, dir, "events")
      .groupBy(col("event_type"), expr("ts_s div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("drnk") <= 5)
      .orderBy("event_type", "drnk", "day")
  }

  /** Maximum DRAWDOWN per user — the peak-to-trough analytic every
    * metrics/trading stack ships: over the time-ordered series of
    * centered integer deltas (cents − 50, a signed random walk since
    * `value` is uniform on [0,1)), track the running sum, its running
    * peak, and report the deepest peak-to-current gap. Two stacked
    * running windows + the final per-user aggregate all share ONE
    * user_id exchange (the window's partitioning satisfies the
    * groupBy); all-integer arithmetic ⇒ exact oracle. Ties on ts_ns
    * broken by event_id, so the walk order is engine-deterministic. */
  def winDrawdown(s: SparkSession, dir: String): DataFrame = {
    val run = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        (floor(col("value") * 100 + lit(0.5)).cast("long") - 50).as("delta"))
      .withColumn("cum", sum("delta").over(run))
      .withColumn("peak", max("cum").over(run))
      .groupBy("user_id")
      .agg(max(col("peak") - col("cum")).as("max_drawdown"),
        max("peak").as("max_peak"),
        sum("delta").as("final_sum"),
        count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  /** win_cusum — CUSUM change-point detection over the daily event
    * series: the classic Page (1954) sequential test that flags a
    * sustained LEVEL SHIFT (a traffic drop, an ingestion stall) that
    * per-day z-scores miss because each day alone stays in band.
    *
    * The textbook recursion S_t = max(0, S_{t−1} + (x_t − k)) is not
    * a window function — but it has a closed form: with
    * P_t = Σ_{i≤t}(x_i − k), S_t = P_t − min(0, min_{i≤t} P_i). So
    * the whole detector is TWO window passes (prefix sum + running
    * min) over the bounded per-day aggregate — no UDAF, no recursion,
    * no driver loop. Both sides (surge S⁺ with drift +k, slump S⁻
    * symmetric) ride the same prefix frame. Drift k = the global
    * daily mean (integer div, in-plan); alarm at S > 3k (documented
    * tuning constant). All integer.
    *
    * Scale: events collapse to the ≤|days|-row frame in one map-side
    * combined groupBy; every window runs over that aggregate (the
    * PlanSweep bounded-frame shape).
    *
    * The driver corpus is deliberately FLAT day-to-day (max natural
    * |P_t| ≈ 0.2·k), so a detector over the raw series never fires —
    * and an alarm that cannot fire demonstrates nothing (the
    * profile_dq_rules calibration lesson). The monitored series
    * therefore simulates a 50% INGESTION STALL over the last quarter
    * of the range: events with an even id are dropped past the
    * 3/4-point cutoff (deterministic on both engines, the
    * text_pii_scrub injection pattern), which drives S⁻ through the
    * 3k alarm line in the final days while the early days stay
    * quiet — the detector provably discriminates. */
  def winCusum(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(expr("ts_s div 86400").as("day"),
      col("event_id"))
    val cut = e.agg(min("day").as("lo"), max("day").as("hi"))
      .select(expr("lo + (3 * (hi - lo)) div 4").as("cut_day"))
    val daily = e.crossJoin(broadcast(cut))
      .filter(col("day") < col("cut_day") || col("event_id") % 2 === 0)
      .groupBy("day")
      .agg(count(lit(1)).as("n"))
    val withK = daily.crossJoin(broadcast(
      daily.agg(expr("sum(n) div count(1)").as("k"))))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withK
      .withColumn("p_pos", sum(col("n") - col("k")).over(w))
      .withColumn("p_neg", sum(col("k") - col("n")).over(w))
      .withColumn("s_pos", col("p_pos") - least(lit(0L), min("p_pos").over(w)))
      .withColumn("s_neg", col("p_neg") - least(lit(0L), min("p_neg").over(w)))
      .select(col("day"), col("n"), col("k"), col("s_pos"), col("s_neg"),
        (col("s_pos") > lit(3L) * col("k")).as("surge_alarm"),
        (col("s_neg") > lit(3L) * col("k")).as("slump_alarm"))
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_cusum" -> winCusum,
    "win_drawdown" -> winDrawdown,
    "win_dense_rank" -> winDenseRank,
    "win_cume_dist" -> winCumeDist,
    "win_ewma" -> winEwma,
    "win_rolling_quantile" -> winRollingQuantile,
    "win_streaks" -> winStreaks,
    "win_share" -> winShare,
    "win_concurrency" -> winConcurrency,
    "win_first_last" -> winFirstLast,
    "win_sessionize" -> winSessionize,
    "win_pattern" -> winPattern,
    "win_sessionize_salted" -> winSessionizeSalted,
    "pipeline_scd2" -> pipelineScd2,
    "pipeline_gapfill" -> pipelineGapfill,
    "win_percent" -> winPercent,
    "win_rank" -> winRank,
    "win_running" -> winRunning,
    "win_range" -> winRange,
    "win_lag" -> winLag,
    "win_ntile" -> winNtile)

  val oracleSql: Map[String, String] = Map(
    // same closed form: S_t = P_t − min(0, running-min P)
    "win_cusum" ->
      """WITH e AS (SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT)
        |    // 86400 AS day, event_id FROM events),
        |cutq AS (SELECT min(day) + (3 * (max(day) - min(day))) // 4
        |    AS cut_day FROM e),
        |d AS (SELECT day, count(*) AS n FROM e CROSS JOIN cutq
        |  WHERE day < cut_day OR event_id % 2 = 0 GROUP BY day),
        |kk AS (SELECT CAST(sum(n) AS BIGINT) // count(*) AS k FROM d),
        |p AS (SELECT day, n, k,
        |    CAST(sum(n - k) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS p_pos,
        |    CAST(sum(k - n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS p_neg
        |  FROM d CROSS JOIN kk),
        |sxx AS (SELECT day, n, k,
        |    p_pos - least(CAST(0 AS BIGINT), min(p_pos) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_pos,
        |    p_neg - least(CAST(0 AS BIGINT), min(p_neg) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_neg
        |  FROM p)
        |SELECT day, n, k, s_pos, s_neg,
        |  s_pos > 3 * k AS surge_alarm, s_neg > 3 * k AS slump_alarm
        |FROM sxx ORDER BY day""".stripMargin,
    // same two stacked running windows over the integer walk
    "win_drawdown" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) - 50 AS delta
        |  FROM events),
        |c AS (SELECT user_id, ts_ns, event_id, delta,
        |    CAST(sum(delta) OVER w AS BIGINT) AS cum
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |r AS (SELECT user_id, delta, cum,
        |    CAST(max(cum) OVER w AS BIGINT) AS peak
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, CAST(max(peak - cum) AS BIGINT) AS max_drawdown,
        |  CAST(max(peak) AS BIGINT) AS max_peak,
        |  CAST(sum(delta) AS BIGINT) AS final_sum,
        |  count(*) AS n
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    // ranks are functions of the day-count alone; ties exercised
    "win_dense_rank" ->
      """WITH e AS (SELECT event_type,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 86400 AS day
        |  FROM events),
        |d AS (SELECT event_type, day, count(*) AS n
        |  FROM e GROUP BY 1, 2),
        |r AS (SELECT event_type, day, n,
        |    rank() OVER (PARTITION BY event_type ORDER BY n DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY event_type ORDER BY n DESC)
        |      AS drnk
        |  FROM d)
        |SELECT event_type, day, n,
        |  CAST(rnk AS INTEGER) AS rnk, CAST(drnk AS INTEGER) AS drnk
        |FROM r WHERE drnk <= 5
        |ORDER BY event_type, drnk, day""".stripMargin,
    // cume_dist counts value peers (tie-insensitive); nth_value reads
    // a totally ordered full frame — both replay exactly
    "win_cume_dist" ->
      """SELECT o_custkey, o_orderkey,
        |  floor((cume_dist() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS cd,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS runner_up
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    // same 8-tap fan-out; integer weight×cents sums are exact, the
    // double division happens once per row in the same order
    "win_ewma" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |sq AS (SELECT user_id, event_id, cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_ns, event_id) AS rn FROM e),
        |fan AS (SELECT user_id, rn + o.o AS rn,
        |    cents * (1 << (7 - o.o)) AS wx, (1 << (7 - o.o)) AS wt
        |  FROM sq, range(8) o(o)),
        |g AS (SELECT user_id, rn, sum(wx) AS num, sum(wt) AS den
        |  FROM fan GROUP BY 1, 2)
        |SELECT g.user_id, sq.event_id,
        |  floor((num / den / 100.0) * 10000.0 + 0.5) / 10000.0 AS ewma
        |FROM g JOIN sq ON sq.user_id = g.user_id AND sq.rn = g.rn
        |ORDER BY 1, 2""".stripMargin,
    // same fan-out formulation; quantile_disc picks the same element
    "win_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    (epoch_ns(ts) // 1000000000) // 86400 AS day FROM events),
        |isl AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island
        |  FROM d),
        |runs AS (SELECT user_id, island, count(*) AS len,
        |    min(day) AS streak_start
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, max(len) AS max_streak, count(*) AS n_streaks,
        |  min(streak_start) AS first_day
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "win_rolling_quantile" ->
      """WITH e AS (SELECT event_type,
        |    (epoch_ns(ts) // 1000000000) // 86400 AS day, value
        |  FROM events),
        |fan AS (SELECT event_type, day + o.o AS target_day, value
        |        FROM e, range(7) o(o)),
        |days AS (SELECT DISTINCT event_type, day AS target_day FROM e)
        |SELECT f.event_type, f.target_day AS day,
        |  count(*) AS n_window,
        |  floor((quantile_disc(f.value, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50d,
        |  floor((quantile_disc(f.value, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90d
        |FROM fan f JOIN days USING (event_type, target_day)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // integer-cents sums are exact; share = one double division
    "win_share" ->
      """WITH bn AS (SELECT c_nationkey,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM customer GROUP BY c_nationkey)
        |SELECT n.n_regionkey, n.n_name, cents,
        |  floor((cents / (sum(cents) OVER w)) * 10000.0 + 0.5) / 10000.0
        |    AS share,
        |  CAST((max(cents) OVER w) - cents AS BIGINT) AS gap_cents
        |FROM bn JOIN nation n ON c_nationkey = n_nationkey
        |WINDOW w AS (PARTITION BY n.n_regionkey)
        |ORDER BY n_regionkey, n_name""".stripMargin,
    // adjacency via the same lead() chain; DuckDB shares the window sort
    "win_pattern" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000000000 AS ts_s FROM events),
        |x AS (SELECT user_id, event_id, event_type, ts_s,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(ts_s, 1) OVER w AS ts1
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id))
        |SELECT user_id, count(*) AS n_matches,
        |  min(event_id) AS first_match_event,
        |  min(ts1 - ts_s) AS fastest_gap_s
        |FROM x
        |WHERE event_type = 'view' AND t1 = 'click' AND ts1 - ts_s <= 3600
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // single global window — logically identical to the engine's
    // two-level prefix sum (associative integer sums)
    "win_concurrency" ->
      """WITH e AS (SELECT user_id, event_id,
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
        |  FROM s GROUP BY 1, 2),
        |ep AS (SELECT start_s AS t, 1 AS delta FROM sess
        |       UNION ALL SELECT end_s, -1 FROM sess),
        |c AS (SELECT t, t // 86400 AS day_bin,
        |    sum(delta) OVER (ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        |  FROM ep)
        |SELECT day_bin, CAST(max(conc) AS BIGINT) AS peak
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // deliberately the UNSALTED single-window formulation: the salted
    // two-level decomposition must be invisible in the result
    "win_sessionize_salted" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_ns(ts) // 1000000000 AS ts_s FROM events),
        |b AS (SELECT user_id, event_id, ts_s,
        |    CASE WHEN ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |s AS (SELECT user_id, ts_s,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM b)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_s) AS start_s, max(ts_s) - min(ts_s) AS dur_s
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "win_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_ns(ts) // 1000000000 AS ts_s FROM events),
        |b AS (SELECT user_id, event_id, ts_s,
        |    CASE WHEN ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |s AS (SELECT user_id, ts_s,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM b)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_s) AS start_s, max(ts_s) - min(ts_s) AS dur_s
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "pipeline_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000000000 AS ts_s FROM events),
        |ch AS (SELECT * FROM (
        |    SELECT user_id, event_id, event_type, ts_s,
        |      lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts_s, event_id) AS prev_type
        |    FROM e)
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_id AS first_event_id, event_type,
        |  ts_s AS valid_from,
        |  lead(ts_s) OVER (PARTITION BY user_id
        |    ORDER BY ts_s, event_id) AS valid_to
        |FROM ch ORDER BY user_id, valid_from, first_event_id""".stripMargin,
    // generate_series yields the same per-user calendar; last_value
    // IGNORE NULLS over the same ROWS frame is the forward fill
    "pipeline_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_obs
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        |cal AS (SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span)
        |SELECT cal.user_id, strftime(cal.day, '%Y-%m-%d') AS day,
        |  daily.n_obs AS n_obs,
        |  last_value(daily.n_obs IGNORE NULLS) OVER (
        |    PARTITION BY cal.user_id ORDER BY cal.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_filled
        |FROM cal LEFT JOIN daily
        |  ON daily.user_id = cal.user_id AND daily.day = cal.day
        |ORDER BY cal.user_id, day""".stripMargin,
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
