package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * At 100 TB, `rand()`-based sampling is the wrong tool: it is not
  * reproducible across retried tasks (a recomputed partition draws new
  * numbers → downstream stages can see different samples of the same
  * data), not auditable, and not oracle-checkable. Production corpus
  * pipelines sample by KEY HASH instead: a pure function of the row key
  * decides membership, so any engine, any retry, any scale produces the
  * same sample. Both queries here are single-pass projections with one
  * final aggregation — no shuffle before the agg, embarrassingly
  * parallel at any scale.
  *
  * The hash is a Knuth-style multiplicative congruence kept small
  * enough that the integer arithmetic can't overflow under ANSI mode
  * and is bit-identical in DuckDB: bucket(k) = ((k·40503 + 17) mod
  * 65521) mod 100 — 65521 is the largest 16-bit prime, 40503 the
  * 16-bit Knuth multiplier (same constant family as
  * SimilarityQueries.planeIntAt).
  */
object SampleQueries {

  /** Percentile bucket 0..99 of a bigint key — identical in DuckDB. */
  def hashBucket(k: Column): Column = ((k * 40503L + 17L) % 65521L) % 100L
  def hashBucketSql(k: String): String = s"((($k) * 40503 + 17) % 65521) % 100"

  /** Per-stratum sampling rates (percent) for sample_stratified:
    * downsample the over-represented language, keep the tails. */
  val strataRates: Seq[(String, Int)] = Seq("en" -> 50, "de" -> 30)
  val defaultRate: Int = 10

  /** Stratified deterministic sample of documents: language decides the
    * rate, the doc_id hash decides membership. Output is per-language
    * totals + an id checksum so the oracle comparison covers exactly
    * WHICH rows were kept, not just how many. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val rate = strataRates.foldRight(lit(defaultRate)) { case ((l, r), acc) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    t(s, dir, "documents")
      .withColumn("keep", hashBucket(col("doc_id")) < rate)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("sampled_id_sum"))
      .orderBy("lang")
  }

  /** Train/validation/test split (80/10/10) by event_id hash — the
    * canonical "same row always lands in the same split" contract a
    * training pipeline needs so that later runs (or other engines)
    * never leak validation rows into training. */
  def sampleSplit(s: SparkSession, dir: String): DataFrame = {
    val b = hashBucket(col("event_id"))
    t(s, dir, "events")
      .withColumn("split",
        when(b < 80, "train").when(b < 90, "val").otherwise("test"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("event_id")).as("id_sum"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("split")
  }

  /** Per-source quota sampling: each source contributes at most
    * [[QuotaPerSource]] documents, chosen by hash priority (not "first
    * N seen", which is partition-order-dependent). This is the corpus
    * mixing primitive — cap dominant sources, keep the long tail.
    * One window shuffle on source; at scale rank ≤ K truncates inside
    * the window stage, so only K rows per source survive it. */
  val QuotaPerSource = 15
  def sampleQuota(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("prio"), col("doc_id"))
    t(s, dir, "documents")
      .withColumn("prio", (col("doc_id") * 40503L + 17L) % 65521L)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= QuotaPerSource)
      .select("source", "rn", "doc_id", "prio")
      .orderBy("source", "rn")
  }

  /** Corpus MIXTURE sampling — the data-mixing op an LLM pipeline runs
    * last: hit a target per-language document count by COMPUTING each
    * language's keep-rate from its observed frequency (downsample the
    * dominant languages toward [[MixTargetPerLang]], keep rare ones
    * whole), then selecting rows by the same deterministic key hash as
    * the other samplers. Differs from sample_stratified (fixed
    * author-chosen rates) in that the rates are DERIVED from corpus
    * statistics — re-mixing after ingest never needs a config change.
    *
    * Two passes over a narrow (lang, doc_id) projection: a per-lang
    * count (n_langs rows, broadcast back) then the filtered scan —
    * the count side is a tiny dim at any corpus size. Integer
    * threshold arithmetic (thr = min(65521, target·65521 div c)) so
    * membership is bit-identical in DuckDB. */
  val MixTargetPerLang = 40L
  def pipelineMixture(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val rates = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .withColumn("thr",
        least(lit(65521L), expr(s"($MixTargetPerLang * 65521) div c")))
    docs.select("lang", "doc_id")
      .join(broadcast(rates), "lang")
      .withColumn("keep",
        ((col("doc_id") * 40503L + 17L) % 65521L) < col("thr"))
      .groupBy("lang")
      .agg(min("c").as("n_docs"), min("thr").as("thr"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("kept_id_sum"))
      .orderBy("lang")
  }

  /** Temperature-based multilingual resampling (the mT5/XLM-R data
    * balancer): sample language l with probability ∝ c_l^α (α = 0.5),
    * which upsamples rare languages relative to their raw frequency and
    * flattens dominant ones — the standard fix for high-resource
    * languages swamping a multilingual mix. Differs from
    * [[pipelineMixture]] (a per-language absolute target) in that the
    * SHAPE of the distribution is retempered, not capped.
    *
    * Exactness: w_l = floor(sqrt(c_l)) — IEEE-754 sqrt is correctly
    * rounded, so floor(sqrt(bigint)) is bit-identical in DuckDB; every
    * other step is integer arithmetic (thr = min(65521,
    * T·w_l·65521 div (W·c_l)), membership by the shared doc_id hash).
    * Scale: two tiny aggregates over (lang) — n_langs rows, broadcast
    * back — then one filtered scan; no data-sized shuffle. */
  val TempTargetTotal = 200L
  def pipelineTemperature(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val stats = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .withColumn("w", floor(sqrt(col("c").cast("double"))).cast("long"))
    val tot = stats.agg(sum("w").as("w_total"))
    val rates = stats.crossJoin(broadcast(tot))
      .withColumn("thr", least(lit(65521L),
        expr(s"($TempTargetTotal * w * 65521) div (w_total * c)")))
    docs.select("lang", "doc_id")
      .join(broadcast(rates), "lang")
      .withColumn("keep",
        ((col("doc_id") * 40503L + 17L) % 65521L) < col("thr"))
      .groupBy("lang")
      .agg(min("c").as("n_docs"), min("w").as("wgt"), min("thr").as("thr"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("kept_id_sum"))
      .orderBy("lang")
  }

  val AnonK = 5

  /** k-ANONYMITY generalization — the privacy pass a training corpus
    * runs before release: rows whose quasi-identifier (lang, source)
    * group is smaller than k=[[AnonK]] get GENERALIZED up the lattice
    * (source → '*'), and rows still identifiable at (lang, '*') are
    * SUPPRESSED — dropped from the release entirely (standard
    * suppression; an emitted ('*','*') bucket with its id_sum would
    * leak the exact doc_id whenever fewer than k rows land in it).
    * Invariant as published: EVERY row of the output belongs to a
    * group of ≥ k rows (asserted in PropertySpec, which also replays
    * the lattice driver-side to check released + suppressed counts
    * conserve the corpus). Two tiny group-size dims (|langs×sources|,
    * |langs| rows) broadcast back onto the scan — the corpus shuffles
    * only into the final bounded (ql, qs) aggregate. All-integer ⇒
    * exact oracle. */
  def pipelineAnonymize(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "lang", "source")
    val g1 = d.groupBy("lang", "source").agg(count(lit(1)).as("n1"))
    val g2sizes = d.join(broadcast(g1), Seq("lang", "source"))
      .filter(col("n1") < AnonK)
      .groupBy("lang").agg(count(lit(1)).as("n2"))
    val tagged = d
      .join(broadcast(g1), Seq("lang", "source"))
      .join(broadcast(g2sizes), Seq("lang"), "left")
      .withColumn("ql",
        when(col("n1") >= AnonK, col("lang"))
          .when(col("n2") >= AnonK, col("lang"))
          .otherwise(lit("*")))
      .withColumn("qs",
        when(col("n1") >= AnonK, col("source")).otherwise(lit("*")))
    tagged
      .filter(!(col("ql") === "*" && col("qs") === "*"))
      .groupBy("ql", "qs")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
      .orderBy("ql", "qs")
  }

  /** Distributed RESERVOIR sample: a uniform-without-replacement
    * K-subset via global hash-priority top-K — the deterministic
    * equivalent of Vitter's reservoir algorithm (each row draws a
    * "random" priority, the K smallest win; here the draw is the key
    * hash, so the sample is reproducible across engines and retries).
    * Mergeable by construction: each partition keeps its local top-K
    * and the driver merges K-sized heaps — exactly what Spark's
    * TakeOrderedAndProject physical operator does, so the plan never
    * sorts or shuffles the full input. The rank window after the limit
    * runs over K=[[ReservoirK]] rows, not input-scale (PlanSweep's
    * bounded-frame shape). Tie-break on event_id makes the order total
    * — 65521 priority buckets collide long before sf0.1. */
  val ReservoirK = 100
  /** Keep the K smallest (prio, event_id) rows of a frame that already
    * carries `prio` — the mergeable-sketch core (min-K of a union =
    * min-K of the two min-Ks), shared with stream_reservoir's state
    * merge so the constants and tie-break cannot drift. */
  private[graft] def reservoirTrim(df: DataFrame): DataFrame =
    df.orderBy(col("prio"), col("event_id")).limit(ReservoirK)
  /** Attach the deterministic draw and take the bottom-K. */
  private[graft] def reservoirBottomK(events: DataFrame): DataFrame =
    reservoirTrim(events
      .withColumn("prio", (col("event_id") * 40503L + 17L) % 65521L)
      .select("event_id", "user_id", "prio"))
  /** Final presentation: rank the ≤K-row sample (plan-bounded — the
    * window sits behind the limit). */
  private[graft] def reservoirPresent(bottom: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("prio"), col("event_id"))
    bottom.withColumn("rn", row_number().over(w))
      .select("rn", "event_id", "user_id", "prio")
      .orderBy("rn")
  }
  def sampleReservoir(s: SparkSession, dir: String): DataFrame =
    reservoirPresent(reservoirBottomK(
      t(s, dir, "events").select(col("event_id"), col("user_id"))))

  /** WEIGHTED priority sampling (Ohlsson/Rosén order sampling, the
    * fixed-point analogue of the exponential-keys A-ES scheme): each
    * document draws priority u/w where u is its key hash and w its
    * weight (n_chars — longer documents carry more training tokens),
    * and the K smallest priorities win. P(selected) increases with w,
    * so the sample is length-biased exactly the way token-budget
    * corpus sampling wants, yet fully deterministic and mergeable
    * (same TakeOrderedAndProject single-pass shape as
    * [[sampleReservoir]]). Integer arithmetic throughout: priority =
    * (u · 10⁶) div w, max 65520·10⁶ ≪ 2⁶³. */
  val WeightedK = 50
  def sampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .withColumn("prio", expr(
        "(((doc_id * 40503 + 17) % 65521) * 1000000) div greatest(n_chars, 1)"))
      .orderBy(col("prio"), col("doc_id")).limit(WeightedK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("prio"), col("doc_id"))
    base.withColumn("rn", row_number().over(w))
      .select("rn", "doc_id", "n_chars", "prio")
      .orderBy("rn")
  }

  /** Differentially-private histogram release — the privacy mechanism
    * a corpus card publishes instead of exact counts: per-language
    * document counts perturbed with DISCRETE two-sided geometric noise
    * (α = 1/2), the integer analogue of the Laplace mechanism, giving
    * ε = ln 2 for the unit-sensitivity count query. The noise draw is
    * deterministic: u = hash(group id-sum) mod 65521 feeds the exact
    * inverse-CDF ladder (P(0) = 1/3, P(±j) = (1/3)·2⁻ʲ, tail clamped
    * at ±5), so both engines replay the identical release. True
    * counts ride along for the oracle comparison; a production
    * release would publish only (lang, noisy_n). One bounded groupBy
    * — no data-sized shuffle beyond the count itself. */
  def pipelineDpHistogram(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
    val u = ((col("id_sum") * 40503L + 17L) % 65521L)
    // inverse CDF of the two-sided geometric on 65521 buckets:
    // cumulative thresholds 21840 |+10920 ±1 |+5460 ±2 |+2730 ±3
    // |+1365 ±4 |+683 +5, remainder -5 (the clamped tail)
    val noise = when(u < 21840L, 0L)
      .when(u < 32760L, 1L).when(u < 43680L, -1L)
      .when(u < 49140L, 2L).when(u < 54600L, -2L)
      .when(u < 57330L, 3L).when(u < 60060L, -3L)
      .when(u < 61425L, 4L).when(u < 62790L, -4L)
      .when(u < 64155L, 5L).otherwise(-5L)
    g.withColumn("noise", noise)
      .withColumn("noisy_n", col("n_docs") + col("noise"))
      .select("lang", "n_docs", "noise", "noisy_n")
      .orderBy("lang")
  }

  /** sample_balance — class-balanced downsampling: every event type is
    * cut to EXACTLY the minority class's count (the classifier-
    * training rebalance), membership decided by the deterministic
    * hash priority so retries/engines agree.
    *
    * Exact per-class bottom-k at scale is the interesting part: the
    * naive rank-within-class window shuffles on event_type — with a
    * handful of classes that funnels the whole corpus through
    * |classes| tasks. Instead, HISTOGRAM-ASSISTED SELECTION:
    *   1. count rows per (class, prio-bucket) — a bounded
    *      |classes|×100 aggregate, map-side combined;
    *   2. from the running bucket totals compute per bucket
    *      take = clamp(n_min − cum_before, 0, cnt): buckets fully
    *      below the cut keep everything (broadcast-joined bucket map,
    *      no sort), buckets past it drop everything;
    *   3. only the ONE boundary bucket per class (~1% of the class)
    *      pays a rank window, partitioned by (class, bucket).
    * Buckets are prio-monotone, so lower-bucket rows all precede
    * boundary rows in (prio, event_id) order — the composition is
    * EXACTLY the naive per-class bottom-n_min, which is what the
    * ORACLE replays (rank ≤ n_min): the hash proves
    * histogram-selection ≡ naive rank. Finer buckets shrink the
    * boundary window further at no extra shuffle. */
  def sampleBalance(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select("event_type", "event_id")
      .withColumn("prio", (col("event_id") * 40503L + 17L) % 65521L)
      .withColumn("bkt", expr("prio div 656"))
    val hist = e.groupBy("event_type", "bkt").agg(count(lit(1)).as("cnt"))
    val totals = hist.groupBy("event_type").agg(sum("cnt").as("n_class"))
    val nMin = totals.agg(min("n_class").as("n_min"))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("bkt")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val plan = hist
      .withColumn("cum_before", coalesce(sum("cnt").over(wcum), lit(0L)))
      .crossJoin(broadcast(nMin))
      .withColumn("take", least(col("cnt"),
        greatest(lit(0L), col("n_min") - col("cum_before"))))
    val keptWhole = e.join(
      broadcast(plan.filter(col("take") === col("cnt"))
        .select("event_type", "bkt")),
      Seq("event_type", "bkt"))
      .select("event_type", "event_id")
    val wsel = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type", "bkt").orderBy("prio", "event_id")
    val keptBoundary = e.join(
      broadcast(plan.filter(col("take") > 0 && col("take") < col("cnt"))
        .select("event_type", "bkt", "take")),
      Seq("event_type", "bkt"))
      .withColumn("rn", row_number().over(wsel))
      .filter(col("rn") <= col("take"))
      .select("event_type", "event_id")
    keptWhole.unionByName(keptBoundary)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"), sum("event_id").as("kept_id_sum"))
      .join(broadcast(totals), "event_type")
      .select(col("event_type"), col("n_class").as("n_orig"),
        col("n_kept"), col("kept_id_sum"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_balance" -> sampleBalance,
    "pipeline_dp_histogram" -> pipelineDpHistogram,
    "sample_reservoir" -> sampleReservoir,
    "sample_weighted" -> sampleWeighted,
    "pipeline_anonymize" -> pipelineAnonymize,
    "pipeline_temperature" -> pipelineTemperature,
    "pipeline_mixture" -> pipelineMixture,
    "sample_quota" -> sampleQuota,
    "sample_stratified" -> sampleStratified,
    "sample_split" -> sampleSplit)

  private val bucketDoc = hashBucketSql("doc_id")
  private val bucketEvt = hashBucketSql("event_id")

  val oracleSql: Map[String, String] = Map(
    // the NAIVE per-class rank replay — the hash proves the
    // histogram-assisted selection equals bottom-n_min per class
    "sample_balance" ->
      """WITH e AS (SELECT event_type, event_id,
        |    (event_id * 40503 + 17) % 65521 AS prio FROM events),
        |tot AS (SELECT event_type, count(*) AS n_class FROM e
        |  GROUP BY event_type),
        |nm AS (SELECT min(n_class) AS n_min FROM tot),
        |r AS (SELECT event_type, event_id, row_number() OVER (
        |    PARTITION BY event_type ORDER BY prio, event_id) AS rn FROM e),
        |k AS (SELECT event_type, count(*) AS n_kept,
        |    CAST(sum(event_id) AS BIGINT) AS kept_id_sum
        |  FROM r CROSS JOIN nm WHERE rn <= n_min GROUP BY event_type)
        |SELECT t.event_type, t.n_class AS n_orig, k.n_kept, k.kept_id_sum
        |FROM tot t JOIN k USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // hash-priority top-K replayed exactly; same total order
    "sample_reservoir" ->
      s"""WITH p AS (SELECT event_id, user_id,
         |    (event_id * 40503 + 17) % 65521 AS prio FROM events),
         |t AS (SELECT * FROM p ORDER BY prio, event_id LIMIT $ReservoirK)
         |SELECT CAST(row_number() OVER (ORDER BY prio, event_id) AS INTEGER)
         |    AS rn,
         |  event_id, user_id, CAST(prio AS BIGINT) AS prio
         |FROM t ORDER BY rn""".stripMargin,
    // u·10⁶ // w priority — all-integer, bit-identical
    "sample_weighted" ->
      s"""WITH p AS (SELECT doc_id, n_chars,
         |    (((doc_id * 40503 + 17) % 65521) * 1000000)
         |      // greatest(n_chars, 1) AS prio
         |  FROM documents),
         |t AS (SELECT * FROM p ORDER BY prio, doc_id LIMIT $WeightedK)
         |SELECT CAST(row_number() OVER (ORDER BY prio, doc_id) AS INTEGER)
         |    AS rn,
         |  doc_id, n_chars, CAST(prio AS BIGINT) AS prio
         |FROM t ORDER BY rn""".stripMargin,
    // the same inverse-CDF ladder over the same deterministic u
    "pipeline_dp_histogram" ->
      """WITH g AS (SELECT lang, count(*) AS n_docs,
        |    CAST(sum(doc_id) AS BIGINT) AS id_sum
        |  FROM documents GROUP BY lang),
        |n AS (SELECT lang, n_docs,
        |    (id_sum * 40503 + 17) % 65521 AS u FROM g),
        |d AS (SELECT lang, n_docs,
        |    CASE WHEN u < 21840 THEN 0
        |         WHEN u < 32760 THEN 1 WHEN u < 43680 THEN -1
        |         WHEN u < 49140 THEN 2 WHEN u < 54600 THEN -2
        |         WHEN u < 57330 THEN 3 WHEN u < 60060 THEN -3
        |         WHEN u < 61425 THEN 4 WHEN u < 62790 THEN -4
        |         WHEN u < 64155 THEN 5 ELSE -5 END AS noise
        |  FROM n)
        |SELECT lang, n_docs, CAST(noise AS BIGINT) AS noise,
        |  CAST(n_docs + noise AS BIGINT) AS noisy_n
        |FROM d ORDER BY lang""".stripMargin,
    // same two-level generalization lattice, all integer counts;
    // suppressed ('*','*') rows are dropped from the release (their
    // id_sum would de-anonymize a <k bucket)
    "pipeline_anonymize" ->
      """WITH d AS (SELECT doc_id, lang, source FROM documents),
        |g1 AS (SELECT lang, source, count(*) AS n1 FROM d GROUP BY 1, 2),
        |g2 AS (SELECT d.lang, count(*) AS n2
        |       FROM d JOIN g1 USING (lang, source)
        |       WHERE g1.n1 < 5 GROUP BY 1),
        |tagged AS (SELECT d.doc_id,
        |    CASE WHEN g1.n1 >= 5 THEN d.lang
        |         WHEN g2.n2 >= 5 THEN d.lang ELSE '*' END AS ql,
        |    CASE WHEN g1.n1 >= 5 THEN d.source ELSE '*' END AS qs
        |  FROM d JOIN g1 USING (lang, source)
        |  LEFT JOIN g2 ON g2.lang = d.lang)
        |SELECT ql, qs, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM tagged WHERE NOT (ql = '*' AND qs = '*')
        |GROUP BY ql, qs ORDER BY ql, qs""".stripMargin,
    // α=0.5 temperature weights replayed exactly: floor(sqrt()) is
    // IEEE-correctly-rounded on both engines, the rest is integer
    "pipeline_temperature" ->
      s"""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
         |s AS (SELECT lang, c, CAST(floor(sqrt(c)) AS BIGINT) AS w FROM c),
         |s2 AS (SELECT *, sum(w) OVER () AS w_total FROM s),
         |r AS (SELECT lang, c, w,
         |    least(CAST(65521 AS BIGINT),
         |      ($TempTargetTotal * w * 65521) // (w_total * c)) AS thr
         |  FROM s2),
         |k AS (SELECT d.lang, r.c, r.w, r.thr, d.doc_id,
         |    ((d.doc_id * 40503 + 17) % 65521) < r.thr AS keep
         |  FROM documents d JOIN r USING (lang))
         |SELECT lang, CAST(min(c) AS BIGINT) AS n_docs,
         |  CAST(min(w) AS BIGINT) AS wgt,
         |  CAST(min(thr) AS BIGINT) AS thr,
         |  CAST(coalesce(sum(CASE WHEN keep THEN 1 END), 0) AS BIGINT)
         |    AS n_kept,
         |  CAST(coalesce(sum(CASE WHEN keep THEN doc_id END), 0) AS BIGINT)
         |    AS kept_id_sum
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "pipeline_mixture" ->
      s"""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
         |r AS (SELECT lang, c,
         |    least(65521, ($MixTargetPerLang * 65521) // c) AS thr FROM c),
         |k AS (SELECT d.lang, r.c, r.thr, d.doc_id,
         |    ((d.doc_id * 40503 + 17) % 65521) < r.thr AS keep
         |  FROM documents d JOIN r USING (lang))
         |SELECT lang, CAST(min(c) AS BIGINT) AS n_docs,
         |  CAST(min(thr) AS BIGINT) AS thr,
         |  CAST(coalesce(sum(CASE WHEN keep THEN 1 END), 0) AS BIGINT)
         |    AS n_kept,
         |  CAST(coalesce(sum(CASE WHEN keep THEN doc_id END), 0) AS BIGINT)
         |    AS kept_id_sum
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "sample_quota" ->
      """WITH p AS (SELECT source, doc_id,
        |    (doc_id * 40503 + 17) % 65521 AS prio FROM documents),
        |r AS (SELECT source, doc_id, prio,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY prio, doc_id) AS INTEGER) AS rn
        |  FROM p)
        |SELECT source, rn, doc_id, CAST(prio AS BIGINT) AS prio
        |FROM r WHERE rn <= 15 ORDER BY source, rn""".stripMargin,
    // integer-only hash arithmetic — bit-identical across engines
    "sample_stratified" ->
      s"""WITH d AS (SELECT lang, doc_id,
         |    CASE WHEN lang = 'en' THEN 50
         |         WHEN lang = 'de' THEN 30 ELSE 10 END AS rate,
         |    $bucketDoc AS bkt
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN bkt < rate THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sampled,
         |  CAST(sum(CASE WHEN bkt < rate THEN doc_id ELSE 0 END) AS BIGINT)
         |    AS sampled_id_sum
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "sample_split" ->
      s"""WITH e AS (SELECT event_id, user_id,
         |    CASE WHEN $bucketEvt < 80 THEN 'train'
         |         WHEN $bucketEvt < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM events)
         |SELECT split, count(*) AS n_rows,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM e GROUP BY split ORDER BY split""".stripMargin)
}
