package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured backing for SCALE.md §"Config at 100 TB": sweeps
  * `spark.sql.shuffle.partitions` and AQE over three shuffle-heavy
  * plan shapes from the suite (fact⋈fact shuffle join, high-
  * cardinality aggregate, window sort) at sf0.1 and prints one JSON
  * line per cell. Not part of the driver contract — a local
  * experiment tool:
  *
  *   sbt "runMain graft.ScaleProbe [sfDir]"
  *
  * The question each sweep answers, at 100 TB scale-down: how wrong
  * can the partition count be before wall-clock notices, and does AQE
  * coalesce absorb the over-partitioned end (the regime a fixed
  * cluster-wide default puts most queries in)?
  */
object ScaleProbe {
  private def run(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // broadcast off so the join under test really shuffles both sides
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect() // warmup

    def shuffleJoin: DataFrame =
      Tables.t(spark, sfDir, "orders")
        .join(Tables.t(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_extendedprice").as("rev"))
    def highcardAgg: DataFrame =
      Tables.t(spark, sfDir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
    def windowSort: DataFrame =
      operators.WindowQueries.winRunning(spark, sfDir)

    val shapes = Seq(
      "shuffle_join" -> (() => shuffleJoin),
      "highcard_agg" -> (() => highcardAgg),
      "window_sort" -> (() => windowSort))

    for {
      parts <- Seq(8, 32, 128, 512)
      aqe <- Seq(true, false)
    } {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val cells = shapes.map { case (name, mk) =>
        val secs = (1 to 2).map(_ => run(mk())).min // min-of-2: drop JIT/GC noise
        f""""$name":$secs%.3f"""
      }
      println(s"""{"partitions":$parts,"aqe":$aqe,${cells.mkString(",")}}""")
    }
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    spark.conf.set("spark.sql.adaptive.enabled", true)

    // Experiment 2: bucketed-table amortization — write orders+lineitem
    // bucketed by the join key ONCE (the expensive step), then join N
    // times with zero exchanges vs the plain shuffle join each time.
    val bdir = s"/tmp/graft_probe_bucketed_${sfDir.replaceAll("[^0-9.]", "")}"
    val t0b = System.nanoTime()
    Tables.t(spark, sfDir, "orders").write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$bdir/orders").saveAsTable("probe_orders")
    Tables.t(spark, sfDir, "lineitem").write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$bdir/lineitem").saveAsTable("probe_lineitem")
    val writeSec = (System.nanoTime() - t0b) / 1e9
    def bucketedJoin: DataFrame =
      spark.table("probe_orders")
        .join(spark.table("probe_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_extendedprice").as("rev"))
    val plainSec = (1 to 3).map(_ => run(shuffleJoin)).min
    val bucketedSec = (1 to 3).map(_ => run(bucketedJoin)).min
    println(f"""{"experiment":"bucketed_reuse","bucket_write_once":$writeSec%.3f,"plain_join":$plainSec%.3f,"bucketed_join":$bucketedSec%.3f}""")
    spark.sql("DROP TABLE IF EXISTS probe_orders")
    spark.sql("DROP TABLE IF EXISTS probe_lineitem")
    // external tables: DROP removes only metadata — delete the data
    // dir too so repeated probe runs don't accumulate in /tmp
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(bdir))

    // Experiment 3: skew head-to-head — the same skewed sort-merge
    // join (95% of fact rows on ONE key, dim too small to matter but
    // broadcast disabled) run three ways: unmitigated (the straggler
    // baseline), AQE skew-split (runtime partition split, zero code
    // change), and manual 16-way salting (dim exploded ×16, fact
    // salted by a data-dependent hash). At 100 TB the hot key is the
    // difference between a task that finishes and one that runs for
    // hours; this measures how much AQE recovers for free and what
    // salting still buys. Thresholds are test-sized (as in ScaleSpec)
    // so the ~MB hot partition qualifies as "skewed" at sf0.1.
    // ×8 amplification so the hot partition is big enough that one
    // straggler task dominates 8 cores at sf0.1 (the shape a 100 TB
    // hot key produces on a 1000-executor cluster). Materialized ONCE
    // to parquet so every cell pays the same cheap parallel scan and
    // the cells measure the JOIN (shuffle + reduce-side sort), not the
    // shared explode. Written as 64 files deliberately: AQE's skew
    // split can only cut a reduce partition at MAP-TASK boundaries,
    // so a hot key fed by 3 mappers is unsplittable no matter the
    // thresholds (measured here — the split silently declined until
    // the map side had enough tasks). At 100 TB map counts are large
    // so this is free; in a funnel whose upstream stage coalesced to
    // few tasks, AQE cannot rescue the next join's hot key.
    val skdir = s"/tmp/graft_probe_skew_${sfDir.replaceAll("[^0-9.]", "")}"
    Tables.t(spark, sfDir, "lineitem")
      .withColumn("rep", explode(array((0 until 8).map(i => lit(i)): _*)))
      .select(when(col("l_orderkey") % 20 === 0, col("l_orderkey") % 99 + 1)
          .otherwise(0L).as("k"),
        concat(col("l_partkey").cast("string"), lit("p" * 64),
          col("rep").cast("string"), col("l_suppkey").cast("string")).as("pad"))
      .repartition(64)
      .write.mode("overwrite").parquet(skdir)
    val skewFact = spark.read.parquet(skdir)
    val skewDim = spark.range(0, 100)
      .select(col("id").as("k"),
        concat(lit("r"), col("id").cast("string")).as("rpad"))
    // the pad must survive into the aggregate or the hot partition
    // compresses to identical longs below any skew threshold
    def skewAgg(j: DataFrame): DataFrame =
      j.agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("pad_bytes"))
    def skewPlain: DataFrame = skewAgg(skewFact.join(skewDim, "k"))
    def skewSalted: DataFrame = {
      val nSalt = 16
      val f = skewFact.withColumn("salt",
        pmod(xxhash64(col("pad")), lit(nSalt.toLong)))
      val d = skewDim.withColumn("salt",
        explode(array((0 until nSalt).map(i => lit(i.toLong)): _*)))
      skewAgg(f.join(d, Seq("k", "salt")))
    }
    val skewConfs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4MB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    // small scan splits so the shared map side parallelizes and the
    // REDUCE-side straggler is what the cells measure
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4MB")
    var skewFired = false
    val skewCells = Seq(
      ("straggler", false, () => skewPlain),
      ("aqe_skew_split", true, () => skewPlain),
      ("manual_salt16", false, () => skewSalted)).map {
      case (mode, aqe, mk) =>
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        if (aqe) skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
        val secs = (1 to 3).map { _ =>
          val df = mk()
          val t0 = System.nanoTime()
          df.collect() // 1-row aggregate; executes THIS df's plan
          val s = (System.nanoTime() - t0) / 1e9
          if (aqe) skewFired |=
            df.queryExecution.executedPlan.toString.contains("skew=true")
          s
        }.min
        if (aqe) skewConfs.foreach { case (k, _) => spark.conf.unset(k) }
        f""""$mode":$secs%.3f"""
    }
    spark.conf.set("spark.sql.adaptive.enabled", true)
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128MB")
    println(s"""{"experiment":"skew_join","hot_key_share":0.95,"aqe_split_fired":$skewFired,${skewCells.mkString(",")}}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(skdir))

    // Experiment 5: winnow formulation A/B — wall time AND actual
    // shuffled bytes, because the scale argument for the per-row
    // WinnowStats kernel is byte amplification, not CPU: the exploded
    // formulation pushes one (doc_id, pos, 8-byte hash) row per corpus
    // CHARACTER through the window exchange. Counted with a task-end
    // listener (drained via GraftListenerBridge before readout) and
    // normalized by the corpus text bytes.
    {
      val shufWrite = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            shufWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      val k = operators.TextQueries.WinnowK
      val w = operators.TextQueries.WinnowW
      def winnowExploded: DataFrame = {
        val W = org.apache.spark.sql.expressions.Window
        Tables.t(spark, sfDir, "documents")
          .filter(length(col("text")) >= k)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), length(col("text")) - (k - 1))).as("pos"))
          .select(col("doc_id"), col("pos"),
            conv(substring(md5(expr(s"substring(text, pos, $k)")), 1, 12),
              16, 10).cast("long").as("h"))
          .withColumn("fp", min("h").over(
            W.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)))
          .filter(col("pos") >= w)
          .select("doc_id", "fp").distinct()
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_fp"), min("fp").as("min_fp"),
            max("fp").as("max_fp"), sum("fp").as("fp_sum"))
      }
      def winnowKernel: DataFrame =
        operators.TextQueries.textWinnow(spark, sfDir)
      def cell(name: String, mk: () => DataFrame): String = {
        run(mk()) // warm
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        shufWrite.set(0L)
        val secs = run(mk())
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        f""""${name}_sec":$secs%.3f,"${name}_shuffle_mb":${shufWrite.get / 1e6}%.2f"""
      }
      val corpusMb = Tables.t(spark, sfDir, "documents")
        .agg(sum(length(col("text")))).head().getLong(0) / 1e6
      val cells = Seq(
        cell("exploded", () => winnowExploded),
        cell("kernel", () => winnowKernel))
      spark.sparkContext.removeSparkListener(listener)
      println(f"""{"experiment":"winnow_shuffle","corpus_text_mb":$corpusMb%.2f,${cells.mkString(",")}}""")
    }

    // Experiment 6: image near-dedup A/B — the banded-LSH dedup_image
    // vs the O(n²) brute-force pair join on the same Hamming spec.
    // The scale argument: the banded plan's shuffle is O(n) band rows
    // and each bucket's work is O(cap²), while brute force materializes
    // n²/2 candidate pairs regardless of how few survive the verify.
    {
      val shufWrite = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            shufWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      def bruteForce: DataFrame = {
        val ph = operators.MultimodalQueries.multimodalPhash(spark, sfDir)
        val a = ph.select(col("doc_id").as("doc_a"),
          col("phash_hi").as("hi_a"), col("phash_lo").as("lo_a"))
        val b = ph.select(col("doc_id").as("doc_b"),
          col("phash_hi").as("hi_b"), col("phash_lo").as("lo_b"))
        a.join(b, col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            (expr("bit_count(lo_a ^ lo_b)") + expr("bit_count(hi_a ^ hi_b)"))
              .cast("long").as("hamming"))
          .filter(col("hamming") <= 8)
      }
      def banded: DataFrame =
        operators.MultimodalQueries.dedupImage(spark, sfDir)
      def cell6(name: String, mk: () => DataFrame): String = {
        run(mk()) // warm
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        shufWrite.set(0L)
        val secs = run(mk())
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        f""""${name}_sec":$secs%.3f,"${name}_shuffle_mb":${shufWrite.get / 1e6}%.2f"""
      }
      val nImages = operators.MultimodalQueries.multimodalPhash(spark, sfDir).count()
      val cells = Seq(
        cell6("banded_lsh", () => banded),
        cell6("brute_force", () => bruteForce))
      spark.sparkContext.removeSparkListener(listener)
      println(s"""{"experiment":"image_dedup","n_images":$nImages,${cells.mkString(",")}}""")
    }

    // Experiment 7: EWMA formulation A/B — eight window lags vs the
    // fan-out-×8 groupBy + position join. Both compute the identical
    // 8-tap weighted mean; the lag form moves each event through ONE
    // user_id exchange, the fan-out form shuffles 8× the rows into a
    // (user, position) aggregate and then joins back to an
    // event-count-sized anchor side. Shuffle bytes are the scale
    // story; wall time is the local sanity check.
    {
      val shufWrite = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            shufWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      def ewmaFanout: DataFrame = {
        val W = org.apache.spark.sql.expressions.Window
        val e = Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("ts_ns"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
        val w0 = W.partitionBy("user_id").orderBy(asc("ts_ns"), asc("event_id"))
        val seq0 = e.withColumn("rn", row_number().over(w0))
        val anchors = seq0.select(col("user_id"), col("rn"), col("event_id"))
        seq0.withColumn("k", explode(sequence(lit(0), lit(7))))
          .select(col("user_id"), (col("rn") + col("k")).as("rn"),
            (col("cents") * expr("shiftleft(1L, 7 - k)")).as("wx"),
            expr("shiftleft(1L, 7 - k)").as("wt"))
          .groupBy("user_id", "rn")
          .agg(sum("wx").as("num"), sum("wt").as("den"))
          .join(anchors, Seq("user_id", "rn"))
          .select(col("user_id"), col("event_id"),
            Fp.r4(col("num") / col("den") / lit(100.0)).as("ewma"))
      }
      def ewmaLags: DataFrame = operators.WindowQueries.winEwma(spark, sfDir)
      def cell7(name: String, mk: () => DataFrame): String = {
        run(mk()) // warm
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        shufWrite.set(0L)
        val secs = run(mk())
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        f""""${name}_sec":$secs%.3f,"${name}_shuffle_mb":${shufWrite.get / 1e6}%.2f"""
      }
      val cells = Seq(
        cell7("fanout_join", () => ewmaFanout),
        cell7("window_lags", () => ewmaLags))
      spark.sparkContext.removeSparkListener(listener)
      println(s"""{"experiment":"ewma_formulation",${cells.mkString(",")}}""")
    }

    // Experiment 8: broadcast-moments spine A/B — the robust-stats
    // family (agg_zscore / agg_mad / agg_winsorized) joins a ≤5-row
    // per-type moment table back onto the full event scan. With the
    // broadcast hint the scan never shuffles; without it (threshold is
    // -1 in this session) BOTH sides hash-partition on event_type —
    // 5 keys, so the entire corpus funnels through 5 reducers, the
    // worst possible skew. Shuffle bytes are the scale story.
    {
      val shufWrite = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            shufWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      def zSpine(hint: Boolean): DataFrame = {
        val c = Tables.events(spark, sfDir)
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
        val m = c.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("cents").as("s"),
            sum(col("cents") * col("cents")).as("q"))
        val j = if (hint) c.join(broadcast(m), "event_type")
                else c.join(m, "event_type")
        j.withColumn("z", Fp.r4(expr(
            "(cast(cents as double) - cast(s as double) / n)" +
            " / sqrt((cast(q as double) - cast(s as double) * s / n) / (n - 1))")))
          .filter(abs(col("z")) >= 3.0)
          .select("event_id", "z")
      }
      def cell8(name: String, mk: () => DataFrame): String = {
        run(mk()) // warm
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        shufWrite.set(0L)
        val secs = run(mk())
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        f""""${name}_sec":$secs%.3f,"${name}_shuffle_mb":${shufWrite.get / 1e6}%.2f"""
      }
      val cells = Seq(
        cell8("broadcast_moments", () => zSpine(true)),
        cell8("shuffle_moments", () => zSpine(false)))
      spark.sparkContext.removeSparkListener(listener)
      println(s"""{"experiment":"moments_join",${cells.mkString(",")}}""")
    }

    // Experiment 4: scan-split sizing — maxPartitionBytes controls how
    // many tasks read a file (row-group granularity). Too-large splits
    // serialize the scan on a few cores; the aggregate is scan-bound.
    for (mb <- Seq(1, 8, 128)) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", s"${mb}MB")
      val scanAgg = Tables.t(spark, sfDir, "lineitem")
        .agg(sum("l_extendedprice"), avg("l_quantity"))
      val secs = (1 to 3).map(_ => run(scanAgg)).min
      val tasks = Tables.t(spark, sfDir, "lineitem").rdd.getNumPartitions
      println(f"""{"experiment":"scan_split","maxPartitionBytes_mb":$mb,"scan_tasks":$tasks,"agg_sec":$secs%.3f}""")
    }
    spark.stop()
  }
}
