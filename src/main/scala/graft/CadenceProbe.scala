package graft

import org.apache.spark.sql.DataFrame

/** r14 checkpoint-cadence experiment over the five iterative graph
  * loops (VERDICT r13 item 1) — job counts, warm wall (min-of-3) and
  * shuffled bytes per formulation, plus a driver-side row-equality
  * assert so a variant that drifts a value can never record a number.
  *
  * MEASURED (sf0.1, local[32]; full rows in SCALE.md) and ADOPTED into
  * the production queries, whose shapes now ARE the winners:
  *
  *   - graph_pagerank: per-iter ckpt 32 jobs/4.154 s → cadence-2 on
  *     the same shape 29/3.665 (the verdict's literal ask — wins, but
  *     one full round recomputes per gap because the old step read
  *     ranks twice) → static-spine single-consumer CHAIN 21/3.302,
  *     shuffle 35.99 → 34.86 MB. Chain adopted (GraphQueries
  *     .pagerankSpine).
  *   - graph_label_prop: per-round ckpt 15 jobs/2.787 s → fully-fused
  *     chain 10/2.518 (labelPropStep is single-consumer — the
  *     checkpoints guarded nothing). Chain adopted.
  *   - graph_core: per-round deg ckpt 17 jobs/1.908 s → tail-trim
  *     16/1.723 (the last peel's deg has one consumer). Adopted.
  *   - graph_bfs(_multi): per-hop ckpt 23/1.645 & 24/1.589 →
  *     cadence-2 23/1.567 (noise; shuffle UP) & 25/2.188 (+38% — the
  *     skipped level recomputes at every visited/frontier consumer).
  *     NEGATIVE: per-hop checkpoints stay; the knob variants below
  *     keep the negative reproducible.
  *
  * Not part of the driver contract — a local experiment tool:
  *   sbt "runMain graft.CadenceProbe"
  */
object CadenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val shuf = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuf.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
    })

    def measure(mk: () => DataFrame): (Int, Double, Double) = {
      mk().write.mode("overwrite").format("noop").save() // warm
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      var (j, mb) = (0, 0.0)
      val wall = (1 to 3).map { i =>
        jobs.set(0); shuf.set(0L)
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        if (i == 1) { j = jobs.get; mb = shuf.get / 1e6 }
        dt
      }.min
      (j, wall, mb)
    }

    val G = operators.GraphQueries
    // the three adopted winners are now the production shapes; only
    // the BFS cadence knob remains a live A/B (the measured negative)
    val cases: Seq[(String, Seq[(String, () => DataFrame)])] = Seq(
      "graph_pagerank" -> Seq(
        "chain" -> (() => G.graphPagerank(spark, sfDir))),
      "graph_label_prop" -> Seq(
        "chain" -> (() => G.graphLabelProp(spark, sfDir))),
      "graph_core" -> Seq(
        "tail_trim" -> (() => G.graphCore(spark, sfDir))),
      "graph_bfs" -> Seq(
        "per_hop" -> (() => G.graphBfs(spark, sfDir)),
        "cadence2" -> (() => G.graphBfsAt(spark, sfDir, 2))),
      "graph_bfs_multi" -> Seq(
        "per_hop" -> (() => G.graphBfsMulti(spark, sfDir)),
        "cadence2" -> (() => G.graphBfsMultiAt(spark, sfDir, 2))))

    val only = args.toSet
    for ((q, variants) <- cases if only.isEmpty || only(q)) {
      // the equality gate only means something with ≥2 formulations —
      // a single-variant case would compare a collect against its own
      // re-collect (r14 review: vacuous, and a wasted pass)
      val base = if (variants.size < 2) Nil
        else variants.head._2().collect().map(_.toString).toSeq
      val cells = variants.map { case (vn, mk) =>
        if (variants.size >= 2) {
          val got = mk().collect().map(_.toString).toSeq
          require(got == base,
            s"$q/$vn drifted from ${variants.head._1}: " +
              s"${got.size} vs ${base.size} rows")
        }
        val (j, wall, mb) = measure(mk)
        f""""$vn":{"jobs":$j,"wall_sec":$wall%.3f,"shuffle_mb":$mb%.2f}"""
      }
      println(s"""{"experiment":"ckpt_cadence","query":"$q",${cells.mkString(",")}}""")
    }
    spark.stop()
  }
}
