package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Side-by-side A/B probe for candidate operator shapes (r16). For
  * each named variant it reports, over the SAME session and inputs:
  * warm wall seconds (min of 3 after one discarded warm run), total
  * shuffle-write bytes of one warm run, and the warm Spark-job count —
  * the three signals SCALE.md's adopt/reject calls rest on (local wall
  * alone is an overhead floor at sf0.1; shuffle bytes and job count
  * are the signals that transfer to 100 TB — VERDICT r15 scaling
  * finding). Variants live in [[variants]] next to their production
  * twins so an A/B is re-runnable verbatim in any later round.
  *
  *   sbt "runMain graft.AbProbe win_rolling_quantile/grid win_rolling_quantile/fanout"
  */
object AbProbe {
  import graft.operators._

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_rolling_quantile/grid" -> (WindowQueries.winRollingQuantile _),
    "win_rolling_quantile/fanout" -> (WindowQueries.winRollingQuantileFanout _),
    "dedup_components/pinned" -> ((s: SparkSession, d: String) =>
      componentsVariant(s, d, pinEdges = true)),
    "dedup_components/cached" -> ((s: SparkSession, d: String) =>
      componentsVariant(s, d, pinEdges = false)),
    "components_round/pinned" -> ((s: SparkSession, d: String) =>
      componentsRound2Variant(s, d, pinEdges = true)),
    "components_round/cached" -> ((s: SparkSession, d: String) =>
      componentsRound2Variant(s, d, pinEdges = false)),
    "dedup_simhash_pairs/fused_key" -> ((s: SparkSession, d: String) =>
      DedupQueries.simhashPairsFusedKey(
        DedupQueries.simhashSketch(Tables.t(s, d, "documents")))),
    "agg_basket/lazy_ckpt" -> ((s: SparkSession, d: String) =>
      AggQueries.aggBasket(s, d, lazyCheckpoint = true)),
    "agg_basket/eager_ckpt" -> ((s: SparkSession, d: String) =>
      AggQueries.aggBasket(s, d, lazyCheckpoint = false))
  ) ++ SparkEntry.queries.map { case (k, v) => s"declared/$k" -> v }

  private def componentsVariant(s: SparkSession, d: String,
      pinEdges: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.col
    DedupQueries.components(
      Tables.t(s, d, "documents").filter(col("doc_id") < 300).select("doc_id"),
      DedupQueries.dedupNgramJaccard(s, d).select("doc_a", "doc_b"),
      pinEdges)
      .orderBy("doc_id")
  }

  private def componentsRound2Variant(s: SparkSession, d: String,
      pinEdges: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.col
    DedupQueries.componentsRound2(
      Tables.t(s, d, "documents").filter(col("doc_id") < 300).select("doc_id"),
      DedupQueries.dedupNgramJaccard(s, d).select("doc_a", "doc_b"),
      pinEdges)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shufWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
    })
    def run(q: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- args) {
      val q = variants(name)
      run(q) // warm: plans, codegen, page cache
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      jobs.set(0); shufWrite.set(0L)
      val first = run(q)
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      val (nJobs, bytes) = (jobs.get, shufWrite.get)
      val wall = (Seq(first) ++ (1 to 2).map(_ => run(q))).min
      println(f"ABPROBE $name%-42s wall_min3 $wall%7.3f s  shuffle ${bytes / 1e6}%9.2f MB  jobs $nJobs%3d")
    }
    spark.stop()
  }
}
