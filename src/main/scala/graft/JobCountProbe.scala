package graft

import org.apache.spark.sql.SparkSession

/** Spark-job-count probe backing SCALE.md's fixed-cost claims for the
  * iterative queries: every localCheckpoint / broadcast / collect is
  * one scheduled job, and at 100 TB each job is a full scheduling +
  * (often) materialization round-trip — so "fewer materialization
  * jobs per round" (the r9 graph_bfs 8→4 reshape, the r10 label_prop
  * round-1 specialization) is verified here, not eyeballed. Counts
  * onJobStart events for the SECOND (warm) execution of each named
  * query so one-time builds don't blur the steady-state count.
  *
  *   sbt "runMain graft.JobCountProbe graph_label_prop graph_core"
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    })
    // SPARK_GRAFT_COLD=1 counts the FIRST execution instead of the
    // warm second — the cold path is the one the incremental streaming
    // sinks pay per micro-batch (their warm run replays zero batches,
    // so batch-path changes are invisible to the warm count). Point
    // SPARK_GRAFT_SF_DIR at a FRESH COPY of a testdata dir so the
    // content-keyed staging/checkpoint trees start cold.
    val cold = sys.env.get("SPARK_GRAFT_COLD").contains("1")
    for (name <- args) {
      val q = SparkEntry.queries(name)
      if (!cold) {
        q(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
      }
      // drain in BOTH modes (r12, ADVICE low): in cold mode the warm
      // run is skipped, but session/table-setup jobs' async onJobStart
      // events can still be in flight — without the drain they race
      // jobs.set(0) and inflate the first query's cold count
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      jobs.set(0)
      // wall time of the SAME warm execution the count describes — a
      // job trim that merely shifts work into fewer, fatter jobs
      // (e.g. dropping a checkpoint so two consumers recompute the
      // subtree) shows up here even when the count "improves"
      val t0 = System.nanoTime()
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      println(f"JOBCOUNT $name ${jobs.get} wall ${dt}%.3f s")
    }
    spark.stop()
  }
}
