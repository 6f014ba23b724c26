package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-equivalent linear-scaling probe (r6 verdict item 7). The driver
  * ships testdata only up to sf0.1, so the probe SYNTHESIZES a 10×
  * corpus in /tmp from sf0.1 — ten disjoint replicas with shifted
  * keys — and measures the five shuffle-heaviest families at both
  * scales: wall seconds and actual shuffle-write bytes from task
  * metrics. The claim under test is the scaladocs' linearity story:
  * shuffle bytes should grow ~10× (shuffle ∝ rows, never rows²) and
  * wall should grow sublinearly-to-linearly on fixed cores.
  *
  * Replica construction keeps per-replica structure and breaks
  * cross-replica similarity: document text is Caesar-rotated per
  * replica (length/word structure preserved, token identity not — so
  * minhash/LSH load scales by corpus, not by planted clone cliques;
  * replica 0 is the original), and every key family (doc, event,
  * user, customer, supplier, order) is shifted by
  * replica × (max+1) so the ten subgraphs stay disjoint. Probe-only
  * data under /tmp — oracle queries never read it.
  *
  *   sbt "runMain graft.Sf1Probe"
  */
object Sf1Probe {
  private def run(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  val Replicas = 10

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bigDir = s"${System.getProperty("java.io.tmpdir")}/graft_sf1_probe"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$bigDir/_SUCCESS_ALL").exists()) {
      val abc = "abcdefghijklmnopqrstuvwxyz"
      def rot(i: Int): String = abc.drop(i) + abc.take(i)

      def inflate(name: String, shift: DataFrame => Int => DataFrame): Unit = {
        val base = spark.read.parquet(s"$sfDir/$name.parquet")
        val out = (0 until Replicas).map(shift(base)).reduce(_.unionByName(_))
        out.write.mode("overwrite").parquet(s"$bigDir/$name.parquet")
      }
      def span(df: DataFrame, c: String): Long =
        df.agg(max(col(c))).head().getLong(0) + 1

      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val dSpan = span(docs, "doc_id")
      inflate("documents", base => i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * dSpan))
          .withColumn("text",
            if (i == 0) col("text") else translate(col("text"), abc, rot(i % 25 + 1))))

      val events = spark.read.parquet(s"$sfDir/events.parquet")
      val eSpan = span(events, "event_id")
      val uSpan = span(events, "user_id")
      inflate("events", base => i =>
        base.withColumn("event_id", col("event_id") + lit(i * eSpan))
          .withColumn("user_id", col("user_id") + lit(i * uSpan)))

      val cSpan = span(spark.read.parquet(s"$sfDir/customer.parquet"), "c_custkey")
      val sSpan = span(spark.read.parquet(s"$sfDir/supplier.parquet"), "s_suppkey")
      val oSpan = span(spark.read.parquet(s"$sfDir/orders.parquet"), "o_orderkey")
      inflate("customer", base => i =>
        base.withColumn("c_custkey", col("c_custkey") + lit(i * cSpan)))
      inflate("supplier", base => i =>
        base.withColumn("s_suppkey", col("s_suppkey") + lit(i * sSpan)))
      inflate("orders", base => i =>
        base.withColumn("o_orderkey", col("o_orderkey") + lit(i * oSpan))
          .withColumn("o_custkey", col("o_custkey") + lit(i * cSpan)))
      inflate("lineitem", base => i =>
        base.withColumn("l_orderkey", col("l_orderkey") + lit(i * oSpan))
          .withColumn("l_suppkey", col("l_suppkey") + lit(i * sSpan)))
      // dimension tables that stay fixed at 10× fact scale (a real
      // cluster's dims grow sublinearly) — copied through so
      // dim-joining queries (basket, fuzzy/ER vocab, skyline) run
      Seq("part", "region", "nation", "embeddings").foreach { name =>
        spark.read.parquet(s"$sfDir/$name.parquet")
          .write.mode("overwrite").parquet(s"$bigDir/$name.parquet")
      }
      new java.io.File(s"$bigDir/_SUCCESS_ALL").createNewFile()
    }

    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shufWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)

    // default: the five shuffle-heaviest r6 families; extra args
    // select other registry queries (r7: the new iterative-graph and
    // distributed-training additions)
    val families =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("graph_pagerank", "dedup_minhash",
        "win_rolling_quantile", "pipeline_pack_sequences", "pipeline_end_to_end")
    families.foreach { name =>
      val q = SparkEntry.queries(name)
      def cell(dir: String): (Double, Double) = {
        run(q(spark, dir)) // warm (plans, code gen, page cache)
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        shufWrite.set(0L)
        // time CONSTRUCTION + execution: the iterative queries do their
        // work in eager localCheckpoints during construction, so timing
        // only the final write would miss every iteration
        val t0 = System.nanoTime()
        val secs = { run(q(spark, dir)); (System.nanoTime() - t0) / 1e9 }
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        (secs, shufWrite.get / 1e6)
      }
      val (s01, m01) = cell(sfDir)
      val (s1, m1) = cell(bigDir)
      println(f"""{"experiment":"sf1_linear","query":"$name","sf01_sec":$s01%.3f,"sf1_sec":$s1%.3f,"sf01_shuffle_mb":$m01%.2f,"sf1_shuffle_mb":$m1%.2f,"wall_ratio":${s1 / s01}%.2f,"shuffle_ratio":${if (m01 > 0) m1 / m01 else -1}%.2f}""")
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
