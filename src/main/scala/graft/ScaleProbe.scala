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

    // Experiment 3: scan-split sizing — maxPartitionBytes controls how
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
