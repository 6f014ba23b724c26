package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanism demonstrations that the sf-sized oracle queries
  * can't surface: AQE's runtime skew-join split. At 100 TB a single
  * hot key (one user, one document template) turns a sort-merge join
  * partition into a straggler; AQE detects the oversized partition at
  * runtime and splits it across tasks — no manual salting needed when
  * it's enabled. join_salted covers the manual mitigation; this proves
  * the adaptive one fires.
  */
class ScaleSpec extends AnyFunSuite with SparkFixture {

  test("AQE splits a skewed sort-merge join partition (skew=true in final plan)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-sized thresholds: the hot key's partition (~MBs) must
      // qualify as "skewed" without needing the production 256 MB
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 1 hot key with 95% of rows vs 99 uniform keys; the padding
      // column must survive into the aggregate (sum(length(pad))) or
      // Catalyst prunes it and the hot shuffle partition compresses to
      // a handful of identical longs, below any skew threshold
      val left = spark.range(0, 200000)
        .select(when(col("id") % 20 === 0, col("id") % 99 + 1).otherwise(0L).as("k"),
          concat(lit("x"), col("id").cast("string"),
            lit("p" * 64)).as("pad"))
      val right = spark.range(0, 100)
        .select(col("id").as("k"), concat(lit("r"), col("id").cast("string")).as("rpad"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("pad_bytes"))
        .as[(Long, Long)]
      // collect() (NOT head(), which plans a separate limited query)
      // executes THIS dataset's queryExecution, so the adaptive plan
      // below is the final, executed one
      val (n, _) = joined.collect().head
      assert(n == 200000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire; final plan:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  /** Runtime bloom-filter join pruning: when a join's small side
    * carries a selective filter, the optimizer can inject a bloom
    * filter built from that side into the LARGE side's scan, dropping
    * non-matching rows before the shuffle. At 100 TB this is the
    * difference between shuffling the whole fact table and shuffling
    * the ~1% that can actually join. The production thresholds
    * (10 MB creation side / 10 GB application side) are test-sized
    * down; what's asserted is that the mechanism fires on our join
    * shape — config, not code, at scale. */
  /** One synthetic user with 50k events spanning ~70 six-hour chunks:
    * 50 true sessions (a >1800 s gap every 1000 events), each chained
    * across many chunk boundaries — the pathological key that would
    * serialize one task in the unsalted form. The salted two-level
    * sessionize must reproduce the unsalted result bit-for-bit, here
    * and on the real fixture. */
  test("win_sessionize_salted equals unsalted sessionize incl. a hot user") {
    import graft.operators.WindowQueries
    val dir = java.nio.file.Files.createTempDirectory("graft_hotuser").toString
    spark.range(50000).select(
        col("id").as("event_id"), lit(1L).as("user_id"),
        ((lit(1704067200L) + col("id") * 30 +
          expr("id div 1000") * 7200) * lit(1000000000L)).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val salted = WindowQueries.winSessionizeSalted(spark, dir).collect().toSeq
    val plain = WindowQueries.winSessionize(spark, dir).collect().toSeq
    assert(salted == plain)
    assert(salted.length == 50, s"expected 50 sessions, got ${salted.length}")
    val a = WindowQueries.winSessionizeSalted(spark, sf).collect().toSeq
    val b = WindowQueries.winSessionize(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    import graft.operators.JoinQueries
    // the DECLARED query's dataflow under its own conf scope — the
    // plan asserted here is the plan join_bloom_pruned executes
    JoinQueries.withBloomConfs(spark) {
      val q = JoinQueries.bloomJoinShape(spark, "/root/testdata/sf0.01")
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"runtime bloom filter did not inject; final plan:\n$plan")
    }
    // conf scoping restored session state: the flag is back to default
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
  }
}
