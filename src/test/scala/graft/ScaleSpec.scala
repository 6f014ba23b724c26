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
}
