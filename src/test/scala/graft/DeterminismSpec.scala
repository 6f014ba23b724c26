package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-independence sweep: a representative sample of the
  * registry (one per family, biased toward queries whose scaladocs
  * CLAIM partition-order independence — integer sums, rounded
  * doubles, total orderings) is executed under two different
  * `spark.sql.shuffle.partitions` settings and must return
  * bit-identical rows. This is the cluster-resize guarantee: at
  * 100 TB the partition count is set by AQE/cluster width, not the
  * query author, so any result that depends on it is a latent
  * wrong-answer bug. (The training loops have their own sequential-
  * replay proofs; this sweep covers the declarative surface.)
  */
class DeterminismSpec extends AnyFunSuite with SparkFixture {

  private val sample = Seq(
    "agg_hash",          // TPC-H Q1 rounded doubles
    "agg_gini",          // rank formula over exact integers
    "agg_autocorr",      // self-joined daily series
    "agg_heatmap",       // integer epoch grid
    "agg_winsorized",    // percentile_disc clamp
    "agg_mad",           // two-pass discrete medians
    "agg_benford",       // generated CASE-chain digits
    "analytics_end_to_end", // four-branch union over one checkpoint
    "join_multi",        // chained joins + top-k
    "win_rank",          // per-key window
    "win_pct_change",    // global window on bounded frame
    "sort_multi",        // TakeOrdered
    "dedup_exact",       // sha2 groupBy
    "pipeline_semdedup", // integer centroids + argmin
    "infer_knn",         // rounded-cosine vote
    "graph_degrees",     // two-level degree census
    "text_stats",        // per-doc scalar stats
    "scalar_format",     // pure projection
    // r7 additions — the FP-bearing and argmax-bearing newcomers
    "agg_moments",       // shared-formula doubles over exact power sums
    "profile_corr_matrix", // corr closed form over exact decimal moments
    "infer_naive_bayes", // integer weights + (score desc, lang) argmax
    "graph_label_prop",  // max_by struct argmax per vote round
    "sim_rank_fusion",   // integer RRF over two index rankings
    "sample_weighted",   // integer priority order sampling
    // late-r7 additions — sketch ranks and global argmaxes
    "agg_kmv_distinct",  // bottom-k rank window + kth-hash estimator
    "agg_kmv_jaccard",   // merged-sketch rank + membership flags
    "pipeline_bpe_train", // per-round global argmax with tie-break
    "graph_core",        // median threshold + nested peel rounds
    "profile_dq_rules",  // basis-point counters + pass flags
    "join_temporal",     // merge-window PIT resolution with tie ordering
    // end-of-r7 additions — order-sensitive aggregation newcomers
    "agg_paths",         // array_sort'd collect_list path strings
    "profile_drift",     // single-ln PSI over integer basis points
    "sample_balance",    // histogram-assisted boundary-bucket rank
    "sort_skyline",      // prefix-min over per-price minima
    "pipeline_entity_resolution", // min-label loop + sorted member list
    "win_cusum",         // prefix-sum/running-min closed form
    "agg_rfm",           // discrete-percentile thresholds + integer bands
    "sim_mmr")           // greedy argmax rounds over the r4-rounded pool

  test("sampled queries are bit-identical under different shuffle partitioning") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    def runAll(parts: String): Map[String, Seq[String]] = {
      conf.set("spark.sql.shuffle.partitions", parts)
      try sample.map { name =>
        name -> SparkEntry.queries(name)(spark, sf)
          .collect().toSeq.map(_.toString)
      }.toMap
      finally conf.set("spark.sql.shuffle.partitions", orig)
    }
    val a = runAll("3")
    val b = runAll("11")
    sample.foreach { name =>
      assert(a(name) == b(name), s"$name diverged under repartitioning")
    }
  }
}
