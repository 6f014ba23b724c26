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

  test("pagerank iterations never re-exchange the edges side") {
    import graft.operators.GraphQueries
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // edgesDeg is repartitioned on src once before its checkpoint; the
    // LogicalRDD keeps that partitioning, so a per-iteration plan must
    // shuffle only rank-vector-sized frames — an exchange ABOVE the
    // (src, dst, deg) scan would mean the 100 TB side moves every round
    val edges = GraphQueries.coreEdges(spark, sf)
    val spine = GraphQueries.pagerankSpine(spark, sf, edges)
    val step = GraphQueries.pagerankStep(edges, spine,
      spine.withColumn("pr",
        org.apache.spark.sql.functions.lit(GraphQueries.PrScale)))
    step.collect() // finalize any adaptive re-planning before auditing
    // AQE buries materialized exchanges inside QueryStageExec LEAVES —
    // a plain collect() sees zero exchanges and the audit is vacuous;
    // flatten through stage boundaries explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val all = flatten(step.queryExecution.executedPlan)
    val shuffles = all.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.nonEmpty,
      "no exchange visible at all — stage traversal went vacuous")
    // a shuffle is fine if what moves has already been combined by a
    // (partial) aggregate — that's the inherent rank-vector-sized
    // contribution shuffle; what must NEVER happen is RAW edge rows
    // reaching an exchange, i.e. an edges leaf with no aggregate in
    // between
    val edgeCols = Set("src", "dst", "deg")
    def rawEdgesReach(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
      case a: AdaptiveSparkPlanExec => rawEdgesReach(a.executedPlan)
      case q: QueryStageExec => rawEdgesReach(q.plan)
      case r: ReusedExchangeExec => rawEdgesReach(r.child)
      case l if l.children.isEmpty =>
        edgeCols.subsetOf(l.output.map(_.name).toSet)
      case other => other.children.exists(rawEdgesReach)
    }
    val offending = shuffles.filter(e => rawEdgesReach(e.child))
    assert(offending.isEmpty,
      s"raw edge rows reached an exchange in an iteration:\n${offending.mkString("\n")}")
  }

  test("label propagation rounds never re-exchange the edges side") {
    import graft.operators.GraphQueries
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // same contract as the pagerank audit: coreEdges (the degreeless
    // builder label_prop actually uses) is hash-partitioned on src
    // before its checkpoint, so a vote round must shuffle only
    // label-vector/vote-count frames — raw edge rows reaching an
    // exchange means the 100 TB side moves every round
    val edges = GraphQueries.coreEdges(spark, sf)
    val labels0 = edges.select(
      org.apache.spark.sql.functions.col("src").as("node")).distinct()
      .withColumn("label", org.apache.spark.sql.functions.col("node"))
      .localCheckpoint(true)
    val step = GraphQueries.labelPropStep(edges, labels0)
    step.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val all = flatten(step.queryExecution.executedPlan)
    val shuffles = all.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.nonEmpty,
      "no exchange visible at all — stage traversal went vacuous")
    val edgeCols = Set("src", "dst")
    def rawEdgesReach(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
      case a: AdaptiveSparkPlanExec => rawEdgesReach(a.executedPlan)
      case q: QueryStageExec => rawEdgesReach(q.plan)
      case r: ReusedExchangeExec => rawEdgesReach(r.child)
      case l if l.children.isEmpty =>
        edgeCols.subsetOf(l.output.map(_.name).toSet)
      case other => other.children.exists(rawEdgesReach)
    }
    val offending = shuffles.filter(e => rawEdgesReach(e.child))
    assert(offending.isEmpty,
      s"raw edge rows reached an exchange in a vote round:\n${offending.mkString("\n")}")
  }

  test("k-core peel rounds never re-exchange the edges side") {
    import graft.operators.GraphQueries
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.SparkPlan
    // the edge frame is pinned to hash(src) before its checkpoint; a
    // peel round may move the bounded alive vector (and the dst-side
    // induced rows AFTER aggregation), but raw edge rows must never
    // reach an exchange
    val e = GraphQueries.coreEdges(spark, sf)
    val alive = e.select(org.apache.spark.sql.functions.col("src").as("node"))
      .distinct().localCheckpoint(true)
    val step = GraphQueries.corePeelStep(e, alive)
    step.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val all = flatten(step.queryExecution.executedPlan)
    val shuffles = all.collect { case ex: ShuffleExchangeLike => ex }
    val edgeCols = Set("src", "dst")
    def rawEdgesReach(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
      case a: AdaptiveSparkPlanExec => rawEdgesReach(a.executedPlan)
      case q: QueryStageExec => rawEdgesReach(q.plan)
      case r: ReusedExchangeExec => rawEdgesReach(r.child)
      case l if l.children.isEmpty =>
        edgeCols.subsetOf(l.output.map(_.name).toSet)
      case other => other.children.exists(rawEdgesReach)
    }
    val offending = shuffles.filter(ex => rawEdgesReach(ex.child))
    assert(offending.isEmpty,
      s"raw edge rows reached an exchange in a peel round:\n${offending.mkString("\n")}")
  }

  test("graph_jaccard's wedge path plans no shuffled join (r11 single-shuffle reshape)") {
    // the reshape's contract: downstream of the checkpointed neighbor
    // lists there is NO join that moves wedge-scale rows — degrees
    // attach by broadcast, wedges come from an explode, and the only
    // exchanges are the two aggregates (supplier degree, pair count)
    val df = operators.GraphQueries.graphJaccard(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // a ReusedExchangeExec is a POINTER to a stage counted elsewhere —
    // do not descend, or every reuse double-counts its target
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _: ReusedExchangeExec => Seq.empty
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val all = flatten(df.queryExecution.executedPlan)
    val shuffledJoins = all.filter { p =>
      p.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]
    }
    assert(shuffledJoins.isEmpty,
      s"wedge path regrew a shuffled join:\n${shuffledJoins.map(_.nodeName)}")
    val exchanges = all.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.nonEmpty, "no exchange visible — traversal vacuous")
    // suppDeg groupBy(p) + common groupBy(pa, pb); the final
    // TakeOrdered adds no exchange and the degree joins broadcast
    assert(exchanges.size <= 2,
      s"expected ≤ 2 exchanges downstream of the lists checkpoint, " +
        s"got ${exchanges.size}")
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

  test("dynamic partition pruning injects into join_dpp's fact scan") {
    import graft.operators.JoinQueries
    val q = JoinQueries.joinDpp(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"DPP did not inject into the partitioned fact scan; plan:\n$plan")
    // the pruned plan returns exactly the quarter's months
    val months = q.collect().map(_.getString(0)).toSeq
    assert(months == months.sorted && months.forall(_.startsWith("1996-0")),
      s"unexpected months: $months")
  }

  test("sink_compact collapses the small-files layout without changing content") {
    val df = SparkEntry.queries("sink_compact")(spark, sf)
    val rows = df.collect() // materializes small + big on first run
    val tag = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_compact_$tag"
    def nFiles(d: String): Int = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles(s"$base/small") >= 32, "small-files fixture not fragmented")
    assert(nFiles(s"$base/big") <= 8, "compaction did not reduce file count")
    val orig = graft.Tables.t(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == orig, "compaction lost or duplicated rows")
  }

  test("z-order layout makes both dimensions prunable per row group; linear sort only one") {
    // The claim behind sink_zorder, proven from the parquet footers the
    // reader actually prunes with: under a 2-D rectangle predicate, a
    // z-ordered file's row groups have tight (zx, zy) bounding boxes so
    // most groups MISS the tile; a zx-sorted file bounds only zx, every
    // group spans the full zy range, and pruning degrades to 1-D.
    import scala.jdk.CollectionConverters._
    // 1M rows over ~260 64 KB row groups: each z-order group then covers
    // a ~63×63 tile of the 1024×1024 key space, well under the 192×192
    // predicate tile — coarser groups drown the geometry in boundary
    // effects (at 33 groups a group's reach ≈ the tile itself and both
    // layouts hit equally; measured before sizing this up)
    val n = 1 << 20
    val base = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1024L)).as("zx"),
      pmod(xxhash64(col("id"), lit(1L)), lit(1024L)).as("zy"))
    val z = graft.operators.ScanQueries.morton10(col("zx"), col("zy"))
    val tmp = System.getProperty("java.io.tmpdir")
    val dirs = Map(
      "linear" -> base.orderBy("zx"),
      "zorder" -> base.orderBy(z)).map { case (name, df) =>
      val dir = s"$tmp/graft_zorder_layout_$name"
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (64 * 1024).toString).parquet(dir)
      name -> dir
    }
    val conf = spark.sessionState.newHadoopConf()
    def boxes(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f.toURI), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.asScala.toSeq.map { b =>
            def mm(c: String): (Long, Long) = {
              val st = b.getColumns.asScala
                .find(_.getPath.toDotString == c).get.getStatistics
              (st.genericGetMin.asInstanceOf[Long], st.genericGetMax.asInstanceOf[Long])
            }
            val ((x0, x1), (y0, y1)) = (mm("zx"), mm("zy"))
            (x0, x1, y0, y1)
          } finally r.close()
        }
    // sink_zorder's tile; a group survives pruning iff its box intersects
    def hits(bs: Seq[(Long, Long, Long, Long)]): Int = bs.count {
      case (x0, x1, y0, y1) => x0 <= 391 && x1 >= 200 && y0 <= 671 && y1 >= 480
    }
    val (lin, zo) = (boxes(dirs("linear")), boxes(dirs("zorder")))
    assert(lin.size >= 16 && zo.size >= 16,
      s"need many row groups to measure pruning (got ${lin.size}/${zo.size})")
    // linear layout: zy is full-range in (almost) every group — the 2nd
    // dimension contributes nothing to pruning
    assert(lin.count { case (_, _, y0, y1) => y0 <= 480 && y1 >= 671 } >
      lin.size * 9 / 10)
    val (linHits, zoHits) = (hits(lin), hits(zo))
    info(s"row groups surviving 2-D pruning: z-order $zoHits/${zo.size}, linear $linHits/${lin.size}")
    assert(zoHits > 0, "tile must be non-empty under z-order too")
    assert(zoHits * 2 <= linHits,
      s"z-order should prune ≥2× more row groups: z=$zoHits/${zo.size} linear=$linHits/${lin.size}")
    dirs.values.foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }
}
