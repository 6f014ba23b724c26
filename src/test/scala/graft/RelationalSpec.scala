package graft

import org.scalatest.funsuite.AnyFunSuite

/** Content + plan-shape assertions for the relational core.
  * Plan shape matters as much as rows: at 100 TB the wrong physical
  * operator IS a bug (SURVEY §4B).
  */
class RelationalSpec extends AnyFunSuite with SparkFixture {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("every declared query runs at sf0.001 and has an oracle or documented self-check") {
    val selfChecked = Set("dedup_minhash", "dedup_simhash",
      "dedup_simhash_pairs", "sim_ann_lsh", "sim_ann_ivf",
      "sim_ann_ivf_trained", "sim_pq")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(SparkEntry.oracleSql.contains(name) || selfChecked(name),
        s"$name has neither oracle SQL nor a declared self-check")
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("scan_pruned pushes the filter into the parquet scan and prunes columns") {
    val p = plan("scan_pruned")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"), p)
    // column-pruned scan: only the 2 projected cols + the filter col
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double,o_orderdate:timestamp"), p)
  }

  test("scan_parquet reads only the 3 projected columns") {
    val p = plan("scan_parquet")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("join_broadcast uses BroadcastHashJoin") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_hint_shj's hint forces a ShuffledHashJoin") {
    assert(plan("join_hint_shj").contains("ShuffledHashJoin"))
  }

  test("join_semi and join_anti plan as semi/anti joins") {
    assert(plan("join_semi").contains("LeftSemi"))
    assert(plan("join_anti").contains("LeftAnti"))
  }

  test("join_theta broadcasts the small side (nested loop, no shuffle of lineitem)") {
    val p = plan("join_theta")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("join_range_binned turns interval containment into a hash equi-join (no BNLJ)") {
    val p = plan("join_range_binned")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("join_interval_overlap binning keeps the overlap join hash-keyed (no BNLJ)") {
    val p = plan("join_interval_overlap")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("source_badrecords quarantines exactly the injected corrupt rows") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("source_badrecords")(spark, sf).collect()
    val byBucket = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expectBad = graft.Tables.t(spark, sf, "orders")
      .filter(col("o_orderkey") % 7 === 3).count()
    assert(byBucket("_corrupt") == ((expectBad, expectBad)),
      s"corrupt bucket ${byBucket("_corrupt")} != injected $expectBad")
    // no corruption leaked into a well-formed bucket and nothing was lost
    byBucket.filterKeys(_ != "_corrupt").foreach { case (b, (_, bad)) =>
      assert(bad == 0L, s"bucket $b contains corrupt rows") }
    val total = graft.Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum == total, "rows lost or duplicated")
  }

  test("sql_recursive_chain executes through the recursive union-loop operator") {
    val df = SparkEntry.queries("sql_recursive_chain")(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString + "\n" +
      df.queryExecution.executedPlan.toString
    assert(p.contains("UnionLoop") || p.contains("CTERelation") ||
      p.toLowerCase.contains("recursive"), s"no recursive operator in plan:\n$p")
    // the walk agrees with the windowed sessionize replay at row level
    import org.apache.spark.sql.functions._
    val viaWindow = graft.operators.WindowQueries.concurrencySessions(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_chains")) // 1 row/session in
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.collect().foreach { r =>
      assert(r.getLong(1) == viaWindow(r.getLong(0)),
        s"chain count mismatch for user ${r.getLong(0)}") }
  }

  test("correlated subqueries decorrelate: no per-row subquery survives optimization") {
    val agg = SparkEntry.queries("sql_correlated_agg")(spark, sf)
    val aggPlan = agg.queryExecution.optimizedPlan.toString
    // RewriteCorrelatedScalarSubquery must have turned the per-row
    // count(*) into an aggregate joined back on the correlation key
    assert(!aggPlan.contains("scalar-subquery"), aggPlan)
    assert(aggPlan.contains("Join"), aggPlan)
    val lat = SparkEntry.queries("sql_lateral_topk")(spark, sf)
    val latPlan = lat.queryExecution.optimizedPlan.toString + "\n" +
      lat.queryExecution.executedPlan.toString
    // the correlated ORDER BY + LIMIT becomes a per-key window/limit
    // join shape — never a cartesian or per-row loop
    assert(!latPlan.contains("CartesianProduct"), latPlan)
    assert(!latPlan.contains("lateral-subquery"), latPlan)
  }

  test("join_bucketed sort-merge-joins without shuffling either side") {
    // disable broadcast so the bucketed SMJ path (not a trivial BHJ) is
    // what gets planned — at real scale neither side would broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("join_bucketed")(spark, sf)
      df.collect() // materialize (also writes bucket tables on first run)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // neither join input may carry an Exchange on its join key
      assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
        !p.contains("Exchange hashpartitioning(c_custkey"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sink_partitioned prunes to a single year partition") {
    val df = SparkEntry.queries("sink_partitioned")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_year"), p)
    assert(p.contains("(o_year"), p)
  }

  test("topk_global plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
  }

  test("sort_multi plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("sort_multi").contains("TakeOrderedAndProject"))
  }

  test("agg_hash uses two-phase HashAggregate") {
    val p = plan("agg_hash")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("source_inline returns the reference label dictionary in order") {
    val rows = SparkEntry.queries("source_inline")(spark, sf).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      operators.ScanQueries.labelNames)
  }

  test("join_broadcast returns all 25 nations") {
    assert(SparkEntry.queries("join_broadcast")(spark, sf).count() == 25)
  }

  test("set algebra: union ⊇ intersect parts; except ∩ intersect = ∅") {
    import spark.implicits._
    val inter = SparkEntry.queries("set_intersect")(spark, sf)
      .as[Long].collect().toSet
    val exc = SparkEntry.queries("set_except")(spark, sf)
      .as[Long].collect().toSet
    assert(inter.intersect(exc).isEmpty)
  }

  test("join_existence plans an ExistenceJoin for IN-under-OR") {
    val q = SparkEntry.queries("join_existence")(spark, sf)
    assert(q.queryExecution.optimizedPlan.toString.contains("ExistenceJoin"),
      q.queryExecution.optimizedPlan.toString)
  }

  test("win_rank emits at most 3 rows per customer, ranks 1..3") {
    val byCust = SparkEntry.queries("win_rank")(spark, sf).collect()
      .groupBy(_.getLong(0))
    byCust.values.foreach { rows =>
      assert(rows.length <= 3)
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length))
    }
  }

  test("profile_stats plans NO Expand (melt replaces stacked count-distincts)") {
    // the scaladoc's scale claim, asserted: stacked count(distinct c1),
    // count(distinct c2), ... in one aggregate would plan an Expand
    // multiplying input rows by the column count; the melt + two-level
    // aggregate shape must not
    val p = plan("profile_stats")
    assert(!p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("profile_histogram uses two-phase HashAggregate (bounded shuffle keys)") {
    val p = plan("profile_histogram")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("win_first_last computes all three frame-edge functions in ONE Window node") {
    val p = plan("win_first_last")
    assert("Window".r.findAllIn(p).size == 1, p)
  }

  test("agg_paths rides the native window group limit (<=3 rows per user cross the exchange)") {
    val p = plan("agg_paths")
    assert(p.contains("WindowGroupLimit"), p)
    // the per-user path groupBy reuses the window's user_id hash
    // partitioning: exactly ONE exchange on user_id in the whole plan
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
  }

  test("sort_skyline equals the brute-force dominance definition and is mutually non-dominating") {
    // sequential replay of the O(n²) definition the oracle uses, in
    // Scala, against the engine's prefix-min algorithm
    val raw = graft.Tables.t(spark, sf, "part")
      .selectExpr("CAST(round(p_retailprice * 100) AS BIGINT) AS p", "p_size AS s")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    def dominates(a: (Long, Int), b: (Long, Int)) =
      a._1 <= b._1 && a._2 <= b._2 && (a._1 < b._1 || a._2 < b._2)
    val expect = raw.distinct.filter(x => !raw.exists(y => dominates(y, x)))
      .sortBy(_._1).toSeq
    val got = SparkEntry.queries("sort_skyline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == expect)
    got.foreach(a => got.foreach(b =>
      assert(a == b || !dominates(a, b), s"$a dominates $b inside the frontier")))
  }

  test("agg_apportion conserves the seat budget exactly") {
    val S = graft.operators.AggQueries.ApportionSeats
    val rows = SparkEntry.queries("agg_apportion")(spark, sf).collect()
    // the defining invariant: seats sum EXACTLY to the budget
    assert(rows.map(_.getAs[Long]("seats")).sum == S)
    // extras distribute exactly the floor shortfall (0 ≤ leftover < #types;
    // at sf0.001 the remainders happen to cancel and leftover is 0 —
    // both branches are legal, the conservation identity is not)
    val leftover = S - rows.map(_.getAs[Long]("floor_seats")).sum
    assert(leftover >= 0 && leftover < rows.length)
    assert(rows.map(_.getAs[Long]("extra")).sum == leftover)
    rows.foreach(r => assert(r.getAs[Long]("extra") <= 1L))
  }

  test("join_fuzzy blocking loses no ed<=1 pair (brute-force replay) and finds the natural pairs") {
    val df = SparkEntry.queries("join_fuzzy")(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // brute force over both vocabularies, classic Levenshtein
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val part = graft.Tables.t(spark, sf, "part")
      .selectExpr("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clean = part.flatMap(_._2.split(" ")).distinct
    val dirty = part.filter(_._1 % 7 == 0).map { case (k, n) =>
      val fw = n.split(" ").head
      val i = ((k / 7) % fw.length).toInt
      fw.substring(0, i) + fw.substring(i + 1)
    }.distinct
    val expect = (for {
      d <- dirty; c <- clean; e = ed(d, c) if e <= 1
    } yield (d, c, e.toLong)).toSet
    assert(got == expect)
    assert(got.nonEmpty, "fuzzy join found no matches — blocking or injection broken")
    // ambiguity is genuinely exercised: some dirty word fuzzy-matches
    // MORE than one clean word (e.g. a deletion bridging red/rod)
    assert(got.groupBy(_._1).exists(_._2.map(_._2).size >= 2),
      s"no dirty word matched >=2 clean words: $got")
  }

  test("pipeline_snapshot_diff classes partition the snapshot-2 user set and all three fire") {
    val rows = SparkEntry.queries("pipeline_snapshot_diff")(spark, sf).collect()
    val byClass = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byClass.keySet == Set("added", "changed", "unchanged"),
      s"expected all three diff classes, got ${byClass.keySet}")
    // class counts must sum to |users with >=1 event <= t2| — replay the
    // cutoff and the user set independently
    import org.apache.spark.sql.functions._
    val e = graft.Tables.t(spark, sf, "events")
    val Array(lo, hi) = e.agg(min("ts_s"), max("ts_s")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val t2 = lo + (hi - lo) / 2
    val nUsers = e.filter(col("ts_s") <= t2)
      .select("user_id").distinct().count()
    assert(byClass.values.sum == nUsers)
  }

  test("agg_basket pair counts equal the per-order brand-set replay") {
    val got = SparkEntry.queries("agg_basket")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val baskets = graft.Tables.t(spark, sf, "lineitem")
      .join(graft.Tables.t(spark, sf, "part"),
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
      .select("l_orderkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    baskets.foreach { bs =>
      for (i <- bs.indices; j <- i + 1 until bs.size)
        counts((bs(i), bs(j))) = counts.getOrElse((bs(i), bs(j)), 0L) + 1
    }
    val nOrders = baskets.size
    val expect = counts.filter(_._2 * 1000 >= nOrders)
    assert(got == expect.toMap)
  }

  test("xpath_string semantics pin (removed from scalar_xml's hot path for being non-codegen)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = Seq("<doc><lang>en</lang><src>web</src></doc>").toDF("xml")
      .select(xpath_string(col("xml"), lit("/doc/src")).as("src"),
        xpath_string(col("xml"), lit("/doc/lang")).as("lang"))
      .head()
    assert(got.getString(0) == "web" && got.getString(1) == "en")
  }
}
