package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the iterative-graph and gap-fill operators. */
class GraphSpec extends AnyFunSuite with SparkFixture {

  test("graph_pagerank covers every node and respects fixed-point bounds") {
    val pr = operators.GraphQueries.graphPagerank(spark, sf).cache()
    val nCust = Tables.t(spark, sf, "customer").count()
    val nSupp = Tables.t(spark, sf, "supplier").count()
    assert(pr.count() == nCust + nSupp, "one rank row per node")
    val row = pr.agg(min("pr"), max("pr"), sum("pr")).head()
    val base = operators.GraphQueries.PrScale * 15 / 100
    assert(row.getLong(0) >= base, "every rank carries at least the teleport base")
    // integer arithmetic only drops mass (floor division + dangling
    // nodes) — total can never exceed the initial mass
    assert(row.getLong(2) <= (nCust + nSupp) * operators.GraphQueries.PrScale)
    // the graph is non-trivial at sf0.001: ranks must actually differ
    assert(pr.select("pr").distinct().count() > 1, "degenerate: all ranks equal")
    pr.unpersist()
  }

  test("graph_pagerank is deterministic across runs") {
    val a = operators.GraphQueries.graphPagerank(spark, sf).collect()
    val b = operators.GraphQueries.graphPagerank(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("graph_bfs: driver-side multi-source BFS replay matches every level summary") {
    // institutionalizes the r9 checkpoint-only-next reshape: the whole
    // BFS (frontier expansion, visited anti-join, min-hop first-
    // discovery labeling) is replayed sequentially in Scala on the
    // same bipartite graph, and every per-level row — count, id-sum
    // checksum, min, max — must match exactly
    val pairs = Tables.t(spark, sf, "orders").select("o_orderkey", "o_custkey")
      .join(Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("c"),
        (col("l_suppkey") * 2 + 1).cast("long").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // fixture-scale ceiling (r10 ADVICE low): this replay builds the
    // whole adjacency map in test-JVM memory, which is the point at
    // sf0.01/0.1 but an OOM trap if the spec is ever pointed at a big
    // sf dir — fail fast by name instead
    assert(pairs.length < 2000000,
      s"driver-side BFS replay is fixture-only; ${pairs.length} edges " +
        "exceed the in-memory adjacency-map ceiling")
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    pairs.foreach { case (c, p) =>
      adj.getOrElseUpdate(c, scala.collection.mutable.Set.empty) += p
      adj.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += c
    }
    val seeds = Tables.t(spark, sf, "customer")
      .filter(col("c_nationkey") === 0)
      .select((col("c_custkey") * 2).cast("long").as("n"))
      .collect().map(_.getLong(0)).toSet
    assert(seeds.nonEmpty, "degenerate fixture: no nation-0 customers")
    val levels = scala.collection.mutable.ArrayBuffer(seeds)
    var visited = seeds
    var frontier = seeds
    for (_ <- 1 to operators.GraphQueries.BfsMaxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty[Long])) -- visited
      levels += next.toSet
      visited ++= next
      frontier = next.toSet
    }
    val expected = levels.zipWithIndex
      .filter(_._1.nonEmpty)
      .map { case (s, d) => (d, (s.size.toLong, s.sum, s.min, s.max)) }
      .toMap
    val got = operators.GraphQueries.graphBfs(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected, s"BFS levels diverge: got $got expected $expected")
    // the graph must actually exercise the loop: at least one hop
    // beyond the seeds discovered something
    assert(expected.size >= 2, "degenerate fixture: BFS never left the seed set")
  }

  test("graph_bfs_multi: per-class driver replay matches, classes traverse independently") {
    // the simultaneous k-class BFS must equal k INDEPENDENT sequential
    // BFS runs — sharing the edge frame and the (node, cls) anti-join
    // must never let one class's visited set mask another's discovery
    val pairs = Tables.t(spark, sf, "orders").select("o_orderkey", "o_custkey")
      .join(Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("c"),
        (col("l_suppkey") * 2 + 1).cast("long").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // fixture-scale ceiling (r10 ADVICE low): this replay builds the
    // whole adjacency map in test-JVM memory, which is the point at
    // sf0.01/0.1 but an OOM trap if the spec is ever pointed at a big
    // sf dir — fail fast by name instead
    assert(pairs.length < 2000000,
      s"driver-side BFS replay is fixture-only; ${pairs.length} edges " +
        "exceed the in-memory adjacency-map ceiling")
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    pairs.foreach { case (c, p) =>
      adj.getOrElseUpdate(c, scala.collection.mutable.Set.empty) += p
      adj.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += c
    }
    val expected = (0 until operators.GraphQueries.BfsClasses).flatMap { cls =>
      val seeds = Tables.t(spark, sf, "customer")
        .filter(col("c_nationkey") === cls)
        .select((col("c_custkey") * 2).cast("long").as("n"))
        .collect().map(_.getLong(0)).toSet
      assert(seeds.nonEmpty, s"degenerate fixture: no nation-$cls customers")
      val levels = scala.collection.mutable.ArrayBuffer(seeds)
      var visited = seeds
      var frontier = seeds
      for (_ <- 1 to operators.GraphQueries.BfsMaxHops) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty[Long])) -- visited
        levels += next.toSet
        visited ++= next
        frontier = next.toSet
      }
      levels.zipWithIndex.filter(_._1.nonEmpty).map { case (s, d) =>
        (cls, d) -> (s.size.toLong, s.sum, s.min, s.max)
      }
    }.toMap
    val got = operators.GraphQueries.graphBfsMulti(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == expected, s"multi-class BFS diverges: got $got expected $expected")
    // classes 1 and 2 genuinely participated (not just class 0's rows)
    assert((1 until operators.GraphQueries.BfsClasses)
        .forall(cls => got.keys.exists(_._1 == cls)),
      "degenerate fixture: a seed class produced no levels")
  }

  /** Crafted hub: doc 0 shares a distinct window with each of docs
    * 1..40 (star, degree 42) plus docs 41/42 which also share a window
    * with each other — the boilerplate-heavy-doc shape the r4 verdict
    * flagged. Degree orientation must (a) still list exactly the one
    * real triangle and (b) leave the hub with out-degree 0, so no
    * O(d²) wedge fan-out can form at it. */
  test("graph_triangles under a hub vertex: correct and degree-oriented") {
    import spark.implicits._
    val L = operators.DedupQueries.SubstrLen
    def w(tag: Int): String = { val s0 = "w" + tag.toString; s0 + "x" * (L - s0.length) }
    val star = (1 to 40).map(i => (i.toLong, w(i)))
    val hub = (0L, ((1 to 40).map(w) ++ Seq(w(41), w(42))).mkString)
    val a = (41L, w(41) + w(100)) // shares w41 with hub, w100 with b
    val b = (42L, w(42) + w(100))
    val dir = java.nio.file.Files.createTempDirectory("graft_hub").toString
    (star :+ hub :+ a :+ b).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tris = operators.GraphQueries.graphTriangles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tris == Set((0L, 41L, 42L)), s"wrong triangle set: $tris")
    // replay the orientation: every edge points low-(deg,id) -> high,
    // so the hub (max degree) takes no out-edges and per-vertex wedge
    // work is bounded by arboricity, not hub-degree squared
    val pairs = operators.DedupQueries.substringPairs(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 43, "expected 42 star edges + 1 (41,42) edge")
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (v, hits) => v -> hits.length.toLong }
    val outDeg = pairs
      .map { case (x, y) =>
        if (deg(x) < deg(y) || (deg(x) == deg(y) && x < y)) x else y }
      .groupBy(v => v).map { case (v, hits) => v -> hits.length }
    assert(outDeg.getOrElse(0L, 0) == 0, "hub must take no out-edges")
    assert(outDeg.values.max <= 2, s"out-degree not arboricity-bounded: $outDeg")
  }

  test("pipeline_gapfill emits a dense per-user calendar with no unfilled days") {
    val g = operators.WindowQueries.pipelineGapfill(spark, sf).cache()
    // dense calendar: row count per user == span length in days
    val spanCheck = g.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        (datediff(max(to_date(col("day"))), min(to_date(col("day")))) + 1).as("span"))
      .filter(col("rows") =!= col("span"))
    assert(spanCheck.count() == 0, "calendar has holes or duplicates")
    assert(g.filter(col("n_filled").isNull).count() == 0,
      "forward fill left a null (leading gap should be impossible)")
    // observed days keep their exact count
    assert(g.filter(col("n_obs").isNotNull)
      .filter(col("n_obs") =!= col("n_filled")).count() == 0)
    // at least one genuine gap day exists in the fixture, else the
    // query proves nothing
    assert(g.filter(col("n_obs").isNull).count() > 0, "fixture has no gaps")
    g.unpersist()
  }

  test("graph_degrees: handshake lemma and node accounting vs the pair frame") {
    import spark.implicits._
    val rows = SparkEntry.queries("graph_degrees")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val pairs = graft.operators.DedupQueries.substringPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    assert(rows.map(_._2).sum == nodes.length, "node totals")
    // Σ degree·n_nodes counts every edge endpoint exactly twice
    assert(rows.map(r => r._1 * r._2).sum == 2L * pairs.length, "handshake")
    rows.foreach { case (deg, n, minNode) =>
      assert(deg >= 1 && n >= 1)
      assert(nodes.contains(minNode), s"degree $deg witness not a node")
    }
  }

  test("graph_label_prop: communities bounded by the node set, labels are nodes") {
    import spark.implicits._
    val rows = SparkEntry.queries("graph_label_prop")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val nNodes = graft.operators.GraphQueries
      .coreEdges(spark, sf).select("src").distinct().count()
    // top-20 communities can't hold more members than nodes exist
    assert(rows.map(_._2).sum <= nNodes, "membership exceeds node count")
    // sizes are emitted largest-first with a label tie-break
    assert(rows.map(_._2).sameElements(rows.map(_._2).sortBy(-_)), "not size-sorted")
    rows.foreach { case (label, n, idSum, minNode) =>
      assert(n >= 1)
      // a community's label was propagated from some member's initial
      // label — always a node id; min member ≤ id-sum average
      assert(minNode * n <= idSum, s"label $label: checksum below min bound")
    }
  }

  test("graph_core: driver-side peel replay matches, trajectory monotone") {
    import spark.implicits._
    val rows = SparkEntry.queries("graph_core")(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.length == graft.operators.GraphQueries.CoreRounds)
    // survivor counts never grow (alive sets are nested)
    val alive = rows.map(_._3)
    assert(alive.sameElements(alive.sorted.reverse), "peeling grew the core")
    // sequential replay: collect the pair graph and peel in plain Scala
    val pairs = graft.operators.GraphQueries.coreEdges(spark, sf)
      .select("src", "dst").as[(Long, Long)].collect()
    var edges = (pairs ++ Array.empty[(Long, Long)]).toSet // both dirs already
    def degrees(e: Set[(Long, Long)]): Map[Long, Int] =
      e.groupBy(_._1).map { case (n, es) => n -> es.size }
    val d0 = degrees(edges).values.toSeq.sorted
    val k = d0((d0.size - 1) / 2) // percentile_disc(0.5): lower middle
    assert(k == rows.head._2, "median-degree threshold drifted")
    var deg = degrees(edges)
    rows.foreach { case (_, _, nAlive, degSum, idSum) =>
      val a = deg.filter(_._2 >= k)
      assert(a.size.toLong == nAlive)
      assert(a.values.map(_.toLong).sum == degSum)
      assert(a.keys.sum == idSum)
      edges = edges.filter { case (s, d) => a.contains(s) && a.contains(d) }
      deg = degrees(edges)
    }
  }

  test("graph_jaccard: similarity bounds and common ≤ min degree") {
    import spark.implicits._
    val rows = SparkEntry.queries("graph_jaccard")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= graft.operators.GraphQueries.JacTopK)
    rows.foreach { case (pa, pb, common, da, db, jac) =>
      assert(pa < pb, "pair not canonical")
      assert(common >= 1 && common <= math.min(da, db), "common exceeds a degree")
      assert(jac >= 0 && jac <= 100, s"jac_pct $jac out of range")
      // exact integer replay of the percentage
      assert(jac == 100 * common / (da + db - common), "jac_pct formula drift")
    }
  }
}
