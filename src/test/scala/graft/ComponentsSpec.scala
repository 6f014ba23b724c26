package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** componentsStar (large-star/small-star, O(log n) rounds) must agree
  * with components (min-label propagation, O(diameter) rounds) on every
  * graph — they compute the same labels by different fixpoints. The
  * chain case is exactly the adversarial shape the star variant exists
  * for: diameter 499 would cost min-label propagation 499 rounds; the
  * star alternation collapses it in ~log₂(500). */
class ComponentsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def labelsOf(nodes: Seq[Long], edges: Seq[(Long, Long)],
      star: Boolean): Map[Long, Long] = {
    val n = nodes.toDF("doc_id")
    val e = edges.toDF("doc_a", "doc_b")
    val f = if (star) DedupQueries.componentsStar _ else DedupQueries.components _
    f(n, e).as[(Long, Long)].collect().toMap
  }

  test("star: chain of 500 collapses to comp=0 (log-round convergence)") {
    val nodes = (0L until 500L)
    val edges = (0L until 499L).map(i => (i, i + 1))
    val got = labelsOf(nodes, edges, star = true)
    assert(got.size == 500)
    assert(got.values.forall(_ == 0L), s"non-zero labels: ${got.filter(_._2 != 0L).take(5)}")
  }

  test("star: singletons label themselves, mixed clusters match min-label") {
    val nodes = (0L to 9L)
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 7L))
    val got = labelsOf(nodes, edges, star = true)
    assert(got == labelsOf(nodes, edges, star = false))
    assert(got(3L) == 1L && got(7L) == 5L && got(0L) == 0L && got(9L) == 9L)
  }

  test("star ≡ min-label on seeded pseudo-random graphs") {
    // deterministic LCG so the test never flaps
    var seed = 0x5DEECE66DL
    def next(bound: Int): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 16, bound.toLong)
    }
    for (trial <- 1 to 3) {
      val n = 60 + trial * 20
      val nodes = (0L until n.toLong)
      val edges = (1 to n).map(_ => (next(n), next(n)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val star = labelsOf(nodes, edges, star = true)
      val prop = labelsOf(nodes, edges, star = false)
      assert(star == prop, s"trial $trial: ${star.toSet.diff(prop.toSet).take(5)}")
    }
  }

  test("star is deterministic across invocations") {
    val nodes = (0L until 50L)
    val edges = (0L until 48L by 2).map(i => (i, i + 2)) // two interleaved chains
    val a = labelsOf(nodes, edges, star = true)
    val b = labelsOf(nodes, edges, star = true)
    assert(a == b)
    // even chain → comp 0, odd nodes untouched → singletons
    assert(a(48L) == 0L && a(47L) == 47L)
  }

  test("dedup_components_star equals dedup_components on real documents") {
    val a = SparkEntry.queries("dedup_components_star")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val b = SparkEntry.queries("dedup_components")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
