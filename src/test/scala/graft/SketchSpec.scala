package graft

import graft.functions.MisraGries
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries mergeable-summary guarantees, independent of Spark:
  * the properties the text_heavy_hitters oracle relies on.
  */
class SketchSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Deterministic skewed stream: item i appears ~(1000 / (i+1)) times
    * (zipf-ish), interleaved so heavy items aren't contiguous. */
  private val stream: Seq[String] = {
    val items = for {
      i <- 0 until 200
      rep <- 0 until (1000 / (i + 1))
    } yield (s"w$i", rep)
    items.sortBy { case (w, rep) => (rep, w) }.map(_._1)
  }

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("sequential fold: every item with count > N/(k+1) survives; undercount bounded") {
    val k = 20
    val sk = MisraGries.sequential(k, stream)
    assert(sk.size <= k)
    val n = stream.size
    val exact = exactCounts(stream)
    val bound = n.toDouble / (k + 1)
    exact.foreach { case (w, c) =>
      if (c > bound) {
        assert(sk.contains(w), s"heavy hitter $w (count $c > $bound) missing")
        assert(sk(w) <= c && sk(w) >= c - bound,
          s"$w estimate ${sk(w)} outside [${c - bound}, $c]")
      }
    }
  }

  test("merge keeps the superset guarantee across arbitrary splits") {
    val k = 20
    val mg = MisraGries(k)
    val exact = exactCounts(stream)
    val n = stream.size
    val bound = n.toDouble / (k + 1)
    for (splits <- Seq(2, 3, 7)) {
      val parts = stream.grouped(math.max(1, stream.size / splits)).toSeq
      val merged = parts.map(p => MisraGries.sequential(k, p)).reduce(mg.merge)
      assert(merged.size <= k)
      exact.foreach { case (w, c) =>
        if (c > bound) assert(merged.contains(w),
          s"heavy hitter $w lost after $splits-way merge")
      }
    }
  }

  test("KMV bottom-k is mergeable: bottom-K of halves re-merged == one-shot bottom-K") {
    import org.apache.spark.sql.functions._
    val keys = graft.operators.AggQueries.kmvKeys(spark, sf)
    val one = graft.operators.AggQueries.kmvBottom(keys)
      .as[(String, Long)].collect().toSeq.sorted
    // split the key space arbitrarily, sketch each half, merge by
    // union + re-take bottom-K — the 1000-executor independence claim
    val k = graft.operators.AggQueries.KmvK
    val lo = graft.operators.AggQueries.kmvBottom(keys.filter(col("ak") % 2 === 0))
    val hi = graft.operators.AggQueries.kmvBottom(keys.filter(col("ak") % 2 === 1))
    val merged = lo.unionByName(hi)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= k).select("event_type", "h")
      .as[(String, Long)].collect().toSeq.sorted
    assert(merged == one, "bottom-k union-merge diverged from the one-shot sketch")
  }

  test("KMV estimate lands within the 4-sigma band of the exact cardinality") {
    val rows = SparkEntry.queries("agg_kmv_distinct")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, kIn, _, est, exact) =>
      if (kIn < graft.operators.AggQueries.KmvK)
        assert(est == exact, s"$t: sub-K sketch must be exact")
      else {
        // relative sigma of the KMV estimator is 1/sqrt(K-2)
        val sigma = exact / math.sqrt(graft.operators.AggQueries.KmvK - 2.0)
        assert(math.abs(est - exact) <= 4 * sigma,
          s"$t: est $est vs exact $exact outside 4 sigma")
      }
    }
  }

  test("text_heavy_hitters equals the exact heavy-hitter set (sketch+verify is deterministic)") {
    val got = SparkEntry.queries("text_heavy_hitters")(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got.nonEmpty)
    // exact truth computed with plain Spark aggregation
    import org.apache.spark.sql.functions._
    val terms = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
    val n = terms.count()
    val truth = terms.groupBy("word").count()
      .filter(col("count") * 51 > n)
      .orderBy(desc("count"), asc("word"))
      .as[(String, Long)].collect().toSeq
    assert(got == truth)
    // stable across runs despite partitioning-dependent sketch state
    val again = SparkEntry.queries("text_heavy_hitters")(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got == again)
  }
}
