package graft

import graft.plans.PartialTopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom PartialTopKPerKey operator: correctness (pruning is
  * invisible in the final answer), plan shape (the custom exec node is
  * actually planned), and the pruning bound itself. */
class PlansSpec extends AnyFunSuite with SparkFixture {

  private def orders = Tables.t(spark, sf, "orders")
    .select("o_custkey", "o_orderkey", "o_totalprice")

  test("topk_per_key equals the unpruned window formulation row-for-row") {
    val pruned = SparkEntry.queries("topk_per_key")(spark, sf).collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val plain = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
      .collect()
    assert(pruned.sameElements(plain))
  }

  test("PartialTopKExec appears in the executed plan") {
    val df = SparkEntry.queries("topk_per_key")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("PartialTopK"),
      df.queryExecution.executedPlan.toString)
  }

  test("the partial prune bounds rows per key without losing top rows") {
    PartialTopK.ensureRegistered(spark)
    // repartition to several partitions so the per-partition bound is
    // actually exercised
    val in = orders.repartition(7)
    val nParts = in.rdd.getNumPartitions
    val pruned = PartialTopK.partialTopK(
      in, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    val perKey = pruned.groupBy("o_custkey").count().collect()
    perKey.foreach { r =>
      assert(r.getLong(1) <= 3L * nParts,
        s"key ${r.get(0)} kept ${r.getLong(1)} rows > 3 × $nParts partitions")
    }
    // no key with ≥3 input rows may fall below 3 kept rows
    val inCounts = in.groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keptCounts = perKey.map(r => r.getLong(0) -> r.getLong(1)).toMap
    inCounts.foreach { case (k, n) =>
      assert(keptCounts.getOrElse(k, 0L) >= math.min(n, 3L),
        s"key $k lost rows: ${keptCounts.getOrElse(k, 0L)} kept of $n")
    }
  }

  test("a tiny maxKeys cap forces batch flushes without losing top rows") {
    PartialTopK.ensureRegistered(spark)
    // cap of 2 keys on ~1000 distinct custkeys per partition forces
    // hundreds of flushes; batch-local pruning must still keep every
    // key's true top-3 (a suppressed row had >= k better same-key rows
    // in its own batch, all emitted)
    val in = orders.repartition(5)
    val pruned = PartialTopK.partialTopK(
      in, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3, maxKeys = 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val viaCapped = pruned
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn").collect()
    val plain = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn").collect()
    assert(viaCapped.sameElements(plain))
  }

  test("topk_join: prune composes with a broadcast join and stays invisible") {
    val df = SparkEntry.queries("topk_join")(spark, sf)
    val got = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey").orderBy(desc("c_acctbal"), asc("c_custkey"))
    val plain = Tables.t(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .join(broadcast(Tables.t(spark, sf, "nation")
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("rn"), col("c_custkey"),
        col("c_name"), col("c_acctbal"))
      .orderBy("n_name", "rn")
      .collect()
    assert(got.sameElements(plain))
  }

  test("partial top-k works through the extension point (GraftExtensions session)") {
    // SparkFixture's session is built with
    // spark.sql.extensions=graft.functions.GraftExtensions, so the
    // strategy must be active without ensureRegistered
    val df = PartialTopK.partialTopK(
      orders, Seq("o_custkey"), Seq("o_totalprice" -> false), 1)
    assert(df.count() > 0)
  }

  test("TopKDemotion rewrites the rank+lag shape native declines") {
    val df = SparkEntry.queries("topk_rewrite")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK"), plan)
    // the native rule really did decline this shape
    assert(!plan.contains("WindowGroupLimit"), plan)
    // the rewrite is invisible: equals the UNFILTERED window (which
    // the rule cannot match — no Filter-over-Window) filtered
    // driver-side. The session has the rule injected via extensions,
    // so "compile without the rule" isn't constructible here; this
    // reference is rule-proof by shape instead.
    val o = orders
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val wf = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val cents = round(col("o_totalprice") * 100).cast("long")
    val all = o.select(col("*"), row_number().over(w).as("rn"),
        sum(cents).over(wf).as("run_cents"),
        (lag(cents, 1).over(w) - cents).as("gap_cents"))
      .select("o_custkey", "o_orderkey", "o_totalprice",
        "rn", "run_cents", "gap_cents")
      .orderBy("o_custkey", "rn")
    assert(!all.queryExecution.executedPlan.toString.contains("PartialTopK"))
    val ref = all.collect().filter(_.getInt(3) <= 3)
    assert(df.collect().sameElements(ref))
  }

  test("TopKDemotion defers to the native rule on the pure rank shape") {
    graft.plans.TopKDemotion.ensureRegistered(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val df = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // native InferWindowGroupLimit takes this; the demotion must not stack
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("PartialTopK"), plan)
  }

  test("TopKDemotion defers on the all-expanding rank+running-agg shape (4.1-native)") {
    graft.plans.TopKDemotion.ensureRegistered(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val wf = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val df = orders.select(col("*"), row_number().over(w).as("rn"),
        sum(round(col("o_totalprice") * 100).cast("long")).over(wf).as("run"))
      .filter(col("rn") <= 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // Spark 4.1's isExpandingWindow admits the running agg — native owns it
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("PartialTopK"), plan)
  }

  test("TopKDemotion declines rank() under ties (heap prune would drop peers)") {
    graft.plans.TopKDemotion.ensureRegistered(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"))
    val wf = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val df = orders.withColumn("rk", rank().over(w))
      .withColumn("run", sum(round(col("o_totalprice") * 100).cast("long")).over(wf))
      .filter(col("rk") <= 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PartialTopK"), plan)
  }

  test("text_winnow (codegen'd WinnowStats) equals the exploded-window formulation row-for-row") {
    val W = org.apache.spark.sql.expressions.Window
    val k = graft.operators.TextQueries.WinnowK
    val w = graft.operators.TextQueries.WinnowW
    val exploded = Tables.t(spark, sf, "documents")
      .filter(length(col("text")) >= k)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (k - 1))).as("pos"))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(expr(s"substring(text, pos, $k)")), 1, 12),
          16, 10).cast("long").as("h"))
      .withColumn("fp", min("h").over(
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)))
      .filter(col("pos") >= w)
      .select("doc_id", "fp").distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"), min("fp").as("min_fp"),
        max("fp").as("max_fp"), sum("fp").as("fp_sum"))
      .orderBy("doc_id")
      .collect()
    val perRow = SparkEntry.queries("text_winnow")(spark, sf).collect()
    assert(perRow.sameElements(exploded))
  }

  test("win_ewma plans one window exchange + presentation sort — no join, no fan-out") {
    val df = SparkEntry.queries("win_ewma")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), plan)     // the fan-out formulation needed one
    assert(!plan.contains("Generate"), plan) // and an explode
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("KMV bottom-k rides the native group-limit rewrite (partial + final)") {
    // the scaladoc's scale claim: map tasks keep K rows per type
    // BEFORE the shuffle — InferWindowGroupLimit must plan a Partial
    // WindowGroupLimit under the rank window, or the full distinct
    // pair set sorts through one task per type
    Seq("agg_kmv_distinct", "agg_kmv_jaccard").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"), s"$q: rank not group-limited\n$plan")
    }
    // the data-scale window (distinct pairs → per-type bottom-K) must
    // limit on the MAP side; jaccard's audited plan only shows its
    // merged-sketch window (the bottom-K one runs inside the
    // checkpoint), whose input is already K·|types|-bounded
    val plan = SparkEntry.queries("agg_kmv_distinct")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Partial"), s"no map-side partial limit\n$plan")
  }

  test("robust-stats family broadcasts its per-type moments (never sort-merges the scan)") {
    Seq("agg_zscore", "agg_mad", "agg_winsorized").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q: moments not broadcast\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q: scan got sort-merged\n$plan")
    }
  }

  test("text_winnow plans ONE exchange (the presentation sort) — no gram shuffle") {
    val df = SparkEntry.queries("text_winnow")(spark, sf)
    df.collect()
    // AQE's string repeats the plan (Final + Initial) — assert on the final section
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("hashpartitioning"), plan)
    // the kernel must run ONCE per row: no isnotnull(winnowstats…) residue in a Filter
    assert("winnowstats".r.findAllIn(plan).size == 1, plan)
  }

  test("text_repetition (codegen'd RepetitionStats) equals the exploded-groupBy formulation") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val wc = docs.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_word_n"))
    val gc = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(ws) - 2, 0)), " +
          "i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1]))")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(coalesce(sum(when(col("c") >= 2, col("c"))), lit(0L)).as("dup3_pos"))
    val exploded = docs
      .join(wc, "doc_id").join(gc, "doc_id")
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
        col("top_word_n"),
        greatest(size(col("ws")) - 2, lit(0)).cast("long").as("n_3grams"),
        col("dup3_pos"),
        (col("top_word_n") * 10L > size(col("ws")).cast("long") * 2L)
          .as("top_word_heavy"),
        (col("dup3_pos") * 10L >
          greatest(size(col("ws")) - 2, lit(0)).cast("long") * 3L)
          .as("repetitive"))
      .orderBy("doc_id")
      .collect()
    val perRow = SparkEntry.queries("text_repetition")(spark, sf).collect()
    assert(perRow.sameElements(exploded))
  }

  test("text_repetition plans ONE exchange (the presentation sort) — no word shuffle") {
    val df = SparkEntry.queries("text_repetition")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("hashpartitioning"), plan)
    assert("repetitionstats".r.findAllIn(plan).size == 1, plan)
  }

  test("text_entropy (codegen'd EntropyStats) equals the exploded-per-char formulation") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    // filter guards against a zero-width-split trailing "" element
    val cc = docs.select(col("doc_id"),
        explode(expr("filter(split(text, ''), x -> x != '')")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(
        sum("n").as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        max("n").as("top_char_n"))
    val bg = docs.select(col("doc_id"),
        size(array_distinct(expr(
          "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")))
          .cast("long").as("distinct_bigrams"))
    val exploded = docs.select("doc_id")
      .join(cc, "doc_id").join(bg, "doc_id")
      .select(col("doc_id"), col("n_chars"), col("distinct_chars"),
        col("top_char_n"), col("distinct_bigrams"),
        (col("top_char_n") * 6L > col("n_chars")).as("char_dominated"),
        (col("distinct_bigrams") * 3L < col("n_chars")).as("low_diversity"))
      .orderBy("doc_id")
      .collect()
    val perRow = SparkEntry.queries("text_entropy")(spark, sf).collect()
    assert(perRow.sameElements(exploded))
  }

  test("text_entropy plans ONE exchange (the presentation sort) — no char shuffle") {
    val df = SparkEntry.queries("text_entropy")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("hashpartitioning"), plan)
    assert("entropystats".r.findAllIn(plan).size == 1, plan)
  }

  test("WinnowStats handles non-ASCII text via the char-substring fallback") {
    import spark.implicits._
    // é is 2 UTF-8 bytes: byte-offset grams would diverge from char grams
    val txt = "héllo wörld around the block"
    val got = Seq((1L, txt)).toDF("doc_id", "text")
      .select(graft.functions.Native.winnowStats(col("text"), 8, 4).as("w"))
      .selectExpr("w.n_fp", "w.min_fp", "w.max_fp", "w.fp_sum")
      .head()
    val W = org.apache.spark.sql.expressions.Window
    val want = Seq((1L, txt)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 7)).as("pos"))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(expr("substring(text, pos, 8)")), 1, 12),
          16, 10).cast("long").as("h"))
      .withColumn("fp", min("h").over(
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)))
      .filter(col("pos") >= 4)
      .select("fp").distinct()
      .agg(count(lit(1)), min("fp"), max("fp"), sum("fp"))
      .head()
    assert(got == want, s"got $got want $want")
  }
}
