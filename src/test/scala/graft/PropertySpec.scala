package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions.{col, size, split, sum}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator-driven properties (SURVEY §5B): set-op algebra
  * vs brute-force Scala sets, dedup idempotence, HLL error band.
  * (Generators sampled with fixed seeds — the scalatest/scalacheck
  * bridge artifact isn't resolvable offline.)
  */
class PropertySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("pipeline_mixture: rare langs kept whole, dominant langs near target") {
    val rows = graft.operators.SampleQueries.pipelineMixture(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val target = graft.operators.SampleQueries.MixTargetPerLang
    rows.foreach { case (lang, nDocs, thr, nKept) =>
      assert(nKept <= nDocs, s"$lang kept more than exists")
      // thr saturated at the hash modulus means "keep everything"
      if (thr == 65521L) assert(nKept == nDocs, s"$lang: saturated but lossy")
      // a downsampled language must land within binomial noise of the
      // target (hash buckets are near-uniform; 3x is a loose band)
      else assert(nKept <= target * 3,
        s"$lang: kept $nKept, target $target — hash badly non-uniform")
    }
  }

  private val smallLists =
    Gen.listOfN(30, Gen.chooseNum(0L, 15L))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("union/intersect/except match Scala set algebra on generated tables") {
    for ((xs, ys) <- samples(smallLists, 5).zip(samples(smallLists, 5).reverse)) {
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      assert(a.union(b).distinct().as[Long].collect().toSet ==
        (xs.toSet ++ ys.toSet))
      assert(a.intersect(b).as[Long].collect().toSet ==
        xs.toSet.intersect(ys.toSet))
      assert(a.except(b).as[Long].collect().toSet ==
        xs.toSet.diff(ys.toSet))
    }
  }

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    for (texts <- samples(Gen.listOfN(20, Gen.oneOf("a b c", "d e f", "g h i")), 3)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      import org.apache.spark.sql.functions._
      def dedup(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(sha2(col("text"), 256).as("h"))
          .agg(min("doc_id").as("doc_id"), first("text").as("text"))
          .select("doc_id", "text")
      val once = dedup(docs).collect().toSet
      val twice = dedup(dedup(docs)).collect().toSet
      assert(once.map(r => (r.getLong(0), r.getString(1))) ==
        twice.map(r => (r.getLong(0), r.getString(1))))
    }
  }

  test("approx_percentile stays within 2% of the exact percentile per group") {
    import org.apache.spark.sql.functions._
    val exact = SparkEntry.queries("agg_quantile")(spark, sf)
      .select("o_orderpriority", "p50").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = Tables.t(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)").as("p50_approx"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.nonEmpty)
    approx.foreach { case (k, v) =>
      val e = exact(k)
      assert(math.abs(v - e) / e <= 0.02, s"$k: approx $v vs exact $e")
    }
    // the declared query publishes this as the in-band invariant —
    // every group must report true (what the driver oracle hash-checks)
    val bands = SparkEntry.queries("agg_approx_quantile")(spark, sf)
      .select("p50_in_band").collect().map(_.getBoolean(0))
    assert(bands.nonEmpty && bands.forall(identity))
  }

  test("approx_count_distinct stays within 5% of exact on events users") {
    val e = Tables.t(spark, sf, "events")
    val exact = e.select("user_id").distinct().count().toDouble
    val approx = e.agg(
      org.apache.spark.sql.functions.approx_count_distinct("user_id"))
      .collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }

  test("agg_sketch_union: merged HLL sketches within 5% of exact per type") {
    val exact = Tables.t(spark, sf, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the declared query now publishes the band invariant directly
    // (oracle-checked); here we re-verify it AND the raw merged
    // estimate the published boolean summarizes
    SparkEntry.queries("agg_sketch_union")(spark, sf).collect().foreach { r =>
      val tpe = r.getString(0)
      assert(r.getLong(1) == 2, "two half-sketches per type")
      assert(r.getBoolean(2), s"$tpe: union estimate out of 5% band")
      assert(r.getLong(3) == exact(tpe), s"$tpe: exact count drifted")
    }
    val raw = Tables.t(spark, sf, "events")
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.hll_sketch_estimate(
        org.apache.spark.sql.functions.hll_sketch_agg(
          org.apache.spark.sql.functions.col("user_id"))).as("ap"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    raw.foreach { case (tpe, approx) =>
      val ex = exact(tpe).toDouble
      assert(math.abs(approx - ex) / ex <= 0.05,
        s"$tpe: raw sketch estimate $approx vs exact $ex")
    }
  }

  test("minhash pair generation only ever pairs doc_a < doc_b, no self-pairs") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    DedupQueries.minhashPairs(docs).as[(Long, Long)].collect()
      .foreach { case (a, b) => assert(a < b) }
  }

  test("stream_session sessions per user are >= 1 and <= event count") {
    val rows = SparkEntry.queries("stream_session")(spark, sf)
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (_, nSessions, nEvents) =>
      assert(nSessions >= 1 && nSessions <= nEvents)
    }
  }

  test("contamination cap drops a ubiquitous gram but keeps rare overlaps") {
    // doc_ids chosen for their hash buckets: 24/33 are eval (>= 95),
    // 0..13 are train (< 95). One boilerplate gram spans 12 train docs
    // (df = 12 > cap 10) and eval doc 24; one rare gram spans train
    // docs 12,13 (df = 2) and eval doc 33. The capped join must report
    // ONLY doc 33 — the boilerplate overlap is dropped by spec, the
    // rare overlap carries its exact df.
    val ubiq = "common words appear every where"
    val rare = "rare secret test leak phrase"
    val docs = ((0 to 11).map(id => (id.toLong, ubiq)) ++
      Seq(12L -> rare, 13L -> rare, 24L -> ubiq, 33L -> rare)).toDF("doc_id", "text")
    val out = graft.operators.TextQueries.contaminationFrom(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((33L, 1L, 2L)),
      s"expected only the rare-gram overlap to survive the cap, got $out")
  }

  test("pipeline_pack_sequences: exact token conservation and boundary splits") {
    val L = graft.operators.TextQueries.PackSeqLen
    val rows = graft.operators.TextQueries.pipelinePackSequences(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // sequences are contiguous from 0 and every one but the tail holds
    // exactly L tokens — the packing leaves no holes and no overflow
    assert(rows.map(_._1) == (0L until rows.length.toLong))
    rows.init.foreach { case (id, _, nTok, _, _) =>
      assert(nTok == L, s"seq $id has $nTok tokens, want $L") }
    assert(rows.last._3 >= 1 && rows.last._3 <= L)
    // token conservation: packed tokens == corpus tokens
    val total = graft.Tables.t(spark, sf, "documents")
      .select(sum(size(split(col("text"), " ")).cast("long"))).as[Long].head()
    assert(rows.map(_._3).sum == total)
    // adjacent sequences share their boundary doc unless the cut fell
    // exactly between docs — i.e. docs genuinely split across bounds
    val splits = rows.sliding(2).count {
      case Seq(a, b) => a._5 == b._4
      case _         => false
    }
    assert(splits > 0, "no document ever spanned a sequence boundary")
    // brute-force replay: sequential offsets over the collected corpus
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    var off = 0L
    val expect = docs.flatMap { case (id, n) =>
      val spans = (off / L to (off + n - 1) / L).map { s =>
        (s, math.min(off + n, (s + 1) * L) - math.max(off, s * L), id)
      }
      off += n
      spans
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, xs) =>
      (s, xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).min, xs.map(_._3).max)
    }
    assert(rows == expect)
  }

  test("text_pii_scrub match counts equal exactly the injected PII") {
    // doc_id % 3 != 0 docs get one email, doc_id % 2 == 0 one phone;
    // the regexes must find precisely those — no miss, no double
    // count, and no accidental match inside the base corpus text
    val rows = SparkEntry.queries("text_pii_scrub")(spark, sf)
      .as[(Long, Int, Int, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nEmails, nPhones, md5) =>
      assert(nEmails == (if (id % 3 != 0) 1 else 0), s"doc $id emails")
      assert(nPhones == (if (id % 2 == 0) 1 else 0), s"doc $id phones")
      assert(md5.length == 32)
    }
  }

  test("pipeline_anonymize: every released group is k-anonymous") {
    val k = graft.operators.SampleQueries.AnonK
    val rows = SparkEntry.queries("pipeline_anonymize")(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the UNCONDITIONAL invariant: no suppressed bucket is emitted at
    // all, and every released group has >= k rows — the whole output
    // is k-anonymous, not "k-anonymous except one exempted row"
    rows.foreach { case (ql, qs, n, _) =>
      assert(!(ql == "*" && qs == "*"), "suppressed bucket leaked into release")
      assert(n >= k, s"released group ($ql,$qs) has $n < $k rows")
    }
    // conservation: released + driver-replayed suppressed == corpus.
    // Replay the lattice: level-1 groups < k generalize to (lang,'*');
    // langs whose generalized pool is still < k are suppressed.
    val level1 = Tables.t(spark, sf, "documents")
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val n2 = level1.toSeq.filter(_._2 < k)
      .groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val suppressed = n2.values.filter(_ < k).sum
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_._3).sum + suppressed == nDocs,
      s"released ${rows.map(_._3).sum} + suppressed $suppressed != $nDocs")
    // generalized rows really were un-releasable at level 1: a ('l','*')
    // group only exists if SOME (l, source) group was < k
    rows.filter(r => r._2 == "*" && r._1 != "*").foreach { case (ql, _, _, _) =>
      assert(level1.exists { case ((l, _), n) => l == ql && n < k },
        s"($ql,*) exists but every ($ql, source) group was already >= $k")
    }
  }

  test("win_rolling_quantile: day-grid window equals the explode-x7 formulation") {
    // r16 rewrite guard: the declared query moved from the r8 fan-out
    // (events x7 through one exchange) to a pre-aggregated day-grid
    // range-frame window with integer-ceil discrete-quantile selection
    // (element_at(sorted, ceil(q*n)) == percentile_disc). The two
    // shapes must agree ROW-FOR-ROW — on sf0.001 and on sf0.01, whose
    // group sizes exercise both ceil parities and multi-day frames.
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val grid = graft.operators.WindowQueries.winRollingQuantile(spark, dir)
      val fan = graft.operators.WindowQueries.winRollingQuantileFanout(spark, dir)
      assert(grid.schema.map(f => (f.name, f.dataType)) ==
        fan.schema.map(f => (f.name, f.dataType)))
      assert(grid.collect().toSeq == fan.collect().toSeq)
    }
  }

  test("win_ewma matches the driver-side 8-tap recurrence per user") {
    // replay the truncated EWMA in plain Scala over the same integer
    // cents and compare every output row — proves the fan-out
    // aggregation IS the 8-tap weighted mean, not something near it
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val expect = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
        .map(e => (e._2, math.floor(e._4 * 100 + 0.5).toLong))
      ordered.zipWithIndex.map { case ((id, _), i) =>
        val taps = ordered.slice(math.max(0, i - 7), i + 1).reverse
          .zipWithIndex.map { case ((_, c), k) => (c * (1L << (7 - k)), 1L << (7 - k)) }
        val (num, den) = (taps.map(_._1).sum, taps.map(_._2).sum)
        (u, id) -> (math.floor(num.toDouble / den / 100.0 * 10000.0 + 0.5) / 10000.0)
      }
    }.toMap
    val got = SparkEntry.queries("win_ewma")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (u, id, ewma) =>
      assert(ewma == expect((u, id)), s"user $u event $id")
    }
  }

  test("agg_ttest: t=0 on identical samples, sign flips with direction") {
    // purchase-vs-click on real data: t's sign must equal the sign of
    // the mean difference, and Welch df must lie in [min(n)-1, n1+n2-2]
    val rows = SparkEntry.queries("agg_ttest")(spark, sf)
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(rows.length == 10) // 5 choose 2
    rows.foreach { case (a, b, na, nb, t, df) =>
      assert(a < b)
      assert(df >= math.min(na, nb) - 1 - 1e-6, s"$a/$b df below Welch floor")
      assert(df <= na + nb - 2 + 1e-6, s"$a/$b df above pooled ceiling")
      assert(math.abs(t) < 50, s"$a/$b absurd t on same-shaped synthetic data")
    }
  }

  test("agg_gini: bounds hold and a driver-side replay agrees per type") {
    val rows = SparkEntry.queries("agg_gini")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length == 5)
    val raw = Tables.t(spark, sf, "events")
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    rows.foreach { case (et, n, total, g) =>
      val xs = raw.filter(_._1 == et).sortBy(t => (t._3, t._2)).map(_._3)
      assert(xs.length == n, s"$et n")
      assert(xs.sum == total, s"$et total")
      val iw = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      val expect = math.floor(((2.0 * iw - (n + 1.0) * total)
        / (n.toDouble * total)) * 10000.0 + 0.5) / 10000.0
      assert(g == expect, s"$et gini")
      assert(g >= 0.0 && g < 1.0, s"$et gini out of [0,1)")
    }
  }

  test("agg_autocorr: r bounded, pair counts equal the lag-covered days") {
    val rows = SparkEntry.queries("agg_autocorr")(spark, sf)
      .as[(Int, Long, Double)].collect()
    assert(rows.length == 3)
    val daily = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.expr("ts_s div 86400").as("day"))
      .count().as[(Long, Long)].collect().toMap
    rows.foreach { case (k, n, r) =>
      val pairs = daily.keys.count(d => daily.contains(d + k))
      assert(pairs == n, s"k=$k pair count")
      assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9, s"k=$k r=$r out of range")
    }
  }

  test("win_dense_rank: ties make rank skip while dense_rank stays dense") {
    val rows = SparkEntry.queries("win_dense_rank")(spark, sf)
      .as[(String, Long, Long, Int, Int)].collect()
    assert(rows.exists(r => r._4 != r._5),
      "no tie exercised the rank/dense_rank divergence — fixture changed?")
    rows.groupBy(_._1).values.foreach { g =>
      val dr = g.map(_._5)
      assert(dr.distinct.sorted.sameElements(1 to dr.max),
        "dense ranks must have no holes")
      g.foreach(r => assert(r._4 >= r._5, "rank below dense_rank"))
    }
  }

  test("agg_heatmap: grid bounded, counts cover every event exactly once") {
    val rows = SparkEntry.queries("agg_heatmap")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length <= 168)
    rows.foreach { case (dow, hour, n, _) =>
      assert(dow >= 0 && dow <= 6 && hour >= 0 && hour <= 23)
      assert(n >= 1)
    }
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum == total, "heatmap must cover every event")
  }

  test("win_pct_change: day coverage and an exact spot replay") {
    val rows = SparkEntry.queries("win_pct_change")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val daily = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.expr("ts_s div 86400").as("day"))
      .count().as[(Long, Long)].collect().sortBy(_._1)
    // one row per observed day except the first; prev = the previous
    // OBSERVED day (calendar gaps don't null the lag)
    val expected = daily.zip(daily.tail).map { case ((d0, n0), (d1, n1)) =>
      (d1, n1, n0,
        math.floor(100.0 * (n1 - n0.toDouble) / n0 * 10000.0 + 0.5) / 10000.0)
    }
    assert(rows.toSeq == expected.toSeq)
  }

  test("agg_benford: digits 1-9, counts cover every positive-cent event") {
    val rows = SparkEntry.queries("agg_benford")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.map(_._1).forall(d => d >= 1 && d <= 9))
    val pos = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions
        .expr("cast(floor(value * 100 + 0.5) as long) > 0")).count()
    assert(rows.map(_._2).sum == pos, "benford must cover every positive value")
    // expected shares sum to ~100%
    val totalPct = (1 to 9).map(d => math.log10(1.0 + 1.0 / d) * 100).sum
    assert(math.abs(totalPct - 100.0) < 1e-9)
  }

  test("agg_winsorized: clamp bounds hold and the mean replays exactly") {
    val rows = SparkEntry.queries("agg_winsorized")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.length == 5)
    val raw = Tables.t(spark, sf, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def disc(xs: Seq[Long], p: Double): Long = {
      val s = xs.sorted; s((math.ceil(p * s.length) - 1).toInt)
    }
    rows.foreach { case (et, n, lo, hi, wmean) =>
      val xs = raw.filter(_._1 == et).map(_._2).toSeq
      assert(lo == disc(xs, 0.05) && hi == disc(xs, 0.95), s"$et bounds")
      assert(lo <= hi)
      val sw = xs.map(x => math.max(lo, math.min(hi, x))).sum
      val expect = math.floor(sw.toDouble / n * 10000.0 + 0.5) / 10000.0
      assert(wmean == expect, s"$et wmean")
    }
  }

  test("scalar_format: fixed-width, hex and money renderings replay") {
    val rows = SparkEntry.queries("scalar_format")(spark, sf)
      .as[(Long, String, String, String, String)].collect()
    val vals = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), math.floor(r.getDouble(2) * 100 + 0.5).toLong)).toMap
    rows.foreach { case (id, padded, hexId, money, tag) =>
      val (et, cents) = vals(id)
      assert(padded == f"$id%08d", s"$id padded")
      assert(hexId == java.lang.Long.toHexString(id), s"$id hex")
      assert(money == s"${cents / 100}.${"%02d".format(cents % 100)}", s"$id money")
      assert(tag == s"ev-$id/$et", s"$id tag")
    }
  }

  test("agg_mad: both medians equal a sequential lower-median replay") {
    val rows = SparkEntry.queries("agg_mad")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 5)
    val raw = Tables.t(spark, sf, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def discMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((math.ceil(0.5 * s.length) - 1).toInt)
    }
    rows.foreach { case (et, n, med, mad) =>
      val xs = raw.filter(_._1 == et).map(_._2).toSeq
      assert(xs.length == n, s"$et n")
      val m = discMedian(xs)
      assert(med == m, s"$et median")
      assert(mad == discMedian(xs.map(x => math.abs(x - m))), s"$et mad")
    }
  }

  test("agg_diversity: Simpson matches exact counts; bounds hold") {
    val rows = SparkEntry.queries("agg_diversity")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    val raw = Tables.t(spark, sf, "documents")
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.foreach { case (src, nLangs, nDocs, d) =>
      val cs = raw.filter(_._1 == src).groupBy(_._2).map(_._2.length.toLong)
      assert(cs.size == nLangs && cs.sum == nDocs, s"$src counts")
      val ss = cs.map(c => c * c).sum
      val expect = math.floor(
        (1.0 - ss.toDouble / (nDocs.toDouble * nDocs)) * 10000.0 + 0.5) / 10000.0
      assert(d == expect, s"$src simpson")
      assert(d >= 0.0 && d < 1.0, s"$src simpson out of [0,1)")
    }
  }

  test("agg_chisq: full grid, integer marginals consistent") {
    val rows = SparkEntry.queries("agg_chisq")(spark, sf)
      .as[(String, String, Long, Double, Double)].collect()
    val langs = rows.map(_._1).distinct
    val sources = rows.map(_._2).distinct
    assert(rows.length == langs.length * sources.length, "grid has holes")
    // observed marginals must reproduce the documents table exactly
    val total = rows.map(_._3).sum
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(total == nDocs, "cell counts don't sum to N")
    rows.foreach { case (l, src, o, e, contrib) =>
      assert(e > 0, s"$l/$src zero expected mass")
      assert(contrib >= 0)
      if (o == 0) assert(contrib > 0, s"$l/$src zero cell must still contribute")
    }
  }

  test("sample_reservoir: exactly K rows, ranked by priority, drawn from events") {
    val rows = SparkEntry.queries("sample_reservoir")(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.length == graft.operators.SampleQueries.ReservoirK)
    assert(rows.map(_._1).toSeq == (1 to rows.length), "rank gap")
    val prios = rows.map(_._4)
    assert(prios.sameElements(prios.sorted), "not priority-ordered")
    rows.foreach { case (_, eid, _, prio) =>
      assert(prio == ((eid * 40503L + 17L) % 65521L), "priority not the key hash")
    }
  }

  test("sample_weighted: length-biased — sample mean n_chars beats corpus mean") {
    val rows = SparkEntry.queries("sample_weighted")(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.length == graft.operators.SampleQueries.WeightedK)
    val corpusAvg = Tables.t(spark, sf, "documents")
      .agg(org.apache.spark.sql.functions.avg("n_chars")).as[Double].head()
    val sampleAvg = rows.map(_._3).sum.toDouble / rows.length
    assert(sampleAvg > corpusAvg,
      s"weighted sample avg $sampleAvg not above corpus avg $corpusAvg")
  }

  test("pipeline_dp_histogram: bounded noise, release = truth + noise") {
    val rows = SparkEntry.queries("pipeline_dp_histogram")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, noise, noisy) =>
      assert(math.abs(noise) <= 5, s"$lang: noise $noise outside the clamp")
      assert(noisy == n + noise, s"$lang: release drifted from truth+noise")
    }
  }

  test("infer_naive_bayes: confusion matrix covers exactly the test split") {
    val rows = SparkEntry.queries("infer_naive_bayes")(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val testDocs = Tables.t(spark, sf, "documents")
      .where("((doc_id * 40503 + 17) % 65521) % 100 >= " +
        graft.operators.InferenceQueries.NbTrainPct)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("doc_id"))
      .as[(Long, Long)].head()
    assert(rows.map(_._3).sum == testDocs._1, "confusion counts ≠ test docs")
    assert(rows.map(_._4).sum == testDocs._2, "id-sum conservation broken")
    // the classifier must beat chance: diagonal mass over total above
    // 1/|langs| (the languages are near-balanced in the fixture)
    val diag = rows.filter(r => r._1 == r._2).map(_._3).sum
    val nLangs = rows.map(_._1).distinct.length
    assert(diag.toDouble / testDocs._1 > 1.0 / nLangs,
      s"NB accuracy ${diag.toDouble / testDocs._1} no better than chance")
  }

  test("profile_corr_matrix: full 6-pair matrix, bounds, constant n") {
    val rows = SparkEntry.queries("profile_corr_matrix")(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.length == 6, "pair matrix has holes")
    assert(rows.map(_._2).distinct.length == 1, "pairs saw different row counts")
    rows.foreach { case (pair, _, corr) =>
      assert(corr >= -1.0 && corr <= 1.0, s"$pair corr $corr out of [-1,1]")
    }
  }

  test("agg_cms_estimate: one-sided error — estimates never fall below exact") {
    val rows = SparkEntry.queries("agg_cms_estimate")(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val exact = Tables.t(spark, sf, "events")
      .where("user_id < 10").groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(rows.length == exact.size, "a probe user lost its estimate")
    rows.foreach { case (u, est, ex, neverUnder) =>
      assert(ex == exact(u), s"user $u exact count drifted")
      assert(est >= ex, s"user $u: CMS underestimated ($est < $ex)")
      assert(neverUnder, s"user $u: invariant column wrong")
    }
  }

  test("agg_moments: variance nonnegative, kurtosis above its algebraic floor") {
    val rows = SparkEntry.queries("agg_moments")(spark, sf)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, mean, variance, skew, kurt) =>
      assert(n > 0 && variance >= 0.0, s"$et negative variance")
      assert(mean >= 0.0, s"$et negative mean of nonnegative cents")
      // Pearson's inequality: kurtosis >= skew^2 + 1, so excess
      // kurtosis >= skew^2 - 2 for ANY distribution (r4 slack)
      assert(kurt >= skew * skew - 2.0 - 1e-3,
        s"$et kurt $kurt below the skew^2-2 floor")
    }
  }

  test("sim_rank_fusion: every fused hit comes from an index, rrf replays") {
    val fused = SparkEntry.queries("sim_rank_fusion")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5))))
    assert(fused.nonEmpty)
    val lsh = graft.operators.SimilarityQueries.simAnnLsh(spark, sf)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = graft.operators.SimilarityQueries.simAnnIvf(spark, sf)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    fused.foreach { case (q, frank, n, rrf, lshR, ivfR) =>
      assert(frank >= 1 && frank <= 3)
      assert(lshR.isDefined == lsh((q, n)), s"($q,$n) lsh membership drift")
      assert(ivfR.isDefined == ivf((q, n)), s"($q,$n) ivf membership drift")
      val expect = lshR.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        ivfR.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf == expect, s"($q,$n) rrf $rrf != $expect")
    }
  }

  test("pipeline_chunk: chunks tile every document with exact overlap accounting") {
    val rows = SparkEntry.queries("pipeline_chunk")(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val nChars = Tables.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(rows.length == nChars.size, "a document lost its chunk manifest")
    val overlap = graft.operators.TextQueries.ChunkLen -
      graft.operators.TextQueries.ChunkStride
    rows.foreach { case (doc, k, chars, covered) =>
      assert(covered, s"doc $doc not fully covered")
      // overlapping tiles: total chunk chars = n_chars + overlap*(k-1)
      assert(chars == nChars(doc) + overlap * (k - 1),
        s"doc $doc: chunk chars $chars don't tile ${nChars(doc)}")
    }
  }

  test("pipeline_bpe_train: sequential Scala replay reproduces every merge rule") {
    val got = SparkEntry.queries("pipeline_bpe_train")(spark, sf)
      .as[(Int, String, Long, String, Long, Long)].collect().toSeq
    assert(got.length == graft.operators.TextQueries.BpeRounds)
    // plain-Scala BPE trainer over the collected corpus
    var texts = Tables.t(spark, sf, "documents")
      .select("text").as[String].collect().toSeq
    got.foreach { case (r, pair, pairN, sym, before, after) =>
      assert(before == texts.map(_.length.toLong).sum, s"round $r: chars_before")
      val counts = scala.collection.mutable.Map.empty[String, Long]
      texts.foreach { t =>
        (0 until t.length - 1).foreach { i =>
          val g = t.substring(i, i + 2)
          counts(g) = counts.getOrElse(g, 0L) + 1
        }
      }
      val (bestG, bestC) = counts.toSeq.minBy { case (g, c) => (-c, g) }
      assert(bestG == pair && bestC == pairN, s"round $r: merge rule drift")
      texts = texts.map(_.replace(pair, sym)) // Java replace: L-to-R non-overlap
      assert(after == texts.map(_.length.toLong).sum, s"round $r: chars_after")
      // each merge shrinks by (len(pair) - 1) == 1 char per applied merge,
      // and overlapping grams mean applied merges <= counted pairs
      assert(before - after <= pairN, s"round $r: merged more than counted")
      assert(before - after > 0, s"round $r: merge applied nothing")
    }
  }

  test("pipeline_bpe_apply conserves the trained corpus totals per doc") {
    val apply = SparkEntry.queries("pipeline_bpe_apply")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val train = SparkEntry.queries("pipeline_bpe_train")(spark, sf)
      .as[(Int, String, Long, String, Long, Long)].collect()
    // the corpus the rules compress is the corpus the manifest sums to
    assert(apply.map(_._2).sum == train.head._5, "orig chars drift")
    assert(apply.map(_._3).sum == train.last._6, "rewritten chars drift")
    apply.foreach { case (doc, nc, nt, pct) =>
      assert(nt <= nc, s"doc $doc grew under BPE")
      assert(pct == 100 * (nc - nt) / nc, s"doc $doc: saved_pct formula drift")
    }
  }

  test("profile_dq_rules: pass flags replay and the strict rule fails") {
    val rows = SparkEntry.queries("profile_dq_rules")(spark, sf)
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.length == 5)
    rows.foreach { case (r, m, t, p) =>
      assert(m >= 0 && m <= 10000, s"$r metric out of basis-point range")
      assert(p == (m >= t), s"$r: passed flag contradicts metric")
    }
    // the deliberately-strict range rule must demonstrate a failure
    assert(rows.collect { case (r, _, _, false) => r }.toSeq ==
      Seq("range_value_lt100"))
  }

  test("text_collocations: support floor holds and lift is positive") {
    val rows = SparkEntry.queries("text_collocations")(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty &&
      rows.length <= graft.operators.TextQueries.ColTopK)
    val lifts = rows.map(_._6)
    assert(lifts.sameElements(lifts.sorted.reverse), "not lift-ranked")
    rows.foreach { case (w1, w2, n, c1, c2, lift) =>
      assert(n >= graft.operators.TextQueries.ColMinCount, s"$w1 $w2 below support")
      assert(n <= math.min(c1, c2), s"$w1 $w2: joint count exceeds a marginal")
      assert(lift > 0, s"$w1 $w2: nonpositive lift")
    }
  }

  test("sample_balance: every class kept at exactly the minority count, via the boundary bucket") {
    val rows = graft.operators.SampleQueries.sampleBalance(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_orig"), r.getAs[Long]("n_kept")))
    val nMin = rows.map(_._2).min
    rows.foreach { case (c, _, kept) =>
      assert(kept == nMin, s"$c kept $kept != minority $nMin") }
    // majority classes were genuinely cut (the boundary logic ran)
    assert(rows.exists { case (_, orig, kept) => orig > kept },
      "no class was downsampled — the selection never exercised a boundary")
  }

  test("agg_paths: paths are <=3 valid segments and user counts total the user base") {
    val rows = graft.operators.AggQueries.aggPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_users")))
    val types = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { case (p, _) =>
      val segs = p.split(">")
      assert(segs.nonEmpty && segs.length <= 3 && segs.forall(types), p)
    }
    val nUsers = graft.Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum == nUsers)
  }

  test("agg_hhi and agg_pareto: concentration invariants hold") {
    val h = graft.operators.AggQueries.aggHhi(spark, sf).head()
    val (nB, hhi, cr4) = (h.getAs[Long]("n_brands"), h.getAs[Long]("hhi"),
      h.getAs[Long]("cr4_bp"))
    // perfectly even market floor ≤ HHI ≤ monopoly 10⁸; CR4 ≤ 100%
    assert(hhi >= (10000L / nB) * (10000L / nB) * nB - 10000L && hhi <= 100000000L)
    assert(cr4 > 0 && cr4 <= 10000L)
    val p = graft.operators.AggQueries.aggPareto(spark, sf).head()
    assert(p.getAs[Long]("rev_share_bp") >= 8000L)
    assert(p.getInt(0) >= 1 && p.getInt(0) <= p.getAs[Long]("n_customers"))
    assert(p.getAs[Long]("head_share_bp") <= 10000L)
  }

  test("win_cusum: the prefix-sum closed form equals Page's recursion, replayed sequentially") {
    val rows = graft.operators.WindowQueries.winCusum(spark, sf).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n"), r.getAs[Long]("k"),
        r.getAs[Long]("s_pos"), r.getAs[Long]("s_neg"))).sortBy(_._1)
    var (sp, sn) = (0L, 0L)
    rows.foreach { case (day, n, k, gotP, gotN) =>
      sp = math.max(0L, sp + (n - k))
      sn = math.max(0L, sn + (k - n))
      assert(gotP == sp && gotN == sn,
        s"day $day: closed form ($gotP,$gotN) != recursion ($sp,$sn)")
    }
  }

  test("agg_bloom: no false negatives ever; false positives exist at sf0.01+ (the one-sided trade)") {
    val rows = graft.operators.AggQueries.aggBloom(spark, sf).collect()
      .map(r => (r.getBoolean(1), r.getBoolean(2))) // (in_bloom, is_member)
    rows.foreach { case (inB, mem) =>
      assert(!mem || inB, "FALSE NEGATIVE — bloom's defining invariant broken") }
    assert(rows.exists(_._2), "no true members probed")
    // at sf0.001 EVERY user id is < 64, so all probes are members and
    // no negative exists to collide; the 22-FP collision evidence is
    // pinned by the sf0.01 oracle hash instead — here only check that
    // when negatives exist, the filter isn't saturated into all-true
    val negatives = rows.filter(!_._2)
    if (negatives.nonEmpty)
      assert(negatives.exists(!_._1), "every non-member hit — filter saturated")
  }

  test("agg_rfm: segment counts conserve the customer base and scores stay in 1..3") {
    val rows = graft.operators.AggQueries.aggRfm(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = graft.Tables.t(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(total == nCust, s"segments hold $total customers, base has $nCust")
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach(c =>
        assert(r.getAs[Long](c) >= 1 && r.getAs[Long](c) <= 3)) }
  }

  test("agg_decay: scores bounded by 16384·n and monotone in recency share") {
    val rows = graft.operators.AggQueries.aggDecay(spark, sf).collect()
    rows.foreach { r =>
      val (n, score) = (r.getAs[Long]("n"), r.getAs[Long]("decay_score"))
      assert(score >= 0 && score <= 16384L * n,
        s"${r.getString(0)}: score $score outside [0, 16384·$n]")
    }
  }

  test("profile_drift: PSI contributions are non-negative and shares are basis-point-consistent") {
    // (p−q)·ln(p∕q) ≥ 0 for all p,q > 0 — a negative contribution
    // means the formula (or the rounding) broke
    val rows = graft.operators.AggQueries.profileDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("psi_contrib") >= 0.0,
        s"${r.getString(0)}: negative PSI contribution")
      assert(r.getAs[Long]("p_bp") <= 10000L && r.getAs[Long]("q_bp") <= 10000L)
    }
  }
}
