package graft

import graft.operators.SimilarityQueries
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for similarity search: cosine bounds, brute-force/LSH
  * agreement (recall), determinism of the self-checked ANN query.
  */
class SimilaritySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("cosine values are within [-1, 1] and ranks are 1..5 per query") {
    val rows = SparkEntry.queries("sim_cosine_topk")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, rank, _, cos) =>
      assert(cos >= -1.0001 && cos <= 1.0001)
      assert(rank >= 1 && rank <= 5)
    }
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.sameElements(1 to g.length))
      // scores non-increasing with rank
      val byRank = g.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ANN-LSH results are a subset of same-bucket candidates with valid ranks") {
    val rows = SparkEntry.queries("sim_ann_lsh")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.sameElements(1 to g.length))
    }
  }

  test("ANN-LSH recall: bucketed top-1 appears in brute-force top-5 for most queries") {
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .filter(_._2 == 1)
    val hits = ann.count { case (q, _, n, _) => brute.get(q).exists(_.contains(n)) }
    assert(hits.toDouble / ann.length >= 0.3,
      s"ANN top-1 recall vs brute top-5: $hits/${ann.length}")
  }

  test("DotProductF32 (codegen) is bit-identical to the zip_with/aggregate fold") {
    import org.apache.spark.sql.functions._
    val e = Tables.t(spark, sf, "embeddings").limit(100)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = e.select(
      graft.functions.Native.dotF32(col("embedding"), col("embedding")).as("native"),
      hof.as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("ANN-IVF results have valid ranks and the candidate stage is an equi-join") {
    val df = SparkEntry.queries("sim_ann_ivf")(spark, sf)
    val rows = df.as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.sameElements(1 to g.length))
      val byRank = g.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ANN-IVF recall: probed top-1 appears in brute-force top-5 for some queries") {
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val ann = SparkEntry.queries("sim_ann_ivf")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .filter(_._2 == 1)
    assert(ann.nonEmpty)
    val hits = ann.count { case (q, _, n, _) => brute.get(q).exists(_.contains(n)) }
    assert(hits.toDouble / ann.length >= 0.2,
      s"IVF top-1 recall vs brute top-5: $hits/${ann.length}")
  }

  test("sim_ann_ivf is deterministic across runs") {
    val a = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect().map(_.toString).toSeq
    val b = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("sim_ann_lsh is deterministic across runs") {
    val a = SparkEntry.queries("sim_ann_lsh")(spark, sf).collect().map(_.toString).toSeq
    val b = SparkEntry.queries("sim_ann_lsh")(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("sim_ivf_pq: valid ranks, candidates respect the IVF probe structure") {
    val rows = SparkEntry.queries("sim_ivf_pq")(spark, sf)
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, rank, n, _) =>
      assert(q != n); assert(rank >= 1 && rank <= 3)
    }
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.sameElements(1 to g.length))
      val byRank = g.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        "adist must be non-decreasing with rank")
    }
    // replay the coarse quantizer driver-side from the PUBLIC seed
    // formula: every returned neighbor's rank-1 cluster must be among
    // the query's top-IvfProbes clusters — i.e. the pair really came
    // through the inverted-file candidate stage, not a global scan
    val emb = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    def clustersRanked(v: Array[Float]): Seq[Int] = {
      val q = v.map(x => math.floor(x.toDouble * 1024 + 0.5).toLong)
      (0 until SimilarityQueries.IvfClusters).map { c =>
        val d = (0 until SimilarityQueries.IvfDim).map { i =>
          val diff = q(i) * 99L - SimilarityQueries.centroidIntAt(c, i) * 1024L
          diff * diff
        }.sum
        (d, c)
      }.sorted.map(_._2)
    }
    rows.foreach { case (q, _, n, _) =>
      val probes = clustersRanked(emb(q)).take(SimilarityQueries.IvfProbes).toSet
      val nCluster = clustersRanked(emb(n)).head
      assert(probes.contains(nCluster),
        s"pair ($q,$n): neighbor cluster $nCluster not in probes $probes")
    }
  }

  test("trained IVF: k-means actually moves centroids off the seed codebook") {
    val seed = SimilarityQueries.seedCodebookInt
    val trained = SimilarityQueries.trainedCodebookInt(spark, sf)
    assert(trained.length == seed.length)
    assert(trained.exists(_.length == seed.head.length))
    val moved = seed.indices.count(c => !seed(c).sameElements(trained(c)))
    assert(moved > 0, "training left every centroid on its seed value")
  }

  test("distributed integer k-means equals a sequential driver-side replay") {
    // the partition-order-independence claim, tested concretely: the
    // cluster-parallel trajectory must be BIT-IDENTICAL to a single-
    // threaded reference run over the same quantized vectors
    val trained = SimilarityQueries.trainedCodebookInt(spark, sf)
    val vecs = Tables.t(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray
        .map(x => math.floor(x.toDouble * 1024.0 + 0.5).toLong))
    var cb = SimilarityQueries.seedCodebookInt
    for (_ <- 1 to SimilarityQueries.KmeansIters) {
      val assigned = vecs.map { q =>
        cb.indices.map { c =>
          var d = 0L
          var i = 0
          while (i < q.length) {
            val t = q(i) - cb(c)(i); d += t * t; i += 1
          }
          (d, c)
        }.min._2 // distance ties break on the lower cid, like the engine
      }
      val next = cb.indices.map { c =>
        val members = vecs.indices.filter(assigned(_) == c)
        if (members.isEmpty) cb(c)
        else cb(c).indices.map { i =>
          members.map(vecs(_)(i)).sum / members.size.toLong
        }.toArray
      }.toArray
      cb = next
    }
    assert(cb.length == trained.length)
    cb.indices.foreach { c =>
      assert(cb(c).sameElements(trained(c)),
        s"centroid $c diverged from the sequential replay")
    }
  }

  test("sim_ann_ivf_trained: valid ranks, deterministic, recall vs brute force") {
    val rows = SparkEntry.queries("sim_ann_ivf_trained")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.sameElements(1 to g.length))
    }
    val again = SparkEntry.queries("sim_ann_ivf_trained")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.toSeq == again.toSeq)
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val top1 = rows.filter(_._2 == 1)
    val hits = top1.count { case (q, _, n, _) => brute.get(q).exists(_.contains(n)) }
    assert(hits.toDouble / top1.length >= 0.3,
      s"trained-IVF top-1 recall vs brute top-5: $hits/${top1.length}")
  }

  test("ANN index roundtrip: search from the persisted index equals in-memory trained IVF") {
    // the persisted-postings path must reproduce sim_ann_ivf_trained
    // bit-for-bit (they also share the oracle SQL verbatim)
    val fromIndex = SparkEntry.queries("source_ann_index")(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val inMemory = SparkEntry.queries("sim_ann_ivf_trained")(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(fromIndex.nonEmpty && fromIndex == inMemory)
    // stats read back from the artifact cover the whole corpus exactly
    val stats = SparkEntry.queries("sink_ann_index")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    val corpus = graft.Tables.t(spark, sf, "embeddings")
    assert(stats.map(_._2).sum == corpus.count(), "postings lost/duplicated vectors")
    assert(stats.map(_._3).sum ==
      corpus.agg(org.apache.spark.sql.functions.sum("vec_id")).head().getLong(0),
      "id-sum checksum diverged")
    // the layout really is list-partitioned: cluster=<c>/ directories
    import graft.operators.SimilarityQueries
    // the index root is file:-qualified (r15, ADVICE r14) — resolve the
    // URI back to a local File for the direct layout inspection
    val idx = SimilarityQueries.ensureAnnIndex(spark, sf)
    val parts = new java.io.File(java.net.URI.create(s"$idx/postings"))
      .listFiles()
      .filter(_.getName.startsWith("cluster="))
    assert(parts.length == stats.length,
      s"${parts.length} list partitions vs ${stats.length} stat rows")
  }

  test("sim_pq: every query's own row ranks 1 (its codes minimize each subspace)") {
    val rows = SparkEntry.queries("sim_pq")(spark, sf)
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.sameElements(1 to g.length), s"ranks broken for $q")
      val r1 = g.find(_._2 == 1).get
      assert(r1._3 == q, s"query $q: rank-1 is ${r1._3}, not itself")
    }
  }

  test("sim_pq codes are in [0, 16) and encoding is deterministic") {
    import org.apache.spark.sql.functions._
    val cb = (0 until SimilarityQueries.PqM).map(m =>
      (0 until SimilarityQueries.PqK).map(c =>
        (0 until SimilarityQueries.PqSubDim).map(i =>
          SimilarityQueries.pqCentroidAt(m, c, i))))
    assert(cb.flatten.flatten.forall(v => v >= -0.5 && v <= 0.5))
    val a = SparkEntry.queries("sim_pq")(spark, sf).collect().map(_.toString).toSeq
    val b = SparkEntry.queries("sim_pq")(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
    // approx distances are non-negative and non-decreasing in rank
    SparkEntry.queries("sim_pq")(spark, sf)
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).values.foreach { g =>
        val byRank = g.sortBy(_._2).map(_._4)
        assert(byRank.forall(_ >= 0L))
        assert(byRank.zip(byRank.tail).forall { case (x, y) => x <= y })
      }
  }

  test("infer_knn: predictions equal a sequential brute-force replay") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("infer_knn")(spark, sf)
      .as[(Long, Int, Long, Int, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 10)
    val all = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)].collect()
    def dotSeq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val corpus = all.filter(_._1 >= 10)
    rows.foreach { case (q, pred, votes, truth, correct) =>
      val (_, qe, ql) = all.find(_._1 == q).get
      assert(truth == ql && correct == (pred == truth))
      val qn = math.sqrt(dotSeq(qe, qe))
      val top5 = corpus
        .map { case (id, ce, lb) =>
          (id, lb, r4(dotSeq(qe, ce) / (qn * math.sqrt(dotSeq(ce, ce))))) }
        .sortBy { case (id, _, cos) => (-cos, id) }.take(5)
      val (expPred, expVotes) = top5.groupBy(_._2).view
        .mapValues(_.length).toSeq
        .minBy { case (lb, v) => (-v, lb) }
      assert(pred == expPred, s"q=$q pred")
      assert(votes == expVotes, s"q=$q votes")
    }
  }

  test("pipeline_semdedup: reps are members, accounting covers the corpus") {
    val rows = SparkEntry.queries("pipeline_semdedup")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val nVec = Tables.t(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum == nVec,
      "cluster membership must partition the corpus")
    assert(rows.map(_._3).distinct.length == rows.length,
      "representatives must be distinct vectors")
    rows.foreach { case (c, n, rep, dist, dropped) =>
      assert(c >= 0 && c < 16)
      assert(n >= 1 && dropped == n - 1, s"cluster $c accounting")
      assert(dist >= 0, s"cluster $c negative distance")
    }
  }

  test("sim_mmr equals a sequential greedy replay and genuinely diversifies") {
    import org.apache.spark.sql.functions.col
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val vecs = graft.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      r4(d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val q = vecs(0L)
    val rel = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
    val pool = rel.sortBy { case (id, r) => (-r, id) }
      .take(graft.operators.SimilarityQueries.MmrPool)
    var sel = Vector.empty[(Long, Double)]
    for (_ <- 1 to graft.operators.SimilarityQueries.MmrK) {
      val cands = pool.filterNot(p => sel.exists(_._1 == p._1))
      val scored = cands.map { case (id, r) =>
        val score =
          if (sel.isEmpty) r4(0.7 * r)
          else r4(0.7 * r - 0.3 * sel.map(s => cos(vecs(id), vecs(s._1))).max)
        (id, score)
      }
      sel :+= scored.minBy { case (id, sc) => (-sc, id) }
    }
    val got = SparkEntry.queries("sim_mmr")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3))).toVector
    assert(got == sel, s"engine $got != replay $sel")
    // diversification is real: the MMR selection differs from the
    // pure top-relevance prefix (otherwise the penalty term is inert)
    assert(got.map(_._1) != pool.take(sel.size).map(_._1),
      "MMR selected exactly the top-relevance prefix — penalty inert")
  }

  test("superseded ANN staging trees are evicted on rebuild, other dirs untouched") {
    // r10 verdict item 3: the index family keys its tmpdir trees by
    // content signature, so every testdata regeneration used to strand
    // a full postings/checkpoint tree under the old signature. Plant
    // stale same-dir trees (a fake superseded signature) plus a
    // foreign-dir tree, rebuild at the CURRENT signature, and assert
    // exactly the stale ones are gone.
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val slug = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val staleStream = new java.io.File(tmp, s"graft_stream_ann_v1_${slug}_deadf00d")
    val staleIndex = new java.io.File(tmp, s"graft_ann_index_${slug}_deadf00d")
    // different sfDir slug — must survive (another dataset's live tree)
    val foreign = new java.io.File(tmp, s"graft_stream_ann_v1_${slug}x_deadf00d")
    Seq(staleStream, staleIndex, foreign)
      .foreach(d => assert(new java.io.File(d, "postings").mkdirs()))
    try {
      val served = SimilarityQueries.streamAnnIndex(spark, sf).collect()
      SimilarityQueries.sourceAnnIndex(spark, sf).collect(): Unit
      assert(served.nonEmpty)
      assert(!staleStream.exists, "superseded stream_ann tree survived rebuild")
      assert(!staleIndex.exists, "superseded ann_index tree survived rebuild")
      assert(foreign.exists, "eviction crossed into another sfDir's tree")
      // the current-signature tree is the keep — still present and serving
      val again = SimilarityQueries.streamAnnIndex(spark, sf).collect()
      assert(again.toSeq == served.toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      Seq(staleStream, staleIndex, foreign).foreach(rm)
    }
  }
}
