package graft

import graft.operators.InferenceQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-fidelity assertions for the inference layer — including
  * the reference's core performance contract: the model is
  * materialized exactly once per partition (ipynb:99, R19).
  */
class InferenceSpec extends AnyFunSuite with SparkFixture {

  test("infer_mappartitions loads the model file exactly once per partition") {
    val df = InferenceQueries.inferMapPartitions(spark, sf)
    val parts = graft.Tables.t(spark, sf, "embeddings").rdd.getNumPartitions
    InferenceQueries.modelLoads.set(0)
    df.count()
    assert(InferenceQueries.modelLoads.get() == parts,
      s"expected $parts loads, got ${InferenceQueries.modelLoads.get()}")
  }

  test("infer_arrow_batches: columnar round trip is lossless, batch boundaries invisible") {
    // the Arrow path must equal the plain row-iterator path bit-for-bit
    val arrow = InferenceQueries.inferArrowBatches(spark, sf).collect().toSeq
    val plain = InferenceQueries.inferMapPartitions(spark, sf).collect().toSeq
    assert(arrow == plain, "Arrow encode/score/decode diverged from row scoring")
    // the columnar boundary was genuinely crossed: >= ceil(rows/batch)
    // record batches were built for the 500-row corpus
    InferenceQueries.arrowBatchesBuilt.set(0)
    InferenceQueries.inferArrowBatches(spark, sf).count()
    val rows = graft.Tables.t(spark, sf, "embeddings").count()
    val minBatches = (rows + InferenceQueries.ArrowBatchRows - 1) /
      InferenceQueries.ArrowBatchRows
    assert(InferenceQueries.arrowBatchesBuilt.get() >= minBatches,
      s"expected >= $minBatches Arrow batches, got ${InferenceQueries.arrowBatchesBuilt.get()}")
    // batch-size invariance, driven directly on the partition kernel:
    // 8-row and 256-row batching must emit identical rows in order
    val sample = (0 until 40).map(i =>
      (i.toLong, Seq.tabulate(InferenceQueries.Dim)(j => (i * 31 + j * 7 % 13 - 6).toFloat / 8f), i % 10))
    val w = InferenceQueries.weights
    val out8 = InferenceQueries.arrowScorePartition(sample.iterator, w, 8).toSeq
    val out256 = InferenceQueries.arrowScorePartition(sample.iterator, w, 256).toSeq
    assert(out8 == out256, "batch boundary leaked into scoring results")
  }

  test("SparkFiles-distributed weights parse bit-identical to the in-JVM matrix (R15)") {
    InferenceQueries.ensureWeightsFile(spark)
    val fromFile = InferenceQueries.loadModelFromFile()
    val direct = InferenceQueries.weights
    assert(fromFile.length == direct.length)
    fromFile.zip(direct).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq) // Double.toString round-trip is exact
    }
  }

  test("argmax is never decided by FP noise: top-2 score margin is wide (sf0.01)") {
    // The DuckDB oracle replays sum(x*w) with unspecified accumulation
    // order; a near-tie between two class scores could flip `pred`
    // between engines (ADVICE r01). Guard: on the data the driver
    // actually verifies, the winning score must beat the runner-up by
    // far more than any plausible 64-term reassociation error (~1e-13
    // relative ⇒ absolute ~1e-11 at these magnitudes).
    val w = InferenceQueries.weights
    val rows = graft.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
      .select("embedding").collect()
    assert(rows.nonEmpty)
    val minMargin = rows.iterator.map { r =>
      val emb = r.getSeq[Float](0)
      val scores = w.map { wc =>
        var s0 = 0.0; var i = 0
        while (i < emb.length) { s0 += emb(i).toDouble * wc(i); i += 1 }
        s0
      }.sorted
      scores(scores.length - 1) - scores(scores.length - 2)
    }.min
    assert(minMargin > 1e-6, s"min top-2 margin $minMargin is flip-prone")
  }

  test("predictions are valid class ids and accuracy is in [0,1]") {
    val rows = InferenceQueries.inferMapPartitions(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) < InferenceQueries.NumClasses))
    val acc = rows.count(r => r.getInt(1) == r.getInt(2)).toDouble / rows.length
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("MeanXml: the artifact path is injectable — a relocated copy parses identically (r14 verdict item 4)") {
    // env override SPARK_GRAFT_MEAN_XML exists since r2; this pins the
    // path-parameter injection seam it rides on with a RELOCATED copy,
    // so udf_scalar/infer_mean_xml survive any environment where the
    // /root/reference checkout moves (JVM env is immutable in-test, so
    // the parameterized parse is the testable half of the override).
    val orig = graft.sources.MeanXml.parse()
    val moved = java.nio.file.Files.createTempFile("graft_mean_moved", ".xml")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(graft.sources.MeanXml.path), moved,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val relocated = graft.sources.MeanXml.parse(moved.toString)
      assert(relocated.toSeq == orig.toSeq,
        "relocated artifact must parse bit-identically")
      assert(relocated.length == 3072)
    } finally java.nio.file.Files.deleteIfExists(moved): Unit
  }

  test("udf_scalar mean-subtract equals the zip_with built-in") {
    import spark.implicits._
    val viaUdf = InferenceQueries.udfScalar(spark, sf)
      .as[(Long, Int, Double)].collect().toSeq
    val mean = array((0 until InferenceQueries.Dim)
      .map(i => lit(InferenceQueries.meanAt(i))): _*)
    val viaBuiltin = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"),
        posexplode(zip_with(col("embedding"), mean,
          (x, m) => x.cast("double") - m)))
      .select(col("vec_id"), (col("pos") + 1).as("pos"), Fp.r4(col("col")))
      .orderBy("vec_id", "pos")
      .as[(Long, Int, Double)].collect().toSeq
    assert(viaUdf == viaBuiltin)
  }

  test("infer_train: loss strictly decreases; slope converges to chars-per-word") {
    import spark.implicits._
    val rows = InferenceQueries.inferTrain(spark, sf)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == (1 to InferenceQueries.TrainIters),
      "one row per iteration, ordered")
    val losses = rows.map(_._4)
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss must strictly decrease each GD step: $losses")
    }
    // true ratio on this corpus ≈ 5.5 chars/word; scaled by 1e6
    val finalSlope = rows.last._2
    assert(finalSlope > 4500000L && finalSlope < 6500000L,
      s"slope $finalSlope should approach the corpus chars-per-word ratio")
  }

  test("infer_train is deterministic across runs") {
    val a = InferenceQueries.inferTrain(spark, sf).collect()
    val b = InferenceQueries.inferTrain(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("infer_train trajectory equals a sequential driver-side replay") {
    import InferenceQueries.{TrainIters, TrainScale, TrainLrDen, TrainLossDiv}
    // partition-order independence, tested concretely: the distributed
    // gradient steps must be BIT-IDENTICAL to a single-threaded replay
    val docs = Tables.t(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("x"),
        col("n_chars").cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var (a, b) = (0L, 0L)
    val expect = (1 to TrainIters).map { it =>
      var loss = 0L; var sxr = 0L; var sr = 0L
      docs.foreach { case (x, y) =>
        val r = a * x + b - y * TrainScale
        val rd = r / TrainLossDiv
        loss += rd * rd; sxr += x * r; sr += r
      }
      val n = docs.length.toLong
      a -= (sxr / n) / TrainLrDen
      b -= (sr / n) / TrainLrDen
      (it, a, b, loss)
    }
    val got = InferenceQueries.inferTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("udaf centroid equals per-dimension avg via posexplode") {
    import spark.implicits._
    val viaUdaf = InferenceQueries.udafAgg(spark, sf)
      .as[(Int, Int, Double)].collect().toSeq
    val viaAvg = graft.Tables.t(spark, sf, "embeddings")
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), (col("pos") + 1).as("pos"))
      .agg(Fp.r4(avg(col("col").cast("double"))).as("mean_val"))
      .orderBy("label", "pos")
      .as[(Int, Int, Double)].collect().toSeq
    assert(viaUdaf == viaAvg)
  }

  test("infer_train_perceptron equals a sequential driver-side replay and improves") {
    // same partition-order-independence argument as infer_train: the
    // distributed epoch (codegen'd integer margins, 64-key gradient
    // aggregate) must be BIT-IDENTICAL to a single-threaded replay
    val data = graft.Tables.t(spark, sf, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map { r =>
        val y = if (r.getInt(0) % 2 == 0) 1L else -1L
        val xq = r.getSeq[Float](1)
          .map(f => math.floor(f.toDouble * 1024.0 + 0.5).toLong).toArray
        (y, xq)
      }
    val dim = InferenceQueries.Dim
    val w = Array.fill(dim)(0L)
    var b = 0L
    val expect = (1 to InferenceQueries.PercIters).map { it =>
      val mis = data.filter { case (y, xq) =>
        var m = b; var i = 0
        while (i < dim) { m += w(i) * xq(i); i += 1 }
        y * m <= 0L
      }
      mis.foreach { case (y, xq) =>
        (0 until dim).foreach(i => w(i) += y * xq(i))
      }
      b += mis.iterator.map(_._1).sum
      (it, mis.length.toLong, b, w.map(math.abs).sum,
        w.iterator.zipWithIndex.map { case (wi, i) => wi * (i + 1) }.sum)
    }
    val got = InferenceQueries.inferTrainPerceptron(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    // epoch 1 flags every row (zero weights => zero margins, y*0 <= 0);
    // training must then beat all-misclassified by a real margin
    assert(expect.head._2 == data.length.toLong)
    assert(expect.last._2 < data.length.toLong * 6 / 10,
      s"final misclassification ${expect.last._2}/${data.length} not under 60%")
  }
}
