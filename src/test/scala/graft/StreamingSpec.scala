package graft

import java.sql.Timestamp

import graft.streaming.StreamQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

case class Doc(doc_id: Long, lang: String, text: String)

/** Structured-Streaming behavior: each stream_* transform run on a
  * MemoryStream must equal the same transform on the equivalent batch
  * DataFrame (SURVEY §5B), and late rows beyond the watermark must be
  * dropped.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val sample: Seq[Ev] = (0 until 200).map { i =>
    Ev(i.toLong, ts(i), i % 5L, if (i % 2 == 0) "click" else "view", i * 1.5)
  }

  /** Runs a streaming transform to completion on `rows` and returns
    * the final complete-mode result. */
  private def runStream(rows: Seq[Ev], transform: DataFrame => DataFrame,
      name: String): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val q = transform(mem.toDF()).writeStream
      .outputMode("complete").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect().map(_.toString).toSeq.sorted
  }

  test("tumbling window on a bounded stream equals the batch aggregate") {
    val streamed = runStream(sample, StreamQueries.tumblingAgg, "t_tumbling")
    val batch = StreamQueries.tumblingAgg(sample.toDF())
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(streamed.count() == 4) // 200 minutes → 4 hour-buckets
  }

  test("file-source stream (parquet directory) equals the batch tumbling aggregate") {
    // the production source shape: a landing directory of parquet files
    // discovered incrementally — two separate drops prove multi-file
    // discovery, maxFilesPerTrigger=1 forces multiple micro-batches
    val dir = java.nio.file.Files.createTempDirectory("graft_fsrc").toString
    sample.take(120).toDF().coalesce(1).write.mode("append").parquet(dir)
    sample.drop(120).toDF().coalesce(1).write.mode("append").parquet(dir)
    val sdf = spark.readStream
      .schema(sample.toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = StreamQueries.tumblingAgg(sdf).writeStream
      .outputMode("complete").format("memory").queryName("t_fsrc").start()
    try q.processAllAvailable() finally q.stop()
    val batch = StreamQueries.tumblingAgg(sample.toDF())
    assert(sortedRows(spark.table("t_fsrc")) == sortedRows(batch))
  }

  test("stream-static enrichment join equals the batch aggregate") {
    val dim = StreamQueries.typeDim.toDF("event_type", "weight", "category")
    val streamed = runStream(sample, df => StreamQueries.enrichAgg(df, dim), "t_enrich")
    val batch = StreamQueries.enrichAgg(sample.toDF(), dim)
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(streamed.count() > 0)
  }

  test("sliding window on a bounded stream equals the batch aggregate") {
    val streamed = runStream(sample, StreamQueries.slidingAgg, "t_sliding")
    val batch = StreamQueries.slidingAgg(sample.toDF())
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("parquet file sink with checkpoint persists every streamed row exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_fsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fsink_ckpt").toString
    val mem = MemoryStream[Ev]
    mem.addData(sample.take(100): _*)
    val q = mem.toDF().writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    mem.addData(sample.drop(100): _*) // second micro-batch, same query
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == sample.length)
    assert(back.select("event_id").as[Long].collect().sorted.toSeq ==
      sample.map(_.event_id).sorted)
  }

  test("foreachBatch sees every row exactly once across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val mem = MemoryStream[Ev]
    mem.addData(sample.take(80): _*)
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("event_id").collect().foreach(r => seen.add(r.getLong(0)))
        () // the sink contract wants Unit, not the last expression
      }
      .start()
    q.processAllAvailable()
    mem.addData(sample.drop(80): _*)
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted == sample.map(_.event_id).sorted)
  }

  test("incremental stream_scd2 equals the one-shot batch SCD2 and is idempotent") {
    val inc = StreamQueries.streamScd2(spark, sf).collect().toSeq
    val batch = operators.WindowQueries.pipelineScd2(spark, sf).collect().toSeq
    assert(inc == batch, "incrementally merged history diverged from batch SCD2")
    // the merge genuinely ran across micro-batches (one per time chunk)
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_scd2_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    // re-run with the same checkpoint processes nothing and is stable
    val again = StreamQueries.streamScd2(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_funnel equals the one-shot bounded funnel and is idempotent") {
    val inc = StreamQueries.streamFunnel(spark, sf).collect().toSeq
    val batch = operators.AggQueries.aggFunnelWindow(spark, sf).collect().toSeq
    assert(inc == batch,
      "three-timestamp funnel state diverged from the one-shot bounded funnel")
    // the state handoff genuinely ran across micro-batches (one per chunk)
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_funnel_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    // re-run with the same checkpoint processes nothing and is stable
    val again = StreamQueries.streamFunnel(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_retention equals the one-shot cohort matrix and is idempotent") {
    val inc = StreamQueries.streamRetention(spark, sf).collect().toSeq
    val batch = operators.AggQueries.aggRetention(spark, sf).collect().toSeq
    assert(inc == batch,
      "per-user bitmask retention state diverged from the one-shot cohort matrix")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_reten_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamRetention(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_topwords equals the one-shot df ranking and is idempotent") {
    val inc = StreamQueries.streamTopWords(spark, sf).collect().toSeq
    val batch = operators.TextQueries.textTopWords(spark, sf).collect().toSeq
    assert(inc == batch,
      "summed per-chunk df deltas diverged from the one-shot document frequencies")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_topw_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamTopWords(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_zscore moments converge to the batch anomaly set") {
    val inc = StreamQueries.streamZscore(spark, sf).collect().toSeq
    val batch = operators.AggQueries.aggZscore(spark, sf).collect().toSeq
    assert(inc == batch,
      "merged integer moments diverged from the one-shot anomaly pass")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_zsc_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamZscore(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_heatmap grid converges to the batch grid") {
    val inc = StreamQueries.streamHeatmap(spark, sf).collect().toSeq
    val batch = operators.AggQueries.aggHeatmap(spark, sf).collect().toSeq
    assert(inc == batch,
      "merged (dow, hour) counts diverged from the one-shot grid")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_heat_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamHeatmap(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_transitions stitches chunk-boundary pairs exactly") {
    val inc = StreamQueries.streamTransitions(spark, sf).collect().toSeq
    val batch = operators.AggQueries.aggTransitions(spark, sf).collect().toSeq
    assert(inc == batch,
      "boundary-stitched transition counts diverged from the one-shot matrix " +
        "(a straddling (prev,next) pair was lost or double-counted)")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_trans_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamTransitions(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_ohlc equals the one-shot agg_ohlc bars and is idempotent") {
    val inc = StreamQueries.streamOhlc(spark, sf).collect().toSeq
    val batch = operators.AggQueries.aggOhlc(spark, sf).collect().toSeq
    assert(inc == batch, "incrementally merged bar state diverged from batch OHLC")
    // the merge genuinely ran across micro-batches (one per time chunk)
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_ohlc_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    // re-run with the same checkpoint processes nothing and is stable
    val again = StreamQueries.streamOhlc(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("transformWithState running totals equal the batch aggregate and are idempotent") {
    val inc = StreamQueries.streamTransformWithState(spark, sf).collect().toSeq
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("event_id").as("id_sum"),
        max("ts_s").as("max_ts"))
      .orderBy("user_id").collect().toSeq
    assert(inc == batch,
      "RocksDB ValueState totals diverged from the batch aggregate")
    // the state genuinely carried across micro-batches (one per chunk)
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_tws_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    // re-run with the same checkpoint processes nothing and is stable
    val again = StreamQueries.streamTransformWithState(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_concurrency equals batch win_concurrency and is idempotent") {
    val inc = StreamQueries.streamConcurrency(spark, sf).collect().toSeq
    val batch = operators.WindowQueries.winConcurrency(spark, sf).collect().toSeq
    assert(inc == batch, "incrementally merged endpoint state diverged from batch sweep")
    // the merge genuinely ran across micro-batches (one per chunk file)
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_conc_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    // re-run with the same checkpoint processes nothing and is stable
    val again = StreamQueries.streamConcurrency(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_minhash equals one-shot dedup_minhash and is idempotent") {
    val inc = StreamQueries.streamMinhash(spark, sf).collect().toSeq
    val batch = operators.DedupQueries.dedupMinhash(spark, sf).collect().toSeq
    assert(inc == batch, "accumulated pair state diverged from one-shot LSH")
    assert(inc.nonEmpty, "fixture corpus should contain near-duplicates")
    // the accumulation genuinely ran across micro-batches — asserted
    // on THIS run's exact staging dir (r10 ADVICE low: a stale
    // graft_stream_minhash_* tree from an earlier corpus signature
    // must not be able to satisfy the check)
    // stagingBase is file:-qualified (r15, ADVICE r14) — resolve the
    // URI back to a local File for the direct dir inspection
    val mhBase = new java.io.File(java.net.URI.create(
      streaming.StreamQueries.stagingBase("minhash", spark, sf)))
    assert(Option(new java.io.File(mhBase, "chk/commits").list())
        .exists(_.length >= 2),
      s"expected at least 2 committed micro-batches in $mhBase")
    // re-run with the same checkpoint processes nothing and is stable
    val again = StreamQueries.streamMinhash(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_ann_index serves the one-shot trained-IVF search and is idempotent") {
    val inc = operators.SimilarityQueries.streamAnnIndex(spark, sf).collect().toSeq
    // the incrementally accumulated index must serve EXACTLY what the
    // one-shot persisted index serves (both share trainedIvfOracleSql)
    val oneShot = operators.SimilarityQueries.sourceAnnIndex(spark, sf).collect().toSeq
    assert(inc == oneShot,
      "incrementally maintained postings diverged from the one-shot index")
    assert(inc.nonEmpty, "trained-IVF search returned no neighbors")
    // the append genuinely ran across micro-batches (one per vec_id%4
    // chunk) — asserted on THIS run's exact staging dir (r10 ADVICE
    // low: a stale tree from an earlier corpus signature must not be
    // able to satisfy the check)
    // file:-qualified root (r15) — resolve via URI like mhBase above
    val annBase = new java.io.File(java.net.URI.create(
      operators.SimilarityQueries.streamAnnBase(spark, sf)))
    assert(Option(new java.io.File(annBase, "chk/commits").list())
        .exists(_.length >= 2),
      s"expected at least 2 committed micro-batches in $annBase")
    // re-run with the same checkpoint processes nothing and is stable
    val again = operators.SimilarityQueries.streamAnnIndex(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("JVM-local staging roots are file:-qualified so they never resolve against fs.defaultFS (ADVICE r14)") {
    // the eviction walk DELETES trees under this root; on a deployment
    // whose defaultFS is hdfs:// a scheme-less java.io.tmpdir path
    // would have listed — and recursively deleted — under the remote
    // namespace. All three construction sites share localTmpRoot.
    val root = streaming.StreamQueries.localTmpRoot
    assert(root.startsWith("file:"),
      s"localTmpRoot must carry an explicit file: scheme, got $root")
    assert(streaming.StreamQueries.stagingBase("sink", spark, sf)
      .startsWith("file:"))
    assert(operators.SimilarityQueries.streamAnnBase(spark, sf)
      .startsWith("file:"))
    // and the qualified root resolves to the SAME local directory the
    // scheme-less form did — existing staged trees keep being reused
    assert(new java.io.File(java.net.URI.create(root)).getAbsolutePath ==
      new java.io.File(System.getProperty("java.io.tmpdir")).getAbsolutePath)
  }

  /** Injects a one-shot crash after the batch-`crashBatch` state
    * write to `pathOf` (i.e. INSIDE foreachBatch's at-least-once
    * replay window: state committed, streaming checkpoint not), runs
    * `query` on an ISOLATED staging tree (familySuffix), asserts the
    * first run died in the injected window, restarts, and returns the
    * recovered rows — which the caller must prove identical to the
    * one-shot batch answer (r10 verdict item 7: clean-rerun
    * idempotency was tested, mid-batch crash recovery was not). */
  private def crashRecovered(pathOf: => String, crashBatch: Long)(
      query: => DataFrame): Seq[org.apache.spark.sql.Row] = {
    import graft.streaming.BatchState
    StreamQueries.familySuffix = "xc"
    try {
      val path = pathOf // resolved AFTER the suffix is in force
      BatchState.crashAfter = Some((path, crashBatch))
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.toString +: chain(t.getCause)
      val died = intercept[Exception] { query.collect(): Unit }
      assert(chain(died).exists(_.contains("graft test crash")),
        s"expected the injected crash, got: ${chain(died).mkString(" <- ")}")
      assert(BatchState.crashAfter.isEmpty,
        s"crash hook never fired — batch $crashBatch never hit the window")
      query.collect().toIndexedSeq
    } finally {
      BatchState.crashAfter = None
      StreamQueries.familySuffix = ""
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      Option(new java.io.File(System.getProperty("java.io.tmpdir"))
        .listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("graft_stream_") &&
          f.getName.contains("xc_"))
        .foreach(rm)
    }
  }

  test("stream_foreachbatch recovers exactly-once from a crash between state write and checkpoint commit") {
    // crash after batch 0's state is committed but before the
    // checkpoint records it: the replay must find its version and
    // no-op — the overwrite-in-place shape double-applied the delta
    val rec = crashRecovered(
      StreamQueries.stagingBase("feb", spark, sf) + "/state", 0L) {
      StreamQueries.streamForeachBatch(spark, sf)
    }
    val twin = Tables.t(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("event_id").as("id_sum"),
        max("ts_s").as("last_ts_s"), Fp.r4(sum("value")).as("sum_value"))
      .orderBy("user_id")
      .collect().toIndexedSeq
    assert(rec == twin,
      "replayed upsert diverged from the one-shot aggregate " +
        "(the crashed batch's delta was lost or double-applied)")
  }

  test("stream_scd2 recovers exactly-once from a mid-stream crash") {
    // batch 1 of the time-ordered chunks: state already holds batch
    // 0's history, so a double-applied replay would corrupt the
    // extend/close merge, not just double counters
    val rec = crashRecovered(
      StreamQueries.stagingBase("scd2", spark, sf) + "/state", 1L) {
      StreamQueries.streamScd2(spark, sf)
    }
    val twin = operators.WindowQueries.pipelineScd2(spark, sf)
      .collect().toIndexedSeq
    assert(rec == twin,
      "replayed SCD2 merge diverged from the one-shot batch history")
  }

  test("stream_transitions recovers when the crash lands BETWEEN its two state stores") {
    // the nastiest window: counts v1 committed, last-event slot still
    // at v0, checkpoint uncommitted. The replay must skip the counts
    // merge (already committed) and re-run only the last-slot merge —
    // readBelow keeps it from seeing state its first attempt advanced
    val rec = crashRecovered(
      StreamQueries.stagingBase("trans", spark, sf) + "/counts", 1L) {
      StreamQueries.streamTransitions(spark, sf)
    }
    val twin = operators.AggQueries.aggTransitions(spark, sf)
      .collect().toIndexedSeq
    assert(rec == twin,
      "post-crash transition matrix diverged from the one-shot matrix " +
        "(the coupled stores drifted across the replay)")
  }

  test("stream_minhash recovers when the crash lands BETWEEN its two stores") {
    // bands b1 committed, pairs still at v0, checkpoint uncommitted:
    // the replay must rewrite b1 with the same bytes (overwrite-
    // idempotent dir, never append) and re-derive the identical pairs
    val rec = crashRecovered(
      StreamQueries.stagingBase("minhash", spark, sf) + "/sigs", 1L) {
      StreamQueries.streamMinhash(spark, sf)
    }
    val twin = operators.DedupQueries.dedupMinhash(spark, sf)
      .collect().toIndexedSeq
    assert(rec == twin,
      "post-crash pair state diverged from the one-shot batch LSH " +
        "(a band row duplicated or a pair lost across the replay)")
  }

  test("stream_jaccard recovers when the crash lands BETWEEN its two stores") {
    // wedges v1 committed, suppdeg still at v0, checkpoint
    // uncommitted: the replay must skip the wedge merge (already
    // committed), re-derive the SAME delta (the edge store read is
    // bounded strictly below the batch id) and re-run only the degree
    // merge — any double-applied delta corrupts common/da/db and the
    // top-k order
    val rec = crashRecovered(
      StreamQueries.stagingBase("jaccard", spark, sf) + "/wedges", 1L) {
      StreamQueries.streamJaccard(spark, sf)
    }
    val twin = operators.GraphQueries.graphJaccard(spark, sf)
      .collect().toIndexedSeq
    assert(rec == twin,
      "post-crash similarity diverged from the one-shot batch answer " +
        "(a wedge double-counted or a degree lost across the replay)")
  }

  test("append-store compaction bounds the dir count and preserves stream_minhash's answer") {
    // r12 verdict item 3 (state lifecycle): the band store grows one
    // b<bid> dir per batch forever by design; with the fold forced on
    // every batch (Age=1/MinDirs=1) the store must end bounded — only
    // the final batch's dir above the watermark base — and the pair
    // set must still equal the one-shot batch LSH exactly
    import graft.streaming.AppendStore
    val (age0, min0) = (AppendStore.Age, AppendStore.MinDirs)
    StreamQueries.familySuffix = "xk" // isolated tree: the shared one
    // is already checkpoint-complete, so no batch (or fold) would run
    try {
      AppendStore.Age = 1
      AppendStore.MinDirs = 1
      val inc = StreamQueries.streamMinhash(spark, sf).collect().toIndexedSeq
      val twin = operators.DedupQueries.dedupMinhash(spark, sf)
        .collect().toIndexedSeq
      assert(inc == twin,
        "compacted-store pair set diverged from the one-shot batch LSH")
      val sigs = new java.io.File(java.net.URI.create(
        StreamQueries.stagingBase("minhash", spark, sf) + "/sigs"))
      val bLeft = Option(sigs.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.matches("b\\d+"))
        .map(_.getName).sorted
      // batches 0..2: batch 1 folds b0 (w=0), batch 2 folds b1 (w=1)
      // and deletes it — only the final batch's own dir may remain
      assert(bLeft.sameElements(Array(s"b${StreamQueries.MinhashChunks - 1}")),
        s"unbounded store: expected only the final b-dir, got ${bLeft.toList}")
      assert(new java.io.File(sigs,
          s"base/v${StreamQueries.MinhashChunks - 2}/_SUCCESS").exists(),
        "watermark base version was not committed")
    } finally {
      AppendStore.Age = age0
      AppendStore.MinDirs = min0
      StreamQueries.familySuffix = ""
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      Option(new java.io.File(System.getProperty("java.io.tmpdir"))
        .listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("graft_stream_") &&
          f.getName.contains("xk_"))
        .foreach(rm)
    }
  }

  test("append-store compaction recovers from a crash between base commit and dir deletion") {
    // the fold's own at-least-once window (the 7th crash injection):
    // edge base v1 committed, the folded b1 dir NOT yet deleted,
    // checkpoint uncommitted. The replayed batch must read the
    // watermark base INSTEAD of the leftover dir (never both — a
    // double-read would double every wedge delta), skip its committed
    // wedge/degree merges, and compact's re-entry must delete the
    // leftover. Forced folds via the test knobs; isolated tree via
    // crashRecovered's familySuffix.
    import graft.streaming.AppendStore
    val (age0, min0) = (AppendStore.Age, AppendStore.MinDirs)
    try {
      AppendStore.Age = 1
      AppendStore.MinDirs = 1
      val rec = crashRecovered(
        StreamQueries.stagingBase("jaccard", spark, sf) + "/edges/base", 1L) {
        StreamQueries.streamJaccard(spark, sf)
      }
      val twin = operators.GraphQueries.graphJaccard(spark, sf)
        .collect().toIndexedSeq
      assert(rec == twin,
        "post-crash similarity diverged after a mid-compaction death " +
          "(an edge read twice through base+leftover, or a fold lost)")
    } finally {
      AppendStore.Age = age0
      AppendStore.MinDirs = min0
    }
  }

  test("append-store compaction bounds the ANN postings dirs and preserves the served index") {
    // the third append-only store, and the generalized fold: the base
    // must come out PARTITIONED BY cluster (probed-list pruning has to
    // survive compaction) and the served top-3 must still equal the
    // one-shot persisted index exactly (trainedIvfOracleSql's hash)
    import graft.streaming.AppendStore
    val (age0, min0) = (AppendStore.Age, AppendStore.MinDirs)
    StreamQueries.familySuffix = "xk"
    try {
      AppendStore.Age = 1
      AppendStore.MinDirs = 1
      val inc = operators.SimilarityQueries.streamAnnIndex(spark, sf)
        .collect().toIndexedSeq
      val oneShot = operators.SimilarityQueries.sourceAnnIndex(spark, sf)
        .collect().toIndexedSeq
      assert(inc == oneShot,
        "compacted-index search diverged from the one-shot persisted index")
      val postings = new java.io.File(java.net.URI.create(
        operators.SimilarityQueries.streamAnnBase(spark, sf) + "/postings"))
      val bLeft = Option(postings.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.matches("batch=\\d+"))
        .map(_.getName).sorted
      // 4 vec_id%4 batches: 1 folds b0 (w=0), 2 folds b1, 3 folds b2 —
      // only the final batch's own dir may remain above base/v2
      assert(bLeft.sameElements(Array("batch=3")),
        s"unbounded store: expected only batch=3, got ${bLeft.toList}")
      val baseV2 = new java.io.File(postings, "base/v2")
      assert(new java.io.File(baseV2, "_SUCCESS").exists(),
        "watermark base version was not committed")
      assert(Option(baseV2.listFiles()).getOrElse(Array.empty)
          .exists(f => f.isDirectory && f.getName.startsWith("cluster=")),
        "the fold lost the cluster=<c>/ pruning layout")
    } finally {
      AppendStore.Age = age0
      AppendStore.MinDirs = min0
      StreamQueries.familySuffix = ""
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      Option(new java.io.File(System.getProperty("java.io.tmpdir"))
        .listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("graft_stream_") &&
          f.getName.contains("xk_"))
        .foreach(rm)
    }
  }

  test("stream_ann_index recovers exactly-once from a crash after a postings write") {
    val rec = crashRecovered(
      operators.SimilarityQueries.streamAnnBase(spark, sf) + "/postings", 1L) {
      operators.SimilarityQueries.streamAnnIndex(spark, sf)
    }
    val twin = operators.SimilarityQueries.sourceAnnIndex(spark, sf)
      .collect().toIndexedSeq
    assert(rec == twin,
      "post-crash incremental index diverged from the one-shot index " +
        "(a vector lost, duplicated, or mis-assigned across the replay)")
  }

  test("BatchState: replayed batch skips its merge; predecessors evicted after commit") {
    import graft.streaming.BatchState
    val root = java.nio.file.Files.createTempDirectory("graft_bstate").toString
    val st = s"$root/state"
    try {
      BatchState.swap(spark, st, 0L) {
        case None => Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
        case Some(_) => fail("first batch must see no previous state")
      }
      assert(BatchState.read(spark, st).count() == 2)
      BatchState.swap(spark, st, 1L) {
        case Some(state) => state.withColumn("v", col("v") * 2)
        case None => fail("batch 1 must see batch 0's state")
      }
      assert(BatchState.read(spark, st).agg(sum("v")).head().getLong(0) == 60L)
      // v0 evicted once v1 committed — the store stays ≤ 2 versions
      assert(!new java.io.File(s"$st/v0").exists())
      // replay of batch 1 (checkpoint never committed): the merge
      // must NOT run again — a second doubling would corrupt state
      BatchState.swap(spark, st, 1L) { _ =>
        fail("replay of a committed batch must not re-run its merge")
      }
      assert(BatchState.read(spark, st).agg(sum("v")).head().getLong(0) == 60L)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("BatchState: multi-partition state versions commit, merge, evict and replay-skip") {
    // the 100 TB state-store shape (r11 verdict item 5a): at cluster
    // scale a sink's state frame is MANY parquet part files per
    // version, so the commit protocol must version/evict whole
    // multi-file dirs and a replay after the predecessor's eviction
    // must still no-op — nothing in the prior unit tests exercised a
    // version with partition count > 1
    import graft.streaming.BatchState
    val root = java.nio.file.Files.createTempDirectory("graft_bstate").toString
    val st = s"$root/state"
    def parts(v: Long): Int =
      Option(new java.io.File(s"$st/v$v").listFiles()).getOrElse(Array.empty)
        .count(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
    try {
      BatchState.swap(spark, st, 0L) { prev =>
        assert(prev.isEmpty)
        spark.range(0, 1000)
          .select(col("id").as("k"), lit(1L).as("n")).repartition(8)
      }
      assert(parts(0) == 8, s"v0 wrote ${parts(0)} part files, want 8")
      BatchState.swap(spark, st, 1L) { prev =>
        prev.get.union(spark.range(1000, 2000)
          .select(col("id").as("k"), lit(1L).as("n")).repartition(8))
      }
      assert(parts(1) > 1, "merged version collapsed to one partition")
      // the whole 8-file v0 dir is evicted once v1 commits
      assert(!new java.io.File(s"$st/v0").exists(),
        "superseded multi-file version not evicted")
      assert(BatchState.read(spark, st).count() == 2000)
      // replay of batch 1 AFTER v0's eviction (the at-least-once
      // window, post-eviction flavor): must skip the merge entirely
      BatchState.swap(spark, st, 1L) { _ =>
        fail("replay of a committed batch must not re-run its merge")
      }
      assert(BatchState.read(spark, st).count() == 2000)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("BatchState: a partial version dir (death DURING the write) is overwritten from the predecessor") {
    import graft.streaming.BatchState
    val root = java.nio.file.Files.createTempDirectory("graft_bstate").toString
    val st = s"$root/state"
    try {
      BatchState.swap(spark, st, 0L) { _ => Seq((1L, 10L)).toDF("k", "v") }
      // simulate dying mid-write of v1: a partial dir, no _SUCCESS
      val partial = new java.io.File(s"$st/v1")
      partial.mkdirs()
      java.nio.file.Files.write(partial.toPath.resolve("part-garbage.parquet"),
        Array[Byte](1, 2, 3))
      var sawPrev = -1L
      BatchState.swap(spark, st, 1L) { prev =>
        sawPrev = prev.map(_.count()).getOrElse(-2L)
        prev.get.withColumn("v", col("v") + 1)
      }
      assert(sawPrev == 1L, "replay must merge from the intact predecessor")
      assert(BatchState.read(spark, st).head().getLong(1) == 11L)
      assert(!partial.toPath.resolve("part-garbage.parquet").toFile.exists(),
        "the partial write's garbage must be gone after the overwrite")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("BatchState.readBelow never reads state at or above the asking batch") {
    import graft.streaming.BatchState
    val root = java.nio.file.Files.createTempDirectory("graft_bstate").toString
    val st = s"$root/state"
    try {
      Seq((1L, 1L)).toDF("k", "v").write.parquet(s"$st/v0")
      Seq((1L, 2L)).toDF("k", "v").write.parquet(s"$st/v3")
      assert(BatchState.readBelow(spark, st, 3L).get.head().getLong(1) == 1L)
      assert(BatchState.readBelow(spark, st, 4L).get.head().getLong(1) == 2L)
      assert(BatchState.readBelow(spark, st, 0L).isEmpty)
      assert(BatchState.read(spark, st).head().getLong(1) == 2L)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("streaming dropDuplicates dedups a doubled stream exactly") {
    val streamed = runStream(sample ++ sample, StreamQueries.dedupAgg, "t_dedup")
    val n = streamed.agg(sum("n")).collect()(0).getLong(0)
    assert(n == sample.length)
  }

  test("session_window stream agrees with the batch lag/cumsum session count") {
    // user 0: events at minute 0, 10, 50 (gap 40m ⇒ 2 sessions), user 1: 1 session
    val rows = Seq(
      Ev(1, ts(0), 0, "click", 1.0), Ev(2, ts(10), 0, "click", 1.0),
      Ev(3, ts(50), 0, "click", 1.0), Ev(4, ts(5), 1, "view", 1.0))
    val streamed = runStream(rows, StreamQueries.sessionAgg, "t_session")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(streamed == Map(0L -> 2L, 1L -> 1L))
  }

  test("flatMapGroupsWithState max-gap agrees with the batch lag/max query") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // state = (lastTsSec, maxGap, count); events buffered + sorted per
    // batch since iterator order within a group is not time-ordered
    val out = mem.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Ev], state: GroupState[(Long, Long, Long)]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts.getTime / 1000, e.event_id))
          var (last, maxGap, n) = state.getOption.getOrElse((Long.MinValue, -1L, 0L))
          sorted.foreach { e =>
            val ts = e.ts.getTime / 1000
            if (last != Long.MinValue && ts - last > maxGap) maxGap = ts - last
            last = ts; n += 1
          }
          state.update((last, maxGap, n))
          Iterator((user, maxGap, n))
      }
    val q = out.toDF("user_id", "max_gap_s", "n_events").writeStream
      .outputMode("update").format("memory").queryName("t_maxgap").start()
    mem.addData(sample: _*)
    try q.processAllAvailable() finally q.stop()
    // latest state per user (update mode may emit per batch; single batch here)
    val streamed = spark.table("t_maxgap")
      .groupBy("user_id")
      .agg(max("max_gap_s").as("max_gap_s"), max("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val batch = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_s", "event_id")
      sample.toDF()
        .withColumn("ts_s", unix_timestamp(col("ts")))
        .withColumn("delta_s", col("ts_s") - lag("ts_s", 1).over(w))
        .groupBy("user_id")
        .agg(max("delta_s").as("max_gap_s"), count(lit(1)).as("n_events"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    }
    assert(streamed == batch)
  }

  test("stream-stream time-bounded join equals the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val clicksMem = MemoryStream[Ev]
    val purchMem = MemoryStream[Ev]
    val clicks = clicksMem.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = purchMem.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("t_ssjoin").start()
    val clickRows = sample.filter(_.event_type == "click")
    val purchRows = sample.filter(_.event_type == "view") // reuse as 2nd stream
    clicksMem.addData(clickRows: _*)
    purchMem.addData(purchRows: _*)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_ssjoin").count()
    val batchExpected = (for {
      c <- clickRows; p <- purchRows
      if p.user_id == c.user_id
      if p.ts.getTime >= c.ts.getTime && p.ts.getTime < c.ts.getTime + 3600 * 1000
    } yield 1).size
    assert(streamed == batchExpected && streamed > 0,
      s"stream-stream join rows $streamed vs batch $batchExpected")
  }

  test("rows later than the watermark are dropped in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamQueries.tumblingAgg(mem.toDF()).writeStream
      .outputMode("append").format("memory").queryName("t_late").start()
    // batch 1: advance event time to 03:20 → watermark 03:10
    mem.addData(sample: _*)
    q.processAllAvailable()
    // batch 2: a row at 00:30 — a full hour-window behind the watermark
    mem.addData(Ev(999, ts(30), 9, "late", 1.0))
    q.processAllAvailable()
    // batch 3: advance time far enough to close all windows
    mem.addData(Ev(1000, ts(600), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_late")
    // the late row must NOT have re-opened or contributed to hour-0
    val hour0 = out.filter(col("window_start_s") === 1704067200L)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(hour0 == 60, s"late row leaked into closed window: $hour0")
  }

  test("streaming quality gate equals the batch gate (codegen kernel inside streaming)") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "text").as[Doc].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamQueries.qualityGateAgg(mem.toDF()).writeStream
      .outputMode("complete").format("memory").queryName("t_qgate").start()
    try {
      // two micro-batches prove the counters accumulate incrementally
      mem.addData(docs.take(250): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(250): _*)
      q.processAllAvailable()
    } finally q.stop()
    val batch = StreamQueries.qualityGateAgg(
      Tables.t(spark, sf, "documents"))
    assert(sortedRows(spark.table("t_qgate")) == sortedRows(batch))
    // the gate must actually gate: some docs kept, some dropped
    val tot = spark.table("t_qgate")
      .agg(sum("n_kept"), sum("n_seen")).head()
    assert(tot.getLong(0) > 0 && tot.getLong(0) < tot.getLong(1))
  }

  test("incremental stream_dq_gate equals one-shot profile_dq_rules and is idempotent") {
    val inc = StreamQueries.streamDqGate(spark, sf).collect().toSeq
    val batch = SparkEntry.queries("profile_dq_rules")(spark, sf).collect().toSeq
    assert(inc == batch, "merged counter state diverged from the one-shot rules")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_dq_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamDqGate(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_kmv equals one-shot agg_kmv_distinct and is idempotent") {
    val inc = StreamQueries.streamKmv(spark, sf).collect().toSeq
    val batch = SparkEntry.queries("agg_kmv_distinct")(spark, sf).collect().toSeq
    assert(inc == batch, "merged bottom-k sketch diverged from the one-shot sketch")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_kmv_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamKmv(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_reservoir equals one-shot sample_reservoir and is idempotent") {
    val inc = StreamQueries.streamReservoir(spark, sf).collect().toSeq
    val batch = operators.SampleQueries.sampleReservoir(spark, sf).collect().toSeq
    assert(inc == batch, "merged bottom-K state diverged from the one-shot sample")
    assert(inc.size == operators.SampleQueries.ReservoirK)
    // the merge genuinely ran across micro-batches
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_reservoir_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    // re-run with the same checkpoint processes nothing and is stable
    val again = StreamQueries.streamReservoir(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_basket equals one-shot agg_basket and is idempotent") {
    // orderkey-chunked baskets are complete per micro-batch, so the
    // summed pair/marginal/total state must reproduce the batch
    // support+lift table BIT-exactly (shared basketAssemble)
    val inc = StreamQueries.streamBasket(spark, sf).collect().toSeq
    val batch = SparkEntry.queries("agg_basket")(spark, sf).collect().toSeq
    assert(inc == batch, "merged basket state diverged from the one-shot mining")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_basket_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamBasket(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_rfm equals one-shot agg_rfm and is idempotent") {
    // (max, sum, sum) per-customer state merges exactly regardless of
    // how a customer's orders split across micro-batches
    val inc = StreamQueries.streamRfm(spark, sf).collect().toSeq
    val batch = SparkEntry.queries("agg_rfm")(spark, sf).collect().toSeq
    assert(inc == batch, "merged RFM state diverged from the one-shot grid")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_rfm_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamRfm(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("incremental stream_bloom equals one-shot agg_bloom and is idempotent") {
    // bit sets are closed under OR, so the distinct-merged state must
    // probe bit-identically to the batch filter
    val inc = StreamQueries.streamBloom(spark, sf).collect().toSeq
    val batch = SparkEntry.queries("agg_bloom")(spark, sf).collect().toSeq
    assert(inc == batch, "merged bloom bits diverged from the one-shot filter")
    val tagDirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_stream_bloom_"))
    assert(tagDirs.exists(d =>
        Option(new java.io.File(d, "chk/commits").list()).exists(_.length >= 2)),
      "expected at least 2 committed micro-batches")
    val again = StreamQueries.streamBloom(spark, sf).collect().toSeq
    assert(again == inc)
  }

  test("stream_cms: cell-wise merged sketch probes identically to the batch sketch") {
    // integer cell sums are associative, so the incremental state must
    // reproduce the batch query BIT-exactly — the incremental=batch
    // contract the scaladoc claims
    val streamed = SparkEntry.queries("stream_cms")(spark, sf)
      .collect().toSeq.map(_.toString)
    val batch = SparkEntry.queries("agg_cms_estimate")(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(streamed == batch, "incremental CMS diverged from batch CMS")
  }
}
