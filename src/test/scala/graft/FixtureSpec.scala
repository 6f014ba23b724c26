package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Assumptions about the DRIVER'S testdata that specific oracles rely
  * on — asserted here so a fixture change surfaces as a named test
  * failure instead of a silent cross-engine divergence.
  */
class FixtureSpec extends AnyFunSuite with SparkFixture {

  /** Every SF the oracle gate can run at — assumptions must hold at
    * ALL of them, not just the small ones. */
  private val allSfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("documents are pure ASCII (multimodal decode/frames oracles slice chars, Spark slices bytes)") {
    for (dir <- allSfDirs) {
      val nonAscii = Tables.t(spark, dir, "documents")
        .filter(length(col("text")) =!= octet_length(encode(col("text"), "UTF-8")))
        .count()
      assert(nonAscii == 0, s"$dir has $nonAscii non-ASCII documents")
      // DuckDB regexp_extract_all(text, '.') char-splits (multimodal +
      // text_entropy oracles) skip newlines — the corpus must have none
      val withNewline = Tables.t(spark, dir, "documents")
        .filter(col("text").contains("\n") || col("text").contains("\r"))
        .count()
      assert(withNewline == 0, s"$dir has $withNewline documents with newlines")
      // the BPE queries mint merge symbols from 'A'.. — provably
      // outside the corpus alphabet only while the corpus stays
      // lowercase+space; a regenerated corpus with uppercase would
      // silently alias merged tokens with real text
      // the BPE trainer also interpolates the winning pair into a SQL
      // literal and mints uppercase merge symbols — pin the FULL
      // charset, not just no-uppercase: lowercase + space only
      val offCharset = Tables.t(spark, dir, "documents")
        .filter(!col("text").rlike("^[a-z ]*$")).count()
      assert(offCharset == 0,
        s"$dir has $offCharset documents outside [a-z ] (BPE charset contract)")
    }
  }

  test("KMV activity-key packing stays injective (ak < 2^31-1 across SFs)") {
    // agg_kmv_* / stream_kmv hash ak = user_id*1e5 + epoch_day through
    // a permutation of Z_M (M = 2^31-1); injectivity — and therefore
    // the 'bottom-k multiset is a true set' claim and the streaming
    // merge's distinct() semantics — requires ak < M
    for (dir <- allSfDirs) {
      val mx = Tables.t(spark, dir, "events")
        .agg(max(expr(graft.operators.AggQueries.kmvAkSqlSpark))).head().getLong(0)
      assert(mx < graft.operators.AggQueries.KmvM,
        s"$dir: max activity key $mx breaches the 2^31-1 hash field")
    }
  }

  test("no all-zero embedding vectors (sim_quantize divides by max|x|; engines disagree on x/0)") {
    for (dir <- allSfDirs) {
      val zeroVecs = Tables.t(spark, dir, "embeddings")
        .filter(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + abs(x.cast("double"))) === 0.0)
        .count()
      assert(zeroVecs == 0, s"$dir has $zeroVecs all-zero embeddings")
    }
  }

  test("lineitem quantities are integral (proj_expr's floor-cast is exact either way)") {
    for (dir <- allSfDirs) {
      val fractional = Tables.t(spark, dir, "lineitem")
        .filter(col("l_quantity") =!= floor(col("l_quantity")))
        .count()
      assert(fractional == 0, s"$dir has $fractional fractional quantities")
    }
  }

  test("schema-drift canary: every table loads and materializes a row at every SF") {
    for (dir <- allSfDirs; name <- Tables.names) {
      val df = Tables.t(spark, dir, name)
      assert(df.limit(1).collect().length == 1, s"$dir/$name is empty or unreadable")
    }
  }

  test("Tables.t memoization: plan reuse within a (session, dir), isolation across dirs") {
    // r8: Tables.t caches READER PLANS (the metastore-cache role) —
    // the same (session, dir, table) must return the identical plan
    // object (no re-listing / footer re-inference), while different
    // dirs must never cross
    val a1 = Tables.t(spark, sf, "lineitem")
    val a2 = Tables.t(spark, sf, "lineitem")
    assert(a1 eq a2, "same (session, dir, table) rebuilt its reader plan")
    val other = allSfDirs.find(_ != sf).get
    val b = Tables.t(spark, other, "lineitem")
    assert(!(a1 eq b), "different dirs shared one cached plan")
    // and the cached plans still read their OWN dir's data
    assert(a1.count() != b.count(),
      "sf dirs unexpectedly hold identical row counts — isolation unprovable")
  }

  test("oracle-critical schema pins: embedding dim 64, expected column sets") {
    for (dir <- allSfDirs) {
      // sim_maxsim / sim_crossmodal oracles unroll generate_series(1, 64)
      val dims = Tables.t(spark, dir, "embeddings")
        .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
      assert(dims.sameElements(Array(64)), s"$dir: embedding dims ${dims.toSeq}")
      val docCols = Tables.t(spark, dir, "documents").columns.toSet
      assert(Set("doc_id", "lang", "source", "n_chars", "text").subsetOf(docCols),
        s"$dir: documents columns $docCols")
      val evCols = Tables.t(spark, dir, "events").columns.toSet
      assert(Set("event_id", "user_id", "event_type", "value", "props",
        "ts", "ts_s", "ts_ns").subsetOf(evCols), s"$dir: events columns $evCols")
    }
  }

  test("events loader contract: ts_ns/ts_s/ts types and values hold under the current encoding") {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    for (dir <- allSfDirs) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts_ns").dataType == LongType, s"$dir: ts_ns must be LONG")
      assert(ev.schema("ts_s").dataType == LongType, s"$dir: ts_s must be LONG")
      assert(ev.schema("ts").dataType == TimestampType, s"$dir: ts must be TIMESTAMP")
      // ts_s is the floor-second of ts_ns; ts is the second-truncated instant;
      // event times land in a sane decade (catches unit mix-ups: ms-vs-us-vs-ns)
      val bad = ev.filter(
        col("ts_s") * lit(1000000000L) > col("ts_ns") ||
        col("ts_ns") >= (col("ts_s") + 1) * lit(1000000000L) ||
        unix_seconds(col("ts")) =!= col("ts_s") ||
        year(col("ts")) < 2000 || year(col("ts")) > 2040
      ).count()
      assert(bad == 0, s"$dir: $bad events violate the ts_ns/ts_s/ts contract")
    }
  }

  test("events loader NANOS branch: the checked-in TIMESTAMP(NANOS) fixture derives the same contract") {
    // the driver's testdata flipped encodings once (r5: NANOS-as-long →
    // timestamp[us]) and broke 42 queries; current testdata exercises
    // only the MICROS branch, so the legacy branch is pinned by a
    // 20-row genuine TIMESTAMP(NANOS) parquet (written by pyarrow,
    // store_schema off — Spark must hit the parquet footer type, not a
    // stored arrow schema). Both branches must agree row-for-row on
    // (ts_ns, ts_s, ts) for the same event_ids.
    import org.apache.spark.sql.types.LongType
    val fixture = getClass.getResource("/fixtures/events_nanos.parquet")
    assert(fixture != null, "events_nanos.parquet fixture missing from resources")
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_fix")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(fixture.toURI),
      dir.resolve("events.parquet"))
    val viaNanos = Tables.events(spark, dir.toString)
    // the branch actually taken is the LongType one: nanosAsLong maps
    // TIMESTAMP(NANOS) to LONG at the reader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == LongType,
      "fixture no longer exercises the NANOS-as-long branch")
    val got = viaNanos.select("event_id", "ts_ns", "ts_s", "ts")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getTimestamp(3)))
      .toMap
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_id").isin(got.keys.toSeq: _*))
      .select("event_id", "ts_ns", "ts_s", "ts")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getTimestamp(3)))
      .toMap
    assert(got.size == 20, s"expected 20 fixture rows, got ${got.size}")
    assert(got == want,
      "NANOS and MICROS branches derived different ts contracts for the same events")
  }
}
