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
}
