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
}
