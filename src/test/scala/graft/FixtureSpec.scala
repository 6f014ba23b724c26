package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Assumptions about the DRIVER'S testdata that specific oracles rely
  * on — asserted here so a fixture change surfaces as a named test
  * failure instead of a silent cross-engine divergence.
  */
class FixtureSpec extends AnyFunSuite with SparkFixture {

  test("documents are pure ASCII (multimodal decode/frames oracles slice chars, Spark slices bytes)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val nonAscii = Tables.t(spark, dir, "documents")
        .filter(length(col("text")) =!= octet_length(encode(col("text"), "UTF-8")))
        .count()
      assert(nonAscii == 0, s"$dir has $nonAscii non-ASCII documents")
    }
  }

  test("lineitem quantities are integral (proj_expr's floor-cast is exact either way)") {
    val fractional = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_quantity") =!= floor(col("l_quantity")))
      .count()
    assert(fractional == 0)
  }
}
