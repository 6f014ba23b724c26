package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine deterministic rounding.
  *
  * Spark's `round` goes through exact BigDecimal HALF_UP; DuckDB's
  * double `round` multiplies by 10^d first. The two disagree whenever
  * the scaled value lands on (or FP-rounds onto) a decimal half-point
  * — which is COMMON for ratios/products of small integers. So every
  * query rounds with the same explicit op sequence on both engines:
  *
  *   r4(x) = floor(x * 10000.0 + 0.5) / 10000.0
  *
  * multiply, add, floor, divide — each IEEE-754 deterministic, so
  * identical inputs give bit-identical outputs in Spark and DuckDB.
  * (Ties round toward +inf; the CHOICE doesn't matter, only that both
  * engines make the same one.) Bonus: never emits -0.0.
  *
  * The SQL-side twin is [[Fp.r4Sql]]; oracle strings must use it for
  * every value produced by FP arithmetic.
  */
object Fp {
  def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  def r4Sql(expr: String): String = s"floor(($expr) * 10000.0 + 0.5) / 10000.0"
}
