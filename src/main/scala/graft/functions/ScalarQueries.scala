package graft.functions

import graft.Fp
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface: string / date / math / array / json / map
  * (SURVEY §2B). All are built-in `org.apache.spark.sql.functions`
  * expressions — fully whole-stage-codegen'd, no UDFs in the hot path.
  *
  * Oracle alignment notes:
  *  - DuckDB returns BIGINT where Spark returns INT for
  *    length/size/datediff — the oracle SQL casts to INTEGER.
  *  - float array elements are widened to DOUBLE (exact) before any
  *    arithmetic so both engines round the same 64-bit value.
  */
object ScalarQueries {

  /** String functions over documents (lower/substring/length/concat/split). */
  def scalarString(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        lower(substring(col("text"), 1, 20)).as("prefix"),
        length(col("text")).as("n_chars_fn"),
        concat(col("lang"), lit("-"), col("source")).as("tag"),
        size(split(col("text"), " ")).as("n_words"))
      .orderBy("doc_id")

  /** Date functions over orders (year/month/date_trunc/datediff). */
  def scalarDate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy("o_orderkey")

  /** Math functions over lineitem (round/abs/sqrt/ln/pow). */
  def scalarMath(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Fp.r4(abs(col("l_extendedprice") - 1000)).as("abs_delta"),
        Fp.r4(sqrt(col("l_quantity"))).as("sqrt_qty"),
        Fp.r4(log(col("l_extendedprice"))).as("ln_price"),
        Fp.r4(pow(col("l_discount") + 1, 2)).as("pow_disc"))
      // (l_orderkey, l_linenumber) is not unique — order by all outputs
      .orderBy("l_orderkey", "l_linenumber", "abs_delta", "sqrt_qty",
        "ln_price", "pow_disc")

  /** Array higher-order functions over embeddings
    * (size/element_at/slice/transform). */
  def scalarArray(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        Fp.r4(element_at(col("embedding"), 1).cast("double")).as("first_val"),
        transform(slice(col("embedding"), 1, 3),
          x => Fp.r4(x.cast("double"))).as("head3"))
      .orderBy("vec_id")

  /** JSON extraction over events.props. */
  def scalarJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"))
      .orderBy("event_id")

  /** Map literal + element_at lookup — the reference's label→name dict
    * (R24, ipynb:367-379) as a pure expression. */
  def scalarMap(s: SparkSession, dir: String): DataFrame = {
    val kv: Seq[Column] = graft.operators.ScanQueries.labelNames
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        element_at(map(kv: _*), col("label")).as("class_name"))
      .orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scalar_string" -> scalarString,
    "scalar_date" -> scalarDate,
    "scalar_math" -> scalarMath,
    "scalar_array" -> scalarArray,
    "scalar_json" -> scalarJson,
    "scalar_map" -> scalarMap)

  private val mapCase: String = graft.operators.ScanQueries.labelNames
    .map { case (k, v) => s"WHEN $k THEN '$v'" }.mkString(" ")

  val oracleSql: Map[String, String] = Map(
    "scalar_string" ->
      """SELECT doc_id, lower(substr(text, 1, 20)) AS prefix,
        |  CAST(length(text) AS INTEGER) AS n_chars_fn,
        |  concat(lang, '-', source) AS tag,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor((abs(l_extendedprice - 1000)) * 10000.0 + 0.5) / 10000.0 AS abs_delta,
        |  floor((sqrt(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sqrt_qty,
        |  floor((ln(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS ln_price,
        |  floor((pow(l_discount + 1, 2)) * 10000.0 + 0.5) / 10000.0 AS pow_disc
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber, abs_delta, sqrt_qty, ln_price, pow_disc""".stripMargin,
    "scalar_array" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        |  floor((CAST(embedding[1] AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 + 0.0 AS first_val,
        |  list_transform(embedding[1:3], x -> floor((CAST(x AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 + 0.0) AS head3
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "scalar_json" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,
    "scalar_map" ->
      s"""SELECT vec_id, label, CASE label $mapCase END AS class_name
         |FROM embeddings ORDER BY vec_id""".stripMargin)
}
