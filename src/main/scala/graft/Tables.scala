package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table loader for the driver's synthetic parquet tables
  * (TESTDATA.md). All queries read ONLY through here so schema and
  * path conventions live in one place.
  *
  * Scale note: `spark.read.parquet` plans a `FileSourceScanExec` with
  * the vectorized columnar reader; filters/projections composed on the
  * returned DataFrame are pushed into the scan by Catalyst, so at
  * 100 TB the scan reads only the needed columns/row-groups.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") return events(spark, dir)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps,
    * which Spark's reader rejects (PARQUET_TYPE_ILLEGAL). We read the
    * raw nanos as LONG (`nanosAsLong`) and expose:
    *   - `ts_ns`  — raw nanoseconds since epoch (exact)
    *   - `ts_s`   — floor seconds since epoch (exact integer math,
    *                matches DuckDB `epoch_ns(ts) // 1000000000`)
    *   - `ts`     — second-truncated TimestampType for date functions
    * All oracle comparisons on event time go through `ts_s`/`ts` so
    * Spark-vs-DuckDB sub-second precision differences cannot surface.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_s", org.apache.spark.sql.functions.expr("ts_ns div 1000000000"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_seconds(ts_s)"))
  }
}
