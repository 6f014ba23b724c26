package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (getOrCreate ⇒ one session per
  * forked test JVM). sf0.001 keeps suites fast. */
trait SparkFixture {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    // proves the extension-point wiring: ExtensionsSpec calls the
    // injected SQL functions through this session
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"
}
