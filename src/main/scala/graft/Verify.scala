package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // RAM-backed scratch when available (see Bench.scratchDir)
      .config("spark.local.dir", Bench.scratchDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.muteKnownBenignWarnings()
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q1,q2 restricts the dump (local iteration aid;
    // the driver never sets it, so the official run is always full)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(f =>
      SparkEntry.queries.view.filterKeys(f).toMap)
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = only.fold(SparkEntry.oracleSql)(f =>
        SparkEntry.oracleSql.view.filterKeys(f).toMap)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // query manifest, SCOPED to this dump: in the driver's official
    // (always unrestricted) run this is the full declared list, so
    // completeness stays externally checkable; under SPARK_GRAFT_ONLY
    // it lists only the dumped queries, so tools/check_oracle.py on a
    // subset dump no longer reports every unselected query as a bogus
    // "no spark output" FAIL (r8 verdict item 5)
    Files.writeString(Paths.get(s"$outDir/queries.txt"),
      selected.keys.toSeq.sorted.mkString("\n"))
    spark.stop()
  }
}
