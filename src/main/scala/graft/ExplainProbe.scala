package graft
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_NO_BROADCAST=1 disables auto-broadcast so the
    // sort-merge plans the local row counts hide — the shapes the
    // 100 TB claims are actually about — become visible (r16; used
    // for the components-pin plan evidence in plans/r16/)
    if (sys.env.get("SPARK_GRAFT_NO_BROADCAST").contains("1"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (name <- args) {
      println(s"######## $name")
      // r16: names resolve through AbProbe.variants (a superset of the
      // registry — declared queries appear as both "x" and
      // "declared/x"), so A/B counterpart shapes can be dumped too
      val q = SparkEntry.queries.getOrElse(name, AbProbe.variants(name))
      q(spark, "/root/testdata/sf0.1").explain("formatted")
    }
    spark.stop()
  }
}
