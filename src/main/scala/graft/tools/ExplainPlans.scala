package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the plan-shape review
  * (SURVEY.md §4 / the 100 TB checklist). Not part of the driver
  * contract. Usage: runMain graft.tools.ExplainPlans [names...]
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "pricing_summary", "join_broadcast", "join_shuffle", "topk_orders",
      "similarity_topk", "ohlc_hourly")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
