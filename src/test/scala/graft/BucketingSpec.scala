package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Bucketing, Tables}

/** Co-located join layout: bucketed tables join without a shuffle. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("same-bucket-count tables sort-merge join with zero exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.orders(spark, TestSpark.sf0001)
        .withColumnRenamed("o_custkey", "custkey")
      val customer = Tables.customer(spark, TestSpark.sf0001)
        .withColumnRenamed("c_custkey", "custkey")
      Bucketing.writeBucketed(orders, "b_orders", "custkey", 8)
      Bucketing.writeBucketed(customer, "b_customer", "custkey", 8)
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer",
        "custkey")
      assert(!Bucketing.hasShuffle(joined),
        "bucketed join must not shuffle:\n" +
          joined.queryExecution.executedPlan.toString)
      // and the join is still correct
      val plainCount = orders.join(customer, "custkey").count()
      assert(joined.count() == plainCount)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("bucketed silver pair + document tables serve survivors with zero exchanges") {
    // the 100 TB silver-table claim, proven in the plan: the pair
    // table buckets on the removal key j, documents on doc_id — the
    // consumer's distinct AND anti-join both reuse the on-disk hash
    // distribution, so the whole survivor pass plans without a single
    // ShuffleExchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.pipeline.CorpusSilver.writeDocumentsBucketed(
        spark, TestSpark.sf0001, "b_docs", 8)
      graft.pipeline.CorpusSilver.writePairsBucketed(
        spark, TestSpark.sf0001, "b_pairs", 8)
      val surv = graft.pipeline.CorpusSilver.survivorsBucketed(
        spark, "b_docs", "b_pairs")
      assert(!Bucketing.hasShuffle(surv),
        "bucketed survivor pass must not shuffle:\n" +
          surv.queryExecution.executedPlan.toString)
      // and it returns exactly the inline pipeline's survivor set
      val inline = graft.operators.LlmTextOps
        .dedupSurvivors(spark, TestSpark.sf0001)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      val silver = surv.collect().map(_.toSeq).sortBy(_.head.toString)
      assert(silver.toSeq == inline.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_pairs")
    }
  }
}
