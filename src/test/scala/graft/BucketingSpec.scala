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
}
