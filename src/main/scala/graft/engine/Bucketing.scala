package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: the co-located-join story for repeated
  * fact⋈fact joins at scale. Writing both sides bucketed (and sorted)
  * by the join key with the same bucket count lets sort-merge joins
  * run with **zero exchange** — the shuffle is paid once at write
  * time instead of on every query. This is the layout the raw/silver
  * tables of a 100 TB deployment would use for their hot join keys.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With equal
    * bucket counts Catalyst plans a sort-merge join whose children
    * report the bucket distribution — no ShuffleExchange on either
    * side (assert with [[hasShuffle]]).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True if the executed plan contains any shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
}
