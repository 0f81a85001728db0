package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ReferenceOps

/** The reference pipeline assembled end-to-end (SURVEY.md §3):
  * ingest → raw layer → hourly downsample → retention, as idempotent
  * lake writes instead of the reference's SQLite/Postgres sinks.
  *
  * Sink semantics vs the reference:
  * - raw append (`dataCollector.py:120-128`) → date-partitioned parquet
  *   append; one atomic job commit per batch replaces the per-poll
  *   `conn.commit()`.
  * - hourly flush (`dataCollector.py:140-163`) → *dynamic partition
  *   overwrite* by date: re-flushing an hour is idempotent, fixing the
  *   reference's PK-violating bare INSERT (`dataCollector.py:73,146-150`,
  *   SURVEY §7 "no-upsert flush").
  * - daily truncate (`dataCollector.py:130-136`) → partition drop of
  *   date directories older than the retention window; with
  *   partition-by-date layout, readers get partition pruning for free.
  */
object CryptoIngest {

  /** Land a tick batch into the raw layer, partitioned by event date. */
  def landRaw(ticks: DataFrame, path: String): Unit =
    ticks
      .withColumn("date", to_date(col("ts")))
      .write.partitionBy("date").mode("append").parquet(path)

  /** Downsample ticks to hourly OHLC and flush idempotently
    * (overwrite only the date partitions present in this batch).
    */
  def flushHourly(ticks: DataFrame, path: String): Unit = {
    val spark = ticks.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      ReferenceOps.ohlcAgg(ticks)
        .write.partitionBy("date").mode("overwrite").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Drop raw-layer date partitions strictly older than `keepDays`
    * days before `asOf`. Pure partition-directory deletes — no data
    * rewrite, O(partitions) metadata work at any scale.
    * Returns the dropped partition dates.
    */
  def applyRetention(spark: SparkSession, path: String, asOf: java.time.LocalDate,
      keepDays: Int): Seq[String] = {
    val cutoff = asOf.minusDays(keepDays.toLong - 1).toString
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val dropped = fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("date="))
      .filter(_.getName.stripPrefix("date=") < cutoff)
    dropped.foreach(fs.delete(_, true))
    dropped.map(_.getName.stripPrefix("date="))
  }

  /** One full pipeline pass over a landed tick batch: raw append,
    * hourly flush, retention. The batch twin of the reference's
    * `run()` loop iteration (`dataCollector.py:179-220`).
    */
  def runBatch(ticks: DataFrame, rawPath: String, hourlyPath: String,
      keepDays: Int = 1): Seq[String] = {
    val spark = ticks.sparkSession
    landRaw(ticks, rawPath)
    flushHourly(ticks, hourlyPath)
    val maxDay = ticks.agg(max(to_date(col("ts")))).collect().head.getDate(0)
    applyRetention(spark, rawPath, maxDay.toLocalDate, keepDays)
  }
}
