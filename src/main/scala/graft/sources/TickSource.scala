package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion sources for the tick pipeline — the Spark twin of the
  * reference's fetch path (`dataCollector.py:97-117`).
  *
  * The reference polls the Binance spot REST endpoint per symbol and
  * parses `{"symbol": "...", "price": "<decimal string>"}` payloads
  * (`float(data['price'])`, `dataCollector.py:104-105`), skipping any
  * symbol whose fetch/parse fails (`dataCollector.py:101-116`). In a
  * zero-egress Spark deployment the poller is an external landing job;
  * this module owns everything after bytes land: payload parsing with
  * per-record error tolerance, and schema-checked JSON/CSV readers.
  */
object TickSource {

  /** Shape of one Binance ticker payload (`GET /api/v3/ticker/price`),
    * price as string exactly as the API returns it.
    */
  val apiPayloadSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("price", StringType)))

  /** Landed tick-file schema (raw layer rows, `dataCollector.py:49-55`
    * with a real timestamp instead of ISO text).
    */
  val tickSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("symbol", StringType),
    StructField("price", DoubleType)))

  /** Landing-zone contract for the external 5 s poller (the fetch loop
    * at `dataCollector.py:97-117`, which this zero-egress library
    * cannot own): each line records the fetch wall-clock and the raw
    * API payload string, untouched — parsing and error tolerance stay
    * inside the engine (`parseApiPayload`).
    */
  val landingSchema: StructType = StructType(Seq(
    StructField("fetch_ts", TimestampType),
    StructField("payload", StringType)))

  /** Parse a column of raw API payload strings into (symbol, price)
    * with the reference's skip-and-continue error semantics: a
    * malformed payload or non-numeric price yields null fields that
    * `dropMalformed` then filters — the batch never fails
    * (`dataCollector.py:101-116`, tested `tests.py:144-149`).
    *
    * @param fetchTs the event-time column to stamp (the reference uses
    *                fetch wall-clock, `dataCollector.py:106`)
    */
  def parseApiPayload(df: DataFrame, payload: Column, fetchTs: Column,
      dropMalformed: Boolean = true): DataFrame = {
    val parsed = df
      .withColumn("_p", from_json(payload, apiPayloadSchema))
      .withColumn("ts", fetchTs)
      .withColumn("symbol", col("_p.symbol"))
      // try_cast semantics: bad decimal string -> null, no ANSI error
      .withColumn("price", expr("try_cast(_p.price AS DOUBLE)"))
      .select("ts", "symbol", "price")
    if (dropMalformed)
      parsed.where(col("symbol").isNotNull && col("price").isNotNull)
    else parsed
  }

  /** Read landed JSON-lines ticks with explicit schema; PERMISSIVE
    * keeps bad records as nulls, DROPMALFORMED skips them (R9).
    */
  def fromJsonLines(spark: SparkSession, path: String,
      mode: String = "DROPMALFORMED"): DataFrame =
    spark.read.schema(tickSchema).option("mode", mode).json(path)

  /** Read landed CSV ticks (header: ts,symbol,price) with explicit
    * schema and the same malformed-record policy.
    */
  def fromCsv(spark: SparkSession, path: String,
      mode: String = "DROPMALFORMED"): DataFrame =
    spark.read.schema(tickSchema)
      .option("header", "true").option("mode", mode)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path)
}
