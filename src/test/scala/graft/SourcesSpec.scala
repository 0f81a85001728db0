package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TickSource

/** Ingestion-source semantics: Binance-payload parsing with the
  * reference's skip-and-continue error tolerance
  * (`dataCollector.py:101-116`), and schema-checked JSON/CSV landing.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseApiPayload: good payloads parsed, malformed skipped, batch survives") {
    val payloads = Seq(
      """{"symbol": "BTCUSDT", "price": "50000.00"}""",
      """{"symbol": "ETHUSDT", "price": "3000.55"}""",
      """{"symbol": "LTCBTC", "price": "not_a_number"}""", // bad price
      """not json at all""",                               // bad payload
      """{"symbol": "XRPUSDT"}""")                         // missing price
    val df = payloads.toDF("payload")
      .withColumn("fetch_ts", lit("2024-01-01 10:00:00").cast("timestamp"))
    val out = TickSource.parseApiPayload(df, col("payload"), col("fetch_ts"))
      .orderBy("symbol").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("BTCUSDT", "ETHUSDT"))
    assert(out.head.getDouble(2) == 50000.0)
    // permissive mode keeps the wreckage as nulls instead
    val kept = TickSource.parseApiPayload(df, col("payload"), col("fetch_ts"),
      dropMalformed = false)
    assert(kept.count() == 5)
  }

  test("all-fetches-fail vector (tests.py:144-149): empty batch, no error") {
    val df = Seq("boom", "{bad").toDF("payload")
      .withColumn("fetch_ts", lit("2024-01-01 10:00:00").cast("timestamp"))
    assert(TickSource.parseApiPayload(df, col("payload"), col("fetch_ts"))
      .count() == 0)
  }

  test("JSON and CSV landing round-trip with DROPMALFORMED") {
    val tmp = Files.createTempDirectory("graft_src").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/ticks.json"),
      """{"ts": "2024-01-01T10:00:00", "symbol": "BTCUSDT", "price": 50000.0}
        |{"ts": "2024-01-01T10:00:05", "symbol": "ETHUSDT", "price": 3000.5}
        |{"ts": "garbage", "symbol": 12
        |""".stripMargin)
    val j = TickSource.fromJsonLines(spark, s"$tmp/ticks.json")
    assert(j.where(col("symbol").isNotNull).count() == 2)
    Files.writeString(java.nio.file.Paths.get(s"$tmp/ticks.csv"),
      """ts,symbol,price
        |2024-01-01 10:00:00,BTCUSDT,50000.0
        |2024-01-01 10:00:05,ETHUSDT,3000.5
        |""".stripMargin)
    val c = TickSource.fromCsv(spark, s"$tmp/ticks.csv")
    assert(c.count() == 2)
    assert(c.agg(sum("price")).collect().head.getDouble(0) == 53000.5)
  }

  test("similarity_ivf returns ranked neighbors per probe") {
    val out = graft.operators.LlmVectorOps
      .similarityIvf(spark, TestSpark.sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val perProbe = rows.groupBy(_.getLong(0))
    perProbe.foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(1)).toSeq
      assert(ranks == (1 to ranks.size).toSeq, "ranks must be contiguous from 1")
    }
  }
}
