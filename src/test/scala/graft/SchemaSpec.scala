package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-as-golden tests — the engine twin of the reference's DDL
  * string assertions (`tests.py:52-63` sqlite, `:65-82` postgres):
  * the hourly aggregate's shape is pinned to `downsampled_prices`
  * (`dataCollector.py:62-75`), the raw layer to `raw_prices`
  * (`dataCollector.py:49-55`).
  */
class SchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ohlc_hourly output pins the downsampled_prices DDL shape") {
    val schema = SparkEntry.queries("ohlc_hourly")(spark, TestSpark.sf0001)
      .schema
    val expected = Seq(
      "date" -> DateType, "hour" -> IntegerType, "symbol" -> StringType,
      "open_price" -> DoubleType, "high_price" -> DoubleType,
      "low_price" -> DoubleType, "close_price" -> DoubleType,
      "avg_price" -> DoubleType, "sample_count" -> LongType)
    assert(schema.fields.map(f => f.name -> f.dataType).toSeq == expected)
  }

  test("ingest_raw output pins the tick shape (raw_prices with real timestamp)") {
    val schema = SparkEntry.queries("ingest_raw")(spark, TestSpark.sf0001)
      .schema
    assert(schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "ts" -> TimestampType, "symbol" -> StringType, "price" -> DoubleType))
  }

  test("every oracle-gated query has a deterministic total-order sort key set") {
    // structural proxy: verify each declared query's output columns are
    // unique (sorted-column hashing relies on unambiguous names)
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, TestSpark.sf0001).columns.toSeq
      assert(cols.distinct.size == cols.size, s"$name has duplicate columns")
      assert(cols.forall(_.nonEmpty), s"$name has empty column name")
    }
  }
}
