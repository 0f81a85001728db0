package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's whole per-symbol state machine
  * (`dataCollector.py:20-30` state, `:80-94` update, `:140-163` flush)
  * packaged as one typed Spark `Aggregator` — usable as a UDAF column
  * (`udaf(OhlcAggregator)`) or with `groupByKey(...).agg(...)`.
  *
  * merge() is the piece the reference never needed (single thread):
  * it makes the same state machine associative so Spark can run it as
  * partial aggregates per partition + a final merge — the property
  * that lets the identical logic scale out.
  */
object OhlcAggregator
    extends Aggregator[(Long, Double), OhlcBuf, OhlcResult] {

  override def zero: OhlcBuf =
    OhlcBuf(Long.MaxValue, 0.0, Long.MinValue, 0.0,
      Double.NegativeInfinity, Double.PositiveInfinity, 0.0, 0L)

  override def reduce(b: OhlcBuf, in: (Long, Double)): OhlcBuf = {
    val (tsMicros, price) = in
    OhlcBuf(
      openTs = if (tsMicros < b.openTs) tsMicros else b.openTs,
      open = if (tsMicros < b.openTs) price else b.open,
      closeTs = if (tsMicros > b.closeTs) tsMicros else b.closeTs,
      close = if (tsMicros > b.closeTs) price else b.close,
      high = math.max(b.high, price),
      low = math.min(b.low, price),
      sum = b.sum + price,
      count = b.count + 1L)
  }

  override def merge(a: OhlcBuf, b: OhlcBuf): OhlcBuf =
    if (a.count == 0L) b
    else if (b.count == 0L) a
    else OhlcBuf(
      openTs = math.min(a.openTs, b.openTs),
      open = if (a.openTs <= b.openTs) a.open else b.open,
      closeTs = math.max(a.closeTs, b.closeTs),
      close = if (a.closeTs >= b.closeTs) a.close else b.close,
      high = math.max(a.high, b.high),
      low = math.min(a.low, b.low),
      sum = a.sum + b.sum,
      count = a.count + b.count)

  override def finish(b: OhlcBuf): OhlcResult =
    OhlcResult(b.open, b.high, b.low, b.close,
      if (b.count == 0L) 0.0 else b.sum / b.count, b.count)

  override def bufferEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
  override def outputEncoder: Encoder[OhlcResult] =
    Encoders.product[OhlcResult]
}

/** Partial-aggregate state == the reference's `running_metrics` dict
  * plus the timestamps needed to make first/last associative.
  */
case class OhlcBuf(
    openTs: Long, open: Double, closeTs: Long, close: Double,
    high: Double, low: Double, sum: Double, count: Long)

case class OhlcResult(
    open_price: Double, high_price: Double, low_price: Double,
    close_price: Double, avg_price: Double, sample_count: Long)
