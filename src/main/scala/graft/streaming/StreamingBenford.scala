package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Determinism.r6
import graft.operators.AnalyticOps

/** S20 `streaming_benford` — the batch `benford_deviation` screen on
  * the ingest path: per closed 1-hour event-time window, the
  * first-digit distribution of arriving values against the nine
  * Benford literals, emitting the worst absolute deviation and an
  * alarm flag. A feed that starts clipping, fabricating, or
  * unit-mangling numbers bends this curve within a window — hours
  * before aggregate stats drift (the live twin of the batch
  * forensic audit, on the S16 conditional-bin-sum discipline).
  *
  * One stateful aggregation: nine conditional digit sums inside a
  * single windowed groupBy (append mode — each window emits exactly
  * once at watermark close), the share/deviation fold row-local
  * AFTER the aggregate with the batch literals and fences. State per
  * open window is O(9 longs). Sub-cent and non-positive values can't
  * take a leading digit; they are excluded INSIDE the aggregate
  * (digit null → no bucket) rather than by a row filter, so every
  * event still advances the watermark (deterministic filters are
  * pushed below EventTimeWatermark — a dropped row would never move
  * it). The digit rule and the nine shares are the SAME vals the
  * batch operator uses (`AnalyticOps.firstDigit` /
  * `benfordShares`), so the two screens cannot drift.
  */
object StreamingBenford {

  /** `events` streaming with (ts TIMESTAMP, value DOUBLE). Emits
    * (window_start, n, max_abs_deviation, alarm) once per closed
    * 1-hour window; `alarmAt` is the deviation threshold.
    */
  def benfordStream(events: DataFrame, alarmAt: Double = 0.05): DataFrame = {
    val withDigit = events
      .withWatermark("ts", "10 minutes")
      .withColumn("vq",
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
      .withColumn("digit",
        when(col("vq") >= 1, AnalyticOps.firstDigit("vq")))
    val agg = withDigit
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        sum(when(col("digit").isNotNull, 1L).otherwise(0L)).as("n"),
        (1 to 9).map(dg =>
          sum(when(col("digit") === dg, 1L).otherwise(0L)).as(s"c$dg")): _*)
    def dev(dg: Int): Column = {
      val share = AnalyticOps.benfordShares(dg - 1)._2
      abs(r6(r6(col(s"c$dg").cast("double") / col("n").cast("double"))
        - lit(share)))
    }
    val maxDev = (1 to 9).map(dev).reduce((a, b) => greatest(a, b))
    agg
      .where(col("n") > 0)
      .select(col("window.start").as("window_start"), col("n"),
        maxDev.as("max_abs_deviation"),
        (maxDev > lit(alarmAt)).as("alarm"))
  }
}
