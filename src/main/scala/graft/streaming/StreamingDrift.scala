package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S16 `streaming_psi` — the batch `psi_drift` posture turned into a
  * LIVE drift alarm: per (1-hour event-time window, symbol), the
  * Population Stability Index of the window's price distribution
  * against a STATIC reference profile (decile bounds + smoothed
  * reference shares from the batch history — the model-monitoring
  * deployment shape: the reference is fit when the model ships, the
  * stream is scored against it forever after).
  *
  * One stateful aggregation only: the per-bin counts ride TEN
  * conditional sums inside a single windowed groupBy (never a second
  * chained stateful agg — append mode emits each (window, symbol) row
  * exactly once at watermark close), and the PSI fold over the ten
  * bins is row-local arithmetic AFTER the aggregate, using the exact
  * batch recipe: Laplace-smoothed shares on the 6-dp grid, fenced ln
  * input, terms quantized at 10⁻⁶ and summed in WRITTEN bin order
  * (a fixed 10-term expression — no fold-order exposure at all).
  * State per open window is O(symbols × 10 longs).
  *
  * `reference` must be driver-small (|symbols| rows: bounds array +
  * 10 reference shares, from [[referenceProfile]]) and is broadcast;
  * its lifecycle is caller-owned, the StreamingAnomalies stats
  * posture. Symbols absent from the reference pass unscored (inner
  * join) — route them to a coverage alarm, never silently widen.
  */
object StreamingDrift {

  /** Static reference profile from a batch history frame with
    * (symbol, price): 9 decile bounds on the 6-dp grid plus the 10
    * Laplace-smoothed reference shares, each share itself fenced to
    * the grid — one row per symbol, persisted for re-use across
    * micro-batches (caller unpersists on refresh).
    */
  def referenceProfile(history: DataFrame): DataFrame = {
    val bounds = history.groupBy(col("symbol"))
      .agg(expr(
        """transform(
             percentile(price, array(0.1, 0.2, 0.3, 0.4, 0.5,
                                     0.6, 0.7, 0.8, 0.9)),
             b -> floor(b * 1000000 + 0.5) / 1000000)""").as("bs"))
    val shares = history.join(bounds, Seq("symbol"))
      .select(col("symbol"),
        (size(expr("filter(bs, b -> price > b)")) + 1).as("bin"))
      .groupBy(col("symbol"))
      .pivot("bin", (1 to 10).toSeq)
      .count()
    val total = (1 to 10).map(b => coalesce(col(s"$b"), lit(0L)))
      .reduce(_ + _)
    bounds.join(shares, Seq("symbol"))
      .select(col("symbol") +: col("bs") +:
        (1 to 10).map(b =>
          graft.engine.Determinism.r6(
            (coalesce(col(s"$b"), lit(0L)) + 1).cast("double")
              / (total + 10).cast("double")).as(s"p$b")): _*)
      .persist()
  }

  /** `ticks` streaming with (ts, symbol, price); `reference` from
    * [[referenceProfile]]. Emits (window_start, symbol, n, psi) once
    * per closed 1-hour window.
    */
  def psiStream(ticks: DataFrame, reference: DataFrame): DataFrame = {
    val binned = ticks
      .withWatermark("ts", "10 minutes")
      .join(broadcast(reference), Seq("symbol"))
      .withColumn("bin",
        size(expr("filter(bs, b -> price > b)")) + 1)
    // first() over a broadcast-joined constant is deterministic per
    // (window, symbol) — every row of the group carries the same
    // reference share
    val agg = binned
      .groupBy(window(col("ts"), "1 hour"), col("symbol"))
      .agg(
        count(lit(1)).as("n"),
        (1 to 10).map(b =>
          sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"c$b"))
          ++ (1 to 10).map(b => first(col(s"p$b")).as(s"p$b")): _*)
    val nTot = col("n")
    def q(b: Int): Column = graft.engine.Determinism.r6(
      (col(s"c$b") + 1).cast("double") / (nTot + 10).cast("double"))
    val termQ: Column = (1 to 10).map { b =>
      floor(((q(b) - col(s"p$b"))
        * log(graft.engine.Determinism.r6(q(b) / col(s"p$b"))))
        * lit(1000000.0) + lit(0.5)).cast("long")
    }.reduce(_ + _)
    agg.select(col("window.start").as("window_start"), col("symbol"),
      col("n"),
      graft.engine.Determinism.r6(termQ.cast("double") / lit(1000000.0))
        .as("psi"))
  }
}
