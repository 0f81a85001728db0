package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S13 `streaming_topk` — windowed heavy hitters with bounded sketch
  * state: the top-n most frequent keys per closed event-time window,
  * while the stream runs — the live twin of the batch
  * `heavy_hitters` / `heavy_hitters_mg` rows (who is hammering the
  * feed THIS hour, dataCollector.py's monitoring concern).
  *
  * Why the obvious spelling can't ship: exact per-window top-k needs
  * `groupBy(win, key).count()` → rank — a chained stateful aggregate
  * whose first stage keeps one state row per distinct (window, key),
  * unbounded in the key space. The Misra–Gries aggregate
  * (`functions.MisraGriesAgg`) collapses that to ONE stateful
  * aggregate with O(capacity) state per window — the state store
  * holds a ≤capacity counter map per open window, and any key with
  * frequency > n/(capacity+1) is guaranteed present (reported counts
  * undercount by at most n/(capacity+1); with capacity ≥ distinct
  * keys the counts are exact — the regime the spec pins stream ==
  * batch in).
  *
  * Output: (window_start, rank, user_id, cnt) per closed 1 h window,
  * append mode, 10 min watermark — rank by (cnt desc, key asc), the
  * summary's own order rule.
  */
object StreamingTopk {

  /** `events` is a streaming frame with (ts TIMESTAMP, user_id LONG).
    * `capacity` sizes the sketch; `n` is the emitted top-n.
    */
  def topkStream(s: SparkSession, events: DataFrame,
      capacity: Int = 256, n: Int = 3): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.MisraGriesAgg.mg(s, col("user_id"), capacity)
        .as("mg"))
      .select(col("window.start").as("window_start"),
        posexplode(expr(s"slice(mg, 1, $n)")).as(Seq("r", "e")))
      .select(col("window_start"), (col("r") + 1).cast("int").as("rank"),
        col("e.key").as("user_id"), col("e.cnt").as("cnt"))
}
