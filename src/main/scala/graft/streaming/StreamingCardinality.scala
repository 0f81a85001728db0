package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S11 `streaming_kmv` — windowed approximate cardinality with a
  * bounded-state AGGREGATE: unique users per (event-time window,
  * group) while the stream runs, the classic streaming-analytics ask
  * the batch `distinct_users_kmv` answers retroactively.
  *
  * Why not the obvious spellings: `approx_count_distinct` is not
  * supported on streaming aggregations, and an exact streaming
  * `countDistinct` needs per-key distinct state that grows with true
  * cardinality. This composes the two streaming-safe pieces the
  * engine already has: watermark-scoped deduplication feeding the
  * bounded `graft_topk` aggregate as a KMV sketch (score = −h keeps
  * the k SMALLEST distinct portable hashes; O(k) state per
  * (window, group) at every partial, merge, and state-store write).
  * The estimate n̂ = (k−1)·M/h₍ₖ₎ — identical arithmetic to the
  * batch row, and groups under k distinct report the exact count.
  *
  * State honesty: only the AGGREGATE's state is O(k). The upstream
  * dropDuplicates keeps one state row per distinct (window, group,
  * hash) until the watermark passes the window — i.e. the dedup
  * stage's footprint is watermark-horizon × per-window cardinality,
  * the same order as exact distinct state over the open windows. The
  * win over exact streaming countDistinct is therefore eviction
  * discipline (the window in the dedup key caps state at the horizon,
  * not the stream's lifetime) and the O(k) downstream/emit path, not
  * a sub-cardinality total footprint; a genuinely k-bounded pipeline
  * would need the sketch to absorb raw (non-distinct) rows, which
  * `graft_topk`'s keep-max semantics over duplicate hashes cannot
  * (duplicates of one hash would evict distinct smaller ones).
  *
  * Output: (window_start, event_type, n_users_kmv), one append-mode
  * row per closed 1 h window, 10 min watermark.
  */
object StreamingCardinality {

  /** `events` is a streaming frame with (ts TIMESTAMP, event_type
    * STRING, user_id LONG). `k` sizes the sketch (error ~1/√(k−2)).
    */
  def kmvStream(s: SparkSession, events: DataFrame, k: Int = 64): DataFrame = {
    val m = 2147483647.0
    val h = pmod(
      pmod(col("user_id"), lit(1048573L)) * lit(2654435761L)
        + pmod(col("user_id"), lit(8191L)) * lit(131L),
      lit(2147483647L)) + lit(1L)
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("h", h)
      .withColumn("win", window(col("ts"), "1 hour"))
      // KMV needs DISTINCT hashes: per-(window, group, hash) dedup,
      // with the window column in the key so the dedup state for a
      // window is dropped once the watermark passes it — without it
      // this state would grow forever
      .dropDuplicates("win", "event_type", "h")
      .groupBy(col("win"), col("event_type"))
      .agg(graft.functions.TopKAgg.topk(s,
        -col("h").cast("double"), col("h"), k).as("t"))
      .select(col("win.start").as("window_start"), col("event_type"),
        when(size(col("t")) < k, size(col("t")).cast("long"))
          .otherwise(floor(
            lit((k - 1).toDouble) * lit(m)
              / expr("""CAST(aggregate(t, CAST(0 AS BIGINT),
                          (acc, x) -> greatest(acc, x.vec_id)) AS DOUBLE)""")
              + 0.5).cast("long"))
          .as("n_users_kmv"))
  }
}
