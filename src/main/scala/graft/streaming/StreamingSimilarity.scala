package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Determinism.r6
import graft.functions.VectorExprs
import graft.operators.LlmVectorOps

/** S8 `streaming_similarity` — the online-serving half of the vector
  * surface: a watermarked stream of probe vectors searched against a
  * STATIC corpus, exact top-k per probe emitted once the probe's
  * event-time window closes.
  *
  * Shape: the corpus is quantized once (int8 codes — the same
  * `graft_int8_quantize` kernel as `similarity_topk_q8`, so scores
  * are the identical exact integers), persisted so micro-batches
  * don't re-run the quantization scan, and broadcast to the stream
  * side; each micro-batch is a map-side nested loop over
  * probe×codes, and the per-probe top-k folds through the bounded
  * `graft_topk` aggregate (`functions/TopKAgg`) — append mode,
  * state O(k) per (probe, window) at every partial, merge, and
  * state-store write (a collect_list+sort fold would checkpoint one
  * struct per corpus vector per probe until the watermark fires).
  * At 100 TB the static side outgrows a broadcast and the corpus
  * scan becomes the `similarity_lsh`-style bucket join per
  * micro-batch (or reads `CorpusSilver.writeQuantizedCodes` packed
  * bytes); the stream-side contract (watermark, windowed bounded
  * top-k, append) is unchanged — which is exactly the part this
  * module pins.
  *
  * The reference (a 5 s polling daemon) has no query-serving path at
  * all; this is the mandated-extension streaming analog of E19.
  */
object StreamingSimilarity {

  case class Probe(ts: java.sql.Timestamp, probe_id: Long,
      embedding: Array[Float])

  /** Exact top-k per probe per 1 h event-time window, 10 min
    * watermark. `probes` is a streaming frame with (ts, probe_id,
    * embedding); `corpus` a static (vec_id, embedding) frame. Output:
    * (window_start, probe_id, topk ARRAY<STRUCT<vec_id, score>>) —
    * one append-mode row per closed window per probe.
    */
  def topkStream(s: SparkSession, probes: DataFrame, corpus: DataFrame,
      k: Int = 10): DataFrame = {
    val codes = LlmVectorOps.quantized(s, corpus)
      .select(col("vec_id"), col("qemb"))
      .withColumn("qq", VectorExprs.dot(s, col("qemb"), col("qemb")))
      .where(col("qq") > 0.0)
    // the static side of a stream-static join is re-evaluated every
    // micro-batch: persist so the quantization scan runs once, not
    // per trigger (a long-lived deployment serves the packed
    // CorpusSilver code table instead and skips this entirely)
    codes.persist()
    val pq = LlmVectorOps.quantized(s, probes)
      .select(col("ts"), col("probe_id"), col("qemb").as("p_q"))
      .withColumn("p_qq", VectorExprs.dot(s, col("p_q"), col("p_q")))
      .where(col("p_qq") > 0.0)
      .withWatermark("ts", "10 minutes")
    val scored = pq.join(broadcast(codes))
      .withColumn("score", r6(
        VectorExprs.dot(s, col("p_q"), col("qemb"))
          / (sqrt(col("p_qq")) * sqrt(col("qq")))))
    scored
      .groupBy(window(col("ts"), "1 hour"), col("probe_id"))
      // bounded top-k aggregate — O(k) state; same (score desc,
      // vec_id asc) ranking rule as the batch top-k family
      .agg(graft.functions.TopKAgg.topk(s, col("score"), col("vec_id"), k)
        .as("topk"))
      .select(col("window.start").as("window_start"), col("probe_id"),
        col("topk"))
  }
}
