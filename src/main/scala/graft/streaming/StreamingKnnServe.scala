package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs
import graft.operators.LlmVectorOps

/** S28 `streaming_knn_serve` — the ONLINE twin of the routed kNN edge
  * substrate (`spark.graft.knn.source=ivf`): a watermarked stream of
  * probe vectors served against a static corpus through the SAME
  * IVF-candidate machinery the batch edge build routes through, exact
  * top-k within the probed lists emitted once each probe's event-time
  * window closes.
  *
  * Where S8 (`StreamingSimilarity`) brute-force scans the whole
  * quantized corpus per probe — right when the corpus broadcasts —
  * this module is the serving shape for the corpus that DOESN'T: the
  * static side is pre-digested ONCE into the seed codebook plus
  * inverted member lists (the `knnEdges3Ivf` layout, persisted so
  * micro-batches re-scan nothing), and each probe touches only its
  * `nprobe` nearest lists:
  *
  *   1. per micro-batch, ONE compiled scan per probe over the
  *      BROADCAST codebook yields its nprobe nearest list ids
  *      ([[VectorExprs.cosineKnn]] — k ≈ n/100 centroid structs);
  *   2. the stream joins the persisted (cent_id, members[]) lists on
  *      the 8-byte list key — n·nprobe skinny rows, never a corpus
  *      scan;
  *   3. each (probe, probed list) pair runs ONE compiled scored scan
  *      ([[VectorExprs.cosineKnnScored]]) over the list's member
  *      array — top-k (id, r6 score) per list, ~stride dots each;
  *   4. keep-1 assignment puts every corpus vector in EXACTLY one
  *      list, so the per-list partials are disjoint and the bounded
  *      `graft_topk` aggregate ([[graft.functions.TopKAgg]]) over
  *      them IS the exact top-k within the probed lists — O(k) state
  *      per (probe, window) at every partial, merge, and state-store
  *      write, append mode.
  *
  * Recall contract: identical to the batch route — exact within the
  * probed lists, list coverage is the `nprobe` dial (full probe ==
  * S8's exact answer; the isotropy caveat in
  * [[LlmVectorOps.KnnNprobeConf]]'s scaladoc applies unchanged, as
  * does its out-degree note: a probe whose lists are all empty emits
  * no row). At 100 TB the lists live as a parquet silver and the
  * stream-static join reads it pruned by cent_id; the stream-side
  * contract (watermark, windowed bounded top-k, append, checkpoint
  * replay) is unchanged — StreamingSpec pins closed-window emission
  * and kill + checkpoint-restart replay stability.
  *
  * The reference (a 5 s polling daemon, dataCollector.py:16-231) has
  * no serving path at all; this is the mandated-extension streaming
  * analog of the round-11 `knn_edges` substrate.
  */
object StreamingKnnServe {

  case class Probe(ts: java.sql.Timestamp, probe_id: Long,
      embedding: Array[Float])

  /** Exact-within-probed-lists top-k per probe per 1 h event-time
    * window, 10 min watermark. `probes` is a streaming frame with
    * (ts, probe_id, embedding); `corpus` a static (vec_id, embedding)
    * frame whose seed centroids are the vectors with
    * vec_id % [[LlmVectorOps.ivfStride]] == 0 (the batch route's
    * codebook rule). Output: (window_start, probe_id,
    * topk ARRAY<STRUCT<vec_id, score>>) — one append-mode row per
    * closed window per probe with ≥ 1 candidate.
    */
  def knnServeStream(s: SparkSession, probes: DataFrame, corpus: DataFrame,
      k: Int = 10, nprobe: Int = 8): DataFrame = {
    val e = LlmVectorOps.withNorm(s, corpus, "embedding", "norm")
      .select(col("vec_id"), col("embedding"), col("norm"))
    // static digests are re-evaluated every micro-batch in a
    // stream-static join: persist both so the corpus is scanned once
    // at first trigger, never per trigger (a long-lived deployment
    // writes the lists as a parquet silver instead). Memoized through
    // SessionMemo keyed on the corpus plan — a bare persist() here
    // leaked two cached frames per stream construction for the
    // session's lifetime; the memo makes repeats (and restarts over
    // the same corpus) reuse ONE entry, unpersisted at context stop
    // or SessionMemo.invalidate like every other silver.
    val corpusKey = corpus.queryExecution.analyzed.semanticHash()
    val centArr = graft.engine.SessionMemo.getOrBuild(s,
      s"s28_centroids|$corpusKey")(
      LlmVectorOps.seedCentroids(e)
        .agg(collect_list(struct(col("cent_id"), col("cent_emb"),
          col("cent_norm"))).as("cents")))
    val lists = graft.engine.SessionMemo.getOrBuild(s,
      s"s28_lists|$corpusKey")(
      e.crossJoin(broadcast(centArr))
        .select(VectorExprs.cosineKnn(s, col("embedding"), col("norm"),
          lit(-1L), col("cents"), 1)(0).as("cent_id"),
          struct(col("vec_id"), col("embedding"), col("norm")).as("member"))
        .groupBy(col("cent_id"))
        .agg(collect_list(col("member")).as("members")))
    val p = LlmVectorOps.withNorm(s, probes, "embedding", "norm")
      .select(col("ts"), col("probe_id"), col("embedding"), col("norm"))
      .withWatermark("ts", "10 minutes")
    // probe → its nprobe nearest lists (selfId −1: a probe excludes
    // no corpus vector — external ids live in a different key space)
    val probed = p.crossJoin(broadcast(centArr))
      .select(col("ts"), col("probe_id"), col("embedding"), col("norm"),
        explode(VectorExprs.cosineKnn(s, col("embedding"), col("norm"),
          lit(-1L), col("cents"), nprobe)).as("cent_id"))
    val scored = probed.join(broadcast(lists), Seq("cent_id"))
      .select(col("ts"), col("probe_id"),
        explode(VectorExprs.cosineKnnScored(s, col("embedding"),
          col("norm"), lit(-1L), col("members"), k)).as("c"))
    scored
      .groupBy(window(col("ts"), "1 hour"), col("probe_id"))
      // disjoint per-list partials → the bounded merge is exact; same
      // (score desc, vec_id asc) rule as the batch top-k family
      .agg(graft.functions.TopKAgg.topk(s, col("c.score"), col("c.id"), k)
        .as("topk"))
      .select(col("window.start").as("window_start"), col("probe_id"),
        col("topk"))
  }
}
