package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LlmTextOps

/** S12 `streaming_mixture` — temperature-weighted source mixing on
  * the ingest path: the batch `mixture_sample` decides which
  * documents of a SETTLED corpus enter the training mix; this gate
  * applies the same decision to documents as they ARRIVE, so the
  * landed corpus is already mixture-correct and no retroactive
  * subsample pass is needed.
  *
  * Deployment shape: the per-source weights are a property of a
  * reference corpus (the silver snapshot the mixture was tuned on),
  * not of the unbounded stream — computing √n_s over a stream would
  * mean unbounded-lookback state for exactly the quantity that is
  * supposed to be a curated, versioned artifact. So the static side
  * is [[LlmTextOps.mixtureThresholds]] over the reference corpus
  * (driver-small: one row per source), PERSISTED by the caller-owned
  * rule ([[StreamingDecontaminate.benchmarkGrams]] precedent — the
  * static side of a stream-static join re-evaluates every
  * micro-batch; a nightly-refresh deployment unpersists the old
  * frame when swapping).
  *
  * The gate itself is STATELESS: broadcast threshold join + the
  * shared [[LlmTextOps.mixtureMember]] modular-hash cut, emitted in
  * the same micro-batch, zero streaming state. Because membership is
  * append-stable (a pure function of doc_id and the source
  * threshold), replayed micro-batches reproduce identical verdicts —
  * exactly-once output without any dedup state — and the stream
  * gate provably agrees with what the batch operator would have
  * decided for the same document (StreamingSpec S12 pins the two
  * verdict-for-verdict).
  */
object StreamingMixture {

  /** Per-source thresholds from the static reference corpus,
    * persisted (caller-owned lifecycle — see object doc). */
  def mixtureWeights(referenceDocs: DataFrame): DataFrame =
    LlmTextOps.mixtureThresholds(referenceDocs).persist()

  /** `docs` is a streaming frame with (ts TIMESTAMP, doc_id LONG,
    * source STRING, ...); `weights` the [[mixtureWeights]] frame.
    * Output: one append-mode row per KEPT document — (ts, doc_id,
    * source, p_s) — in the same micro-batch it arrived. Documents
    * from sources absent in the reference corpus are DROPPED (inner
    * join): an unknown source has no mixture weight, and silently
    * admitting it at weight 1 would distort the mix the weights were
    * tuned for — deployments alarm on the gap via a count on the
    * pre-gate stream, the S10 unknown-symbol posture.
    */
  def mixtureStream(docs: DataFrame, weights: DataFrame): DataFrame =
    docs.join(broadcast(weights), Seq("source"))
      .where(LlmTextOps.mixtureMember(col("doc_id"), col("ht")))
      .select(col("ts"), col("doc_id"), col("source"), col("p_s"))
}
