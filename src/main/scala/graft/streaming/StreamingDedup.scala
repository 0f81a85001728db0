package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S23 `streaming_dedup` — exact dedup on the ingest path: the
  * streaming twin of `dedup_exact_digest` / `dedup_incremental`. Each
  * document hashes to an 8-byte xxhash64 digest and
  * `dropDuplicatesWithinWatermark` keeps the FIRST arrival per digest,
  * dropping any duplicate that lands within the watermark horizon.
  *
  * The `WithinWatermark` variant — not plain `dropDuplicates` — is the
  * 100 TB-honest choice: per-digest state EXPIRES once the watermark
  * passes it, so state size is bounded by the horizon's arrival rate
  * instead of growing with the corpus forever (the documented trade: a
  * duplicate arriving later than the horizon re-emits, which the batch
  * `dedup_incremental` ledger pass reconciles downstream — exactly the
  * streaming-dedup + nightly-compaction split production pipelines
  * run). Only (ts, doc_id, digest) rows carry state — never text.
  */
object StreamingDedup {

  /** `documents` streaming with (ts TIMESTAMP, doc_id LONG,
    * text STRING). Emits the first arrival per text digest within the
    * watermark horizon.
    */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "10 minutes")
      .withColumn("digest", xxhash64(col("text")))
      .dropDuplicatesWithinWatermark("digest")
      .select(col("ts"), col("doc_id"), col("digest"))
}
