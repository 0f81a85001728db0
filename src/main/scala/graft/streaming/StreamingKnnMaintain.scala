package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.KnnIncremental

/** S29 `streaming_knn_maintain` — ONLINE maintenance of the
  * incremental kNN edge silver ([[KnnIncremental]]): a stream of new
  * corpus vectors (vec_id, embedding) folds into the stored
  * edge/member/probe tables one micro-batch at a time, so the graph
  * consumers (`pagerank_docs`, `khop_reachability`, …) always serve a
  * current edge set without a rebuild ever running.
  *
  * Shape: `foreachBatch` → [[KnnIncremental.append]] with
  * epoch = batchId + 1 (epoch 0 is the initial [[KnnIncremental.build]]).
  * foreachBatch is at-least-once — after a crash between the sink
  * write and the checkpoint commit, the SAME batch id replays — and
  * the append is IDEMPOTENT per epoch by construction (every artifact
  * lands by overwrite in its own `epoch=N` subdir; every read of
  * prior state filters `epoch < N`), so the replay converges to the
  * exact same silver: the S7c exactly-once posture with the epoch dir
  * as the transaction boundary instead of a staging table.
  *
  * No watermark / no streaming state: the maintenance is stateless
  * per micro-batch (all durable state lives in the silver), which is
  * what makes the replay contract purely a storage-layout property —
  * StreamingSpec S29/S29r pin batch-parity and kill + restart
  * stability.
  *
  * The reference (dataCollector.py's 5 s polling loop) appends rows,
  * never maintains a derived index; this is the mandated-extension
  * online twin of `knn_edges_incremental`.
  */
object StreamingKnnMaintain {

  case class VecRow(vec_id: Long, embedding: Array[Float])

  /** Maintain the incremental edge silver at `dir` (already
    * [[KnnIncremental.build]]-initialized) from a streaming frame of
    * (vec_id, embedding). Returns the writer so the caller sets
    * checkpoint/trigger and starts it.
    */
  def maintainStream(s: SparkSession, vecs: DataFrame,
      dir: String): DataStreamWriter[Row] =
    vecs.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      // an empty replayed/no-op batch must not write empty epoch dirs
      if (!b.isEmpty) KnnIncremental.append(s, dir, b, epoch = id + 1)
    }
}
