package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Batch-shaped multimodal kernels — the Scala analogue of
  * `mapInPandas`: binary payloads flow through `mapPartitions` in
  * caller-sized batches so a real decoder (image/audio codec, ONNX
  * runtime, ffmpeg) could amortize per-batch setup. The decode itself
  * is a STUB (this container ships no codec libs); the distributed
  * plumbing — binary column in, fixed case-class schema out, batch
  * iteration, no shuffle — is real and tested (batch size must not
  * change results).
  */
object MultimodalKernels {

  /** Fixed feature schema for one media payload. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      // frame-sample stub: every stride-th byte as a "frame" signal
      sampled_frames: Seq[Int],
      // resize stub: fake dims scaled to fit a 64x64 thumbnail box
      thumb_w: Int,
      thumb_h: Int,
      byte_mean: Double)

  /** Deterministic stub decoder for one batch of payloads. Replace
    * the body with a real codec call; batch-at-a-time signature is
    * what an inference/codec library wants.
    */
  private[operators] def decodeBatch(
      batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) =>
      val (w, h, _) = LlmVectorOps.fakeDecode(bytes)
      val stride = math.max(1, bytes.length / 8)
      val frames = bytes.indices.by(stride).take(8)
        .map(i => bytes(i) & 0xff)
      val scale = 64.0 / math.max(w, h)
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      val mean = if (bytes.isEmpty) 0.0
      else math.rint(sum.toDouble / bytes.length * 1e6) / 1e6
      MediaFeatures(id, bytes.length, frames,
        math.max(1, math.rint(w * scale).toInt),
        math.max(1, math.rint(h * scale).toInt), mean)
    }

  /** Run the kernel over any (doc_id: Long, payload: binary) frame,
    * `batchSize` rows per decode call, partition-parallel, zero
    * shuffle.
    */
  def extractFeatures(src: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
  }

  /** `multimodal_batch_features` inventory entry: documents' text
    * bytes standing in for media blobs (no oracle: stub decode).
    * The driver's comparator hashes scalar cells only, so the frame
    * sample is flattened to a CSV string; the typed
    * `Dataset[MediaFeatures]` API keeps the array.
    */
  def multimodalBatchFeatures(s: SparkSession, d: String): DataFrame = {
    val src = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    extractFeatures(src).toDF()
      .select(col("doc_id"), col("n_bytes"),
        concat_ws(",", col("sampled_frames")).as("frames_csv"),
        col("thumb_w"), col("thumb_h"), col("byte_mean"))
      .orderBy("doc_id")
  }
}
