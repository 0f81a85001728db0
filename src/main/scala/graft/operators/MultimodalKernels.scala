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
      // floor(x+0.5) rounding, NOT rint: rint rounds half-to-even,
      // which SQL cannot mirror portably — the engine-wide r6 contract
      // (Determinism.r6) is floor-based, and the declarative twin
      // (multimodalBatchFeatures) must match this kernel bit-for-bit
      val mean = if (bytes.isEmpty) 0.0
      else math.floor(sum.toDouble / bytes.length * 1e6 + 0.5) / 1e6
      MediaFeatures(id, bytes.length, frames,
        math.max(1, math.floor(w.toDouble * scale + 0.5).toInt),
        math.max(1, math.floor(h.toDouble * scale + 0.5).toInt), mean)
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
    * bytes standing in for media blobs. Computed declaratively via the
    * native `graft_byte_stats` expression (whole-stage codegen, no
    * row deserialization) — `MultimodalKernelsSpec` pins it equal to
    * the batched `extractFeatures` mapPartitions kernel above, which
    * stays as the plumbing a REAL codec would ride. The stub
    * arithmetic is deterministic byte math, so the query is
    * oracle-gated against DuckDB. The driver's comparator hashes
    * scalar cells only, so the frame sample is flattened to a CSV
    * string; the typed `Dataset[MediaFeatures]` API keeps the array.
    */
  def multimodalBatchFeatures(s: SparkSession, d: String): DataFrame = {
    // byte stats, mean, and the stub decode dims come from the SAME
    // shared projection multimodal_features uses
    // (LlmVectorOps.withByteFeatures) — the fake-dims formula lives
    // once on the declarative side, so a stub change cannot diverge
    // the two queries (the kernel twin is pinned equal by spec).
    // `scale` as its own column pins the op order (w * (64/max)), the
    // same sequence the kernel and the DuckDB oracle run.
    val docs = LlmVectorOps.withByteFeatures(s, Tables.documents(s, d))
      .withColumn("scale", lit(64.0) /
        greatest(col("fake_width"), col("fake_height")).cast("double"))
    docs.select(
      col("doc_id"), col("n_bytes"),
      concat_ws(",", col("bs.frames").cast("array<string>")).as("frames_csv"),
      greatest(lit(1), floor(col("fake_width").cast("double") * col("scale")
        + lit(0.5)).cast("int")).as("thumb_w"),
      greatest(lit(1), floor(col("fake_height").cast("double") * col("scale")
        + lit(0.5)).cast("int")).as("thumb_h"),
      col("byte_mean"))
      .orderBy("doc_id")
  }
}
