package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.LlmVectorOps

/** Int8 embedding quantization invariants. The arithmetic itself
  * (scale, codes, integer summaries) is oracle-gated through
  * `embed_quantize` / `similarity_topk_q8`; these tests pin the
  * *numeric contract* the oracle can't state: code range, per-element
  * reconstruction error, saturation at ±127, and how much pairwise
  * geometry the codes preserve (q8 top-k recall vs the float top-k).
  */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  private lazy val q = LlmVectorOps
    .quantized(spark, graft.engine.Tables.embeddings(spark, sf))
    .select(col("vec_id"), col("scale"), col("embedding"), col("qemb"))
    .collect()

  test("codes are integral, in [-127, 127], and saturate at the max element") {
    assert(q.nonEmpty)
    q.foreach { r =>
      val codes = r.getSeq[Float](3)
      assert(codes.forall(c => c == c.floor && c.abs <= 127f),
        s"vec ${r.getLong(0)}: non-integral or out-of-range code")
      // the max-|x| element maps to exactly ±127 by construction
      assert(codes.map(_.abs).max == 127f,
        s"vec ${r.getLong(0)}: no saturated code — scale misapplied")
    }
  }

  test("per-element reconstruction error is bounded by half a quantization step") {
    q.foreach { r =>
      val scale = r.getDouble(1)
      assert(scale > 0.0)
      val xs = r.getSeq[Float](2)
      val codes = r.getSeq[Float](3)
      xs.zip(codes).foreach { case (x, c) =>
        // q = floor(x*scale + 0.5) ⇒ |x*scale − q| ≤ 0.5 exactly;
        // 1e-6 absorbs the float widening of x
        assert(math.abs(x.toDouble * scale - c) <= 0.5 + 1e-6,
          s"vec ${r.getLong(0)}: reconstruction off by more than half a step")
      }
    }
  }

  test("similarity_topk_q8 recall@10 >= 0.85 vs the float top-k at sf0.01") {
    def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topk(LlmVectorOps.similarityTopk(spark, sf))
    val q8 = topk(LlmVectorOps.similarityTopkQ8(spark, sf))
    val recall = (exact & q8).size.toDouble / exact.size
    // int8 on 64-d unit vectors preserves ranking almost perfectly
    // even on this weakly-similar corpus (scores cluster at 0.3-0.5);
    // floor sits under the measured value with corpus-shift margin
    assert(recall >= 0.85, f"q8 recall@10 degraded: $recall%.3f")
  }

  test("embed_quantize covers every vector with its true dimension") {
    val rows = LlmVectorOps.embedQuantize(spark, sf)
    val n = graft.engine.Tables.embeddings(spark, sf).count()
    assert(rows.count() == n)
    assert(rows.where(col("dim") =!= 64).count() == 0)
    // integer summaries stay inside the int8 envelope
    assert(rows.where(col("q_min") < -127 || col("q_max") > 127).count() == 0)
    assert(rows.where(col("q_normsq") > 127L * 127L * 64L).count() == 0)
  }

  test("packed silver codes serve the identical q8 top-k (and 1/4 the bytes)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-codes").toString
    try {
      graft.pipeline.CorpusSilver.writeQuantizedCodes(spark, sf, s"$tmp/codes")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      // integer dots over packed bytes produce the identical exact
      // scores as the float-array form — not approximately: exactly
      assert(rows(graft.pipeline.CorpusSilver.similarityTopkQ8(spark, s"$tmp/codes"))
        == rows(LlmVectorOps.similarityTopkQ8(spark, sf)))
      // the point of packing: the code table stores ~1 byte/dim.
      // Compare payload-bearing parquet sizes (codes + scale vs float
      // embeddings + label); random floats don't compress, so the
      // ratio lands near 1/4 with parquet overhead on top
      def bytes(p: String) = {
        def rec(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles).map(_.map(rec).sum).getOrElse(0L)
          else if (f.getName.endsWith(".parquet")) f.length else 0L
        rec(new java.io.File(p))
      }
      val ratio = bytes(s"$tmp/codes").toDouble /
        bytes(s"$sf/embeddings.parquet")
      assert(ratio < 0.5, f"packed code table not small: ratio $ratio%.2f")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("int8 pack/dot round-trip: byte dots equal float-array dots exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, Array.tabulate(64)(i => (i - 32) / 32.0f)),
      (2L, Array.tabulate(64)(i => math.sin(i.toDouble).toFloat)))
      .toDF("vec_id", "embedding")
    val q = LlmVectorOps.quantized(spark, df)
      .withColumn("code",
        graft.functions.Int8Pack.int8Pack(spark, col("qemb")))
    val both = q.select(
      graft.functions.VectorExprs.dot(spark, col("qemb"), col("qemb")),
      graft.functions.Int8DotBytes.int8Dot(spark, col("code"), col("code")))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("quantization invariants hold across extreme magnitudes (seeded random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // magnitudes from denormal-adjacent to near-overflow, mixed signs,
    // varied dims — the envelope/saturation/reconstruction contract
    // must be scale-free because scale divides out
    val vecs = (0 until 40).map { i =>
      val dim = 1 + rnd.nextInt(96)
      val mag = math.pow(10, rnd.nextInt(60) - 30).toFloat
      (i.toLong, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f * mag))
    }
    val out = LlmVectorOps.quantized(spark, vecs.toDF("vec_id", "embedding"))
      .select(col("vec_id"), col("scale"), col("embedding"), col("qemb"))
      .collect()
    assert(out.length == vecs.length)
    out.foreach { r =>
      val scale = r.getDouble(1)
      val xs = r.getSeq[Float](2)
      val codes = r.getSeq[Float](3)
      assert(codes.forall(c => c == c.floor && c.abs <= 127f))
      if (xs.exists(_ != 0f)) {
        assert(codes.map(_.abs).max == 127f, s"vec ${r.getLong(0)} no saturation")
        xs.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x.toDouble * scale - c) <= 0.5 + 1e-6)
        }
      } else assert(scale == 0.0 && codes.forall(_ == 0f))
      // pack → byte-dot round-trip stays exactly equal to the
      // float-code dot at every magnitude
    }
    val dots = LlmVectorOps.quantized(spark, vecs.toDF("vec_id", "embedding"))
      .withColumn("code", graft.functions.Int8Pack.int8Pack(spark, col("qemb")))
      .select(
        graft.functions.VectorExprs.dot(spark, col("qemb"), col("qemb")),
        graft.functions.Int8DotBytes.int8Dot(spark, col("code"), col("code")))
      .collect()
    dots.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("all-zero vectors quantize to scale 0 and an all-zero code, not NaN") {
    import spark.implicits._
    val z = Seq((1L, Array.fill(64)(0.0f)), (2L, Array.tabulate(64)(_ / 64.0f)))
      .toDF("vec_id", "embedding")
    val out = LlmVectorOps.quantized(spark, z)
      .select(col("vec_id"), col("scale"), col("qemb")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Float](2))).toMap
    assert(out(1L)._1 == 0.0 && out(1L)._2.forall(_ == 0f))
    assert(out(2L)._1 > 0.0 && out(2L)._2.map(_.abs).max == 127f)
  }
}
