package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalKernels

/** Batch plumbing invariants for the mapPartitions media kernel. */
class MultimodalKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def src = Seq(
    (1L, "a tiny payload"),
    (2L, "a second considerably longer payload with more bytes in it"),
    (3L, ""),
    (4L, "x" * 5000))
    .toDF("doc_id", "text")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  test("batch size does not change results (1 vs 3 vs 64)") {
    def run(bs: Int) = MultimodalKernels.extractFeatures(src, bs)
      .collect().sortBy(_.doc_id).map(_.toString).toSeq
    assert(run(1) == run(64))
    assert(run(3) == run(64))
  }

  test("kernel output shape: 8 sampled frames max, thumbnail fits 64x64") {
    val rows = MultimodalKernels.extractFeatures(src).collect()
    rows.foreach { r =>
      assert(r.sampled_frames.size <= 8)
      assert(r.thumb_w <= 64 && r.thumb_h <= 64)
      assert(r.thumb_w >= 1 && r.thumb_h >= 1)
    }
    // empty payload survives (total function, no crash)
    assert(rows.find(_.doc_id == 3L).get.n_bytes == 0)
  }

  test("declarative batch-features query equals the mapPartitions kernel") {
    // multimodal_batch_features runs through the native graft_byte_stats
    // expression; extractFeatures is the batched kernel a real codec
    // would ride — both must produce identical features row-for-row
    val d = TestSpark.sf0001
    val src = graft.engine.Tables.documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val kernel = MultimodalKernels.extractFeatures(src).toDF()
      .select(col("doc_id"), col("n_bytes"),
        concat_ws(",", col("sampled_frames").cast("array<string>"))
          .as("frames_csv"),
        col("thumb_w"), col("thumb_h"), col("byte_mean"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val declarative = MultimodalKernels.multimodalBatchFeatures(spark, d)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(kernel.length == declarative.length)
    kernel.zip(declarative).foreach { case (k, q) => assert(k == q) }
  }

  test("no shuffle in the kernel plan") {
    val ds = MultimodalKernels.extractFeatures(src)
    assert(!graft.engine.Bucketing.hasShuffle(ds.toDF()))
  }

  test("GraftSession.local exposes graft SQL functions") {
    // clear first: getOrCreate on the live test session would both
    // recycle it (GraftSession's configs silently stamped onto the
    // shared session — shuffle.partitions=2 leaked into later suites)
    // and dodge the fresh-session registration path this test is for
    val base = TestSpark.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = GraftSession.local(2)
      val d = s.sql(
        """SELECT graft_dot(CAST(array(2.0) AS ARRAY<FLOAT>),
                            CAST(array(3.0) AS ARRAY<FLOAT>))""")
        .collect().head.getDouble(0)
      assert(d == 6.0)
      // registerAll covers every family even when the recycled
      // SparkContext freezes the extensions conf
      val pairs = s.sql("SELECT graft_pairs(array(1L, 2L)) AS p")
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
      assert(pairs.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
      val mh = s.sql(
        "SELECT graft_minhash32(h) AS sig FROM VALUES (1L), (2L) AS t(h)")
        .collect().head.getSeq[Long](0)
      assert(mh.length == 32)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("multimodal_phash == driver dHash replay; pigeonhole emits the full pair set") {
    val bits = 60
    def sigOf(bytes: Array[Byte]): Long = {
      val n = bytes.length.toLong
      def probe(i: Long): Long = {
        val p = (i * (n - 1)) / bits // 1-based pos p+1 → 0-based p
        java.lang.Byte.toUnsignedLong(bytes(p.toInt))
      }
      (0 until bits).foldLeft(0L) { (acc, i) =>
        if (probe(i.toLong) > probe(i.toLong + 1)) acc | (1L << i) else acc
      }
    }
    def replay(sf: String): Seq[(Long, Long, Long)] = {
      val sigs = graft.engine.Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), sigOf(r.getString(1).getBytes("UTF-8"))))
      sigs.foreach { case (_, s) => assert(s >= 0L && s < (1L << 60)) }
      // brute-force Hamming <= 3 pairs — the oracle's formulation,
      // independent of the engine's 4x15-bit chunk blocking
      (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (ia, ib, h.toLong)).sortBy(t => (t._1, t._2)).toSeq
    }
    def got(sf: String): Seq[(Long, Long, Long)] =
      graft.operators.LlmVectorOps.multimodalPhash(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // tiny corpus: equality incl. the legitimately-empty case
    assert(got(TestSpark.sf0001) == replay(TestSpark.sf0001))
    // sf0.1 carries byte-identical payload copies → hamming-0 pairs:
    // the non-vacuous witness (sf0.01 has near- but not byte-dups,
    // the multimodal_dedup 0-row posture)
    val big = got(TestSpark.sf01)
    assert(big == replay(TestSpark.sf01), s"sf0.1: ${big.size} pairs")
    assert(big.nonEmpty, "sf0.1 exact-dup payloads must collide")
    assert(big.exists(_._3 == 0L), "byte-identical copies at hamming 0")
  }

  test("native graft_phash60 == the hex-extraction declarative twin") {
    import graft.engine.Tables
    Seq(TestSpark.sf0001, TestSpark.sf001).foreach { sf =>
      val native = Tables.documents(spark, sf)
        .select(col("doc_id"), graft.functions.Phash60.phash60(spark,
          encode(col("text"), "UTF-8")).as("sig"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val hexTwin = graft.operators.LlmVectorOps
        .multimodalPhashSigsHex(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(native == hexTwin, s"$sf: kernel diverges from hex form")
      // non-negative 60-bit budget holds on the kernel path too
      native.foreach { case (_, s) => assert(s >= 0L && s < (1L << 60)) }
    }
  }
}
