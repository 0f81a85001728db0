package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LlmVectorOps, LlmTextOps}

/** Approximate-operator quality guards: the ANN and blocked-dedup
  * paths have no oracle (approximate by design), so their *recall*
  * against the exact operators is the regression surface. Thresholds
  * sit below the measured values (LSH 0.70, IVF 0.68, blocked dedup
  * 0.66 at sf0.01 — BASELINE.md) with margin for small corpus shifts;
  * a parameter or bucketing change that trashes recall fails here
  * instead of silently shipping.
  */
class AnnQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact = topkSet(LlmVectorOps.similarityTopk(spark, sf))

  test("similarity_lsh recall@10 >= 0.6 vs brute force at sf0.01") {
    val lsh = topkSet(LlmVectorOps.similarityLsh(spark, sf))
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.6, f"LSH recall@10 degraded: $recall%.3f")
  }

  test("similarity_ivf recall@10 >= 0.55 vs brute force at sf0.01") {
    val ivf = topkSet(LlmVectorOps.similarityIvf(spark, sf))
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.55, f"IVF recall@10 degraded: $recall%.3f")
  }

  test("dedup_embed_blocked recall >= 0.5 vs exact pairs at sf0.01") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = pairs(LlmVectorOps.dedupEmbed(spark, sf))
    val bl = pairs(LlmVectorOps.dedupEmbedBlocked(spark, sf))
    assert(bl.subsetOf(ex), s"false positives: ${bl -- ex}")
    val recall = (ex & bl).size.toDouble / ex.size
    assert(recall >= 0.5, f"blocked-dedup recall degraded: $recall%.3f")
  }

  test("dedup_minhash finds every exact-duplicate pair at sf0.01") {
    import org.apache.spark.sql.functions.col
    val exactDups = LlmTextOps.dedupNear(spark, sf)
      .where(col("jaccard") >= 0.999)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = LlmTextOps.dedupMinhash(spark, sf)
      .where(col("est_jaccard") >= 0.999)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDups.subsetOf(mh), s"MinHash missed: ${exactDups -- mh}")
  }
}
