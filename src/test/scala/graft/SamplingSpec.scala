package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.LlmTextOps

/** `stratified_sample` contract: the quota math is oracle-gated; these
  * pin the properties that make hash-threshold sampling the right
  * 100 TB primitive — per-stratum rates actually land near their
  * quotas, the head stratum really is capped, and membership is
  * STABLE under corpus appends (row-local predicate ⇒ adding
  * documents never flips existing ones — the property rand()/
  * TABLESAMPLE sampling lacks and incremental pipelines need).
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("per-stratum sampled fractions land near their quotas at sf0.01") {
    val d = TestSpark.sf001
    val total = graft.engine.Tables.documents(spark, d)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = LlmTextOps.stratifiedSample(spark, d)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    total.foreach { case (lang, n) =>
      val quota = if (lang == "en") 0.25 else 0.75
      val got = sampled.getOrElse(lang, 0L).toDouble / n
      // ±0.15 over a few-dozen-doc stratum; the multiplicative hash
      // is equidistributed but not magic
      assert(math.abs(got - quota) <= 0.15,
        f"$lang: sampled fraction $got%.3f vs quota $quota%.2f")
    }
  }

  test("the head stratum is capped: 'en' no longer dominates the mix") {
    val sampled = LlmTextOps.stratifiedSample(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val en = sampled("en").toDouble
    // raw corpus: en ≈ 2.5× any tail language; capped: within 1.5×
    sampled.foreach { case (lang, n) =>
      assert(en <= 1.5 * n, s"en ($en) still dominates $lang ($n)")
    }
  }

  test("mixture_sample: smaller sources keep a strictly higher fraction (temperature)") {
    import org.apache.spark.sql.functions._
    val kept = LlmTextOps.mixtureSample(spark, TestSpark.sf001)
      .groupBy("source").agg(count(lit(1)).as("kept"),
        first(col("n_s")).as("n_s"))
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("kept"), r.getAs[Long]("n_s")))
    assert(kept.nonEmpty)
    // kept mass ∝ √n_s ⇒ kept RATE ∝ 1/√n_s: the largest source must
    // keep a lower fraction than the smallest (that's the whole point
    // of temperature mixing); equal-size sources make this vacuous,
    // so require a real size spread first
    val bySize = kept.sortBy(_._3)
    val (small, large) = (bySize.head, bySize.last)
    if (large._3 > 2 * small._3) {
      val smallRate = small._2.toDouble / small._3
      val largeRate = large._2.toDouble / large._3
      assert(smallRate > largeRate,
        s"temperature inverted: $small keeps $smallRate, $large keeps $largeRate")
    }
    // global kept fraction lands near the f = 0.5 target (hash noise
    // and the p_s ≤ 1 cap both push it off a little)
    val total = kept.map(_._3).sum.toDouble
    val frac = kept.map(_._2).sum / total
    assert(frac > 0.3 && frac < 0.7, s"global kept fraction $frac")
  }

  test("membership is stable under corpus append (incremental-safety)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sample").toString
    try {
      def doc(id: Long, lang: String) =
        (id, s"text $id", lang, "web", 10L)
      val small = (0L until 200L).map(i => doc(i, if (i % 4 == 0) "en" else "de"))
      val appended = small ++ (200L until 400L).map(i => doc(i, "fr"))
      small.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/small/documents.parquet")
      appended.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/big/documents.parquet")
      def ids(d: String) = LlmTextOps.stratifiedSample(spark, d)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val before = ids(s"$tmp/small")
      val after = ids(s"$tmp/big")
      // every pre-append member survives, no pre-append non-member joins
      assert(after.filter(_ < 200L) == before,
        "append flipped membership of existing documents")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
