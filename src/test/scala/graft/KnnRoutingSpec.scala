package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmVectorOps

/** The kNN edge substrate's source routing (`spark.graft.knn.source`):
  * the IVF candidate route re-ranks with the SAME (r6 score desc, id
  * asc) total order as the exact compiled scan, so whenever every
  * inverted list is probed the routed edges must be IDENTICAL — the
  * full-probe pin proves the candidate-join + re-rank machinery is
  * exact, isolating the route's only approximation in list recall.
  * On the shipped ISOTROPIC fixture vectors partial-probe recall is
  * poor BY MEASUREMENT (18% at nprobe=1, sf0.1 — no sublinear
  * candidate source does better on clusterless data), which is why
  * auto pins small corpora to the exact scan; the clustered-corpus
  * recall story lives in ScaleSweep.
  */
class KnnRoutingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edges(d: String): Seq[(Long, Long)] =
    LlmVectorOps.knnEdges(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("full-probe ivf == exact edge set at sf0.001 and sf0.01") {
    for (d <- Seq(TestSpark.sf0001, TestSpark.sf001)) {
      val exact = edges(d)
      assert(exact.nonEmpty, s"vacuous pin at $d")
      spark.conf.set(LlmVectorOps.KnnSourceConf, "ivf")
      spark.conf.set(LlmVectorOps.KnnNprobeConf, "1000000")
      try {
        assert(edges(d) == exact,
          s"full-probe ivf edges diverged from exact at $d")
      } finally {
        spark.conf.unset(LlmVectorOps.KnnSourceConf)
        spark.conf.unset(LlmVectorOps.KnnNprobeConf)
      }
    }
  }

  test("auto routes exact below the vector-count crossover") {
    assert(LlmVectorOps.knnSourceRoute(spark, TestSpark.sf0001) == "exact")
    assert(LlmVectorOps.knnSourceRoute(spark, TestSpark.sf001) == "exact")
    assert(LlmVectorOps.knnSourceRoute(spark, TestSpark.sf01) == "exact")
  }

  test("default-nprobe ivf edges keep the contract shape") {
    val d = TestSpark.sf001
    spark.conf.set(LlmVectorOps.KnnSourceConf, "ivf")
    try {
      val e = edges(d)
      val n = graft.engine.Tables.embeddings(spark, d).count()
      // every vector emits edges (its own list alone holds candidates)
      assert(e.map(_._1).distinct.size.toLong == n)
      // out-degree is at most 3 and no self-loops
      assert(e.groupBy(_._1).valuesIterator.forall(_.size <= 3))
      assert(e.forall { case (s0, d0) => s0 != d0 })
    } finally spark.conf.unset(LlmVectorOps.KnnSourceConf)
  }

  test("graph consumers through the full-probe ivf route == exact") {
    val d = TestSpark.sf0001
    def rows(df: DataFrame): Seq[String] = df.collect().map(_.toString).toSeq
    val prExact = rows(LlmVectorOps.pagerankDocs(spark, d))
    val hitsExact = rows(LlmVectorOps.hitsScores(spark, d))
    spark.conf.set(LlmVectorOps.KnnSourceConf, "ivf")
    spark.conf.set(LlmVectorOps.KnnNprobeConf, "1000000")
    try {
      assert(rows(LlmVectorOps.pagerankDocs(spark, d)) == prExact)
      assert(rows(LlmVectorOps.hitsScores(spark, d)) == hitsExact)
    } finally {
      spark.conf.unset(LlmVectorOps.KnnSourceConf)
      spark.conf.unset(LlmVectorOps.KnnNprobeConf)
    }
  }

  test("an invalid knn-source conf value fails loudly") {
    spark.conf.set(LlmVectorOps.KnnSourceConf, "bogus")
    try intercept[IllegalArgumentException] {
      LlmVectorOps.knnEdges(spark, TestSpark.sf0001).collect()
    } finally spark.conf.unset(LlmVectorOps.KnnSourceConf)
  }

  test("an invalid knn-codebook conf value fails loudly") {
    spark.conf.set(LlmVectorOps.KnnSourceConf, "ivf")
    spark.conf.set(LlmVectorOps.KnnCodebookConf, "bogus")
    try intercept[IllegalArgumentException] {
      LlmVectorOps.knnEdges(spark, TestSpark.sf0001).collect()
    } finally {
      spark.conf.unset(LlmVectorOps.KnnSourceConf)
      spark.conf.unset(LlmVectorOps.KnnCodebookConf)
    }
  }

  test("trained-codebook full-probe ivf == exact edge set") {
    val d = TestSpark.sf0001
    val exact = edges(d)
    spark.conf.set(LlmVectorOps.KnnSourceConf, "ivf")
    spark.conf.set(LlmVectorOps.KnnNprobeConf, "1000000")
    spark.conf.set(LlmVectorOps.KnnCodebookConf, "trained")
    try {
      assert(edges(d) == exact,
        "trained-codebook full-probe ivf edges diverged from exact")
    } finally {
      spark.conf.unset(LlmVectorOps.KnnSourceConf)
      spark.conf.unset(LlmVectorOps.KnnNprobeConf)
      spark.conf.unset(LlmVectorOps.KnnCodebookConf)
    }
  }

  test("stored edge silver serves identically; bad fingerprint falls back") {
    val d = TestSpark.sf0001
    def rows(df: DataFrame): Seq[String] = df.collect().map(_.toString).toSeq
    val exactEdges = edges(d)
    val prExact = rows(LlmVectorOps.pagerankDocs(spark, d))
    val base = java.nio.file.Files
      .createTempDirectory("graft_knn_edges").toString
    val corpusDir = new java.io.File(base, new java.io.File(d).getName)
    graft.pipeline.CorpusSilver.writeKnnEdges(spark, d,
      corpusDir.toString)
    spark.conf.set(LlmVectorOps.KnnEdgesDirConf, base)
    try {
      // served results equal the inline build, and the plan proves
      // the edges really come from the silver scan
      assert(edges(d) == exactEdges, "served edges diverged from inline")
      assert(rows(LlmVectorOps.pagerankDocs(spark, d)) == prExact,
        "served pagerank diverged from inline")
      val plan = LlmVectorOps.knnEdges(spark, d)
        .queryExecution.executedPlan.toString
      assert(plan.contains(base),
        s"expected a silver scan in the served plan:\n$plan")
      // a corrupted fingerprint must fall back to the inline build —
      // never serve an unverified edge set
      val fp = new java.io.File(corpusDir,
        LlmVectorOps.CorpusFingerprintFile)
      java.nio.file.Files.write(fp.toPath,
        "/not/the/corpus\n0".getBytes("UTF-8"))
      assert(edges(d) == exactEdges, "fallback edges diverged")
      val planAfter = LlmVectorOps.knnEdges(spark, d)
        .queryExecution.executedPlan.toString
      assert(!planAfter.contains(base),
        s"fingerprint mismatch still served the silver:\n$planAfter")
    } finally spark.conf.unset(LlmVectorOps.KnnEdgesDirConf)
  }
}
