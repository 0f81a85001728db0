package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LlmTextOps, LlmVectorOps}

/** Round-7 curation operators: the distributed reservoir sample, the
  * two-phase global shuffle-position assignment, DSIR-style importance
  * weighting, and kNN label propagation. Each test pins the scalable
  * formulation against the naive/windowed formulation the DuckDB
  * oracle also uses — a fast local twin of the hash gate.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sample_per_source == the window-rank formulation, k per source") {
    val s = spark
    val got = LlmTextOps.samplePerSource(s, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // naive: window row_number over the same portable hash stream
    val w = Window.partitionBy("source").orderBy(col("h").asc, col("doc_id").asc)
    val want = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .withColumn("h",
        (col("doc_id") % lit(1000000007L)) * lit(3266489917L) % lit(1000000007L))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 20)
      .select(col("source"), col("rank"), col("doc_id"), col("h"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == want.toSet)
    // every source contributes min(20, |source|) rows
    val perSource = got.groupBy(_._1).view.mapValues(_.length).toMap
    val sizes = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(perSource(src) == math.min(20L, n).toInt, s"source $src")
    }
  }

  test("corpus_shuffle assigns the exact global permutation, no global sort") {
    val s = spark
    val got = LlmTextOps.corpusShuffle(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = got.length
    // pos is a permutation of 0..n-1
    assert(got.map(_._3).sorted.toSeq == (0L until n).toSeq)
    // and equals the naive single-partition row_number formulation
    val want = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select(col("doc_id"),
        ((col("doc_id") % lit(1000000007L)) * lit(668265263L)
          % lit(1000000007L)).as("h"))
      .withColumn("pos",
        row_number().over(Window.orderBy(col("h").asc, col("doc_id").asc))
          .cast("long") - 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == want.toSet)
  }

  test("importance_weights: ratio bounds, target monotonicity, exact sums") {
    val s = spark
    val rows = LlmTextOps.importanceWeights(s, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, st, sa, w) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nb > 0 && sa >= nb, s"doc ${r.getLong(0)}: df_all sum below count")
      assert(st >= 0 && st <= sa, s"doc ${r.getLong(0)}: target df out of range")
      assert(w >= 0.0 && w <= 1.0, s"doc ${r.getLong(0)}: weight $w")
      assert(w == math.floor(st.toDouble / sa.toDouble * 1e6 + 0.5) / 1e6,
        s"doc ${r.getLong(0)}: weight != rounded ratio")
    }
    // src0 documents must average a higher target share than the rest:
    // their own bigrams always count toward df_target
    val bySrc = LlmTextOps.importanceWeights(s, TestSpark.sf0001)
      .join(graft.engine.Tables.documents(s, TestSpark.sf0001)
        .select("doc_id", "source"), Seq("doc_id"))
      .groupBy(col("source") === "src0").agg(avg("weight"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(bySrc(true) > bySrc(false),
      s"src0 mean weight ${bySrc(true)} not above rest ${bySrc(false)}")
  }

  test("knn_label votes match the gated top-10 neighbor list") {
    val s = spark
    val labels = graft.engine.Tables.embeddings(s, TestSpark.sf0001)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // recompute the modal label from the independently gated top-k row
    val neighbors = LlmVectorOps.similarityTopk(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(p => labels(p._2))).toMap
    val want = neighbors.map { case (probe, ls) =>
      val counts = ls.groupBy(identity).view.mapValues(_.length).toMap
      probe -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
    }
    val got = LlmVectorOps.knnLabel(s, TestSpark.sf0001).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (probe, trueL, pred, votes) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))
      val (wl, wc) = want(probe)
      assert(pred == wl && votes == wc.toLong, s"probe $probe")
      assert(trueL == labels(probe), s"probe $probe true label")
      assert(votes >= 1L && votes <= 10L)
    }
  }
}
