package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.LlmTextOps

/** Properties of the round-5 text-pipeline additions: benchmark
  * decontamination, repetition quality metrics, and sliding-window
  * chunking. Each test checks the operator against an independent
  * formulation computed inline (brute force / exploded groupBy /
  * round-trip reconstruction), not against golden values.
  */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001
  private val benches = Seq("src0", "src1", "src2", "src3")

  /** All (doc_id, gram-string) rows of distinct 8-token shingles —
    * the brute-force reference side for decontaminate (string grams,
    * no hashing). */
  private def gramRows = Tables.documents(spark, d)
    .withColumn("toks", split(col("text"), " "))
    .where(size(col("toks")) >= 8)
    .select(col("doc_id"), col("source"),
      explode(array_distinct(expr(
        """transform(sequence(0, size(toks) - 8),
             i -> array_join(slice(toks, i + 1, 8), ' '))"""))).as("gram"))

  test("decontaminate equals the brute-force string-gram overlap") {
    val got = LlmTextOps.decontaminate(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g = gramRows
    val bench = g.where(col("source").isin(benches: _*))
      .select("gram").distinct()
    val expected = g.where(!col("source").isin(benches: _*))
      .join(bench, Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty, "sf0.001 should contain cross-source near-dups")
  }

  test("decontaminate flags no benchmark-slice docs and only true overlaps") {
    val flagged = LlmTextOps.decontaminate(spark, d)
    val srcs = flagged.join(
        Tables.documents(spark, d).select("doc_id", "source"), Seq("doc_id"))
      .select("source").distinct().collect().map(_.getString(0))
    assert(srcs.forall(s => !benches.contains(s)))
    // every reported count is positive and no larger than the doc's
    // own distinct-gram count
    val bad = flagged.join(
        gramRows.groupBy("doc_id").agg(count(lit(1)).as("own")), Seq("doc_id"))
      .where(col("n_shared_grams") <= 0 || col("n_shared_grams") > col("own"))
    assert(bad.count() == 0)
  }

  test("repetition_stats top-bigram run-length equals the exploded groupBy mode") {
    // independent formulation: explode bigram occurrences, count per
    // (doc, bigram), take the per-doc max — the shuffle-heavy twin the
    // map-side sort+fold replaces
    val bg = Tables.documents(spark, d)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        explode(expr(
          """transform(sequence(0, size(toks) - 2),
               i -> concat(toks[i], ' ', toks[i + 1]))""")).as("b"))
    val expected = bg.groupBy("doc_id", "n_tokens", "b")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_tokens").agg(max(col("c")).as("top_c"))
      .withColumn("frac", graft.engine.Determinism.r6(
        col("top_c") / (col("n_tokens") - 1L)))
      .select("doc_id", "frac")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = LlmTextOps.repetitionStats(spark, d)
      .select("doc_id", "top_bigram_frac")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("repetition_stats fractions are bounded and exact on a known doc") {
    val rows = LlmTextOps.repetitionStats(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dup, top) = (r.getAs[Double]("dup_token_frac"),
        r.getAs[Double]("top_bigram_frac"))
      assert(dup >= 0.0 && dup < 1.0, s"dup_token_frac out of range: $r")
      assert(top > 0.0 && top <= 1.0, s"top_bigram_frac out of range: $r")
    }
  }

  test("chunk_documents round-trips: stride-24 prefixes + last chunk rebuild the doc") {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val rebuilt = LlmTextOps.chunkDocuments(spark, d)
      .groupBy("doc_id")
      .agg(expr("array_sort(collect_list(struct(chunk_idx, chunk_text)))")
          .as("cs"),
        max("chunk_idx").as("mx"))
      .select(col("doc_id"), expr(
        """array_join(transform(cs,
             x -> IF(x.chunk_idx = mx, x.chunk_text,
                     array_join(slice(split(x.chunk_text, ' '), 1, 24), ' ')))
           , ' ')""").as("rebuilt"))
    val mismatched = rebuilt.join(docs, Seq("doc_id"))
      .where(col("rebuilt") =!= col("text"))
    assert(mismatched.count() == 0)
  }

  test("dedup_chunks: every chunk of a non-survivor exact copy is a duplicate") {
    val res = LlmTextOps.dedupChunks(spark, d)
    assert(res.where(col("n_dup_chunks") > col("n_chunks")).count() == 0)
    assert(res.agg(sum("n_dup_chunks")).head.getLong(0) > 0)
    // an exact-copy doc that is not its group's survivor repeats every
    // chunk of the survivor, so all its chunks must be flagged
    val docs = Tables.documents(spark, d)
    val nonSurvivors = docs.groupBy("text")
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .where(col("n") > 1)
      .join(docs, Seq("text"))
      .where(col("doc_id") =!= col("keep"))
      .select("doc_id")
    val incomplete = res.join(nonSurvivors, Seq("doc_id"))
      .where(col("n_dup_chunks") =!= col("n_chunks"))
    assert(incomplete.count() == 0)
  }

  test("chunk_documents lengths and indices are consistent") {
    val chunks = LlmTextOps.chunkDocuments(spark, d)
      .withColumn("actual_len", size(split(col("chunk_text"), " ")))
    assert(chunks.where(col("actual_len") =!= col("chunk_len")).count() == 0)
    // every chunk is 1..32 tokens; every non-final chunk is exactly 32
    // OR the doc is shorter than one window
    assert(chunks.where(col("chunk_len") < 1 || col("chunk_len") > 32)
      .count() == 0)
    val n = Tables.documents(spark, d)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val idx = chunks.groupBy("doc_id")
      .agg(max("chunk_idx").as("max_idx"), count(lit(1)).as("n_chunks"))
      .join(n, Seq("doc_id"))
      .where(col("n_chunks") =!= col("max_idx") + 1
        || col("max_idx") =!= floor((col("n") - 1) / 24))
    assert(idx.count() == 0)
  }
}
