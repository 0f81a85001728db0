package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.functions.GramAgg
import graft.operators.LlmVectorOps

/** The compiled `graft_gram_agg` kernel is equality-pinned — values
  * bit-for-bit, not approximately — to the declarative
  * explode-then-DECIMAL-sum formulation it replaces: both quantize
  * each product to integral nano-units and sum exactly, so any
  * divergence is a kernel bug, never float noise.
  */
class GramKernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("compiled gram kernel is bit-identical to the exploded decimal twin") {
    val fast = LlmVectorOps.embedGram(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val slow = LlmVectorOps.embedGramExploded(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(fast.size == 64 * 65 / 2)
    assert(fast == slow)
  }

  test("kernel count and coordinate sums match the plain aggregates") {
    val g = Tables.embeddings(spark, d)
      .agg(GramAgg.gramAgg(spark, col("embedding")).as("g"))
      .select(col("g.n"), col("g.sums")).head()
    val n = Tables.embeddings(spark, d).count()
    assert(g.getLong(0) == n)
    // coordinate sums against per-dim quantized long sums computed
    // declaratively
    val sums = Tables.embeddings(spark, d)
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(expr(
        "CAST(floor(CAST(x AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)"))
        .as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val kernelSums = g.getSeq[Long](1)
    assert(kernelSums.length == sums.size)
    kernelSums.zipWithIndex.foreach { case (v, i) => assert(v == sums(i)) }
  }

  test("kernel is null-safe and empty-group-safe") {
    import spark.implicits._
    val withNulls = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(0.0f, 2.0f))).toDF("id", "emb")
    val g = withNulls.agg(GramAgg.gramAgg(spark, col("emb")).as("g"))
      .select(col("g.n"), col("g.cells")).head()
    assert(g.getLong(0) == 2L)
    val cells = g.getSeq[org.apache.spark.sql.Row](1)
      .map(c => (c.getInt(0), c.getInt(1)) -> c.getLong(2)).toMap
    assert(cells == Map((0, 0) -> 1000000000L, (0, 1) -> 0L,
      (1, 1) -> 4000000000L))
    // all-null group evaluates to null, not a crash
    val empty = withNulls.where(col("id") === 2L)
      .agg(GramAgg.gramAgg(spark, col("emb")).as("g")).head()
    assert(empty.isNullAt(0))
  }

  test("kernel fails loudly on null elements and non-float arrays") {
    import spark.implicits._
    // a null ELEMENT must throw (getFloat would silently read 0.0 and
    // corrupt the moments), with the operator's own message
    val nullElem = Seq(Seq(Some(1.0f), None)).toDF("emb")
    val e = intercept[Exception] {
      nullElem.agg(GramAgg.gramAgg(spark, col("emb"))).collect()
    }
    assert(e.getMessage != null)
    assert(exceptionChain(e).exists(_.contains("null element")),
      s"unexpected error: ${e.getMessage}")
    // a non-float array must fail analysis, not reinterpret bytes
    val doubles = Seq(Seq(1.0, 2.0)).toDF("emb")
    val ae = intercept[Exception] {
      doubles.agg(GramAgg.gramAgg(spark, col("emb"))).collect()
    }
    assert(exceptionChain(ae).exists(_.contains("array<float>")),
      s"unexpected error: ${ae.getMessage}")
  }

  private def exceptionChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq

  test("Pca.fit reports the empty input as a row-count failure") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.engine.Pca.fit(spark, empty, "embedding", k = 2)
    }
    assert(e.getMessage.contains("at least 2 rows"))
  }
}
