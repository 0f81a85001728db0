package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmTextOps

/** The dedup-idempotence properties SURVEY §5 promises: running dedup
  * over its own output changes nothing.
  */
class DedupPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("dedup_exact survivors carry pairwise-distinct texts (idempotence)") {
    val survivors = LlmTextOps.dedupExact(spark, sf)
      .select("doc_id")
    val texts = graft.engine.Tables.documents(spark, sf)
      .join(survivors, Seq("doc_id"))
      .select("text")
    // re-running exact dedup on the survivor set is a no-op iff every
    // surviving text is already unique
    assert(texts.count() == texts.distinct().count())
  }

  test("dedup_survivors contains no full near-dup pair (idempotence)") {
    val pairs = LlmTextOps.dedupNear(spark, sf).select("i", "j")
    val survivors = LlmTextOps.dedupSurvivors(spark, sf)
      .select(col("doc_id"))
    val inside = pairs
      .join(survivors.withColumnRenamed("doc_id", "i"), Seq("i"))
      .join(survivors.withColumnRenamed("doc_id", "j"), Seq("j"))
    // a pair fully inside the survivor set would mean a second dedup
    // pass still has work to do
    assert(inside.count() == 0)
  }

  test("component labels are idempotent: relabeling the star edges is a no-op") {
    val labeled = LlmTextOps.dedupComponents(spark, sf)
    val asPairs = labeled
      .where(col("doc_id") =!= col("component_id"))
      .select(col("component_id").as("i"), col("doc_id").as("j"))
    val relabeled = LlmTextOps.componentsFromPairs(spark, asPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val original = labeled
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relabeled == original)
  }
}
