package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory smoke: every declared query executes at sf0.001,
  * oracle keys are consistent with query keys, and the flagship entry
  * returns rows (the driver's t1 check).
  */
class InventorySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries execute at sf0.001 and are non-empty where expected") {
    // join_anti may legitimately return 0 rows at tiny sf
    val mayBeEmpty = Set("join_anti", "dedup_simhash")
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, TestSpark.sf0001).count()
    }
    val empties = counts.collect {
      case (n, c) if c == 0 && !mayBeEmpty(n) => n
    }
    assert(empties.isEmpty, s"unexpectedly empty: $empties")
  }

  test("dedup family agrees on the exact-duplicate pair set at sf0.001") {
    import org.apache.spark.sql.functions.col
    val exact = graft.operators.LlmTextOps.dedupNear(spark, TestSpark.sf0001)
      .where(col("jaccard") >= 0.999)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = graft.operators.LlmTextOps.dedupMinhash(spark, TestSpark.sf0001)
      .where(col("est_jaccard") >= 0.999)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(mh),
      s"MinHash missed exact dups: ${exact -- mh}")
  }
}
