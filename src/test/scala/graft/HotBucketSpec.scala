package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Pairs
import graft.operators.LlmTextOps

/** Hot-bucket splitting for posting-list pair generation
  * (engine.Pairs.*FromMembers): output-identical to the unsplit list
  * form on an adversarial skewed membership — the `join_skew_salted`
  * posture applied to the LSH candidate stage — and the quadratic
  * work of a viral bucket provably spreads across tasks instead of
  * landing on one.
  */
class HotBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Adversarial membership: one viral bucket holding 200 of 260
    * ids, a mid bucket, many cold buckets, and ids shared across
    * buckets (so distinct-vs-counted semantics differ).
    */
  private def membership = {
    val viral = (0L until 200L).map(id => ("b", 0L, id))
    val mid = (150L until 190L).map(id => ("b", 1L, id))
    val cold = (0L until 60L).map(id => ("b", 100L + id % 20, 200L + id))
    (viral ++ mid ++ cold).toDF("band", "bh", "doc_id")
  }

  private def viaLists(wide: Boolean) = {
    val lists = membership.groupBy(col("band"), col("bh"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .where(size(col("ds")) > 1)
    Pairs.distinctPairs(spark, lists, "ds", wide)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("distinct pairs identical to the unsplit form (packed + wide)") {
    for (wide <- Seq(false, true)) {
      val expected = viaLists(wide)
      val got = Pairs.distinctPairsFromMembers(spark, membership,
          Seq("band", "bh"), "doc_id", wide, hotCap = 32, groups = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"wide=$wide: ${got.size} vs ${expected.size}")
      // viral C(200,2) ∪ mid C(40,2) (a subset of the viral pairs) ∪
      // 20 cold buckets × C(3,2)
      assert(expected.size == 200 * 199 / 2 + 20 * 3)
    }
  }

  test("counted pairs identical to the unsplit form") {
    val lists = membership.groupBy(col("band"), col("bh"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .where(size(col("ds")) > 1)
    val expected = Pairs.countedPairs(spark, lists, "ds", "n", wide = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Pairs.countedPairsFromMembers(spark, membership,
        Seq("band", "bh"), "doc_id", "n", wide = false,
        hotCap = 32, groups = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // the 150..189 ids co-occur in the viral AND the mid bucket —
    // counted must see both occurrences even with the viral bucket
    // split and the mid bucket cold
    assert(got((150L, 151L)) == 2L)
  }

  test("a viral bucket's pair work spreads across tasks") {
    // unsplit: the viral bucket's 19900 pairs explode inside ONE
    // task. Split (cap 32, 8 groups), the work arrives as 8 intra
    // lists (~C(25,2) each) + 28 cross chunks (~25×25 each) that hash
    // across the shuffle. AQE's partition coalescing would re-merge
    // these tiny TEST-scale partitions (at real scale they are the
    // oversized ones it splits), so pin the spread with coalescing
    // off; the chunk boundedness is what the mechanism guarantees.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val perTask = Pairs.explodedPairsFromMembers(spark, membership,
          Seq("band", "bh"), "doc_id", wide = false, hotCap = 32, groups = 8)
        .select(spark_partition_id().as("pid"))
        .groupBy("pid").agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1))
      val total = perTask.sum
      assert(total >= 200 * 199 / 2, s"pair stream too small: $total")
      assert(perTask.length >= 3,
        s"quadratic work not spread: ${perTask.toSeq}")
      assert(perTask.max <= total / 2,
        s"one task still owns the viral bucket: max=${perTask.max} of " +
          s"$total across ${perTask.length} tasks")
    } finally spark.conf.unset(
      "spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("dedup_minhash with the hot-bucket conf ON equals OFF end-to-end") {
    val d = TestSpark.sf0001
    val off = LlmTextOps.dedupMinhash(spark, d).collect().toSeq
    spark.conf.set(LlmTextOps.HotBucketCapConf, "2")
    try {
      // cap 2 forces EVERY multi-member bucket through the split path
      // — maximal exercise of intra+cross on real signatures
      val on = LlmTextOps.dedupMinhash(spark, d).collect().toSeq
      assert(on == off)
    } finally spark.conf.unset(LlmTextOps.HotBucketCapConf)
  }

  test("packed cross pairs reject ids past 31 bits loudly") {
    val bad = Seq(("b", 0L, 1L), ("b", 0L, (1L << 31) + 5),
      ("b", 0L, 2L), ("b", 0L, 3L)).toDF("band", "bh", "doc_id")
    val e = intercept[Exception] {
      Pairs.distinctPairsFromMembers(spark, bad, Seq("band", "bh"),
        "doc_id", wide = false, hotCap = 2, groups = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("2^31") || m.contains("[0, 2^31)")), messages(e).mkString)
    // and the wide form handles the same ids fine
    val wideOk = Pairs.distinctPairsFromMembers(spark, bad,
      Seq("band", "bh"), "doc_id", wide = true, hotCap = 2, groups = 2)
    assert(wideOk.count() == 4 * 3 / 2)
  }
}
