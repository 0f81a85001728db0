package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashAgg

/** MinHashAgg (TypedImperativeAggregate) semantics. */
class MinHashAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("signature equals the 32 explicit min(permutation) columns") {
    val df = Seq.tabulate(200)(i => (i % 7L, i * 2654435761L % 1000000L))
      .toDF("g", "h")
    val viaAgg = df.groupBy("g")
      .agg(MinHashAgg.minhash32(spark, col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val P = 1000000007L
    val Q = 4294967311L
    val cols = (0 until 32).map { p =>
      min(pmod(pmod(col("h"), lit(P)) * lit(2654435761L + 2 * p)
        + lit(40503L * p), lit(Q))).as(s"m$p")
    }
    val viaCols = df.groupBy("g").agg(cols.head, cols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong(_))).toMap
    assert(viaAgg.keySet == viaCols.keySet)
    viaAgg.foreach { case (g, sig) => assert(sig == viaCols(g), s"group $g") }
  }

  test("map-side MinHash32 over a string array equals the exploded MinHashAgg path") {
    val docs = Seq(
      (1L, Seq("the quick fox", "quick fox jumps", "fox jumps over")),
      (2L, Seq("a b c")),
      (3L, Seq("the quick fox", "lazy dog sleeps", "dog sleeps now", "x y z")))
    val viaExpr = docs.toDF("doc_id", "shs")
      .select(col("doc_id"),
        graft.functions.MinHash32.minhash32FromSet(spark, col("shs")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = docs.toDF("doc_id", "shs")
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .withColumn("h", xxhash64(col("sh")))
      .groupBy("doc_id")
      .agg(MinHashAgg.minhash32(spark, col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr == viaAgg)
  }

  test("merge across partitions == single-partition result") {
    val data = Seq.tabulate(1000)(i => (0L, (i * 7919L) ^ (i << 3).toLong))
    val many = data.toDF("g", "h").repartition(8).groupBy("g")
      .agg(MinHashAgg.minhash32(spark, col("h")).as("sig"))
      .collect().head.getSeq[Long](1)
    val one = data.toDF("g", "h").coalesce(1).groupBy("g")
      .agg(MinHashAgg.minhash32(spark, col("h")).as("sig"))
      .collect().head.getSeq[Long](1)
    assert(many == one)
  }

  test("TopKAgg equals the window-rank top-k under any partitioning") {
    // same ranking rule as the window family: score desc, id asc —
    // including a deliberate score tie (ids 40/41 share a score)
    val rows = Seq.tabulate(200)(i =>
      (i % 5L, i.toLong, ((i * 37) % 100).toDouble / 10.0))
    val df = rows.toDF("g", "id", "score").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(graft.functions.TopKAgg.topk(spark, col("score"), col("id"), 3)
        .as("topk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getDouble(1)))).toMap
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3))
        .sortBy { case (id, sc) => (-sc, id) }.take(3).toSeq
    }
    assert(viaAgg.keySet == expected.keySet)
    viaAgg.foreach { case (g, tk) => assert(tk == expected(g), s"group $g") }
    // single-partition result identical (merge path == update path)
    val one = rows.toDF("g", "id", "score").coalesce(1).groupBy("g")
      .agg(graft.functions.TopKAgg.topk(spark, col("score"), col("id"), 3)
        .as("topk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getDouble(1)))).toMap
    assert(one == viaAgg)
  }

  test("estimated jaccard of identical sets is 1, disjoint sets low") {
    def sig(hs: Seq[Long]) = hs.map((0L, _)).toDF("g", "h")
      .groupBy("g").agg(MinHashAgg.minhash32(spark, col("h")).as("sig"))
      .collect().head.getSeq[Long](1)
    val a = Seq.tabulate(50)(i => i * 104729L)
    val same = sig(a).zip(sig(a)).count { case (x, y) => x == y }
    assert(same == 32)
    val b = Seq.tabulate(50)(i => 7L + i * 15485863L)
    val disjoint = sig(a).zip(sig(b)).count { case (x, y) => x == y }
    assert(disjoint <= 8, s"disjoint sets matched $disjoint/32 minima")
  }
}
