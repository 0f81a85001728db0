package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderExpr

/** The Z-order layout key: arithmetic pinned to a local twin, and the
  * reason it exists — multi-dimensional partition pruning — measured
  * against a single-column sort layout on the same data (range
  * partitions stand in for files; a partition "is touched" by a
  * predicate box iff its per-dimension [min, max] envelope intersects
  * the box, exactly the file-skipping test a min/max-stats reader
  * runs).
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("interleave matches the local bit-spread twin incl. edges") {
    def local(x0: Long, y0: Long): Long = {
      val m = (1L << 21) - 1
      val (x, y) = (x0 & m, y0 & m)
      (0 until 21).foldLeft(0L) { (z, i) =>
        z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      }
    }
    val rnd = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (m21, m21), (m21, 0L),
      (123456L, 654321L)) ++
      Seq.fill(200)((rnd.nextLong().abs, rnd.nextLong().abs))
    cases.foreach { case (x, y) =>
      assert(ZOrderExpr.interleave(x, y) == local(x, y), s"($x, $y)")
    }
    // order embedding: quadrant prefixes — the top bit pair of z is
    // determined by the top bits of x and y
    assert(ZOrderExpr.interleave(1L << 20, 0L) == (1L << 40))
    assert(ZOrderExpr.interleave(0L, 1L << 20) == (1L << 41))
  }
  private val m21 = (1L << 21) - 1

  test("z-layout prunes on BOTH dimensions where a sort layout prunes on one") {
    val s = spark
    import s.implicits._
    // a uniform 256×256 grid of points — every (x, y) combination, so
    // envelope intersection is exact, not sampling luck
    val pts = (for { x <- 0 until 256; y <- 0 until 256 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .withColumn("zkey", ZOrderExpr.zorder(s, col("x"), col("y")))
    val nParts = 64
    def touched(layout: org.apache.spark.sql.DataFrame,
        xBox: Option[(Long, Long)], yBox: Option[(Long, Long)]): Long = {
      val env = layout
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
      val fx = xBox.map { case (a, b) =>
        col("x1") >= a && col("x0") <= b }.getOrElse(lit(true))
      val fy = yBox.map { case (a, b) =>
        col("y1") >= a && col("y0") <= b }.getOrElse(lit(true))
      env.where(fx && fy).count()
    }
    val byZ = pts.repartitionByRange(nParts, col("zkey"))
    val byX = pts.repartitionByRange(nParts, col("x"))
    // predicate on y alone: the x-sorted layout cannot prune at all
    val yOnlyZ = touched(byZ, None, Some((40L, 47L)))
    val yOnlyX = touched(byX, None, Some((40L, 47L)))
    assert(yOnlyX >= nParts - 1, s"x-layout should scan ~all: $yOnlyX")
    assert(yOnlyZ <= nParts / 2,
      s"z-layout must prune a y-only box: touched $yOnlyZ of $nParts")
    // predicate on x alone: the z layout still prunes meaningfully
    val xOnlyZ = touched(byZ, Some((40L, 47L)), None)
    assert(xOnlyZ <= nParts / 2,
      s"z-layout must prune an x-only box: touched $xOnlyZ of $nParts")
    // a small box on both dimensions: z touches a handful
    val boxZ = touched(byZ, Some((100L, 115L)), Some((200L, 215L)))
    assert(boxZ <= 8, s"z-layout 16×16 box touched $boxZ of $nParts")
  }

  test("zorder_layout row: zkey recomputes from (x, y) on the gated output") {
    val s = spark
    val rows = graft.operators.RelationalOps
      .zorderLayout(s, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (x, y, z) =>
      assert(z == ZOrderExpr.interleave(x, y))
      assert(y >= 0 && y <= m21)
    }
  }
}
