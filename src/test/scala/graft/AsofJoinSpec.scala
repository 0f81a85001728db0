package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalOps

/** Pins the as-of join composition's edge semantics (E6), which the
  * oracle only exercises on tie-free data.
  */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, String)]) =
    rows.toDF("user_id", "tss").selectExpr("user_id", "CAST(tss AS TIMESTAMP) AS ts")

  private def run(clicks: Seq[(Long, String)], purchases: Seq[(Long, String)]) =
    RelationalOps.asofJoin(df(clicks), df(purchases))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString)).toSet

  test("equal timestamps match (<= semantics, like DuckDB ASOF >=)") {
    val out = run(
      clicks = Seq((1L, "2024-01-01 10:00:00")),
      purchases = Seq((1L, "2024-01-01 10:00:00")))
    assert(out == Set((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0")))
  }

  test("latest prior click wins; later clicks ignored") {
    val out = run(
      clicks = Seq((1L, "2024-01-01 09:00:00"), (1L, "2024-01-01 09:30:00"),
        (1L, "2024-01-01 11:00:00")),
      purchases = Seq((1L, "2024-01-01 10:00:00")))
    assert(out == Set((1L, "2024-01-01 10:00:00.0", "2024-01-01 09:30:00.0")))
  }

  test("purchase with no prior click is dropped (inner asof); users independent") {
    val out = run(
      clicks = Seq((2L, "2024-01-01 09:00:00")),
      purchases = Seq(
        (1L, "2024-01-01 10:00:00"), // user 1 has no clicks at all
        (2L, "2024-01-01 08:00:00"), // before user 2's click
        (2L, "2024-01-01 10:00:00")))
    assert(out == Set((2L, "2024-01-01 10:00:00.0", "2024-01-01 09:00:00.0")))
  }

  private def runFwd(clicks: Seq[(Long, String)], purchases: Seq[(Long, String)]) =
    RelationalOps.asofJoinForward(df(clicks), df(purchases))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString)).toSet

  test("forward: equal timestamps match (>= semantics)") {
    val out = runFwd(
      clicks = Seq((1L, "2024-01-01 10:00:00")),
      purchases = Seq((1L, "2024-01-01 10:00:00")))
    assert(out == Set((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0")))
  }

  test("forward: earliest later click wins; prior clicks ignored") {
    val out = runFwd(
      clicks = Seq((1L, "2024-01-01 09:00:00"), (1L, "2024-01-01 10:30:00"),
        (1L, "2024-01-01 11:00:00")),
      purchases = Seq((1L, "2024-01-01 10:00:00")))
    assert(out == Set((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:30:00.0")))
  }

  test("forward: purchase with no later click is dropped; users independent") {
    val out = runFwd(
      clicks = Seq((2L, "2024-01-01 09:00:00")),
      purchases = Seq(
        (1L, "2024-01-01 08:00:00"), // user 1 has no clicks at all
        (2L, "2024-01-01 10:00:00"), // after user 2's only click
        (2L, "2024-01-01 08:00:00")))
    assert(out == Set((2L, "2024-01-01 08:00:00.0", "2024-01-01 09:00:00.0")))
  }

  test("forward: reversed-sort running frame == naive unboundedFollowing frame at sf0.001") {
    // r8 re-plan: the forward as-of moved off the O(n²)
    // unboundedFollowing frame (PlanShapeSpec lints the class); this
    // pins bit-equality against the naive formulation on real data
    // including equal-ts ties.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val s = spark
    val ev = graft.engine.Tables.events(s, TestSpark.sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val l = clicks.select(col("user_id"), col("ts"), lit(1).as("tag"),
      col("ts").as("click_ts"))
    val r = purchases.select(col("user_id"), col("ts"), lit(0).as("tag"),
      lit(null).cast("timestamp").as("click_ts"))
    val w = Window.partitionBy("user_id").orderBy("ts", "tag")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val naive = l.unionByName(r)
      .withColumn("next_click_ts",
        first(col("click_ts"), ignoreNulls = true).over(w))
      .where(col("tag") === 0 && col("next_click_ts").isNotNull)
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("next_click_ts"))
      .collect().map(x => (x.getLong(0), x.getTimestamp(1), x.getTimestamp(2)))
      .sortBy(t => (t._1, t._2.getTime, t._3.getTime))
    val fast = RelationalOps.asofJoinForward(clicks, purchases)
      .collect().map(x => (x.getLong(0), x.getTimestamp(1), x.getTimestamp(2)))
      .sortBy(t => (t._1, t._2.getTime, t._3.getTime))
    assert(fast.nonEmpty && fast.toSeq == naive.toSeq)
  }

  test("decimal money sums are partition-count invariant") {
    import org.apache.spark.sql.functions._
    import graft.engine.Determinism.dsum
    val data = (1 to 10000).map(i => math.rint((i * 37.13) % 9999 * 100) / 100)
    def total(parts: Int) = data.toDF("x").repartition(parts)
      .agg(dsum(col("x"))).collect().head.getDouble(0)
    assert(total(1) == total(16))
    assert(total(3) == total(32))
  }
}
