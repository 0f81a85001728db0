package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Skew

/** Skew utilities + SQL extension registration. */
class EngineUtilSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin == plain join on skewed data") {
    // one hot key carrying 90% of rows
    val big = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", 1.0), ("k901", 2.0), ("k950", 3.0))
      .toDF("key", "w")
    val plain = big.join(small, Seq("key"))
      .select("key", "v", "w").collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "key", factor = 8)
      .select("key", "v", "w").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 902)
  }

  test("heavyHitters surfaces the hot key first") {
    val big = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("key", "v")
    val top = Skew.heavyHitters(big, col("key"), 3).collect()
    assert(top.head.getString(0) == "hot" && top.head.getLong(1) == 900L)
  }

  test("GraftExtensions exposes graft_dot / graft_simhash64 to SQL") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val d = s2.sql(
        """SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
                            CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d""")
        .collect().head.getDouble(0)
      assert(d == 11.0)
      val h = s2.sql(
        "SELECT graft_simhash64(array(CAST(-1 AS BIGINT))) AS h")
        .collect().head.getLong(0)
      assert(h == -1L) // single all-ones hash -> all bits set
    } finally {
      // newSession-style shared context: don't stop the JVM-wide SC
      SparkSession.clearActiveSession()
    }
  }
}
