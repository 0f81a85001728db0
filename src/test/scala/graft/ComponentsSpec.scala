package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmTextOps

/** Connected-components labeling (large-star/small-star fixpoint):
  * transitive chains merge (the case greedy survivor selection
  * under-merges), labels are component minima, and degenerate inputs
  * terminate.
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def label(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    LlmTextOps.componentsFromPairs(spark, pairs.toDF("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chain A-B, B-C collapses to one component") {
    // greedy keep-smallest-id would keep both 1 and 3 (1-3 not paired);
    // components label all three with the chain minimum
    val got = label(Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint components keep separate minima") {
    val got = label(Seq((5L, 4L), (10L, 11L), (11L, 12L), (12L, 13L), (2L, 7L)))
    assert(got == Map(
      4L -> 4L, 5L -> 4L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      2L -> 2L, 7L -> 2L))
  }

  test("long path and cycle converge to the minimum") {
    val path = (0L until 20L).map(k => (k, k + 1)) // 0-1-2-...-20
    val cycle = Seq((30L, 31L), (31L, 32L), (32L, 30L))
    val got = label(path ++ cycle)
    assert((0L to 20L).forall(n => got(n) == 0L))
    assert((30L to 32L).forall(n => got(n) == 30L))
  }

  test("empty and self-loop-only inputs yield empty output") {
    assert(label(Seq.empty) == Map.empty)
    assert(label(Seq((3L, 3L))) == Map.empty)
  }

  test("random graphs match a reference union-find (20 seeds)") {
    // property check: the distributed large-star/small-star fixpoint
    // equals a trivially-correct driver union-find on arbitrary
    // small graphs (cycles, chains, stars, isolated pairs all arise)
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      nodes.map(n => n -> find(n)).toMap
    }
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val n = 5 + rnd.nextInt(30)
      val m = 1 + rnd.nextInt(40)
      val pairs = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(pairs)
      val got = label(pairs)
      assert(got == expected, s"seed=$seed pairs=$pairs")
    }
  }

  test("path graph of 10^4 nodes converges in O(log n) rounds, not O(diameter)") {
    // the O(log n) claim made for the 100 TB posture, measured: a
    // path is the deep-diameter adversary (Pregel-style propagation
    // needs 10^4 rounds here); alternating large-star/small-star must
    // land within ~2·log2(n) rounds (+ the fixpoint-detection round)
    val n = 10000L
    val path = (0L until n - 1).map(k => (k, k + 1))
    val (labeled, rounds) = LlmTextOps.componentsFixpoint(
      spark, path.toDF("i", "j"))
    val bound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(n - 1)) + 2
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
    val got = labeled.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n)
    assert(got.forall(_._2 == 0L))
  }

  test("star of 10^5 members completes without materializing the hub in memory") {
    // giant-component posture: the hub's neighborhood must flow
    // through the spillable window-min, never a collect_set array on
    // one task; a star is already the fixpoint shape, so rounds stay
    // minimal regardless of member count
    val n = 100000L
    val star = (1L until n).map(k => (k, 0L))
    val (labeled, rounds) = LlmTextOps.componentsFixpoint(
      spark, star.toDF("i", "j"))
    assert(rounds <= 4, s"star took $rounds rounds")
    val labels = labeled.select("component_id").distinct().collect()
    assert(labels.map(_.getLong(0)).toSeq == Seq(0L))
    assert(labeled.count() == n)
  }

  test("reliable-checkpoint rounds produce the identical labeling") {
    // the cluster setting: per-round lineage truncation goes through
    // Dataset.checkpoint against a checkpoint dir (survives executor
    // loss) instead of executor-local blocks — same fixpoint, same
    // rounds, files actually written
    val pairs = ((0L until 40L).map(k => (k, k + 1)) // path: multi-round
      ++ Seq((100L, 101L), (101L, 102L))).toDF("i", "j")
    val expected = LlmTextOps.componentsFromPairs(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // without a checkpoint dir the reliable path must refuse loudly,
    // not fall back to local blocks (guarded: setCheckpointDir is
    // JVM-global with no unset, so only provable on a pristine
    // context — never asserted as a precondition of the whole test)
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] {
        LlmTextOps.componentsFromPairs(spark, pairs, reliableCheckpoint = true)
      }
    }
    // NOT deleted afterwards: the shared context keeps pointing at the
    // dir for the rest of the JVM, and a later checkpoint against a
    // deleted path would fail — tmpdir cleanup owns it instead
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val (labeled, rounds) = LlmTextOps.componentsFixpoint(
      spark, pairs, reliableCheckpoint = true)
    val got = labeled.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(rounds >= 2) // multi-round: the reliable path truncated lineage
    // the rounds really went through the reliable store
    val files = org.apache.commons.io.FileUtils.listFiles(
      new java.io.File(dir), null, true)
    assert(!files.isEmpty, "no checkpoint files written")
  }

  test("labeling is invariant to shuffle partitioning (4 vs 32)") {
    // the fixpoint loop is iterative — pin that partition count (and
    // with it task scheduling / round internals) cannot perturb the
    // final labeling the oracle hashes
    val at4 = LlmTextOps.dedupComponents(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val at32 = LlmTextOps.dedupComponents(spark, TestSpark.sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(at32 == at4)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("dedup_components at sf0.001 refines dedup_near pairs consistently") {
    val comps = LlmTextOps.dedupComponents(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = LlmTextOps.dedupNear(spark, TestSpark.sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    // every paired doc is labeled, endpoints of a pair share a label,
    // and each label is its component's minimum member
    pairs.foreach { case (i, j) =>
      assert(comps(i) == comps(j), s"pair ($i,$j) split across components")
    }
    comps.groupBy(_._2).foreach { case (root, members) =>
      assert(members.keys.min == root, s"component $root not rooted at min")
    }
  }
}
