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
    val dynamic = SparkEntry.dynamicOracleSql(spark, TestSpark.sf0001).keySet
    val missing =
      (SparkEntry.oracleSql.keySet ++ dynamic) -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
    val overlap = SparkEntry.oracleSql.keySet & dynamic
    assert(overlap.isEmpty, s"key in both static and dynamic maps: $overlap")
  }

  test("oracle-less queries are exactly the documented approximate/stub set") {
    val oracleLess = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet --
      SparkEntry.dynamicOracleSql(spark, TestSpark.sf0001).keySet
    val documented = Set(
      "distinct_users_approx", "value_percentiles_approx",
      "dedup_minhash", "dedup_simhash", "dedup_simhash_scaled")
    assert(oracleLess == documented,
      s"undocumented oracle-less: ${oracleLess -- documented}; " +
        s"stale documented: ${documented -- oracleLess}")
  }

  test("all queries execute at sf0.001 and are non-empty where expected", SlowTest) {
    // join_anti may legitimately return 0 rows at tiny sf;
    // split_leakage needs an exact-dup pair straddling the 80/10/10
    // hash buckets, which the 50-doc corpus doesn't produce;
    // multimodal_dedup needs an exact BYTE duplicate — the 0.16%
    // exact-copy rate yields none in the 50-doc corpus (the oracle
    // gate agrees on the empty set; sf0.01 and up are non-empty);
    // multimodal_phash needs a Hamming<=3 signature pair, which only
    // the byte-identical copies at sf0.1 produce (min observed
    // hamming at sf0.01 is 12 — MultimodalKernelsSpec pins the
    // non-vacuous sf0.1 set against the brute-force replay)
    val mayBeEmpty = Set("join_anti", "dedup_simhash", "dedup_simhash_scaled",
      "dedup_simhash_portable", "split_leakage", "multimodal_dedup",
      "multimodal_phash")
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, TestSpark.sf0001).count()
    }
    val empties = counts.collect {
      case (n, c) if c == 0 && !mayBeEmpty(n) => n
    }
    assert(empties.isEmpty, s"unexpectedly empty: $empties")
  }

  test("chunk-blocked dedup_simhash equals the brute-force pair scan at sf0.001") {
    import org.apache.spark.sql.functions._
    val s = spark
    // brute-force reference computed inline: all pairs, Hamming <= 3
    val sigs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .withColumn("th", expr("transform(split(text, ' '), t -> xxhash64(t))"))
      .withColumn("sig", graft.functions.VectorExprs.simhash64(s, col("th")))
      .select(col("doc_id"), col("sig"))
    val brute = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming", bit_count(col("x.sig").bitwiseXOR(col("y.sig"))))
      .where(col("hamming") <= 3)
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = graft.operators.LlmTextOps.dedupSimhash(s, TestSpark.sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"pigeonhole blocking diverged: missing=${brute -- blocked} extra=${blocked -- brute}")
  }

  test("deeper combination blocking emits the identical pair set (every depth)") {
    // the candidate-mass dial must never change the OUTPUT: pigeonhole
    // exactness holds at any nBlocks > maxHamming, and the exact
    // Hamming filter removes hash-collision extras. Pin B = 6 and
    // B = 8 (the 32- and 40-bit key depths the scaled rule selects at
    // large n) against the classic B = 4 scheme at sf0.01, plus the
    // corpus-sized entry point itself.
    import graft.operators.LlmTextOps
    val sigs = LlmTextOps.simhashSigs(spark, TestSpark.sf001)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b4 = pairs(LlmTextOps.simhashBlockedPairs(sigs, 64, 4, 3))
    for (b <- Seq(6, 8)) {
      val deep = pairs(LlmTextOps.simhashBlockedPairs(sigs, 64, b, 3))
      assert(deep == b4,
        s"B=$b diverged: missing=${b4 -- deep} extra=${deep -- b4}")
    }
    assert(pairs(LlmTextOps.dedupSimhashScaled(spark, TestSpark.sf001)) == b4)
    // and deeper keys strictly shrink the pre-Hamming candidate mass
    // on this low-entropy corpus (the dial's whole point)
    val m4 = LlmTextOps.simhashCandidateMass(sigs, 64, 4, 3)
    val m6 = LlmTextOps.simhashCandidateMass(sigs, 64, 6, 3)
    assert(m6 <= m4, s"B=6 candidates $m6 > B=4 candidates $m4")
  }

  test("portable SimHash signature matches the DuckDB golden value and brute force") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val s = spark
    // cross-engine golden: this exact value was computed by the
    // oracle's SQL formulation in DuckDB for the text 'alpha beta' —
    // a drifted constant or op-order change on either side breaks it
    val sig = Seq(Tuple1("alpha beta")).toDF("text")
      .withColumn("th", expr(
        """transform(split(text, ' '),
             t -> CAST(ascii(t) AS BIGINT) * 17161
                  + CAST(ascii(reverse(t)) AS BIGINT) * 131
                  + length(t))"""))
      .select(graft.functions.PortableSimHash60.simhash60Portable(s, col("th")))
      .collect().head.getLong(0)
    assert(sig == 244480808483685522L, s"portable signature drifted: $sig")

    // and the 15-bit chunk blocking is exact vs brute-force Hamming
    // at sf0.01 (sf0.001 has too few portable pairs to be probative)
    val sigs = graft.engine.Tables.documents(s, TestSpark.sf001)
      .withColumn("th", expr(
        """transform(split(text, ' '),
             t -> CAST(ascii(t) AS BIGINT) * 17161
                  + CAST(ascii(reverse(t)) AS BIGINT) * 131
                  + length(t))"""))
      .withColumn("sig",
        graft.functions.PortableSimHash60.simhash60Portable(s, col("th")))
      .select(col("doc_id"), col("sig"))
    val brute = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming", bit_count(col("x.sig").bitwiseXOR(col("y.sig"))))
      .where(col("hamming") <= 3)
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = graft.operators.LlmTextOps
      .dedupSimhashPortable(s, TestSpark.sf001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"pigeonhole blocking diverged: missing=${brute -- blocked} extra=${blocked -- brute}")
    assert(blocked.nonEmpty)
  }

  test("dedup_embed_blocked emits only true pairs (subset of exact dedup_embed)") {
    val exact = graft.operators.LlmVectorOps.dedupEmbed(spark, TestSpark.sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = graft.operators.LlmVectorOps
      .dedupEmbedBlocked(spark, TestSpark.sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact), s"false positives: ${blocked -- exact}")
    assert(blocked.nonEmpty, "LSH blocking found no candidate pairs at all")
  }

  test("scale-adaptive embed blocking emits only true pairs too") {
    // the k = log2(n/64) sizing changes candidate generation, never
    // the exact re-score: output stays a subset of the exact pair set
    val exact = graft.operators.LlmVectorOps.dedupEmbed(spark, TestSpark.sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scaled = graft.operators.LlmVectorOps
      .dedupEmbedBlockedScaled(spark, TestSpark.sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scaled.subsetOf(exact), s"false positives: ${scaled -- exact}")
    assert(scaled.nonEmpty, "scaled LSH blocking found no pairs at all")
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
    // the portable twin must find them too: identical texts produce
    // identical portable signatures, which collide in every band
    val mp = graft.operators.LlmTextOps
      .dedupMinhashPortable(spark, TestSpark.sf0001)
      .where(col("est_jaccard") >= 0.999)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(mp),
      s"portable MinHash missed exact dups: ${exact -- mp}")
  }
}
