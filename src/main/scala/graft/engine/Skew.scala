package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins at scale.
  *
  * When to reach for which tool:
  * - **AQE skew-join first** (`spark.sql.adaptive.skewJoin`, on by
  *   default): for shuffle sort-merge/hash JOINS it splits oversized
  *   partitions at runtime with no code change and no replication
  *   cost — EngineUtilSpec demonstrates the split firing on a hot key.
  * - **Manual salting** (`saltedJoin`): for the shapes AQE cannot
  *   rewrite — skewed AGGREGATIONS (salt, partial-agg, then re-agg),
  *   joins whose build side must broadcast-replicate against a skewed
  *   probe side, and streaming stateful ops where partition splitting
  *   isn't available. Salting trades `factor`× replication of the
  *   small side for an even spread of the hot keys across `factor`
  *   tasks.
  * - Salt entropy matters: the salt hashes ALL big-side columns, so
  *   feed a projection containing a per-row-unique column (an id or
  *   timestamp) — identical rows get identical salts and collapse the
  *   intended spread.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side's rows
    * randomly-but-deterministically (hash of all columns) into
    * `factor` buckets and replicating the small side `factor`×.
    * Result columns = big ++ small (minus the duplicate key), same as
    * `big.join(small, Seq(key))`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(factor.toLong)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-N heavy-hitter keys of `df[key]` — the observability half of
    * skew handling: find the keys worth salting before paying for it.
    * One aggregation, no collect of raw data.
    */
  def heavyHitters(df: DataFrame, key: Column, topN: Int): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
}
