package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins at scale.
  *
  * AQE's skew-join splitting (on by default) covers sort-merge joins;
  * explicit salting is still the tool when a *build* side must be
  * replicated against a heavily skewed probe side (e.g. joining 100 TB
  * of events where 1% of users produce 50% of rows against a per-user
  * dimension). Salting trades `factor`× replication of the small side
  * for an even distribution of the hot keys across `factor` tasks.
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
