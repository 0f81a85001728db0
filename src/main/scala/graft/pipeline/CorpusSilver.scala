package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables
import graft.operators.LlmTextOps

/** Opt-in silver-table materialization for the corpus-dedup pipeline.
  *
  * `dedup_near`, `dedup_survivors` and `corpus_filter` share the
  * shingle → posting-list → pair subplan; as independent bench queries
  * each recomputes it (measured: an in-session persist() is *slower*
  * at test scale — cache-fill races + serialization, see the note in
  * `LlmTextOps.dedupMinhash`). At 100 TB the honest shape is to write
  * the pair set ONCE as a silver table and let every downstream
  * consumer anti-join against the parquet — one shingle pass total,
  * pruned scans for everyone after. This module is that pattern as an
  * explicit, caller-invoked step; it deliberately is NOT wired into
  * Bench, whose per-query numbers must keep measuring full plans.
  */
object CorpusSilver {

  /** Compute and write the exact 3-shingle Jaccard near-dup pair table
    * (the `dedup_near` result: i, j, jaccard) as a silver parquet.
    */
  def writeNearDupPairs(s: SparkSession, sfDir: String, path: String): Unit =
    LlmTextOps.dedupNear(s, sfDir).write.mode("overwrite").parquet(path)

  /** `dedup_survivors` reading the materialized pair table instead of
    * recomputing the shingle pipeline.
    */
  def survivors(s: SparkSession, sfDir: String, pairsPath: String): DataFrame =
    LlmTextOps.survivorsFromPairs(
      Tables.documents(s, sfDir), s.read.parquet(pairsPath))

  /** Connected-components labeling read from the materialized pair
    * table (the `dedup_components` consumer path): the fixpoint loop
    * runs over the silver parquet, so relabeling after a threshold or
    * policy change never re-runs the shingle pipeline.
    */
  def components(s: SparkSession, sfDir: String,
      pairsPath: String): DataFrame =
    LlmTextOps.componentsFromPairs(s,
      s.read.parquet(pairsPath).select("i", "j"))

  /** The full `corpus_filter` capstone served from the silver pair
    * table: one shingle pass ever (at `writeNearDupPairs` time), then
    * the selection composes quality + language + embeddings against
    * the parquet — the shape every downstream consumer runs at 100 TB.
    */
  def corpusFilter(s: SparkSession, sfDir: String,
      pairsPath: String): DataFrame =
    LlmTextOps.corpusFilterFromSurvivors(s, sfDir,
      survivors(s, sfDir, pairsPath))
}
