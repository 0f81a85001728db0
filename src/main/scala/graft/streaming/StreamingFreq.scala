package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LlmTextOps.{cmsHashA, cmsHashB, cmsMod, cmsWidth}

/** S17 `streaming_cms` — live windowed Count-Min frequency estimates
  * for a monitored token set: the batch `freq_cms` sketch on the
  * ingest path. Per closed event-time window, each probe token gets
  * its exact in-window count and its Count-Min estimate — the
  * "how hot is this term right now, and how much is the sketch
  * over-reporting" feed a corpus-intake monitor reads live.
  *
  * Why this shape: materializing the full 4×1024 cell table per
  * window and then taking the min-over-rows per probe would CHAIN a
  * second stateful aggregate after the first (illegal in append
  * mode). For a FIXED probe set the four cells each probe hashes to
  * are compile-time constants, so the sketch read collapses into
  * conditional sums INSIDE the one windowed aggregate (the S16
  * conditional-bin-sum discipline): 4 cell sums + 1 exact sum per
  * probe, the min fold row-local after the aggregate. State per open
  * window is O(probes × 5 longs) — tighter than the full sketch, and
  * the emitted estimate is bit-identical to reading the full-window
  * CMS because a cell sum only ever counts tokens that land in that
  * cell (StreamingSpec pins stream == the batch recipe on the closed
  * window).
  *
  * Same portable hash chain as the batch row
  * ([[graft.functions.PortableTokenHash]] + the affine row maps), so
  * stream and batch gates cannot disagree.
  */
object StreamingFreq {

  /** `docs` is a streaming frame with (ts TIMESTAMP, text STRING);
    * `probes` the monitored tokens (driver-small, fixed at plan
    * time). Emits (window_start, token, exact_n, est_n, overcount)
    * per closed 1 h window, 10 min watermark, append mode.
    */
  def cmsStream(s: SparkSession, docs: DataFrame,
      probes: Seq[String]): DataFrame = {
    require(probes.nonEmpty, "cmsStream needs at least one probe token")
    val toks = docs
      .select(col("ts"), explode(split(col("text"), " ")).as("token"))
      .withColumn("th",
        element_at(graft.functions.PortableTokenHash
          .tokenHashPortable(s, array(col("token"))), 1) % lit(cmsMod))
    def cellOf(th: Column, r: Int): Column =
      (th * lit(cmsHashA(r)) + lit(cmsHashB(r))) % lit(cmsMod) %
        lit(cmsWidth.toLong)
    def probeCell(t: String, r: Int): Long = {
      val th = graft.functions.PortableTokenHash.computeOne(t) % cmsMod
      ((th * cmsHashA(r) + cmsHashB(r)) % cmsMod) % cmsWidth
    }
    val aggs = probes.zipWithIndex.flatMap { case (t, pi) =>
      cmsHashA.indices.map { r =>
        sum(when(cellOf(col("th"), r) === lit(probeCell(t, r)), 1L)
          .otherwise(0L)).as(s"p${pi}_r$r")
      } :+ sum(when(col("token") === lit(t), 1L).otherwise(0L))
        .as(s"p${pi}_exact")
    }
    val out = toks
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(aggs.head, aggs.tail: _*)
    val perProbe = probes.zipWithIndex.map { case (t, pi) =>
      struct(
        lit(t).as("token"),
        col(s"p${pi}_exact").as("exact_n"),
        least(cmsHashA.indices.map(r => col(s"p${pi}_r$r")): _*)
          .as("est_n"))
    }
    out
      .select(col("window.start").as("window_start"),
        explode(array(perProbe: _*)).as("e"))
      .select(col("window_start"), col("e.token").as("token"),
        col("e.exact_n").as("exact_n"), col("e.est_n").as("est_n"),
        (col("e.est_n") - col("e.exact_n")).as("overcount"))
  }
}
