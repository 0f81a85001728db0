package graft

import org.scalatest.Tag

/** Slow-tier tag: wall-clock-heavy cases (polling triggers, kill +
  * checkpoint-restart chaos replays, whole-inventory sweeps, multi-SF
  * route equivalences) excluded from the default `sbt test` so the
  * fast tier fits an automated test budget (~13 min of suite time vs
  * ~32 with the slow tier). The tagged cases are still part of the
  * suite contract — run them with
  *
  *   SPARK_GRAFT_SLOW_TESTS=1 sbt test
  *
  * (build.sbt drops the `-l graft.SlowTest` exclusion when that env
  * var is set). Every tagged case stays green; the split only moves
  * them out of the default tier's wall-clock.
  */
object SlowTest extends Tag("graft.SlowTest")
