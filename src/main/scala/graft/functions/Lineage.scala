package graft.functions

import org.apache.spark.sql.DataFrame

/** Lineage control for ITERATIVE operators (connected components, Lloyd
  * training): each round must truncate the plan, or round N embeds the
  * whole subtree of rounds 1..N-1 and both analysis time and recovery
  * cost grow without bound.
  *
  * Two truncation levels, chosen by session configuration:
  *
  *  - `SparkContext.setCheckpointDir` configured (a real cluster with a
  *    shared store): RELIABLE `checkpoint()` — blocks are written to the
  *    fault-tolerant store, so losing an executor after truncation
  *    recovers by re-reading, not by a job failure. This is the only
  *    correct choice at scale: `localCheckpoint` blocks live in executor
  *    memory/disk, and once lineage is truncated a lost executor makes
  *    them UNRECOVERABLE (the job dies instead of recomputing).
  *  - no checkpoint dir (local mode, tests, bench): eager
  *    `localCheckpoint(true)` — same truncation, executor-local storage,
  *    no filesystem round-trip. Correct whenever executors cannot be
  *    lost independently of the driver, i.e. exactly local mode.
  *
  * The switch is per-call so a session that sets the dir mid-stream gets
  * reliable cuts from that point on. `checkpoint()` is eager (it runs
  * the job at call time) just like `localCheckpoint(true)` — callers'
  * convergence probes keep their cost model either way.
  */
object Lineage {
  /** Eagerly truncate `df`'s lineage: reliable when the session has a
    * checkpoint dir, executor-local otherwise. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)
}
