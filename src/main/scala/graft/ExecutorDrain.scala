package graft

import org.apache.spark.sql.SparkSession

/** Deterministic completion of the between-queries cleanup that
  * `System.gc()` only STARTS: the ContextCleaner frees executor-side
  * broadcast/RDD blocks asynchronously after the driver GC enqueues
  * their references, so a harness that fires the next query immediately
  * races its own cleanup. Under multi-process masters that race is a
  * correctness-of-measurement bug AND a stability bug — dead broadcast
  * blocks sit in the storageFraction-protected pool, and the next heavy
  * query's hash joins die with FailedToGrowBytesToBytesMap (observed at
  * sf1 under local-cluster[4,8,8192] on exactly the 4 heaviest queries;
  * the same suite is green once the sweep WAITS for clean executors).
  *
  * Production mapping (why the engine itself doesn't need this): a real
  * long-lived session gets the same effect from
  * `spark.cleaner.periodicGC.interval` (default 30 min) — the harness
  * equivalent just has to be deterministic per query instead of
  * periodic, because back-to-back 100-query suites outrun a timer.
  */
object ExecutorDrain {
  /** `spark.executor.memory` matching a `local-cluster[n,cores,memMB]`
    * master's per-worker allocation. The bracket number only sizes the
    * WORKER's advertised memory; executors still launch at the default
    * `spark.executor.memory` (1g) unless told otherwise — so
    * `local-cluster[4,8,8192]` silently runs 4×1 GB executor heaps, 8×
    * less than the profile claims (found r11: the bench's 4 heaviest
    * queries died with BytesToBytesMap allocation failures on
    * `-Xmx1024M` executors while every artifact said "8 GB"). Every
    * harness main that accepts a local-cluster master must apply this. */
  def executorMemoryFor(master: String): Option[String] = {
    val m = """local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]""".r
    master match {
      case m(mb) => Some(mb + "m")
      case _     => None
    }
  }

  /** gc + poll cluster storage-used until the executors are actually
    * clean (zero bytes), bounded by `timeoutMs`. After the sweep's
    * clearCache + unpersist, ZERO is the legitimate steady state (the
    * only block producers left are broadcasts and reliable-checkpoint
    * RDDs, which are files, not blocks) — so the loop targets zero, and
    * a stability early-exit is allowed only after `graceMs`: the chain
    * gc → ReferenceQueue → cleaner thread → RemoveBroadcast RPC →
    * executor drop takes a comfortable fraction of a second to even
    * BEGIN moving the number, and exiting on "stable" before that just
    * re-creates the race this helper exists to close (measured: with a
    * 300 ms stability exit the 4-query heavy sequence still died; with
    * the grace period it is green). No-op-fast when already clean.
    *
    * Returns the residual storage-used bytes at exit (0 = fully
    * drained); a nonzero residual is also logged to stderr so a stuck
    * or slow drain leaves a trace in the run's output instead of
    * silently degrading back to the race. */
  def awaitClean(spark: SparkSession, timeoutMs: Long = 15000L): Long = {
    val sc = spark.sparkContext
    def used() = org.apache.spark.graftbridge.StorageBridge.storageUsedBytes(sc)
    System.gc()
    val graceMs = 2000L
    val t0 = System.nanoTime()
    def elapsedMs = (System.nanoTime() - t0) / 1000000L
    var last = used()
    var stable = 0
    while (last > 0 && elapsedMs < timeoutMs &&
           !(stable >= 5 && elapsedMs >= graceMs)) {
      Thread.sleep(100)
      val now = used()
      if (now == last) stable += 1 else stable = 0
      last = now
    }
    // Name the exit cause: "timeout" (still moving when the clock ran
    // out — a genuinely stuck drain) reads very differently from
    // "stable-nonzero" (the cleaner finished and this residual is the
    // steady state, e.g. a deliberately persisted block) — ADVICE r12.
    if (last > 0) {
      val cause = if (elapsedMs >= timeoutMs) s"timeout ${timeoutMs} ms"
                  else s"stable for ${stable * 100} ms"
      System.err.println(
        s"ExecutorDrain.awaitClean: exiting with residual storage " +
          s"${last} B after ${elapsedMs} ms ($cause)")
    }
    last
  }
}
