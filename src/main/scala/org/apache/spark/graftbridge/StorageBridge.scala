package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** The one `private[spark]` doorway the harness sweeps need: reading how
  * much block-manager storage memory is currently OCCUPIED across the
  * cluster. Broadcast blocks (every finished broadcast join's
  * HashedRelation) are released on executors only after the DRIVER's GC
  * collects their references and the asynchronous ContextCleaner ships
  * RemoveBroadcast messages — so "System.gc() ran" does not mean "the
  * executors are clean", and a back-to-back query suite can race its own
  * cleanup (observed under local-cluster[4,8,8192] at sf1 as
  * FailedToGrowBytesToBytesMap inside UnsafeHashedRelation.read: dead
  * broadcasts pinned the storageFraction-protected pool, starving
  * execution memory). Spark's own production answer to the same
  * accumulation is `spark.cleaner.periodicGC.interval` (default 30 min);
  * a measurement harness needs the deterministic equivalent: gc, then
  * poll THIS number until the executors are actually clean.
  */
object StorageBridge {
  /** Bytes of storage memory currently in use, summed over every block
    * manager (driver + executors): Σ (maxMem − remainingMem). */
  def storageUsedBytes(sc: SparkContext): Long = {
    val status = sc.env.blockManager.master.getMemoryStatus
    status.values.iterator.map { case (max, remaining) => max - remaining }.sum
  }
}
