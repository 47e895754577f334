package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the harness-side session plumbing that has no oracle: the
  * local-cluster executor-memory derivation. The bracket memory in
  * `local-cluster[n,cores,memMB]` sizes only the WORKER's advertised
  * pool; executors launch at the `spark.executor.memory` default (1g)
  * unless the session sets it — found r11 when the "8 GB" bench
  * executors turned out to be `-Xmx1024M` and died on the four
  * heaviest queries. This spec keeps the parser honest so no future
  * harness main re-introduces the silent 8× under-provisioning. */
class HarnessSpec extends AnyFunSuite {
  test("local-cluster masters derive spark.executor.memory from the bracket") {
    assert(ExecutorDrain.executorMemoryFor("local-cluster[4,8,8192]")
      .contains("8192m"))
    assert(ExecutorDrain.executorMemoryFor("local-cluster[ 3, 8, 1024 ]")
      .contains("1024m"))
  }

  test("non-cluster masters derive nothing (local defaults untouched)") {
    assert(ExecutorDrain.executorMemoryFor("local[32]").isEmpty)
    assert(ExecutorDrain.executorMemoryFor("local[*]").isEmpty)
    assert(ExecutorDrain.executorMemoryFor("spark://host:7077").isEmpty)
  }
}
