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

  // --- GraftSession's pure resolvers: the fold every harness main now
  // builds through (r12 VERDICT #4). These pins make the 1 GB-executor
  // class of trap impossible BY CONSTRUCTION: a main that uses
  // GraftSession.build cannot skip the bracket derivation, and these
  // tests keep the derivation itself honest.

  test("GraftSession master resolution: fixed > env > local[cpus]") {
    assert(GraftSession.resolveMaster(Map.empty, "32", None) == "local[32]")
    assert(GraftSession.resolveMaster(
      Map("SPARK_GRAFT_MASTER" -> "local-cluster[4,8,16384]"), "32", None)
      == "local-cluster[4,8,16384]")
    // a lab's fixed master wins over the env (StreamRestartLab's two
    // deliberately-sized sessions must not drift with gate envs)
    assert(GraftSession.resolveMaster(
      Map("SPARK_GRAFT_MASTER" -> "local[4]"), "32", Some("local[8]"))
      == "local[8]")
  }

  test("GraftSession executor memory: explicit env wins on any master; " +
       "bracket is the local-cluster fallback") {
    assert(GraftSession.resolveExecutorMemory(
      Map("SPARK_GRAFT_EXECUTOR_MEM" -> "12g"), "spark://host:7077")
      .contains("12g"))
    assert(GraftSession.resolveExecutorMemory(
      Map("SPARK_GRAFT_EXECUTOR_MEM" -> "12g"), "local-cluster[4,8,8192]")
      .contains("12g"))
    assert(GraftSession.resolveExecutorMemory(Map.empty, "local-cluster[4,8,8192]")
      .contains("8192m"))
    assert(GraftSession.resolveExecutorMemory(Map.empty, "local[32]").isEmpty)
  }
}
