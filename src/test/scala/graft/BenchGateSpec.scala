package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query bench regression gate: a query that blows past 3× its
  * recorded time must produce a warning (the round-2 lesson — a 106 s
  * query shipped in a final commit after the last bench refresh), and the
  * recorded-baseline map must stay in lockstep with `SparkEntry.queries`.
  */
class BenchGateSpec extends AnyFunSuite {

  test("gate fires on an artificially slowed query") {
    val recorded = Map("q_a" -> 1.0, "q_b" -> 0.2)
    val fired = Bench.regressionWarnings(Seq("q_a" -> 30.0, "q_b" -> 0.2), recorded)
    assert(fired.size == 1 && fired.head.contains("q_a"), fired)
  }

  test("gate stays quiet at recorded times and on sub-floor jitter") {
    val recorded = Map("q_a" -> 1.0, "q_b" -> 0.2)
    assert(Bench.regressionWarnings(Seq("q_a" -> 1.4, "q_b" -> 0.3), recorded).isEmpty)
    // 5x on a 0.2s query is host jitter, not a regression (absolute floor)
    assert(Bench.regressionWarnings(Seq("q_b" -> 1.0), recorded).isEmpty)
    // failed queries (-1 sentinel) are reported elsewhere, not as regressions
    assert(Bench.regressionWarnings(Seq("q_a" -> -1.0), recorded).isEmpty)
  }

  test("every SparkEntry query has a recorded bench baseline") {
    val missing = SparkEntry.queries.keySet -- Bench.recordedQuerySeconds.keySet
    assert(missing.isEmpty,
      s"queries without a bench baseline (add to Bench.recordedQuerySeconds " +
        s"and re-bench): ${missing.mkString(", ")}")
  }
}
