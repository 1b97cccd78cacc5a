package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.StreamThroughputProbe.stability

/** Pins the regime-relative `stable` verdict (VERDICT r16 #5): the
  * old trigger-absolute flag read false on EVERY healthy decade
  * capture (multi-second batches by design), so the new rule must
  * (a) pass those regimes, (b) still fail a genuine backlog spiral,
  * and (c) keep the jitter tolerance of the sub-trigger regime.
  */
class StabilitySpec extends AnyFunSuite {

  test("healthy multi-second-batch regime is stable (HEALTH60K shape)") {
    // r16 HEALTH60K: rate 60k, sustained 59.5k (99.2%), p50 813 ms,
    // p95 1091 ms, flat durations — stable_strict was false (p95 >
    // 1000 ms trigger) despite textbook health.
    val durs = Seq.fill(50)(810L) ++ Seq.fill(45)(850L) ++ Seq.fill(5)(1091L)
    val (stable, frac, growth) = stability(60000, 59500, durs, 1000)
    assert(stable, s"frac=$frac growth=$growth")
    assert(frac >= 0.99)
  }

  test("10s-batch sparse-serving regime is stable (ANNSERVE shape)") {
    // rate 1 probe/s, batches ~10 s each carrying ~10-20 probes,
    // sustained 2.02 probes/s (catch-up > rate), p95 18.1 s ≤ 2×10.4 s.
    val durs = Seq.fill(20)(10400L) ++ Seq.fill(3)(18100L)
    val (stable, _, _) = stability(1.0, 2.02, durs, 10000)
    assert(stable)
  }

  test("backlog spiral fails on growth even when quantiles look sane yet") {
    // the r16 rate-75 spiral: 59 s → 105 s batches, monotone growth —
    // each overrun batch accumulates rate × overrun extra input.
    val durs = (0 until 12).map(i => 59000L + i * 5000L)
    val (stable, _, growth) = stability(75, 74, durs, 1000)
    assert(!stable)
    assert(growth > 1.5)
  }

  test("rate shortfall fails regardless of flat batch times") {
    val durs = Seq.fill(30)(900L)
    val (stable, frac, _) = stability(60000, 33000, durs, 1000)
    assert(!stable)
    assert(frac < 0.95)
  }

  test("sub-trigger regime keeps the trigger tolerance (2xp50 < trigger)") {
    // p50 5 ms, p95 400 ms: 2×p50 would flag harmless jitter, but the
    // batches all drain well inside the trigger — stable.
    val durs = Seq.fill(95)(5L) ++ Seq.fill(5)(400L)
    val (stable, _, _) = stability(1000, 1000, durs, 1000)
    assert(stable)
  }

  test("fat tail relative to own p50 AND trigger fails") {
    val durs = Seq.fill(90)(2000L) ++ Seq.fill(10)(9000L)
    val (stable, _, _) = stability(100, 100, durs, 1000)
    assert(!stable)
  }
}
