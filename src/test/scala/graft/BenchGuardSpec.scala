package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contention-guard thresholds against the synthetic
  * shapes that previously slipped through (r9 VERDICT #1: six queries
  * published 2-4x high because the old >3x/0.5s baseline trigger
  * missed q12's 0.49s gap and g03's 2.26x ratio). */
class BenchGuardSpec extends AnyFunSuite {

  test("r9's six inflated queries all fire the tightened baseline rule") {
    // (name, contended repeat secs, committed BENCH_FULL median)
    val r9Inflated = Seq(
      ("q12", Seq(0.64, 0.66, 0.62), 0.16),
      ("m01", Seq(0.52, 0.55, 0.50), 0.16),
      ("t08", Seq(0.36, 0.37, 0.35), 0.17),
      ("m06", Seq(0.64, 0.65, 0.63), 0.33),
      ("g13", Seq(1.56, 1.60, 1.52), 0.78),
      ("g03", Seq(4.75, 4.80, 4.70), 2.10))
    r9Inflated.foreach { case (name, secs, committed) =>
      assert(BenchGuard.suspect(secs, clean = true, Some(committed)),
        s"$name should be suspect under the tightened thresholds")
    }
  }

  test("honest run near the committed baseline does not fire") {
    // 1.5x with a small absolute gap: normal run-to-run variance
    assert(!BenchGuard.suspect(Seq(0.24, 0.25, 0.23), clean = true, Some(0.16)))
    // big ratio but tiny absolute gap (0.05s query): noise, not contention
    assert(!BenchGuard.suspect(Seq(0.14, 0.15, 0.14), clean = true, Some(0.05)))
    // exactly-at-threshold stays clean (strict >): 0.75 = 1.5x of 0.50
    assert(!BenchGuard.suspect(Seq(0.75, 0.75, 0.75), clean = true, Some(0.50)))
    // (0.90 uniform vs 0.50 — formerly clean at exactly 1.8x — now
    // correctly retries under the r11 uniform-slowdown rule)
    assert(BenchGuard.suspect(Seq(0.90, 0.90, 0.90), clean = true, Some(0.50)))
  }

  test("spread rule fires on a mid-sweep stall without any baseline") {
    assert(BenchGuard.suspect(Seq(12.8, 85.6, 109.6), clean = true, None))
    assert(!BenchGuard.suspect(Seq(7.0, 7.2, 7.1), clean = true, None))
  }

  test("errored runs are never suspect; retries must be clean and faster") {
    assert(!BenchGuard.suspect(Seq(0.64, 0.66, 0.62), clean = false, Some(0.16)))
    assert(BenchGuard.rerunWins(Seq(0.64, 0.66, 0.62), Seq(0.2, 0.21, 0.2),
      rerunClean = true))
    // an errored rerun is near-zero-fast but must not displace the original
    assert(!BenchGuard.rerunWins(Seq(0.64, 0.66, 0.62), Seq(0.01, 0.01, 0.01),
      rerunClean = false))
    // a genuine regression: rerun equally slow, original kept (no win either way)
    assert(!BenchGuard.rerunWins(Seq(0.64, 0.66, 0.62), Seq(0.65, 0.66, 0.64),
      rerunClean = true))
  }

  test("uniform-slowdown rule: three uniformly-slow repeats vs baseline retry") {
    // r10's t16_decontamination: baseline 0.864s, repeats [1.30, 1.52,
    // 1.63] — spread 1.25x (invisible to the spread rule), median 1.76x
    // baseline (0.04 under the 1.8x trigger). Must now fire.
    assert(BenchGuard.uniformSlowdown(Seq(1.30, 1.52, 1.63), Some(0.864)))
    assert(BenchGuard.suspect(Seq(1.30, 1.52, 1.63), clean = true, Some(0.864)))
    // r10's g01 drift (1.28 -> 1.64 = 1.28x): below 1.5x, stays quiet
    assert(!BenchGuard.uniformSlowdown(Seq(1.60, 1.64, 1.70), Some(1.28)))
    // r11's t17_near_dup_survivors replay: [5.48, 6.39, 7.35] vs
    // committed 3.69 — spread 1.34 escaped the old <1.3x spread
    // ceiling by 0.04; the min-based floor fires (min 5.48 = 1.49x,
    // median 6.39 = 1.73x). The exact shape that published a 1.56x
    // inflated t17 in BENCH_r11.
    assert(BenchGuard.uniformSlowdown(Seq(5.48, 6.39, 7.35), Some(3.69)))
    assert(BenchGuard.suspect(Seq(5.48, 6.39, 7.35), clean = true, Some(3.69)))
    // 1.6x median ratio but one FAST repeat near baseline: not a
    // uniform slowdown — that shape belongs to the spread/baseline rules
    assert(!BenchGuard.uniformSlowdown(Seq(0.90, 1.55, 1.60), Some(0.95)))
    // single-stall set: median at baseline, the uniform rule stays
    // quiet and the spread rule handles it
    assert(!BenchGuard.uniformSlowdown(Seq(1.0, 1.05, 9.0), Some(1.0)))
    assert(BenchGuard.suspect(Seq(1.0, 1.05, 9.0), clean = true, Some(1.0)))
    // tiny absolute gap (0.08s on a 0.1s query): quiet under the gap floor
    assert(!BenchGuard.uniformSlowdown(Seq(0.18, 0.18, 0.19), Some(0.10)))
    // no committed baseline: rule cannot apply
    assert(!BenchGuard.uniformSlowdown(Seq(1.30, 1.52, 1.63), None))
  }

  test("r12 driver-run replay: 12 isolated retries stamp the artifact " +
      "contended_suspect; a healthy sweep does not") {
    // BENCH_r12's driver window needed 12 retries on code identical to
    // the builder's 0-retry sweep — the shape the stamp exists for
    assert(BenchGuard.contendedSuspect(12))
    // s02's spread in that run ([6.24, 30.06]) also fires the per-query
    // spread rule, so the median itself was already being defended
    assert(BenchGuard.spreadNoisy(Seq(6.24, 10.05, 30.06)))
    // healthy range: the builder's committed sweeps run 0-5 retries
    assert(!BenchGuard.contendedSuspect(0))
    assert(!BenchGuard.contendedSuspect(5))
    assert(BenchGuard.contendedSuspect(6))
  }

  test("contentionShaped requires a DECISIVE rerun win; a regression's " +
      "hovering rerun displaces the median but never counts as contention") {
    // contention: isolated rerun collapses to a third of the original
    assert(BenchGuard.contentionShaped(
      Seq(0.64, 0.66, 0.62), Seq(0.20, 0.21, 0.20), rerunClean = true))
    // regression: rerun hovers just under the original median — it WINS
    // (lower median is the honest report) but is NOT contention-shaped,
    // so it cannot push the sweep toward the contended_suspect stamp
    assert(BenchGuard.rerunWins(
      Seq(0.64, 0.66, 0.62), Seq(0.60, 0.62, 0.61), rerunClean = true))
    assert(!BenchGuard.contentionShaped(
      Seq(0.64, 0.66, 0.62), Seq(0.60, 0.62, 0.61), rerunClean = true))
    // exactly at the 0.8x boundary stays not-shaped (strict <)
    assert(!BenchGuard.contentionShaped(
      Seq(1.0, 1.0, 1.0), Seq(0.8, 0.8, 0.8), rerunClean = true))
    // an errored rerun is never contention evidence
    assert(!BenchGuard.contentionShaped(
      Seq(0.64, 0.66, 0.62), Seq(0.01, 0.01, 0.01), rerunClean = false))
  }

  test("baselineMissing flags gate queries absent from the committed " +
      "artifact (the v10-after-closing-sweep shape)") {
    val committed = Map("q01" -> 0.3, "v06" -> 1.2, "v08" -> 1.2)
    // r12's exact failure: v10 added to the gate after the last sweep
    assert(BenchGuard.baselineMissing(
      Seq("q01", "v06", "v08", "v10"), committed) === Seq("v10"))
    // in-sync gate: nothing missing
    assert(BenchGuard.baselineMissing(
      Seq("q01", "v06", "v08"), committed).isEmpty)
    // a query REMOVED from the gate is not "missing" (stale committed
    // keys are harmless — the guard just never consults them)
    assert(BenchGuard.baselineMissing(Seq("q01"), committed).isEmpty)
    // empty committed baseline (first run ever): everything is missing,
    // sorted for a stable artifact
    assert(BenchGuard.baselineMissing(
      Seq("b", "a"), Map.empty) === Seq("a", "b"))
  }

  test("probeFor subtracts only top-level spans: nested legs never go " +
      "negative (the s02 -3.11s shape), and BenchPhases tracks nesting") {
    // the exact r17 artifact bug: s02's four legs recorded INSIDE its
    // build span; summing all five double-counts and the residual goes
    // negative. probeFor must subtract the build alone.
    val q = "s02_streaming_window"
    val spans = Map(
      s"$q.build" -> 10.0, s"$q.ctas" -> 2.0, s"$q.drain1" -> 3.0,
      s"$q.insert" -> 1.0, s"$q.drain2" -> 3.5)
    val nested = Set(s"$q.ctas", s"$q.drain1", s"$q.insert", s"$q.drain2")
    assert(BenchGuard.probeFor(q, 11.0, spans, nested) === Some(1.0))
    // the pre-fix behavior for contrast: flat subtraction is negative
    assert(11.0 - spans.values.sum < 0)
    // sibling top-level spans still all subtract (g15-shaped)
    val flat = Map("g15.build" -> 2.0, "g15.optimize" -> 1.5)
    assert(BenchGuard.probeFor("g15", 4.0, flat, Set.empty) === Some(0.5))
    // no .build span -> no residual line
    assert(BenchGuard.probeFor("q01", 1.0, Map("q01.x" -> 0.4), Set.empty)
      .isEmpty)
    // ns-rounding can push the honest residual epsilon-negative: clamp
    assert(BenchGuard.probeFor("g12", 1.0,
      Map("g12.build" -> 1.0000001), Set.empty) === Some(0.0))
    // other queries' spans never leak into q's residual
    assert(BenchGuard.probeFor("g15", 4.0,
      flat ++ Map("g16.build" -> 99.0), Set.empty) === Some(0.5))
    // and the recorder itself marks nesting: a timed span started while
    // another is active on the thread lands in nestedSnapshot
    BenchPhases.clear()
    BenchPhases.timed("outer.build") {
      BenchPhases.timed("outer.leg1") { () }
      BenchPhases.timed("outer.leg2") { () }
    }
    BenchPhases.timed("outer.sibling") { () }
    assert(BenchPhases.nestedSnapshot === Set("outer.leg1", "outer.leg2"))
    assert(BenchPhases.snapshot.keySet ===
      Set("outer.build", "outer.leg1", "outer.leg2", "outer.sibling"))
    val probe = BenchGuard.probeFor("outer", 1.0, BenchPhases.snapshot,
      BenchPhases.nestedSnapshot)
    assert(probe.exists(_ >= 0.0), s"probe must be non-negative, got $probe")
    BenchPhases.clear()
  }

  test("parseCommitted reads the writer's artifact shape, including reordering") {
    val artifact =
      """{"metric":"total","value":70.77,"unit":"sec",""" +
        """"queries":{"q12":0.16,"g03":2.10},"spread":{"q12":[0.1,0.2]},""" +
        """"phases":{"g12.build":1.2},"errs":{},"retried":[],""" +
        """"contended":false,"repeats":3,"sf":"/root/testdata/sf0.1"}"""
    val (qs, tot) = BenchGuard.parseCommitted(artifact)
    assert(qs === Map("q12" -> 0.16, "g03" -> 2.10))
    assert(tot === Some(70.77))
    // reordered + nested extras must not break or empty the map
    val reordered =
      """{"sf":"x","queries":{"a":1.5,"b":0.25},"extra":{"nested":{"deep":1}},""" +
        """"value":1.75,"metric":"total"}"""
    val (qs2, tot2) = BenchGuard.parseCommitted(reordered)
    assert(qs2 === Map("a" -> 1.5, "b" -> 0.25))
    assert(tot2 === Some(1.75))
  }
}
