package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the wall-budget degrade projection (`Bench.shouldDegrade`) — the
  * arithmetic that decides whether the remaining gates run best-of-N or
  * single-repeat (VERDICT r19 #1). The driver's r19 bench artifact was
  * rc:124 because no such decision existed; these cases pin the decision
  * boundary so a refactor can't silently invert it. */
class BenchProtocolSpec extends AnyFunSuite {

  test("degrades when the projection exceeds the budget") {
    // 100s elapsed, avg 2s/repeat, 200 gates × 2 repeats = 800s projected
    // on top of 100 → 900 > 600 budget
    assert(Bench.shouldDegrade(wallS = 100, gateWallSum = 40,
      repeatsExecuted = 20, remainingGates = 200, effRepeats = 2,
      budgetS = 600))
  }

  test("stays best-of-2 when the projection fits") {
    // 100 + 200×2×2 = 900 ≤ 1000 budget
    assert(!Bench.shouldDegrade(wallS = 100, gateWallSum = 40,
      repeatsExecuted = 20, remainingGates = 200, effRepeats = 2,
      budgetS = 1000))
  }

  test("never degrades before minRepeats of signal — one slow first " +
    "gate cannot flip the protocol") {
    // 2 executed repeats of a pathologically slow gate (30s each): the
    // projection would scream, but signal is insufficient
    assert(!Bench.shouldDegrade(wallS = 60, gateWallSum = 60,
      repeatsExecuted = 2, remainingGates = 250, effRepeats = 2,
      budgetS = 600))
    // the same average with enough repeats DOES degrade
    assert(Bench.shouldDegrade(wallS = 60, gateWallSum = 240,
      repeatsExecuted = 8, remainingGates = 250, effRepeats = 2,
      budgetS = 600))
  }

  test("no-op once already at single repeat") {
    assert(!Bench.shouldDegrade(wallS = 10000, gateWallSum = 1000,
      repeatsExecuted = 100, remainingGates = 100, effRepeats = 1,
      budgetS = 600))
  }

  test("boundary: projection exactly at the budget does NOT degrade " +
    "(strict inequality — the budget is a target, not a tripwire)") {
    // avg 1s/repeat: 100 + 200 gates × 1 × 2 repeats = 500 == 500
    assert(!Bench.shouldDegrade(wallS = 100, gateWallSum = 100,
      repeatsExecuted = 100, remainingGates = 200, effRepeats = 2,
      budgetS = 500))
    assert(Bench.shouldDegrade(wallS = 100, gateWallSum = 100,
      repeatsExecuted = 100, remainingGates = 200, effRepeats = 2,
      budgetS = 499.9))
  }
}
