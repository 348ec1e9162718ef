package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure unit tests for Bench's machine-window adjudication — no Spark
  * session; the gate logic must be provably right without running a
  * suite (r16 judge directive #7: the burst advisory stamp).
  */
class BenchSpec extends AnyFunSuite {

  private def adj(base: Double, probes: Seq[Double],
      gate: Boolean = false, gateSteal: Boolean = false,
      steal: Double = 0.0) =
    Bench.adjudicateCal(base, probes, gate, gateSteal, steal)

  test("quiet run: no flags") {
    val v = adj(0.10, Seq(0.10, 0.11, 0.10, 0.12, 0.11))
    assert(!v.contended && !v.burst && !v.sustainedRun)
    assert(v.medianDrift < 1.5 && v.maxDrift < 2.0)
  }

  test("single 4.8x probe spike: burst=true, contended stays false " +
      "(the r16 driver-run signature)") {
    // base 0.10, one probe at 0.48 (4.8x), the rest quiet — the exact
    // shape that passed every gate in the r16 driver artifact
    val v = adj(0.10, Seq(0.11, 0.10, 0.48, 0.11, 0.10, 0.12, 0.11))
    assert(v.burst, s"expected burst stamp, got $v")
    assert(!v.contended, "a single spike must not flip contended")
    assert(!v.sustainedRun)
  }

  test("spike at exactly 4x does not stamp burst; above does") {
    assert(!adj(0.10, Seq(0.10, 0.40, 0.10, 0.10)).burst)
    assert(adj(0.10, Seq(0.10, 0.41, 0.10, 0.10)).burst)
  }

  test("sustained 3-probe run >2x trips contended (and burst if >4x)") {
    val v = adj(0.10, Seq(0.11, 0.25, 0.26, 0.24, 0.11, 0.10))
    assert(v.sustainedRun && v.contended)
    assert(!v.burst, "2.6x probes are not a >4x burst")
  }

  test("uniformly elevated probes trip the median gate") {
    val v = adj(0.10, Seq(0.20, 0.21, 0.19, 0.22))
    // trimmed min = 2nd-smallest probe vs calBase anchor: calBase 0.10
    // stays the denominator, so median drift is ~2x
    assert(v.medianDrift > 1.5 && v.contended)
  }

  test("hypervisor steal >4% flips contended even with quiet probes") {
    val v = adj(0.10, Seq(0.10, 0.11, 0.10), steal = 6.2)
    assert(v.contended && !v.burst && v.medianDrift < 1.5)
  }

  test("single lucky probe is outlier-trimmed out of the denominator") {
    // one 0.04s fluke among 0.10-0.12s probes (r14 incident): with a
    // plain min every normal probe would read 2.5-3x drift
    val v = adj(0.10, Seq(0.11, 0.04, 0.10, 0.12, 0.11, 0.10))
    assert(v.calMin >= 0.10 - 1e-9)
    assert(!v.contended && !v.burst)
  }

  test("empty probes: neutral verdict from the gate bits alone") {
    assert(!adj(0.10, Seq.empty).contended)
    assert(adj(0.10, Seq.empty, gate = true).contended)
    assert(adj(0.10, Seq.empty, gateSteal = true).contended)
  }
}
