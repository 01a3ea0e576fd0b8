package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compact bench line's number formatting: the official artifact's
  * per-query values pass through this, so corruption here silently
  * falsifies the performance record.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("trim strips trailing zeros only after a decimal point") {
    // the dp=0 degradation path must not eat integral zeros
    assert(Bench.trim(10.2, 0) == "10")
    assert(Bench.trim(100.0, 0) == "100")
    assert(Bench.trim(0.4, 0) == "0")
    // dp>0: strip trailing zeros, then a bare point
    assert(Bench.trim(10.20, 2) == "10.2")
    assert(Bench.trim(10.0, 2) == "10")
    assert(Bench.trim(0.0, 2) == "0")
    assert(Bench.trim(0.25, 2) == "0.25")
    assert(Bench.trim(64.33, 1) == "64.3")
  }
}
