package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Staged

class StagedSpec extends AnyFunSuite {
  private val GiB = 1L << 30

  test("suggestSlices encodes the measured dial rule") {
    // state far below the per-slice budget: no staging needed
    assert(Staged.suggestSlices(1L * GiB, 96L * GiB) == 1)
    // the r12 ×30 regime: state around ~16× the per-slice budget
    // (96 GiB heap → 12 GiB budget) must land at ~16 slices — the
    // measured knee where s16 ran 2.3× faster than s8
    assert(Staged.suggestSlices(190L * GiB, 96L * GiB) == 16)
    // monotone in state, anti-monotone in heap
    assert(Staged.suggestSlices(380L * GiB, 96L * GiB) == 32)
    assert(Staged.suggestSlices(190L * GiB, 192L * GiB) == 8)
    // clamped: a wild overestimate caps at 64 (beyond that the
    // re-scan tax dominates and the caller should shrink the input)
    assert(Staged.suggestSlices(100000L * GiB, 8L * GiB) == 64)
    // degenerate inputs fail loudly
    intercept[IllegalArgumentException] { Staged.suggestSlices(-1L, GiB) }
    intercept[IllegalArgumentException] { Staged.suggestSlices(GiB, 0L) }
  }

  test("ceiling division: state just over a budget multiple adds a slice") {
    val heap = 96L * GiB // budget = 12 GiB
    assert(Staged.suggestSlices(24L * GiB, heap) == 2)
    assert(Staged.suggestSlices(24L * GiB + 1L, heap) == 3)
  }
}
