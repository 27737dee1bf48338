package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Optimizer/FPR-model tests porting /root/reference/optimize_test.go. */
class BloomConfigSpec extends AnyFunSuite {

  // Oracle: /root/reference/optimize_test.go:25-45 (TestFPRate)
  test("FPRate model checkpoints (Putze et al. p.4)") {
    assert(BloomConfig.fpRateAfter(0, 100, 3) == 0.0)
    val nhashes = (100.0 * math.log(2)).toInt
    assert(math.abs(BloomConfig.fpRateAfter(1000000000L, 100000000L, nhashes)
      - 1.0) < 1e-7)
    assert(math.abs(BloomConfig.fpRateAfter(1, 8, 5) - 0.0231) < 6e-5)
    assert(math.abs(BloomConfig.fpRateAfter(1, 20, 14) - 1.94e-4) < 3e-5)
  }

  // Oracle: /root/reference/optimize_test.go:72-92 (TestFPRateCorrectC):
  // reconstruct Table I within +-1 from the model itself.
  test("correction table is consistent with the FPR model (+-1)") {
    val correct = Array(1, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 16,
      17, 18, 20, 21, 23, 25, 26, 28, 30, 32, 35, 38, 40, 44, 48, 51, 58,
      64, 74, 90)
    for (i <- 1 until correct.length) {
      val c = i.toDouble
      var k = c * math.log(2)
      val fprBlock = math.exp(k * math.log1p(-math.exp(-k / c)))
      var cprime = c
      while (BloomConfig.fpRate(cprime, k) > fprBlock) {
        cprime += 1
        k = cprime * math.log(2)
      }
      assert(math.abs(correct(i) - cprime) <= 1,
        s"table disagrees at c=$i: got $cprime, want ${correct(i)}")
    }
  }

  // Oracle: /root/reference/optimize_test.go:94-97,160-165
  test("invalid inputs throw") {
    intercept[IllegalArgumentException] { BloomConfig.fpRateAfter(10, 0, 2) }
    intercept[IllegalArgumentException] { BloomConfig.fpRateAfter(10, 2, 0) }
    intercept[IllegalArgumentException] { BloomConfig.optimize(1, 0.0) }
    intercept[IllegalArgumentException] { BloomConfig.optimize(1, 1.0000001) }
  }

  // Oracle: /root/reference/optimize_test.go:99-107 (TestNewOptimizedMaxFPR)
  test("capacity 0, fpr 1 gives the minimal 512-bit filter") {
    val f = BlockedBloomFilter.optimized(0, 1.0)
    assert(f.numBits == 512)
  }

  // Oracle: /root/reference/optimize_test.go:109-136 (TestMaxBits)
  test("maxBits clamp rounds down to a multiple of 512") {
    val cases = Seq(
      (1L, 512L), (511L, 512L), (513L, 512L), (1023L, 512L),
      ((4L << 20) - 1, (4L << 20) - 512), ((4L << 20) + 1, 4L << 20),
      ((4L << 20) + 512, (4L << 20) + 512))
    for ((want, expect) <- cases) {
      val (nbits, nhashes) = BloomConfig.optimize(2 * want, 1e-10, want)
      assert(nbits <= expect)
      assert(nbits % 512 == 0)
      val f = BlockedBloomFilter(nbits, nhashes)
      assert(f.numBits == expect, s"maxBits=$want: ${f.numBits} != $expect")
    }
  }

  // Oracle: /root/reference/optimize_test.go:138-158 (TestOptimizeFewBits)
  test("optimize never returns fewer than 512 bits") {
    for ((cap, fpr, maxBits) <- Seq((1L, .99, 1L), (100000L, .01, 408L))) {
      val (nbits, nhashes) = BloomConfig.optimize(cap, fpr, maxBits)
      assert(nbits == 512)
      assert(nhashes > 0)
    }
  }

  // (nbits, nhashes) parity with the reference's ACTUAL outputs — the
  // reference's k-selection swaps its floor/ceil variables
  // (/root/reference/optimize.go:106-119), so it picks ceil(k) when the
  // model favors floor; interop (union/load reject k mismatches)
  // requires matching the behavior, not the comment. Values verified
  // against the reference implementation (ADVICE r01).
  test("k rounding matches the reference's swapped-variable selection") {
    assert(BloomConfig.optimize(100000, 0.01) == ((1100288L, 8)))
    assert(BloomConfig.optimize(50000, 0.001) == ((850432L, 12)))
    assert(BloomConfig.optimize(200000, 1e-6) == ((9600000L, 34)))
  }

  // Sizing parity fixture: /root/reference/example_test.go:112-129 —
  // 1e9 keys at fpr 1e-6 capped to 2 GiB degrades achieved fpr to ~1e-3.
  test("capacity-bounded sizing: 1e9 keys, 1e-6 fpr, 2GiB cap") {
    val (nbits, nhashes) = BloomConfig.optimize(1000000000L, 1e-6,
      8L * (1L << 31))
    assert(nbits == 8L * (1L << 31)) // exactly 2 GiB
    val achieved = BloomConfig.fpRateAfter(1000000000L, nbits, nhashes)
    assert(achieved > 1e-4 && achieved < 1e-2, s"achieved fpr $achieved")
  }
}
