package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Cross-library oracle: our from-scratch sketches vs datasketches-java
  * 6.2.0 (present on the Spark classpath, used as a TEST-ONLY independent
  * estimator — FIXTURES.md §6). Two independent implementations fed the
  * same stream must agree within the sum of their error bounds; this
  * catches systematic estimator bias that self-consistent tests miss.
  */
class CrossOracleSpec extends AnyFunSuite {

  def hashes(n: Int, seed: Long): Array[Long] =
    Array.tabulate(n)(i => Hashing.at(seed, i))

  test("HLL estimate agrees with datasketches HllSketch") {
    import org.apache.datasketches.hll.HllSketch
    for (n <- Seq(1000, 50000, 500000)) {
      val ours = HyperLogLog(14)
      val theirs = new HllSketch(14)
      var i = 0
      while (i < n) {
        val h = Hashing.at(101, i)
        ours.add(h)
        theirs.update(h) // they hash the long again internally; both
        // streams have n distinct keys, which is what the estimate sees
        i += 1
      }
      val a = ours.estimate
      val b = theirs.getEstimate
      val tol = 4 * 1.04 / math.sqrt(1 << 14) // ~3.2% combined slack
      assert(math.abs(a / n - 1) < tol, s"ours off at n=$n: $a")
      assert(math.abs(b / n - 1) < tol, s"theirs off at n=$n: $b")
      assert(math.abs(a / b - 1) < 2 * tol, s"disagreement at n=$n: $a vs $b")
    }
  }

  test("KLL quantiles agree with datasketches KllDoublesSketch") {
    import org.apache.datasketches.kll.KllDoublesSketch
    val ours = KllSketch(200)
    val theirs = KllDoublesSketch.newHeapInstance(200)
    val n = 200000
    var i = 0
    while (i < n) {
      val x = Hashing.toUnitDouble(Hashing.at(103, i))
      ours.add(x); theirs.update(x)
      i += 1
    }
    for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      val a = ours.quantile(q)
      val b = theirs.getQuantile(q)
      assert(math.abs(a - b) < 0.02, s"KLL disagreement at q=$q: $a vs $b")
    }
  }

  test("t-digest quantiles agree with datasketches KLL on a skewed stream") {
    import org.apache.datasketches.kll.KllDoublesSketch
    val td = TDigest(100)
    val kll = KllDoublesSketch.newHeapInstance(400)
    val n = 200000
    var i = 0
    while (i < n) {
      // exponential-ish: -log(1-u)
      val x = -math.log1p(-Hashing.toUnitDouble(Hashing.at(107, i)))
      td.add(x); kll.update(x)
      i += 1
    }
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val a = td.quantile(q)
      val b = kll.getQuantile(q)
      val trueQ = -math.log1p(-q)
      // t-digest is tail-VALUE-accurate: check against the analytic
      // quantile by value
      assert(math.abs(a - trueQ) < math.max(0.02, 0.03 * trueQ),
        s"t-digest off at q=$q: $a vs true $trueQ")
      // datasketches KLL guarantees RANK error only (randomized
      // compaction; k=400 -> ~0.9%): in an exponential tail a sub-1%
      // rank error is a large VALUE gap, so compare in rank space via
      // the analytic cdf (+ sampling noise ~3*sqrt(q(1-q)/n))
      val rankB = -math.expm1(-b) // cdf of the exponential at b
      assert(math.abs(rankB - q) < 0.02,
        s"datasketches KLL rank off at q=$q: got rank $rankB for $b")
    }
  }

  test("Bloom: our optimizer's sizes achieve their configured FPR bound") {
    // independent check of Optimize: build at the optimizer's (nbits, k),
    // fill to capacity, measure FPR over a large disjoint probe set
    for ((cap, fpr) <- Seq((10000L, 0.01), (50000L, 0.001))) {
      val f = BlockedBloomFilter.optimized(cap, fpr)
      var i = 0L
      while (i < cap) { f.add(Hashing.at(109, i)); i += 1 }
      val probes = 200000
      var fp = 0
      var j = 0
      while (j < probes) {
        if (f.has(Hashing.at(211, j + 1000000))) fp += 1
        j += 1
      }
      val observed = fp.toDouble / probes
      assert(observed < 2 * fpr,
        s"cap=$cap fpr=$fpr observed=$observed")
    }
  }
}
