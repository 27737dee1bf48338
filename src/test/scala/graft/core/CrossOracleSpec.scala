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

  test("theta estimate and set ops agree with datasketches theta") {
    import org.apache.datasketches.theta.{UpdateSketch, SetOperation}
    val k = 4096
    // A = [0, 100k), B = [50k, 150k) over a shared keyed stream:
    // |A| = 100k, |A ∩ B| = 50k, |A \ B| = 50k
    val oursA = ThetaSketch(k); val oursB = ThetaSketch(k)
    val dsA = UpdateSketch.builder().setNominalEntries(k).build()
    val dsB = UpdateSketch.builder().setNominalEntries(k).build()
    var i = 0
    while (i < 100000) {
      val h = Hashing.at(131, i); oursA.add(h); dsA.update(h); i += 1
    }
    i = 50000
    while (i < 150000) {
      val h = Hashing.at(131, i); oursB.add(h); dsB.update(h); i += 1
    }
    // both implementations sample DIFFERENT hash points (they re-hash
    // internally), so agreement is judged against the true values,
    // each within its own published bound
    val sig = 1.0 / math.sqrt(k - 1.0)
    // set-op relative error: sqrt(|U| / truth) / sqrt(k), |U| = 150k
    def within(est: Double, truth: Double, sigmas: Double, what: String): Unit =
      assert(math.abs(est / truth - 1) <
        sigmas * math.sqrt(150000.0 / truth) / math.sqrt(k.toDouble),
        s"$what off: $est vs $truth")
    assert(math.abs(oursA.estimate / 100000 - 1) < 4 * sig, s"ours |A| ${oursA.estimate}")
    assert(math.abs(dsA.getEstimate / 100000 - 1) < 4 * sig, s"theirs |A| ${dsA.getEstimate}")
    val oursI = oursA.intersect(oursB).estimate
    val dsInterOp = SetOperation.builder().setNominalEntries(k).buildIntersection()
    dsInterOp.intersect(dsA); dsInterOp.intersect(dsB)
    val dsI = dsInterOp.getResult.getEstimate
    within(oursI, 50000, 5, "ours |A∩B|")
    within(dsI, 50000, 5, "theirs |A∩B|")
    val oursD = oursA.aNotB(oursB).estimate
    val dsD = SetOperation.builder().setNominalEntries(k).buildANotB()
      .aNotB(dsA, dsB).getEstimate
    within(oursD, 50000, 5, "ours |A\\B|")
    within(dsD, 50000, 5, "theirs |A\\B|")
    // mutual agreement at the estimate level (independent samples:
    // allow the sum of both error budgets)
    assert(math.abs(oursI / dsI - 1) < 0.2, s"intersection: $oursI vs $dsI")
    assert(math.abs(oursD / dsD - 1) < 0.2, s"difference: $oursD vs $dsD")
  }

  test("tuple sum estimate agrees with datasketches IntegerSketch (Sum mode)") {
    import org.apache.datasketches.tuple.aninteger.{IntegerSketch, IntegerSummary}
    val k = 4096
    val n = 100000
    val ours = TupleSketch(k)
    val ds = new IntegerSketch(
      Integer.numberOfTrailingZeros(k), IntegerSummary.Mode.Sum)
    var i = 0
    var truth = 0.0
    while (i < n) {
      val w = (i % 10) + 1
      val h = Hashing.at(173, i)
      ours.add(h, w.toLong)
      ds.update(h, Integer.valueOf(w))
      truth += w
      i += 1
    }
    // each library re-hashes internally -> independent samples; judge
    // both against the truth within the HT-sum bound, then mutually
    val sig = 1.128 / math.sqrt(k - 1.0) // sqrt(E[w^2])/E[w] for w=1..10
    assert(math.abs(ours.sumEstimate / truth - 1) < 5 * sig,
      s"ours sum ${ours.sumEstimate} vs $truth")
    val it = ds.compact().iterator()
    var dsRetainedSum = 0.0
    while (it.next()) dsRetainedSum += it.getSummary.getValue
    val dsSum = dsRetainedSum / ds.getTheta
    assert(math.abs(dsSum / truth - 1) < 5 * sig, s"theirs sum $dsSum vs $truth")
    assert(math.abs(ours.sumEstimate / dsSum - 1) < 10 * sig,
      s"mutual: ${ours.sumEstimate} vs $dsSum")
    // distinct estimates each within theta's own bound
    val dsig = 1.0 / math.sqrt(k - 1.0)
    assert(math.abs(ours.estimate / n - 1) < 4 * dsig)
    assert(math.abs(ds.getEstimate / n - 1) < 4 * dsig)
  }

  test("freq sketch brackets agree with datasketches LongsSketch") {
    import org.apache.datasketches.frequencies.{LongsSketch, ErrorType}
    // Zipf-ish: item i gets 200000/(i+1) occurrences over 5000 items —
    // far more distinct items than either sketch retains
    val items = 5000
    val exact = Array.tabulate(items)(i => (200000 / (i + 1)).toLong)
    val N = exact.sum
    val ours = FreqSketch.longs(512)
    val theirs = new LongsSketch(512) // maxMapSize, power of 2
    // interleave deterministically so neither sketch sees an item
    // contiguously (contiguous order would make MG look better than
    // its bound): split each item's count into <=1000-weight chunks,
    // shuffle all chunks by a per-chunk hash, apply as weighted updates
    val chunks = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    (0 until items).foreach { i =>
      var left = exact(i)
      while (left > 0) {
        val w = math.min(left, 1000L)
        chunks += ((i, w))
        left -= w
      }
    }
    chunks.zipWithIndex
      .sortBy { case (_, pos) => Hashing.at(211, pos) }
      .foreach { case ((i, w), _) =>
        ours.update(java.lang.Long.valueOf(i.toLong), w)
        theirs.update(i.toLong, w)
      }
    assert(ours.streamWeight == N)
    assert(ours.maxError > 0, "must exercise the approximate regime")
    assert(ours.maxError <= 2 * N / 512, s"mass bound broken: ${ours.maxError}")
    // both implementations' intervals must bracket the exact count of
    // every true top-50 item (deterministic guarantees on both sides)
    (0 until 50).foreach { i =>
      val t = exact(i)
      val lb = ours.lowerBound(java.lang.Long.valueOf(i.toLong))
      assert(lb <= t && t <= lb + ours.maxError,
        s"ours bracket broken at $i: [$lb, ${lb + ours.maxError}] vs $t")
      assert(theirs.getLowerBound(i.toLong) <= t &&
        t <= theirs.getUpperBound(i.toLong),
        s"theirs bracket broken at $i")
    }
    // no-false-negative heavy sets: every item above BOTH guarantee
    // thresholds appears in both reports
    val thr = math.max(ours.guaranteeThreshold, theirs.getMaximumError) + 1
    val oursHeavy = ours.heavyEntries(thr)
      .map(_._1.asInstanceOf[java.lang.Long].longValue()).toSet
    val theirsHeavy = theirs
      .getFrequentItems(thr, ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem).toSet
    (0 until items).foreach { i =>
      if (exact(i) >= thr) {
        assert(oursHeavy.contains(i.toLong), s"ours missing heavy item $i")
        assert(theirsHeavy.contains(i.toLong), s"theirs missing heavy item $i")
      }
    }
  }
}
