package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Extended-sketch accuracy/merge tests. These sketches have no reference
  * implementation (/root/reference has only the Bloom filter — SURVEY.md
  * §2.7); the oracles are each algorithm's published error bound, checked
  * against exact answers on deterministic seeded streams, plus the
  * merge-of-splits ≈ whole property that partial->final aggregation needs.
  */
class SketchSpec extends AnyFunSuite {

  def hashes(n: Int, seed: Long): Array[Long] =
    Array.tabulate(n)(i => Hashing.at(seed, i))

  // ---------------- HyperLogLog ----------------

  test("HLL estimate within 3 * 1.04/sqrt(m) across cardinalities") {
    val p = 12 // m = 4096, sigma ~= 1.625%
    for (n <- Seq(100, 1000, 10000, 100000, 1000000)) {
      val h = HyperLogLog(p)
      var i = 0
      while (i < n) { h.add(Hashing.at(7, i)); i += 1 }
      val err = math.abs(h.estimate / n - 1)
      assert(err < 3 * h.stdError + 0.001,
        s"HLL err $err at n=$n exceeds 3 sigma (${3 * h.stdError})")
    }
  }

  test("HLL duplicates don't change the estimate") {
    val h1 = HyperLogLog(12); val h2 = HyperLogLog(12)
    val hs = hashes(10000, 9)
    hs.foreach(h1.add)
    hs.foreach(h2.add); hs.foreach(h2.add); hs.reverse.foreach(h2.add)
    assert(h1 == h2)
  }

  test("HLL merge of disjoint splits equals whole (register-exact)") {
    val hs = hashes(50000, 11)
    val whole = HyperLogLog(12)
    hs.foreach(whole.add)
    val parts = (0 until 8).map { pid =>
      val h = HyperLogLog(12)
      hs.zipWithIndex.filter(_._2 % 8 == pid).foreach(x => h.add(x._1))
      h
    }
    val merged = parts.reduce((a, b) => a.merge(b))
    assert(merged == whole, "HLL merge must be register-exact")
    intercept[IllegalArgumentException] { merged.merge(HyperLogLog(13)) }
  }

  test("HLL serialization round trip") {
    val h = HyperLogLog(10)
    hashes(5000, 13).foreach(h.add)
    val back = HyperLogLog.deserialize(h.serialize())
    assert(back == h)
    assert(back.estimate == h.estimate)
  }

  test("HLL small-range linear counting is accurate for tiny n") {
    val h = HyperLogLog(14)
    val n = 50
    hashes(n, 17).foreach(h.add)
    assert(math.abs(h.estimate - n) < 2, s"tiny-n estimate ${h.estimate}")
  }

  // ---------------- CountMinSketch ----------------

  test("CMS never undercounts; overshoot bounded by eps*N") {
    val cms = CountMinSketch.fromAccuracy(eps = 0.001, delta = 1e-3)
    // Zipf-ish frequencies: key i added (10000 / (i+1)) times
    val freqs = (0 until 500).map(i => 10000 / (i + 1))
    freqs.zipWithIndex.foreach { case (f, i) =>
      cms.add(Hashing.at(21, i), f)
    }
    val N = cms.total
    assert(N == freqs.map(_.toLong).sum)
    freqs.zipWithIndex.foreach { case (f, i) =>
      val est = cms.estimate(Hashing.at(21, i))
      assert(est >= f, s"CMS undercounted key $i: $est < $f")
      assert(est <= f + (cms.eps * N).toLong + 1,
        s"CMS overshoot at key $i: $est vs $f + ${cms.eps * N}")
    }
  }

  test("CMS merge of splits equals whole (counter-exact)") {
    val whole = CountMinSketch(5, 1024)
    val parts = Array.fill(4)(CountMinSketch(5, 1024))
    val hs = hashes(20000, 23)
    hs.zipWithIndex.foreach { case (h, i) =>
      whole.add(h); parts(i % 4).add(h)
    }
    val merged = parts.reduce((a, b) => a.merge(b))
    assert(java.util.Arrays.equals(merged.counters, whole.counters))
    assert(merged.total == whole.total)
    intercept[IllegalArgumentException] { merged.merge(CountMinSketch(5, 512)) }
  }

  test("CMS serialization round trip") {
    val cms = CountMinSketch(4, 256)
    hashes(1000, 29).foreach(h => cms.add(h, (h & 7L) + 1))
    val back = CountMinSketch.deserialize(cms.serialize())
    assert(java.util.Arrays.equals(back.counters, cms.counters))
    assert(back.total == cms.total)
    assert(back.depth == cms.depth && back.width == cms.width)
  }

  // ---------------- TDigest ----------------

  test("t-digest quantiles on uniform data within 1% rank error") {
    val td = TDigest(100)
    val n = 100000
    var i = 0
    while (i < n) { td.add(Hashing.toUnitDouble(Hashing.at(31, i))); i += 1 }
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = td.quantile(q)
      // for uniform[0,1) the true q-quantile is q itself
      assert(math.abs(est - q) < 0.01,
        s"t-digest q=$q estimate $est off by ${math.abs(est - q)}")
    }
    assert(td.quantile(0.0) <= td.quantile(1.0))
  }

  test("t-digest tails are very accurate") {
    val td = TDigest(100)
    val n = 100000
    var i = 0
    while (i < n) { td.add(Hashing.toUnitDouble(Hashing.at(37, i))); i += 1 }
    for (q <- Seq(0.0001, 0.001, 0.999, 0.9999)) {
      val est = td.quantile(q)
      assert(math.abs(est - q) < 0.002, s"tail q=$q est $est")
    }
  }

  test("t-digest merge of splits within rank-error bound of whole") {
    val n = 80000
    val xs = Array.tabulate(n)(i => Hashing.toUnitDouble(Hashing.at(41, i)))
    val whole = TDigest(100)
    xs.foreach(whole.add(_))
    val parts = Array.fill(8)(TDigest(100))
    xs.zipWithIndex.foreach { case (x, i) => parts(i % 8).add(x) }
    val merged = parts.reduce((a, b) => a.merge(b))
    assert(merged.total == whole.total)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      assert(math.abs(merged.quantile(q) - q) < 0.015,
        s"merged digest q=$q = ${merged.quantile(q)}")
    }
  }

  test("t-digest centroid count stays bounded") {
    val td = TDigest(100)
    var i = 0
    while (i < 500000) { td.add(Hashing.toUnitDouble(Hashing.at(43, i))); i += 1 }
    td.compress()
    assert(td.centroidCount < 2 * 100,
      s"centroid count ${td.centroidCount} exceeds ~2*compression")
  }

  test("t-digest serialization round trip") {
    val td = TDigest(100)
    hashes(10000, 47).foreach(h => td.add(Hashing.toUnitDouble(h)))
    val back = TDigest.deserialize(td.serialize())
    assert(back.total == td.total)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(back.quantile(q) == td.quantile(q))
  }

  test("t-digest weighted add and cdf") {
    val td = TDigest(100)
    td.add(1.0, 3.0); td.add(2.0, 1.0)
    assert(td.total == 4.0)
    assert(td.cdf(0.5) == 0.0)
    assert(td.cdf(3.0) == 1.0)
  }

  // ---------------- KLL ----------------

  test("KLL quantiles within 2% normalized rank error (k=200)") {
    val kll = KllSketch(200)
    val n = 200000
    var i = 0
    while (i < n) { kll.add(Hashing.toUnitDouble(Hashing.at(53, i))); i += 1 }
    assert(kll.n == n)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = kll.quantile(q)
      assert(math.abs(est - q) < 0.02, s"KLL q=$q est $est")
    }
    // rank() is the inverse
    for (x <- Seq(0.2, 0.5, 0.8))
      assert(math.abs(kll.rank(x) - x) < 0.02, s"KLL rank($x)=${kll.rank(x)}")
  }

  test("KLL retained weight equals count exactly (odd compactions)") {
    // k=200 yields odd level capacities (ceil(200*(2/3)^d)); compacting
    // an odd buffer must leave one item behind, or total weight drifts
    // +-1 per compaction and rank(max) wanders off 1.0. rank at +inf
    // counts every retained item once at its weight, so it equals 1.0
    // IFF sum(2^lvl * len) == n.
    for (n <- Seq(1000, 12345, 99999, 200000)) {
      val kll = KllSketch(200)
      var i = 0
      while (i < n) { kll.add(Hashing.toUnitDouble(Hashing.at(7, i))); i += 1 }
      assert(kll.rank(Double.MaxValue) == 1.0,
        s"n=$n: total weight ${kll.rank(Double.MaxValue) * n} != $n")
    }
    // and across merges
    val a = KllSketch(200); val b = KllSketch(200)
    (0 until 33333).foreach(i => a.add(Hashing.toUnitDouble(Hashing.at(8, i))))
    (0 until 44444).foreach(i => b.add(Hashing.toUnitDouble(Hashing.at(9, i))))
    a.merge(b)
    assert(a.rank(Double.MaxValue) == 1.0)
  }

  test("KLL space stays sublinear") {
    val kll = KllSketch(200)
    var i = 0
    while (i < 500000) { kll.add(i.toDouble); i += 1 }
    assert(kll.retained < 3000, s"KLL retained ${kll.retained} items")
  }

  test("KLL merge of splits within rank-error bound of whole") {
    val n = 100000
    val xs = Array.tabulate(n)(i => Hashing.toUnitDouble(Hashing.at(59, i)))
    val parts = Array.fill(8)(KllSketch(200))
    xs.zipWithIndex.foreach { case (x, i) => parts(i % 8).add(x) }
    val merged = parts.reduce((a, b) => a.merge(b))
    assert(merged.n == n)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(math.abs(merged.quantile(q) - q) < 0.025,
        s"merged KLL q=$q = ${merged.quantile(q)}")
    intercept[IllegalArgumentException] { merged.merge(KllSketch(100)) }
  }

  test("KLL min/max are exact") {
    val kll = KllSketch(200)
    val xs = hashes(50000, 61).map(Hashing.toUnitDouble)
    xs.foreach(kll.add)
    assert(kll.quantile(0.0) == xs.min)
    assert(kll.quantile(1.0) == xs.max)
  }

  test("KLL serialization round trip") {
    val kll = KllSketch(200)
    hashes(30000, 67).foreach(h => kll.add(Hashing.toUnitDouble(h)))
    val back = KllSketch.deserialize(kll.serialize())
    assert(back.n == kll.n)
    for (q <- Seq(0.05, 0.5, 0.95))
      assert(back.quantile(q) == kll.quantile(q))
  }

  // ---------------- MinHash / SimHash ----------------

  test("MinHash estimates Jaccard within sampling error") {
    // two sets with known overlap: 800 shared + 200 unique each
    // -> J = 800/1200 = 0.667
    val shared = (0 until 800).toArray
    val a = shared ++ (1000 until 1200)
    val b = shared ++ (2000 until 2200)
    val sigA = MinHash.signatureOfTokens(a, 256)
    val sigB = MinHash.signatureOfTokens(b, 256)
    val est = MinHash.estimateJaccard(sigA, sigB)
    val trueJ = 800.0 / 1200.0
    // binomial sd = sqrt(J(1-J)/256) ~= 0.029; allow 4 sigma
    assert(math.abs(est - trueJ) < 0.12, s"MinHash J est $est vs $trueJ")
  }

  test("MinHash signature merge = signature of union") {
    val a = (0 until 500).toArray
    val b = (300 until 900).toArray
    val merged = MinHash.merge(
      MinHash.signatureOfTokens(a, 128), MinHash.signatureOfTokens(b, 128))
    val union = MinHash.signatureOfTokens((a ++ b).distinct, 128)
    assert(merged.sameElements(union))
  }

  test("MinHash identical sets -> identical signatures, J=1") {
    val t = (100 until 600).toArray
    val s1 = MinHash.signatureOfTokens(t, 64)
    val s2 = MinHash.signatureOfTokens(t.reverse, 64)
    assert(MinHash.estimateJaccard(s1, s2) == 1.0)
  }

  test("SimHash: near-identical docs have small Hamming distance") {
    val base = Array.tabulate(300)(i => (Hashing.at(71, i) & 0xFFFF).toInt)
    val nearDup = base.updated(5, 42).updated(100, 43) // 2 token changes
    val different = Array.tabulate(300)(i => (Hashing.at(73, i) & 0xFFFF).toInt)
    val d1 = SimHash.hammingDistance(
      SimHash.fingerprintOfTokens(base), SimHash.fingerprintOfTokens(nearDup))
    val d2 = SimHash.hammingDistance(
      SimHash.fingerprintOfTokens(base), SimHash.fingerprintOfTokens(different))
    assert(d1 <= 8, s"near-dup hamming $d1")
    assert(d2 >= 16, s"unrelated hamming $d2")
    assert(SimHash.hammingDistance(
      SimHash.fingerprintOfTokens(base), SimHash.fingerprintOfTokens(base)) == 0)
  }

  // ---------------- FreqSketch (Misra-Gries) ----------------

  /** Zipf-ish weighted stream as (item, weight) pairs: item i carries
    * total weight 10000/(i+1), delivered one unit at a time in a
    * deterministic interleaved order (so no item arrives contiguously).
    */
  private def zipfStream(items: Int, seed: Long): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    (0 until items).foreach { i =>
      (0 until 10000 / (i + 1)).foreach(_ => out += i.toLong)
    }
    // deterministic shuffle via sort on a per-position hash
    out.toArray.zipWithIndex
      .sortBy { case (_, pos) => Hashing.at(seed, pos) }
      .map(_._1)
  }

  test("FreqSketch exact regime: distinct <= k is a plain count map") {
    val s = FreqSketch.longs(64)
    val stream = zipfStream(31, 31L)
    stream.foreach(x => s.update(java.lang.Long.valueOf(x)))
    assert(s.maxError == 0L)
    assert(s.numEntries == 31)
    assert(s.streamWeight == stream.length.toLong)
    (0 until 31).foreach { i =>
      val t = 10000L / (i + 1)
      assert(s.lowerBound(java.lang.Long.valueOf(i.toLong)) == t,
        s"exact-regime count off at item $i")
    }
    // merge of splits is bit-identical to the single pass (no trims)
    val parts = Array.fill(4)(FreqSketch.longs(64))
    stream.zipWithIndex.foreach { case (x, i) =>
      parts(i % 4).update(java.lang.Long.valueOf(x))
    }
    val merged = parts.reduce((a, b) => a.merge(b))
    assert(java.util.Arrays.equals(merged.serialize(), s.serialize()),
      "exact-regime merge must be bit-identical to single pass")
  }

  test("FreqSketch approximate regime: bracketing, coverage, 2N/k bound") {
    val k = 32
    val stream = zipfStream(500, 37L)
    val exact = stream.groupBy(identity).map { case (x, a) => x -> a.length.toLong }
    val N = stream.length.toLong

    // every merge order must satisfy the invariants (MG merges are not
    // state-associative; the GUARANTEES are)
    def build(order: Seq[Int]): FreqSketch = {
      val parts = Array.fill(8)(FreqSketch.longs(k))
      stream.zipWithIndex.foreach { case (x, i) =>
        parts(i % 8).update(java.lang.Long.valueOf(x))
      }
      order.map(parts).reduce((a, b) => a.merge(b))
    }
    val orders = Seq(0 to 7, (7 to 0 by -1), Seq(3, 1, 4, 0, 5, 2, 7, 6))
    for (order <- orders) {
      val s = build(order)
      assert(s.streamWeight == N)
      assert(s.maxError <= 2 * N / k,
        s"offset ${s.maxError} exceeds 2N/k = ${2 * N / k}")
      assert(s.maxError > 0, "test must exercise the approximate regime")
      assert(s.numEntries <= k)
      // bracketing for EVERY item (absent: 0 <= true <= offset is the
      // coverage claim below)
      s.entries.foreach { case (item, lb) =>
        val t = exact(item.asInstanceOf[java.lang.Long].longValue())
        assert(lb <= t && t <= lb + s.maxError,
          s"bracket broken at $item: [$lb, ${lb + s.maxError}] vs $t")
      }
      // coverage: no item above the guarantee threshold may be missing
      exact.foreach { case (x, t) =>
        if (t > s.guaranteeThreshold)
          assert(s.lowerBound(java.lang.Long.valueOf(x)) > 0,
            s"item $x with true $t > ${s.guaranteeThreshold} missing")
      }
      // heavyEntries is no-false-negative at its threshold
      val thr = s.guaranteeThreshold + 1
      val heavy = s.heavyEntries(thr).map(_._1).toSet
      exact.foreach { case (x, t) =>
        if (t >= thr) assert(heavy.contains(java.lang.Long.valueOf(x)))
      }
    }
  }

  test("FreqSketch weighted updates, string codec, wire round-trip") {
    val s = FreqSketch.strings(8)
    // 12 distinct items > k=8 forces trims; weights vary
    (0 until 12).foreach { i =>
      s.update(s"item-$i", (i + 1).toLong * 7)
    }
    val N = (1 to 12).map(_.toLong * 7).sum
    assert(s.streamWeight == N)
    assert(s.maxError <= 2 * N / 8)
    val rt = FreqSketch.deserialize(s.serialize())
    assert(rt == s, "round-trip must preserve state")
    assert(java.util.Arrays.equals(rt.serialize(), s.serialize()))
    // heaviest item must survive with a valid bracket
    val lb = s.lowerBound("item-11")
    assert(lb <= 12L * 7 && 12L * 7 <= lb + s.maxError)
    // codec mismatch fails loudly
    intercept[IllegalArgumentException] {
      s.merge(FreqSketch.longs(8))
    }
  }

  test("FreqSketch rejects hostile bytes") {
    val good = {
      val s = FreqSketch.strings(8)
      s.update("a"); s.update("b")
      s.serialize()
    }
    assert(FreqSketch.deserialize(good).numEntries == 2)
    intercept[IllegalArgumentException] {
      FreqSketch.deserialize(Array[Byte](1, 2, 3))
    }
    // truncated payload
    intercept[Exception] {
      FreqSketch.deserialize(java.util.Arrays.copyOf(good, good.length - 3))
    }
    // trailing garbage
    intercept[IllegalArgumentException] {
      FreqSketch.deserialize(good ++ Array[Byte](0))
    }
  }
}
