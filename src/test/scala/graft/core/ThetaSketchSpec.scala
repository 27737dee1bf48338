package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Theta (KMV) sketch accuracy, set-operation, and merge tests. No
  * reference implementation exists (the reference is a Bloom library);
  * the oracle is the published KMV/theta framework math — unbiased
  * k/U(k+1) estimator with RSE ~ 1/sqrt(k-1), intersections exact over
  * the sampled region below min-theta — checked against exact answers
  * on deterministic seeded streams.
  */
class ThetaSketchSpec extends AnyFunSuite {

  def fill(s: ThetaSketch, n: Int, seed: Long): ThetaSketch = {
    var i = 0
    while (i < n) { s.add(Hashing.at(seed, i)); i += 1 }
    s
  }

  test("exact mode below k: estimate is the exact distinct count") {
    val s = ThetaSketch(1024)
    fill(s, 1000, seed = 3)
    assert(s.retained == 1000)
    assert(s.estimate == 1000.0)
    assert(s.rse == 0.0)
    // duplicates are no-ops
    fill(s, 1000, seed = 3)
    assert(s.estimate == 1000.0)
  }

  test("estimation mode: within 4 sigma across cardinalities") {
    val k = 4096
    val sigma = 1.0 / math.sqrt(k - 1.0)
    for (n <- Seq(10000, 100000, 1000000)) {
      val s = fill(ThetaSketch(k), n, seed = 11)
      val err = math.abs(s.estimate / n - 1)
      assert(err < 4 * sigma, s"theta err $err at n=$n exceeds 4 sigma (${4 * sigma})")
      assert(s.retained == k)
    }
  }

  test("duplicates in estimation mode don't move the estimate") {
    val s = fill(ThetaSketch(256), 100000, seed = 5)
    val e1 = s.estimate
    fill(s, 50000, seed = 5) // re-add half the stream
    assert(s.estimate == e1)
  }

  test("merge of splits == whole (exact same retained set and theta)") {
    val k = 512
    val whole = fill(ThetaSketch(k), 200000, seed = 9)
    val parts = (0 until 8).map { p =>
      val s = ThetaSketch(k)
      var i = p
      while (i < 200000) { s.add(Hashing.at(9, i)); i += 8 }
      s
    }
    val merged = parts.reduce((a, b) => a.merge(b))
    assert(merged == whole,
      "tree-merged partials must equal the single-pass sketch bit-for-bit")
    // associativity under a different tree shape
    val merged2 = parts.grouped(2).map(g => g.head.merge(g(1))).reduce((a, b) => a.merge(b))
    assert(merged2 == whole)
  }

  test("union estimate of overlapping streams within 4 sigma") {
    val k = 4096
    val sigma = 1.0 / math.sqrt(k - 1.0)
    // A = [0, 60k), B = [40k, 100k) over a shared keyed stream: |A ∪ B| = 100k
    val a = ThetaSketch(k); val b = ThetaSketch(k)
    var i = 0
    while (i < 60000) { a.add(Hashing.at(21, i)); i += 1 }
    i = 40000
    while (i < 100000) { b.add(Hashing.at(21, i)); i += 1 }
    val u = a.copy().merge(b)
    assert(math.abs(u.estimate / 100000.0 - 1) < 4 * sigma)
  }

  test("intersection estimate matches exact overlap within framework error") {
    val k = 8192
    // |A| = |B| = 100k, |A ∩ B| = 50k
    val a = ThetaSketch(k); val b = ThetaSketch(k)
    var i = 0
    while (i < 100000) { a.add(Hashing.at(33, i)); i += 1 }
    i = 50000
    while (i < 150000) { b.add(Hashing.at(33, i)); i += 1 }
    val inter = a.intersect(b)
    // framework RSE for intersections ~ sqrt(|U| / |I|) / sqrt(k)
    val rse = math.sqrt(150000.0 / 50000.0) / math.sqrt(k.toDouble)
    val err = math.abs(inter.estimate / 50000.0 - 1)
    assert(err < 5 * rse, s"intersection err $err exceeds 5x framework rse $rse")
  }

  test("disjoint intersection estimates zero") {
    val a = fill(ThetaSketch(1024), 50000, seed = 41)
    val b = fill(ThetaSketch(1024), 50000, seed = 42)
    assert(a.intersect(b).estimate == 0.0)
  }

  test("a-not-b matches exact difference within framework error") {
    val k = 8192
    val a = ThetaSketch(k); val b = ThetaSketch(k)
    var i = 0
    while (i < 100000) { a.add(Hashing.at(55, i)); i += 1 }
    i = 70000
    while (i < 200000) { b.add(Hashing.at(55, i)); i += 1 }
    // A \ B = [0, 70k) -> 70k
    val d = a.aNotB(b)
    val rse = math.sqrt(200000.0 / 70000.0) / math.sqrt(k.toDouble)
    assert(math.abs(d.estimate / 70000.0 - 1) < 5 * rse)
    // inclusion-exclusion consistency: |A ∩ B| + |A \ B| uses the same
    // theta, so the retained sets PARTITION a's sample exactly
    val inter = a.intersect(b)
    assert(inter.retained + d.retained ==
      countBelow(a, math.min(a.thetaLong, b.thetaLong)))
  }

  private def countBelow(s: ThetaSketch, t: Long): Int = {
    // retained values strictly below t (via serialize round-trip walk)
    val bb = java.nio.ByteBuffer.wrap(s.serialize())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(4); bb.getInt; bb.getLong
    val cnt = bb.getInt
    var n = 0; var i = 0
    while (i < cnt) { if (bb.getLong < t) n += 1; i += 1 }
    n
  }

  test("exact-mode set ops are exact") {
    // both sketches below k: intersection/difference are exact counts
    val a = ThetaSketch(4096); val b = ThetaSketch(4096)
    var i = 0
    while (i < 2000) { a.add(Hashing.at(77, i)); i += 1 }
    i = 1500
    while (i < 3000) { b.add(Hashing.at(77, i)); i += 1 }
    assert(a.intersect(b).estimate == 500.0)
    assert(a.aNotB(b).estimate == 1500.0)
    assert(a.copy().merge(b).estimate == 3000.0)
  }

  test("serialize round-trip is identity; hostile streams rejected") {
    val s = fill(ThetaSketch(256), 100000, seed = 91)
    val rt = ThetaSketch.deserialize(s.serialize())
    assert(rt == s && rt.estimate == s.estimate)
    val empty = ThetaSketch.deserialize(ThetaSketch(64).serialize())
    assert(empty.estimate == 0.0 && empty.retained == 0)
    intercept[IllegalArgumentException] {
      ThetaSketch.deserialize(Array[Byte](1, 2, 3))
    }
    // corrupt: cnt beyond payload
    val bytes = s.serialize()
    val bad = bytes.clone()
    bad(16) = (bad(16) | 0x40).toByte // inflate cnt
    intercept[IllegalArgumentException] { ThetaSketch.deserialize(bad) }
    // corrupt: break the ascending-order invariant
    val bad2 = bytes.clone()
    val tmp = bad2.slice(20, 28)
    System.arraycopy(bad2, 28, bad2, 20, 8)
    System.arraycopy(tmp, 0, bad2, 28, 8)
    intercept[IllegalArgumentException] { ThetaSketch.deserialize(bad2) }
  }

  test("k mismatch fails loudly on every binary op") {
    val a = ThetaSketch(64); val b = ThetaSketch(128)
    intercept[IllegalArgumentException] { a.merge(b) }
    intercept[IllegalArgumentException] { a.intersect(b) }
    intercept[IllegalArgumentException] { a.aNotB(b) }
  }
}
