package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Tuple sketch (theta + additive summary) tests. The oracle is the
  * published tuple-sketch math — retained keys are exactly theta's on
  * the same key stream, each key's inclusion probability is
  * thetaFraction so the Horvitz–Thompson sum is unbiased — checked
  * against exact answers on deterministic seeded streams, plus a
  * bit-level parity pin against ThetaSketch.
  */
class TupleSketchSpec extends AnyFunSuite {

  def fill(s: TupleSketch, n: Int, seed: Long, w: Int => Long = _ => 1L): TupleSketch = {
    var i = 0
    while (i < n) { s.add(Hashing.at(seed, i), w(i)); i += 1 }
    s
  }

  test("exact mode below k: exact distinct count and exact sums") {
    val s = TupleSketch(4096)
    fill(s, 1000, seed = 3, w = i => (i % 10) + 1L)
    assert(s.retained == 1000)
    assert(s.estimate == 1000.0)
    val exact = (0 until 1000).map(i => (i % 10) + 1L).sum
    assert(s.retainedSum == exact)
    assert(s.sumEstimate == exact.toDouble)
    // re-adding the same keys SUMS their weights (tuple semantics,
    // unlike theta's duplicate no-op)
    fill(s, 1000, seed = 3, w = _ => 2L)
    assert(s.retained == 1000 && s.estimate == 1000.0)
    assert(s.retainedSum == exact + 2000L)
  }

  test("key-stream parity with ThetaSketch: same retained set, same theta") {
    val k = 512
    val tu = fill(TupleSketch(k), 200000, seed = 9)
    val th = {
      val s = ThetaSketch(k)
      var i = 0
      while (i < 200000) { s.add(Hashing.at(9, i)); i += 1 }
      s
    }
    assert(tu.thetaLong == th.thetaLong && tu.retained == th.retained)
    assert(tu.estimate == th.estimate)
  }

  test("HT sum estimate within bounds in estimation mode") {
    val k = 4096
    // weights 1..10 cycling: sqrt(E[w^2])/E[w] = sqrt(38.5)/5.5 ~ 1.128
    val sigma = 1.128 / math.sqrt(k - 1.0)
    for (n <- Seq(50000, 500000)) {
      val s = fill(TupleSketch(k), n, seed = 11, w = i => (i % 10) + 1L)
      val exact = (0 until n).map(i => (i % 10) + 1L).sum.toDouble
      val err = math.abs(s.sumEstimate / exact - 1)
      assert(err < 5 * sigma, s"tuple sum err $err at n=$n exceeds 5 sigma (${5 * sigma})")
      assert(s.retained == k)
    }
  }

  test("merge of splits == whole, including summed weights across parts") {
    val k = 512
    val n = 200000
    // every key added TWICE with different weights, split so the two
    // adds of a key land in different parts: merged must sum them
    val whole = TupleSketch(k)
    var i = 0
    while (i < n) { whole.add(Hashing.at(13, i), 1L); i += 1 }
    i = 0
    while (i < n) { whole.add(Hashing.at(13, i), 10L); i += 1 }
    val parts = (0 until 8).map { p =>
      val s = TupleSketch(k)
      var j = p
      while (j < n) { s.add(Hashing.at(13, j), 1L); j += 8 }
      j = (p + 3) % 8
      while (j < n) { s.add(Hashing.at(13, j), 10L); j += 8 }
      s
    }
    // merge over copies: tuple merge is in-place and summaries are
    // ADDITIVE, so re-merging an already-merged part would double-count
    // (unlike theta, where set union is idempotent)
    val merged = parts.map(_.copy()).reduce((a, b) => a.merge(b))
    assert(merged == whole,
      "tree-merged partials must equal the single-pass sketch bit-for-bit")
    val merged2 = parts.map(_.copy()).grouped(2)
      .map(g => g.head.merge(g(1))).reduce((a, b) => a.merge(b))
    assert(merged2 == whole)
    assert(merged.retainedSum == whole.retainedSum)
  }

  test("exact-mode set ops: intersection sums both sides, aNotB keeps A's") {
    val a = TupleSketch(4096); val b = TupleSketch(4096)
    var i = 0
    while (i < 2000) { a.add(Hashing.at(77, i), 2L); i += 1 }
    i = 1500
    while (i < 3000) { b.add(Hashing.at(77, i), 5L); i += 1 }
    val inter = a.intersect(b)
    assert(inter.estimate == 500.0)
    assert(inter.retainedSum == 500L * (2 + 5))
    assert(inter.sumEstimate == 3500.0)
    val d = a.aNotB(b)
    assert(d.estimate == 1500.0 && d.retainedSum == 3000L)
    val u = a.copy().merge(b)
    assert(u.estimate == 3000.0)
    assert(u.retainedSum == 2000L * 2 + 1500L * 5)
  }

  test("estimation-mode intersection mass within framework error") {
    val k = 8192
    // |A| = |B| = 100k with |I| = 50k shared; weight 3 in A, 4 in B
    val a = TupleSketch(k); val b = TupleSketch(k)
    var i = 0
    while (i < 100000) { a.add(Hashing.at(33, i), 3L); i += 1 }
    i = 50000
    while (i < 150000) { b.add(Hashing.at(33, i), 4L); i += 1 }
    val inter = a.intersect(b)
    val exactMass = 50000.0 * (3 + 4)
    val rse = math.sqrt(150000.0 / 50000.0) / math.sqrt(k.toDouble)
    val err = math.abs(inter.sumEstimate / exactMass - 1)
    assert(err < 5 * rse, s"intersection mass err $err exceeds 5x framework rse $rse")
    // distinct-count estimate matches theta's framework bound too
    assert(math.abs(inter.estimate / 50000.0 - 1) < 5 * rse)
  }

  test("serialize round-trip is identity; hostile streams rejected") {
    val s = fill(TupleSketch(256), 100000, seed = 91, w = i => (i % 7) + 1L)
    val rt = TupleSketch.deserialize(s.serialize())
    assert(rt == s && rt.sumEstimate == s.sumEstimate)
    val empty = TupleSketch.deserialize(TupleSketch(64).serialize())
    assert(empty.estimate == 0.0 && empty.retained == 0 && empty.retainedSum == 0L)
    intercept[IllegalArgumentException] {
      TupleSketch.deserialize(Array[Byte](1, 2, 3))
    }
    // wrong magic: a theta sketch is not a tuple sketch
    intercept[IllegalArgumentException] {
      TupleSketch.deserialize(ThetaSketch(64).serialize())
    }
    // corrupt: cnt beyond payload
    val bytes = s.serialize()
    val bad = bytes.clone()
    bad(16) = (bad(16) | 0x40).toByte
    intercept[IllegalArgumentException] { TupleSketch.deserialize(bad) }
    // corrupt: break the ascending-key invariant
    val bad2 = bytes.clone()
    val tmp = bad2.slice(20, 28)
    System.arraycopy(bad2, 28, bad2, 20, 8)
    System.arraycopy(tmp, 0, bad2, 28, 8)
    intercept[IllegalArgumentException] { TupleSketch.deserialize(bad2) }
  }

  test("k mismatch fails loudly on every binary op") {
    val a = TupleSketch(64); val b = TupleSketch(128)
    intercept[IllegalArgumentException] { a.merge(b) }
    intercept[IllegalArgumentException] { a.intersect(b) }
    intercept[IllegalArgumentException] { a.aNotB(b) }
  }
}
