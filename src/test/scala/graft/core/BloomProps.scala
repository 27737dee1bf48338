package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the sketch algebra — randomized analogs of
  * the reference's seeded tests (SURVEY.md §5 "Fuzz"/"Degenerate" rows).
  */
object BloomProps extends Properties("BlockedBloomFilter") {

  val genConfig: Gen[(Long, Int)] = for {
    nbits <- Gen.oneOf(512L, 1024L, 4096L, 100000L)
    k <- Gen.choose(2, 12)
  } yield (nbits, k)

  val genHashes: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.long)

  property("no false negatives ever") =
    forAll(genConfig, genHashes) { case ((nbits, k), hs) =>
      val f = BlockedBloomFilter(nbits, k)
      hs.foreach(f.add)
      hs.forall(f.has)
    }

  property("union is commutative (bit-exact)") =
    forAll(genConfig, genHashes, genHashes) { case ((nbits, k), ha, hb) =>
      val a1 = BlockedBloomFilter(nbits, k); ha.foreach(a1.add)
      val b1 = BlockedBloomFilter(nbits, k); hb.foreach(b1.add)
      val a2 = a1.copy(); val b2 = b1.copy()
      a1.union(b1) == b2.union(a2)
    }

  property("union is associative (bit-exact)") =
    forAll(genConfig, genHashes, genHashes, genHashes) {
      case ((nbits, k), ha, hb, hc) =>
        def mk(hs: List[Long]) = {
          val f = BlockedBloomFilter(nbits, k); hs.foreach(f.add); f
        }
        val left = mk(ha).union(mk(hb)).union(mk(hc))
        val right = mk(ha).union(mk(hb).union(mk(hc)))
        left == right
    }

  property("union is idempotent") =
    forAll(genConfig, genHashes) { case ((nbits, k), hs) =>
      val f = BlockedBloomFilter(nbits, k); hs.foreach(f.add)
      f.copy().union(f) == f
    }

  property("union of splits equals build of all (any split point)") =
    forAll(genConfig, genHashes, Gen.choose(0, 100)) {
      case ((nbits, k), hs, cut0) =>
        val cut = if (hs.isEmpty) 0 else cut0 % (hs.length + 1)
        val (l, r) = hs.splitAt(cut)
        val a = BlockedBloomFilter(nbits, k); l.foreach(a.add)
        val b = BlockedBloomFilter(nbits, k); r.foreach(b.add)
        val whole = BlockedBloomFilter(nbits, k); hs.foreach(whole.add)
        a.union(b) == whole
    }

  property("intersect never drops common keys") =
    forAll(genConfig, genHashes, genHashes, genHashes) {
      case ((nbits, k), common, onlyA, onlyB) =>
        val a = BlockedBloomFilter(nbits, k)
        val b = BlockedBloomFilter(nbits, k)
        (common ++ onlyA).foreach(a.add)
        (common ++ onlyB).foreach(b.add)
        a.intersect(b)
        common.forall(a.has)
    }

  property("dump/load round trip preserves equality") =
    forAll(genConfig, genHashes) { case ((nbits, k), hs) =>
      val f = BlockedBloomFilter(nbits, k); hs.foreach(f.add)
      BloomIO.load(BloomIO.dump(f)) == f
    }

  property("dump size is 64*(1+nblocks)") =
    forAll(genConfig) { case (nbits, k) =>
      val f = BlockedBloomFilter(nbits, k)
      BloomIO.dump(f).length == 64 * (1 + f.numBlocks)
    }

  property("blockIndex in range for any inputs") =
    forAll { (i: Int, nRaw: Int) =>
      val n = math.max(1, math.abs(nRaw % 100000))
      val j = BlockedBloomFilter.blockIndex(i, n)
      j >= 0 && j < n
    }

  property("cardinality is 0 iff empty, monotone under union") =
    forAll(genConfig, genHashes, genHashes) { case ((nbits, k), ha, hb) =>
      val a = BlockedBloomFilter(nbits, k)
      val empty0 = a.cardinality == 0.0 && a.isEmpty
      ha.foreach(a.add)
      val before = a.cardinality
      val b = BlockedBloomFilter(nbits, k); hb.foreach(b.add)
      a.union(b)
      empty0 && (a.cardinality >= before || a.cardinality.isNaN == false)
    }
}

/** Properties of the extended sketches' merge algebra. */
object SketchProps extends Properties("Sketches") {

  val genHashes: Gen[List[Long]] = Gen.nonEmptyListOf(Gen.long)

  property("HLL merge of splits is register-exact vs whole") =
    forAll(genHashes, Gen.choose(0, 100)) { (hs, cut0) =>
      val cut = cut0 % (hs.length + 1)
      val (l, r) = hs.splitAt(cut)
      val a = HyperLogLog(10); l.foreach(a.add)
      val b = HyperLogLog(10); r.foreach(b.add)
      val whole = HyperLogLog(10); hs.foreach(whole.add)
      a.merge(b) == whole
    }

  property("HLL serde round trip") =
    forAll(genHashes) { hs =>
      val h = HyperLogLog(8); hs.foreach(h.add)
      HyperLogLog.deserialize(h.serialize()) == h
    }

  property("CMS never undercounts any inserted key") =
    forAll(genHashes) { hs =>
      val cms = CountMinSketch(4, 64) // tiny: force collisions
      hs.foreach(h => cms.add(h))
      val counts = hs.groupBy(identity).view.mapValues(_.size).toMap
      counts.forall { case (h, c) => cms.estimate(h) >= c }
    }

  property("CMS merge of splits counter-exact vs whole") =
    forAll(genHashes, Gen.choose(0, 100)) { (hs, cut0) =>
      val cut = cut0 % (hs.length + 1)
      val (l, r) = hs.splitAt(cut)
      val a = CountMinSketch(3, 128); l.foreach(h => a.add(h))
      val b = CountMinSketch(3, 128); r.foreach(h => b.add(h))
      val whole = CountMinSketch(3, 128); hs.foreach(h => whole.add(h))
      a.merge(b)
      java.util.Arrays.equals(a.counters, whole.counters) &&
        a.total == whole.total
    }

  property("KLL min/max exact; quantiles within retained values") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-1e9, 1e9))) { xs =>
      val k = KllSketch(64)
      xs.foreach(k.add)
      k.quantile(0.0) == xs.min && k.quantile(1.0) == xs.max &&
        (0 to 10).forall { i =>
          val q = k.quantile(i / 10.0)
          q >= xs.min && q <= xs.max
        }
    }

  property("t-digest total weight preserved by merge") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)),
      Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))) { (xs, ys) =>
      val a = TDigest(50); xs.foreach(a.add(_))
      val b = TDigest(50); ys.foreach(b.add(_))
      a.merge(b)
      math.abs(a.total - (xs.length + ys.length)) < 1e-6 &&
        a.quantile(0.0) == (xs ++ ys).min &&
        a.quantile(1.0) == (xs ++ ys).max
    }

  property("MinHash merge = signature of union") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 10000)),
      Gen.nonEmptyListOf(Gen.choose(0, 10000))) { (a, b) =>
      val sa = MinHash.signatureOfTokens(a.toArray, 32)
      val sb = MinHash.signatureOfTokens(b.toArray, 32)
      MinHash.merge(sa, sb).sameElements(
        MinHash.signatureOfTokens((a ++ b).distinct.toArray, 32))
    }
}
