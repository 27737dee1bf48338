package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.core.{Hashing, MinHash, SimHash}

/** Property tests for the native-expression kernels: each kernel must
  * agree exactly with the reference Scala implementation it replaces
  * (the round-1 udf bodies), and the simhash bucket keys must satisfy
  * the two-level pigeonhole recall guarantee.
  */
object KernelProps extends Properties("kernels") {

  private val tokensGen = Gen.listOfN(60, Gen.chooseNum(0, 50000))

  property("minhashSignature == MinHash.signatureOfTokens") =
    forAll(tokensGen) { ts =>
      val arr = ts.toArray
      val viaKernel = kernels.minhashSignature(new GenericArrayData(arr), 64)
        .toLongArray()
      viaKernel.sameElements(MinHash.signatureOfTokens(arr, 64))
    }

  property("simhash64 == SimHash.fingerprintOfTokens") =
    forAll(tokensGen) { ts =>
      val arr = ts.toArray
      kernels.simhash64(new GenericArrayData(arr)) ==
        SimHash.fingerprintOfTokens(arr)
    }

  property("minhashBands matches the band-key formula") =
    forAll(tokensGen) { ts =>
      val sig = MinHash.signatureOfTokens(ts.toArray, 64)
      val keys = kernels.minhashBands(new GenericArrayData(sig), 16, 4)
        .toLongArray()
      keys.zipWithIndex.forall { case (k, b) =>
        k == ((b.toLong << 56) ^ (MinHash.bandHash(sig, b, 4) >>> 8))
      }
    }

  property("cosineF matches a straightforward double computation") =
    forAll(Gen.listOfN(32, Gen.chooseNum(-100, 100))) { xs =>
      val a = xs.map(_ / 7.0f).toArray
      val b = xs.reverse.map(_ / 3.0f).toArray
      val got = kernels.cosineF(
        new GenericArrayData(a), new GenericArrayData(b))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      val want = if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
      math.abs(got - want) < 1e-12
    }

  /** The core recall guarantee: any two fingerprints within maxHamming
    * share at least one bucket key — for EVERY placement of the error
    * bits, not just random ones.
    */
  property("simhashBucketKeys: fps within h always share a key") = {
    val gen = for {
      fp <- Gen.long
      h <- Gen.chooseNum(1, 10)
      d <- Gen.chooseNum(0, h)
      flips <- Gen.pick(d, 0 until 64)
    } yield (fp, h, flips.toList)
    forAll(gen) { case (fp, h, flips) =>
      val other = flips.foldLeft(fp)((acc, b) => acc ^ (1L << b))
      val k1 = kernels.simhashBucketKeys(fp, h).toLongArray().toSet
      val k2 = kernels.simhashBucketKeys(other, h).toLongArray().toSet
      k1.intersect(k2).nonEmpty
    }
  }

  property("simhashBucketKeys: distance > h usually shares no key " +
    "(bucket space is wide, not 256 values)") = {
    // not a guarantee (hash merging is allowed) but must hold for the
    // overwhelming majority — this is what the two-level scheme buys
    val gen = for {
      fp <- Gen.long
      seed <- Gen.long
    } yield (fp, seed)
    var total = 0
    var collided = 0
    forAll(gen) { case (fp, seed) =>
      val other = Hashing.splitmix64(seed) // ~32 bits away on average
      if (java.lang.Long.bitCount(fp ^ other) > 20) {
        total += 1
        val k1 = kernels.simhashBucketKeys(fp, 7).toLongArray().toSet
        val k2 = kernels.simhashBucketKeys(other, 7).toLongArray().toSet
        if (k1.intersect(k2).nonEmpty) collided += 1
      }
      collided <= math.max(2, total / 20)
    }
  }

  property("wordNgrams == ngramsOf on arbitrary texts (incl. unicode)") = {
    val wordGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.const(""),                       // consecutive spaces
      Gen.const("héllo"), Gen.const("日本語"), Gen.const("x"))
    val textGen = for {
      k <- Gen.chooseNum(0, 20)
      ws <- Gen.listOfN(k, wordGen)
    } yield ws.mkString(" ")
    forAll(textGen, Gen.chooseNum(1, 4)) { (text, n) =>
      val got = kernels.wordNgrams(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), n)
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      val want = graft.operators.Decontaminate.ngramsOf(text, n).toSeq
      gotSeq == want
    }
  }

  property("tokenShingles matches a direct reimplementation") =
    forAll(tokensGen, Gen.chooseNum(1, 5)) { (ts, n) =>
      val arr = ts.toArray
      val got = kernels.tokenShingles(new GenericArrayData(arr), n)
        .toLongArray()
      val want = (0 to arr.length - n).map { i =>
        var h = Hashing.splitmix64(0x5A17E11EL ^ n)
        (i until i + n).foreach(j =>
          h = Hashing.splitmix64(h ^ Hashing.tokenHash(arr(j))))
        h
      }.toArray
      got.sameElements(want)
    }

  property("minhashSignatureHashes == signature over the same hash stream") =
    forAll(tokensGen) { ts =>
      val hashes = kernels.tokenShingles(
        new GenericArrayData(ts.toArray), 2).toLongArray()
      val got = kernels.minhashSignatureHashes(
        new GenericArrayData(hashes), 64).toLongArray()
      val want = MinHash.signature(hashes.iterator, 64)
      got.sameElements(want)
    }

  property("simhash64Hashes: permutation-invariant, duplicate-sensitive") =
    forAll(tokensGen) { ts =>
      val hs = ts.map(t => Hashing.tokenHash(t)).toArray
      val a = kernels.simhash64Hashes(new GenericArrayData(hs))
      val b = kernels.simhash64Hashes(
        new GenericArrayData(hs.reverse))
      a == b // multiset-determined, order-free
    }

  property("lshBandKeys: identical vectors share all keys, band tag packed") =
    forAll(Gen.listOfN(16, Gen.chooseNum(-50, 50))) { xs =>
      val v = xs.map(_ / 9.0f).toArray
      val k1 = kernels.lshBandKeys(new GenericArrayData(v), 8, 4, 16)
        .toLongArray()
      val k2 = kernels.lshBandKeys(new GenericArrayData(v.clone()), 8, 4, 16)
        .toLongArray()
      k1.sameElements(k2) &&
        k1.zipWithIndex.forall { case (k, b) => (k >>> 56) == b }
    }
}
