package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the Misra-Gries freq sketch: the class-doc
  * invariants (bracketing, coverage, the 2N/k mass bound) must hold for
  * ANY stream, ANY weights, ANY split of the stream into partials, and
  * ANY merge tree — they are theorems, so a single counterexample is a
  * bug, never bad luck.
  */
object FreqProps extends Properties("FreqSketch") {

  // small k + small item universes force the approximate regime often;
  // wide weights exercise the weighted-update path
  val genK: Gen[Int] = Gen.oneOf(8, 16, 32)
  val genStream: Gen[List[(Int, Long)]] =
    Gen.nonEmptyListOf(for {
      item <- Gen.choose(0, 60)
      w <- Gen.choose(1L, 50L)
    } yield (item, w))

  private def exactOf(stream: List[(Int, Long)]): Map[Int, Long] =
    stream.groupBy(_._1).map { case (i, ws) => i -> ws.map(_._2).sum }

  private def invariants(s: FreqSketch, stream: List[(Int, Long)]): Boolean = {
    val exact = exactOf(stream)
    val n = stream.map(_._2).sum
    val mass = s.streamWeight == n
    val bound = s.maxError <= (if (s.k == 0) 0L else 2 * n / s.k)
    val bracket = exact.forall { case (i, t) =>
      val lb = s.lowerBound(java.lang.Long.valueOf(i.toLong))
      lb <= t && t <= lb + s.maxError
    }
    val coverage = exact.forall { case (i, t) =>
      t <= s.guaranteeThreshold ||
        s.lowerBound(java.lang.Long.valueOf(i.toLong)) > 0
    }
    mass && bound && bracket && coverage
  }

  property("single-pass invariants for any stream") =
    forAll(genK, genStream) { (k, stream) =>
      val s = FreqSketch.longs(k)
      stream.foreach { case (i, w) =>
        s.update(java.lang.Long.valueOf(i.toLong), w)
      }
      invariants(s, stream)
    }

  property("invariants survive any split + left-fold merge") =
    forAll(genK, genStream, Gen.choose(2, 7)) { (k, stream, parts) =>
      val sketches = Array.fill(parts)(FreqSketch.longs(k))
      stream.zipWithIndex.foreach { case ((i, w), ix) =>
        sketches(ix % parts).update(java.lang.Long.valueOf(i.toLong), w)
      }
      invariants(sketches.reduce((a, b) => a.merge(b)), stream)
    }

  property("invariants survive a right-leaning merge tree") =
    forAll(genK, genStream, Gen.choose(2, 7)) { (k, stream, parts) =>
      val sketches = Array.fill(parts)(FreqSketch.longs(k))
      stream.zipWithIndex.foreach { case ((i, w), ix) =>
        sketches(ix % parts).update(java.lang.Long.valueOf(i.toLong), w)
      }
      invariants(sketches.reduceRight((a, b) => b.merge(a)), stream)
    }

  property("serialize round-trip preserves state and bytes") =
    forAll(genK, genStream) { (k, stream) =>
      val s = FreqSketch.longs(k)
      stream.foreach { case (i, w) =>
        s.update(java.lang.Long.valueOf(i.toLong), w)
      }
      val bytes = s.serialize()
      val rt = FreqSketch.deserialize(bytes)
      rt == s && java.util.Arrays.equals(rt.serialize(), bytes)
    }

  property("exact regime (k above universe) is a plain count map") =
    forAll(genStream) { stream =>
      val s = FreqSketch.longs(64) // universe is 61 items < 64
      stream.foreach { case (i, w) =>
        s.update(java.lang.Long.valueOf(i.toLong), w)
      }
      val exact = exactOf(stream)
      s.maxError == 0 &&
        exact.forall { case (i, t) =>
          s.lowerBound(java.lang.Long.valueOf(i.toLong)) == t
        }
    }
}
