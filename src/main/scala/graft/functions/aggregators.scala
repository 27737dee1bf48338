package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.core._

/** Typed mergeable aggregators — one per sketch.
  *
  * Architecture: each sketch is an `Aggregator[IN, SKETCH, Array[Byte]]`
  * registered through `functions.udaf`, which Spark plans as a
  * TypedImperativeAggregate inside ObjectHashAggregateExec: per-partition
  * `reduce` (the reference's per-worker Add loop), buffer serialization
  * only at the shuffle boundary, then `merge` on the reducer — exactly the
  * parallel build + tree merge the reference demonstrates by hand
  * (/root/reference/example_test.go:179-208) with Catalyst supplying the
  * tree. No lock-free machinery is needed: Spark buffers are
  * single-threaded per partition, which is why the reference's SyncFilter
  * (/root/reference/sync.go) has no Spark equivalent (SURVEY.md §2.4).
  *
  * Token-array inputs are hashed inside `reduce` (one buffer op per token)
  * rather than exploded into rows first — explode would multiply the
  * shuffled row count by the mean document length (~hundreds) before the
  * aggregation could collapse it; hashing in-place keeps the scan->agg
  * pipeline explode-free, which is what survives a 100 TB scan.
  *
  * Buffers use Kryo encoders (opaque object buffers); outputs are compact
  * binary: Bloom in the reference dump format (BloomIO — interchangeable
  * with reference dumps), others in the engine's own tagged formats.
  */
object aggregators {

  private def kryo[T](implicit ct: scala.reflect.ClassTag[T]): Encoder[T] =
    Encoders.kryo[T](ct)

  // ---------------- Bloom ----------------

  /** Build a blocked Bloom filter from token arrays; emits a reference-
    * format dump. (nbits, k) must be identical across all partials —
    * guaranteed here by construction parameters, mirroring the
    * checkBinop precondition (/root/reference/bloomfilter.go:212-219).
    */
  class BloomTokensAgg(nbits: Long, k: Int)
      extends Aggregator[Array[Int], BlockedBloomFilter, Array[Byte]] {
    def zero: BlockedBloomFilter = BlockedBloomFilter(nbits, k)
    def reduce(b: BlockedBloomFilter, tokens: Array[Int]): BlockedBloomFilter = {
      if (tokens != null) {
        var i = 0
        while (i < tokens.length) { b.add(Hashing.tokenHash(tokens(i))); i += 1 }
      }
      b
    }
    def merge(a: BlockedBloomFilter, b: BlockedBloomFilter): BlockedBloomFilter =
      a.union(b)
    def finish(b: BlockedBloomFilter): Array[Byte] = BloomIO.dump(b)
    def bufferEncoder: Encoder[BlockedBloomFilter] = kryo[BlockedBloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a Bloom filter from pre-hashed 64-bit keys (the reference's
    * native input type, /root/reference/bloomfilter.go:23-24).
    */
  class BloomHashAgg(nbits: Long, k: Int)
      extends Aggregator[Long, BlockedBloomFilter, Array[Byte]] {
    def zero: BlockedBloomFilter = BlockedBloomFilter(nbits, k)
    def reduce(b: BlockedBloomFilter, h: Long): BlockedBloomFilter = {
      b.add(h); b
    }
    def merge(a: BlockedBloomFilter, b: BlockedBloomFilter): BlockedBloomFilter =
      a.union(b)
    def finish(b: BlockedBloomFilter): Array[Byte] = BloomIO.dump(b)
    def bufferEncoder: Encoder[BlockedBloomFilter] = kryo[BlockedBloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Re-aggregate pre-built Bloom dumps (e.g. checkpoint rows) by union —
    * the distributed form of Loader.Load's load-is-union semantics
    * (/root/reference/io.go:151-178). All inputs must share (nbits, k).
    */
  class BloomUnionAgg(nbits: Long, k: Int)
      extends Aggregator[Array[Byte], BlockedBloomFilter, Array[Byte]] {
    def zero: BlockedBloomFilter = BlockedBloomFilter(nbits, k)
    def reduce(b: BlockedBloomFilter, dump: Array[Byte]): BlockedBloomFilter = {
      if (dump != null) BloomIO.load(dump, Some(b))
      b
    }
    def merge(a: BlockedBloomFilter, b: BlockedBloomFilter): BlockedBloomFilter =
      a.union(b)
    def finish(b: BlockedBloomFilter): Array[Byte] = BloomIO.dump(b)
    def bufferEncoder: Encoder[BlockedBloomFilter] = kryo[BlockedBloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------- HyperLogLog ----------------

  class HllTokensAgg(p: Int)
      extends Aggregator[Array[Int], HyperLogLog, Array[Byte]] {
    def zero: HyperLogLog = HyperLogLog(p)
    def reduce(b: HyperLogLog, tokens: Array[Int]): HyperLogLog = {
      if (tokens != null) {
        var i = 0
        while (i < tokens.length) { b.add(Hashing.tokenHash(tokens(i))); i += 1 }
      }
      b
    }
    def merge(a: HyperLogLog, b: HyperLogLog): HyperLogLog = a.merge(b)
    def finish(b: HyperLogLog): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[HyperLogLog] = kryo[HyperLogLog]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  class HllHashAgg(p: Int)
      extends Aggregator[Long, HyperLogLog, Array[Byte]] {
    def zero: HyperLogLog = HyperLogLog(p)
    def reduce(b: HyperLogLog, h: Long): HyperLogLog = { b.add(h); b }
    def merge(a: HyperLogLog, b: HyperLogLog): HyperLogLog = a.merge(b)
    def finish(b: HyperLogLog): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[HyperLogLog] = kryo[HyperLogLog]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge pre-built HLL sketches stored in a column. */
  class HllUnionAgg(p: Int)
      extends Aggregator[Array[Byte], HyperLogLog, Array[Byte]] {
    def zero: HyperLogLog = HyperLogLog(p)
    def reduce(b: HyperLogLog, bytes: Array[Byte]): HyperLogLog = {
      if (bytes != null) b.merge(HyperLogLog.deserialize(bytes))
      b
    }
    def merge(a: HyperLogLog, b: HyperLogLog): HyperLogLog = a.merge(b)
    def finish(b: HyperLogLog): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[HyperLogLog] = kryo[HyperLogLog]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------- Count-min ----------------

  /** Frequency sketch over token arrays (each token weight 1). */
  class CmsTokensAgg(depth: Int, width: Int)
      extends Aggregator[Array[Int], CountMinSketch, Array[Byte]] {
    def zero: CountMinSketch = CountMinSketch(depth, width)
    def reduce(b: CountMinSketch, tokens: Array[Int]): CountMinSketch = {
      if (tokens != null) {
        var i = 0
        while (i < tokens.length) { b.add(Hashing.tokenHash(tokens(i))); i += 1 }
      }
      b
    }
    def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = a.merge(b)
    def finish(b: CountMinSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[CountMinSketch] = kryo[CountMinSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  class CmsHashAgg(depth: Int, width: Int)
      extends Aggregator[Long, CountMinSketch, Array[Byte]] {
    def zero: CountMinSketch = CountMinSketch(depth, width)
    def reduce(b: CountMinSketch, h: Long): CountMinSketch = { b.add(h); b }
    def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = a.merge(b)
    def finish(b: CountMinSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[CountMinSketch] = kryo[CountMinSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  class CmsUnionAgg(depth: Int, width: Int)
      extends Aggregator[Array[Byte], CountMinSketch, Array[Byte]] {
    def zero: CountMinSketch = CountMinSketch(depth, width)
    def reduce(b: CountMinSketch, bytes: Array[Byte]): CountMinSketch = {
      if (bytes != null) b.merge(CountMinSketch.deserialize(bytes))
      b
    }
    def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = a.merge(b)
    def finish(b: CountMinSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[CountMinSketch] = kryo[CountMinSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------- Theta (KMV) ----------------

  /** Theta distinct sketch over token arrays — the intersectable
    * distinct counter (core/ThetaSketch.scala); merge is sketch union.
    */
  class ThetaTokensAgg(k: Int)
      extends Aggregator[Array[Int], ThetaSketch, Array[Byte]] {
    def zero: ThetaSketch = ThetaSketch(k)
    def reduce(b: ThetaSketch, tokens: Array[Int]): ThetaSketch = {
      if (tokens != null) {
        var i = 0
        while (i < tokens.length) { b.add(Hashing.tokenHash(tokens(i))); i += 1 }
      }
      b
    }
    def merge(a: ThetaSketch, b: ThetaSketch): ThetaSketch = a.merge(b)
    def finish(b: ThetaSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[ThetaSketch] = kryo[ThetaSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge pre-built theta sketches stored in a column. */
  class ThetaUnionAgg(k: Int)
      extends Aggregator[Array[Byte], ThetaSketch, Array[Byte]] {
    def zero: ThetaSketch = ThetaSketch(k)
    def reduce(b: ThetaSketch, bytes: Array[Byte]): ThetaSketch = {
      if (bytes != null) b.merge(ThetaSketch.deserialize(bytes))
      b
    }
    def merge(a: ThetaSketch, b: ThetaSketch): ThetaSketch = a.merge(b)
    def finish(b: ThetaSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[ThetaSketch] = kryo[ThetaSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------- Misra-Gries frequent items ----------------

  /** Frequent-token sketch over token arrays (core/FreqSketch.scala):
    * items are the raw token ids, weight 1 per occurrence; merge is
    * MG merge (counts add, one trim). Typed facade of the native
    * catalyst.FreqTokensAggregate.
    */
  class FreqTokensAgg(k: Int)
      extends Aggregator[Array[Int], FreqSketch, Array[Byte]] {
    def zero: FreqSketch = FreqSketch.longs(k)
    def reduce(b: FreqSketch, tokens: Array[Int]): FreqSketch = {
      if (tokens != null) {
        var i = 0
        while (i < tokens.length) {
          b.update(java.lang.Long.valueOf(tokens(i).toLong)); i += 1
        }
      }
      b
    }
    def merge(a: FreqSketch, b: FreqSketch): FreqSketch = a.merge(b)
    def finish(b: FreqSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[FreqSketch] = kryo[FreqSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Frequent-string sketch (words, urls, sources). */
  class FreqStrAgg(k: Int)
      extends Aggregator[String, FreqSketch, Array[Byte]] {
    def zero: FreqSketch = FreqSketch.strings(k)
    def reduce(b: FreqSketch, item: String): FreqSketch = {
      if (item != null) b.update(item)
      b
    }
    def merge(a: FreqSketch, b: FreqSketch): FreqSketch = a.merge(b)
    def finish(b: FreqSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[FreqSketch] = kryo[FreqSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------- Quantiles ----------------

  // ---------------- Tuple (theta + summary) ----------------

  /** Tuple sketch over token arrays, weight 1 per token occurrence
    * (core/TupleSketch.scala). Merge is sketch union with equal keys
    * SUMMING their summaries — NOT idempotent: unioning the same
    * sketch twice double-counts, unlike theta.
    */
  class TupleTokensAgg(k: Int)
      extends Aggregator[Array[Int], TupleSketch, Array[Byte]] {
    def zero: TupleSketch = TupleSketch(k)
    def reduce(b: TupleSketch, tokens: Array[Int]): TupleSketch = {
      if (tokens != null) {
        var i = 0
        while (i < tokens.length) { b.add(Hashing.tokenHash(tokens(i)), 1L); i += 1 }
      }
      b
    }
    def merge(a: TupleSketch, b: TupleSketch): TupleSketch = a.merge(b)
    def finish(b: TupleSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[TupleSketch] = kryo[TupleSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
  class TupleUnionAgg(k: Int)
      extends Aggregator[Array[Byte], TupleSketch, Array[Byte]] {
    def zero: TupleSketch = TupleSketch(k)
    def reduce(b: TupleSketch, bytes: Array[Byte]): TupleSketch = {
      if (bytes != null) b.merge(TupleSketch.deserialize(bytes))
      b
    }
    def merge(a: TupleSketch, b: TupleSketch): TupleSketch = a.merge(b)
    def finish(b: TupleSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[TupleSketch] = kryo[TupleSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  class TDigestAgg(compression: Double)
      extends Aggregator[Double, TDigest, Array[Byte]] {
    def zero: TDigest = TDigest(compression)
    def reduce(b: TDigest, x: Double): TDigest = { b.add(x); b }
    def merge(a: TDigest, b: TDigest): TDigest = a.merge(b)
    def finish(b: TDigest): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[TDigest] = kryo[TDigest]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  class KllAgg(k: Int)
      extends Aggregator[Double, KllSketch, Array[Byte]] {
    def zero: KllSketch = KllSketch(k)
    def reduce(b: KllSketch, x: Double): KllSketch = { b.add(x); b }
    def merge(a: KllSketch, b: KllSketch): KllSketch = a.merge(b)
    def finish(b: KllSketch): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[KllSketch] = kryo[KllSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------- MinHash ----------------

  /** Set-level MinHash signature over token arrays: each partial is an
    * element-wise-min fold; merge is element-wise min — the signature of
    * the union of all inputs (Broder 1997 mergeability).
    */
  class MinHashTokensAgg(numPerms: Int)
      extends Aggregator[Array[Int], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(numPerms)(Long.MaxValue)
    def reduce(sig: Array[Long], tokens: Array[Int]): Array[Long] = {
      if (tokens != null) {
        var t = 0
        while (t < tokens.length) {
          val h = Hashing.tokenHash(tokens(t))
          var i = 0
          while (i < numPerms) {
            val v = Hashing.splitmix64(h ^ MinHash.permSeed(i))
            if (v < sig(i)) sig(i) = v
            i += 1
          }
          t += 1
        }
      }
      sig
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(sig: Array[Long]): Array[Long] = sig
    def bufferEncoder: Encoder[Array[Long]] = kryo[Array[Long]]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
