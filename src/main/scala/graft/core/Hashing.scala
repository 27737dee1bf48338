package graft.core

/** Deterministic 64-bit hash utilities.
  *
  * The reference engine takes caller-supplied 64-bit hashes exclusively
  * (/root/reference/bloomfilter.go:23-24); its examples adapt real keys via
  * FNV-1a (/root/reference/example_test.go:29-65) or first-8-bytes of a
  * crypto hash (/root/reference/benchmarks/blobloom.go:27-35). We provide
  * the same adapters: a splitmix64 finalizer for integer keys and FNV-1a
  * for strings/bytes. All functions are pure and stable across JVMs —
  * required so that a hash computed inside an aggregator `update` on one
  * executor matches the hash computed by a probe expression on another.
  */
object Hashing {

  /** splitmix64 finalizer (Steele et al., public domain constant set).
    * Bijective on Long — distinct tokens get distinct hashes.
    */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Hash of an int token id — the engine-wide token hash.
    * (Reference analog: caller-side hashing before Add,
    * /root/reference/examples/spellcheck/main.go:67-72.)
    */
  @inline def tokenHash(token: Int): Long = splitmix64(token.toLong)

  /** 64-bit FNV-1a over UTF-8 bytes — same algorithm the reference's
    * string example uses (/root/reference/example_test.go:29-46).
    */
  def fnv1a64(s: String): Long = fnv1a64(s.getBytes("UTF-8"))

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L // FNV offset basis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L // FNV prime
      i += 1
    }
    h
  }

  /** Counter-based RNG: stream of reproducible pseudo-random longs keyed by
    * (seed, counter). Identical at any parallelism — the property the
    * deterministic data generator and tests rely on (FIXTURES.md §1).
    */
  @inline def at(seed: Long, counter: Long): Long =
    splitmix64(seed ^ splitmix64(counter))

  /** Uniform double in [0, 1) from a long. */
  @inline def toUnitDouble(h: Long): Double =
    (h >>> 11) * 1.1102230246251565e-16 // 2^-53
}
