package graft.core

/** MinHash signatures and SimHash fingerprints for near-duplicate
  * detection over token sets.
  *
  * Both are "sketches with a merge" in the same algebraic sense as the
  * reference's Bloom union (SURVEY.md §2.7 extension space):
  *  - MinHash signature merge = element-wise min (associative/commutative),
  *    so per-partition signatures combine in partial->final aggregation;
  *    E[matching positions / n] = Jaccard similarity (Broder 1997).
  *  - SimHash merge = element-wise sum of the pre-sign bit-vote vector.
  *
  * Permutation family: h_i(x) = splitmix64(x ^ seed_i) with fixed,
  * engine-wide seeds — deterministic across JVMs/executors.
  */
object MinHash {
  /** Engine-wide seed for permutation i. */
  @inline def permSeed(i: Int): Long =
    Hashing.splitmix64(0x9E6D3A15D0F7B8CAL + i)

  /** MinHash signature of a token set: sig(i) = min over tokens of
    * splitmix64(tokenHash ^ seed_i). Empty set -> all Long.MaxValue.
    */
  def signature(tokenHashes: Iterator[Long], numPerms: Int): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    while (tokenHashes.hasNext) {
      val h = tokenHashes.next()
      var i = 0
      while (i < numPerms) {
        val v = Hashing.splitmix64(h ^ permSeed(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  def signatureOfTokens(tokens: Array[Int], numPerms: Int): Array[Long] =
    signature(tokens.iterator.map(t => Hashing.tokenHash(t)), numPerms)

  /** Element-wise min merge. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, "MinHash signature length mismatch")
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = math.min(a(i), b(i)); i += 1 }
    out
  }

  /** Estimated Jaccard similarity = fraction of matching positions. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length, "MinHash signature length mismatch")
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  /** LSH band key: hash of rows [band*rows, (band+1)*rows) of the
    * signature. Two sets colliding in any band are candidate pairs;
    * collision probability 1-(1-j^rows)^bands (the standard S-curve).
    */
  def bandHash(sig: Array[Long], band: Int, rowsPerBand: Int): Long = {
    var h = Hashing.splitmix64(0xBA4D5EEDL + band.toLong)
    var i = band * rowsPerBand
    val end = math.min(sig.length, i + rowsPerBand)
    while (i < end) { h = Hashing.splitmix64(h ^ sig(i)); i += 1 }
    h
  }
}

object SimHash {
  /** 64-bit SimHash (Charikar 2002): each token votes +-1 on each bit
    * position of its hash, weighted; fingerprint = sign vector.
    */
  def fingerprint(tokenHashes: Iterator[(Long, Double)]): Long = {
    val votes = new Array[Double](64)
    while (tokenHashes.hasNext) {
      val (h, w) = tokenHashes.next()
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += w else votes(b) -= w
        b += 1
      }
    }
    fromVotes(votes)
  }

  def fingerprintOfTokens(tokens: Array[Int]): Long = {
    // weight each distinct token by its count in the doc
    val counts = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      counts.put(t, counts.getOrDefault(t, 0) + 1)
      i += 1
    }
    val it = counts.entrySet().iterator()
    fingerprint(new Iterator[(Long, Double)] {
      def hasNext = it.hasNext
      def next() = {
        val e = it.next()
        (Hashing.tokenHash(e.getKey), e.getValue.toDouble)
      }
    })
  }

  def fromVotes(votes: Array[Double]): Long = {
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** Hamming distance between fingerprints — small distance suggests
    * near-duplicate content.
    */
  @inline def hammingDistance(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)
}
