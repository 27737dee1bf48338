package graft.core

/** Sizing and FPR estimation for blocked Bloom filters.
  *
  * Reproduces the reference's parameter optimizer exactly (same correction
  * table, same rounding) so filters sized by this engine have identical
  * (nbits, k) — and therefore identical bits for identical inputs — as
  * reference-sized filters. Behavior specs:
  *  - Optimize: vanilla c = ceil(-log2(p)/ln2), corrected through Putze et
  *    al. Table I (blocked filters need more bits for the same FPR), x3
  *    fallback for c >= 35, round nbits up to x512, clamp to maxBits with
  *    round-down, then pick k = c*ln2 rounded exactly the way the
  *    reference rounds it — including its swapped floor/ceil variables,
  *    see optimize() (/root/reference/optimize.go:57-120)
  *  - Table I values (/root/reference/optimize.go:122-131)
  *  - FPRate model: Putze et al. Equation (3), a Poisson mixture over
  *    per-block fill summed outward from the mean until terms vanish
  *    (/root/reference/optimize.go:133-201)
  */
object BloomConfig {
  import BlockedBloomFilter.{BlockBits, MaxBits}

  /** Putze et al.'s Table I extended down to zero: vanilla bits-per-key c
    * -> blocked-filter c'. (Spec: /root/reference/optimize.go:122-131.)
    */
  private val correctC: Array[Int] = Array(
    1, 1, 2, 4, 5,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 18, 20, 21, 23,
    25, 26, 28, 30, 32, 35, 38, 40, 44, 48, 51, 58, 64, 74, 90)

  /** Solve (nbits, nhashes) for a desired capacity and false-positive rate.
    *
    * @param capacity expected number of distinct keys
    * @param p        desired FPR at capacity, in (0, 1]
    * @param maxBits  hard cap on filter size in bits; 0 means MaxBits;
    *                 values below 512 mean 512
    */
  def optimize(capacity: Long, p: Double, maxBits: Long = 0L): (Long, Int) = {
    require(p > 0 && p <= 1,
      "false positive rate for a Bloom filter must be > 0, <= 1")
    val n: Double = if (capacity == 0) 1.0 else capacity.toDouble

    var c = math.ceil(-log2(p) / math.log(2))
    if (c < correctC.length) c = correctC(c.toInt).toDouble
    else c *= 3 // desired FPR unachievable for a blocked filter; triple

    var nbits = (c * n).toLong
    if (nbits % BlockBits != 0) nbits += BlockBits - nbits % BlockBits

    var maxb = MaxBits
    if (maxBits != 0 && maxBits < maxb) {
      maxb = math.max(maxBits, BlockBits.toLong)
    }
    if (nbits > maxb) {
      nbits = maxb - maxb % BlockBits // round DOWN when clamped
    }

    c = nbits.toDouble / n
    val k = c * math.log(2)
    if (k < 1) return (nbits, 1)

    val floorK = math.floor(k)
    val ceilK = math.ceil(k)
    if (floorK == ceilK) return (nbits, ceilK.toInt)

    val fprCeil = fpRate(c, ceilK)
    val fprFloor = fpRate(c, floorK)
    // Replicate the reference's ACTUAL selection, not its intent: the
    // reference swaps the rounding variables (optimize.go:106 binds
    // `ceilK, floorK := math.Floor(k), math.Ceil(k)`), so it returns
    // ceil(k) when fpRate(floor) < fpRate(ceil) and floor(k) otherwise.
    // (nbits, k) parity with reference-sized filters is what makes
    // Union/Load interop possible (k mismatch is rejected), so we match
    // the observable behavior bit-for-bit rather than the comment.
    val chosen = if (fprFloor < fprCeil) ceilK else floorK
    (nbits, chosen.toInt)
  }

  /** Expected FPR of a blocked filter with nbits/nhashes after nkeys
    * distinct adds; 0 for an empty filter.
    */
  def fpRateAfter(nkeys: Long, nbits: Long, nhashes: Int): Double = {
    if (nkeys == 0) return 0.0
    fpRate(nbits.toDouble / nkeys.toDouble, nhashes.toDouble)
  }

  /** Putze et al. Equation (3): FPR of a blocked filter with c bits/key and
    * k hashes = E over Poisson(512/c)-distributed per-block load of the
    * single-block FPR. Terms added outward from the mean until the relative
    * contribution < 1e-9.
    */
  def fpRate(c: Double, k: Double): Double = {
    require(c != 0, "0 bits per key is too few")
    require(k != 0, "0 hashes is too few")

    val eps = 1e-9
    val mean = BlockBits / c
    val i = math.ceil(mean) // start at >= 1

    var p = math.exp(logPoisson(mean, i) + logFprBlock(BlockBits / i, k))

    var j = i - 1
    var continue = j > 0
    while (continue) {
      val add = math.exp(logPoisson(mean, j) + logFprBlock(BlockBits / j, k))
      p += add
      if (add / p < eps) continue = false
      else { j -= 1; continue = j > 0 }
    }

    j = i + 1
    continue = true
    while (continue) {
      val add = math.exp(logPoisson(mean, j) + logFprBlock(BlockBits / j, k))
      p += add
      if (add / p < eps) continue = false else j += 1
    }

    p
  }

  /** log FPR of a single fully-loaded block: k * log(1 - exp(-k/c)). */
  private def logFprBlock(c: Double, k: Double): Double =
    k * math.log1p(-math.exp(-k / c))

  /** log Poisson pmf via logGamma. */
  private def logPoisson(lambda: Double, k: Double): Double =
    k * math.log(lambda) - lambda -
      org.apache.commons.math3.special.Gamma.logGamma(k + 1)

  @inline private def log2(x: Double): Double = math.log(x) / math.log(2)
}
