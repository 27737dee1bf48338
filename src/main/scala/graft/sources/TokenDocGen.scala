package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core.Hashing

/** Deterministic synthesizer for the token table (FIXTURES.md §1).
  *
  * Every row is a pure function of (seed, row id): a counter-based
  * splitmix64 stream keyed on (seed, id, draw-index) drives all choices,
  * so the output is IDENTICAL at any parallelism or partitioning — the
  * property the repartition(1) == repartition(32) bit-parity tests depend
  * on (oracle analog: /root/reference/sync_test.go:27-61, concurrent ==
  * sequential).
  *
  * Tokens are Zipf(s=1.1)-distributed over a 50k vocabulary via inverse-CDF
  * binary search against a precomputed cumulative table (exact Zipf, O(log
  * V) per draw; the table is built once per executor lazily). Sources are
  * skewed — one source owns half the rows — to exercise the salting /
  * skew-handling paths. Token id 0 is the most frequent.
  *
  * At the 1e12-sequence target scale this generator is the stand-in for
  * the Iceberg scan: `spark.range(n)` partitions the id space evenly, so
  * the generate stage scales linearly with cores and carries no shuffle.
  */
object TokenDocGen {
  val Vocab: Int = TokenDocs.VocabSize
  val ZipfS = 1.1

  /** Source names with skewed weights; web-crawl holds 50% of rows. */
  val sources: Array[(String, Double)] = Array(
    "web-crawl" -> 0.50, "books" -> 0.20, "code" -> 0.10,
    "wiki" -> 0.08, "news" -> 0.05, "forums" -> 0.03,
    "papers" -> 0.02, "dialogs" -> 0.02)

  private val sourceCdf: Array[Double] = {
    val cdf = new Array[Double](sources.length)
    var acc = 0.0
    for (i <- sources.indices) { acc += sources(i)._2; cdf(i) = acc }
    cdf(cdf.length - 1) = 1.0
    cdf
  }

  /** Zipf cumulative table, built lazily once per JVM (≈400 KB). */
  @transient private lazy val zipfCdf: Array[Double] = {
    val cdf = new Array[Double](Vocab)
    var acc = 0.0
    var i = 0
    while (i < Vocab) { acc += 1.0 / math.pow(i + 1, ZipfS); cdf(i) = acc; i += 1 }
    val total = acc
    i = 0
    while (i < Vocab) { cdf(i) /= total; i += 1 }
    cdf
  }

  /** Inverse-CDF Zipf draw: token id in [0, Vocab), id 0 most frequent. */
  def zipfToken(u: Double): Int = {
    val idx = java.util.Arrays.binarySearch(zipfCdf, u)
    val i = if (idx >= 0) idx else -idx - 1
    math.min(i, Vocab - 1)
  }

  /** Generate one row deterministically from (seed, id). */
  def row(seed: Long, id: Long): TokenDoc = {
    val base = Hashing.splitmix64(seed) ^ Hashing.splitmix64(id)
    val uSource = Hashing.toUnitDouble(Hashing.at(base, 0))
    var s = 0
    while (uSource > sourceCdf(s)) s += 1
    // doc length: 20..520, quadratic ramp (many short docs, few long)
    val uLen = Hashing.toUnitDouble(Hashing.at(base, 1))
    val nTok = 20 + (uLen * uLen * 500).toInt
    val tokens = new Array[Int](nTok)
    var t = 0
    while (t < nTok) {
      tokens(t) = zipfToken(Hashing.toUnitDouble(Hashing.at(base, 2 + t)))
      t += 1
    }
    TokenDoc(f"${sources(s)._1}%s-doc-$id%012d", tokens, nTok, sources(s)._1)
  }

  /** Distributed deterministic generation over [0, rows). */
  def generate(spark: SparkSession, rows: Long, seed: Long = 42L,
               numPartitions: Int = 0): Dataset[TokenDoc] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, rows, 1, parts).map(id => row(seed, id))
  }

  def generateDf(spark: SparkSession, rows: Long, seed: Long = 42L,
                 numPartitions: Int = 0): DataFrame =
    generate(spark, rows, seed, numPartitions).toDF()
}
