package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.core._

/** SQL surface: every sketch operator callable from `spark.sql(...)`.
  *
  * Two registration paths:
  *  - `GraftExtensions` (for `spark.sql.extensions=graft.functions.
  *    GraftExtensions` in spark-submit conf) injects the aggregate
  *    expressions into the session function registry;
  *  - `sql.registerAll(spark)` does the same at runtime and additionally
  *    registers the scalar helpers (probe/estimate/quantile/hash) as
  *    named UDFs.
  *
  * Sizing arguments (capacity, fpr, precision, ...) must be literals —
  * they size the aggregation buffer at plan time, mirroring how the
  * reference resolves Optimize before allocation
  * (/root/reference/optimize.go:40-48).
  */
object sql {

  private def lng(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$what must be numeric, got $other")
    }
  }
  private def dbl(e: Expression, what: String): Double = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case n: Number => n.doubleValue()
      case d: Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be numeric, got $other")
    }
  }
  private type Decimal = org.apache.spark.sql.types.Decimal

  /** name -> (usage, builder) for the aggregate expressions. */
  val aggregateBuilders: Map[String, (String, Seq[Expression] => Expression)] =
    Map(
      "graft_bloom_agg_tokens" -> (
        "(tokens, capacity, fpr[, maxBits]) - blocked Bloom filter dump",
        (es: Seq[Expression]) => {
          val maxBits = if (es.length > 3) lng(es(3), "maxBits") else 0L
          val (nbits, k) = BloomConfig.optimize(
            lng(es(1), "capacity"), dbl(es(2), "fpr"), maxBits)
          catalyst.BloomTokensAggregate(es.head, nbits, k)
            .toAggregateExpression()
        }),
      "graft_bloom_agg_hash" -> (
        "(hash64, capacity, fpr[, maxBits]) - blocked Bloom filter dump",
        (es: Seq[Expression]) => {
          val maxBits = if (es.length > 3) lng(es(3), "maxBits") else 0L
          val (nbits, k) = BloomConfig.optimize(
            lng(es(1), "capacity"), dbl(es(2), "fpr"), maxBits)
          catalyst.BloomHashAggregate(es.head, nbits, k)
            .toAggregateExpression()
        }),
      "graft_bloom_union_agg" -> (
        "(dump, capacity, fpr) - union of Bloom dumps",
        (es: Seq[Expression]) => {
          val (nbits, k) = BloomConfig.optimize(
            lng(es(1), "capacity"), dbl(es(2), "fpr"))
          catalyst.BloomUnionAggregate(es.head, nbits, k)
            .toAggregateExpression()
        }),
      "graft_hll_agg_tokens" -> (
        "(tokens[, p]) - HyperLogLog sketch",
        (es: Seq[Expression]) => {
          val p = if (es.length > 1) lng(es(1), "p").toInt else 14
          catalyst.HllTokensAggregate(es.head, p).toAggregateExpression()
        }),
      "graft_hll_agg_hash" -> (
        "(hash64[, p]) - HyperLogLog sketch",
        (es: Seq[Expression]) => {
          val p = if (es.length > 1) lng(es(1), "p").toInt else 14
          catalyst.HllHashAggregate(es.head, p).toAggregateExpression()
        }),
      "graft_cms_agg_tokens" -> (
        "(tokens[, depth, width]) - count-min sketch",
        (es: Seq[Expression]) => {
          val d = if (es.length > 1) lng(es(1), "depth").toInt else 5
          val w = if (es.length > 2) lng(es(2), "width").toInt else 65536
          catalyst.CmsTokensAggregate(es.head, d, w).toAggregateExpression()
        }),
      "graft_cms_agg_hash" -> (
        "(hash64[, depth, width]) - count-min sketch",
        (es: Seq[Expression]) => {
          val d = if (es.length > 1) lng(es(1), "depth").toInt else 5
          val w = if (es.length > 2) lng(es(2), "width").toInt else 65536
          catalyst.CmsHashAggregate(es.head, d, w).toAggregateExpression()
        }),
      "graft_tdigest_agg" -> (
        "(value[, compression]) - t-digest sketch",
        (es: Seq[Expression]) => {
          val c = if (es.length > 1) dbl(es(1), "compression") else 100.0
          catalyst.TDigestAggregate(es.head, c).toAggregateExpression()
        }),
      "graft_kll_agg" -> (
        "(value[, k]) - KLL quantile sketch",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 200
          catalyst.KllAggregate(es.head, k).toAggregateExpression()
        }))

  private def injectInto(registry:
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    aggregateBuilders.foreach { case (name, (usage, builder)) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Runtime registration of everything (aggregates + scalar helpers). */
  def registerAll(spark: SparkSession): Unit = {
    injectInto(spark.sessionState.functionRegistry)
    val u = spark.udf
    u.register("graft_token_hash", (t: Int) => Hashing.tokenHash(t))
    u.register("graft_fnv64", (s: String) =>
      if (s == null) 0L else Hashing.fnv1a64(s))
    u.register("graft_bloom_might_contain",
      (dump: Array[Byte], h: Long) => BloomIO.load(dump).has(h))
    u.register("graft_bloom_cardinality", (dump: Array[Byte]) => {
      val c = BloomIO.load(dump).cardinality
      if (c.isInfinite) None else Some(c)
    })
    u.register("graft_bloom_fprate", (dump: Array[Byte], nkeys: Long) => {
      val f = BloomIO.load(dump)
      BloomConfig.fpRateAfter(nkeys, f.numBits, f.k)
    })
    u.register("graft_hll_estimate",
      (bytes: Array[Byte]) => HyperLogLog.deserialize(bytes).estimate)
    u.register("graft_cms_estimate",
      (bytes: Array[Byte], h: Long) =>
        CountMinSketch.deserialize(bytes).estimate(h))
    u.register("graft_tdigest_quantile",
      (bytes: Array[Byte], q: Double) =>
        TDigest.deserialize(bytes).quantile(q))
    u.register("graft_kll_quantile",
      (bytes: Array[Byte], q: Double) =>
        KllSketch.deserialize(bytes).quantile(q))
    u.register("graft_simhash",
      (tokens: Array[Int]) =>
        if (tokens == null) 0L else SimHash.fingerprintOfTokens(tokens))
    u.register("graft_hamming64",
      (a: Long, b: Long) => SimHash.hammingDistance(a, b))
    u.register("graft_minhash_jaccard",
      (a: Array[Long], b: Array[Long]) => MinHash.estimateJaccard(a, b))
  }
}

/** spark.sql.extensions entry point: SQL functions plus the runtime
  * Bloom semi-join pruning rule (conf-gated,
  * spark.graft.runtimeFilter.enabled).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    sql.aggregateBuilders.foreach { case (name, (usage, builder)) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    e.injectOptimizerRule(graft.plans.GraftRuntimeFilter(_))
  }
}
