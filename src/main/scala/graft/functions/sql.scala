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

  // SQL inputs arrive with whatever type the user's column has; the
  // aggregates read buffers with exact-type casts, so coerce here (the
  // Column API does the same via .cast) — ExpectsInputTypes would do
  // this but is private[sql] in Spark 4.
  private def asLong(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.LongType)
  private def asDouble(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.DoubleType)
  private def asString(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.StringType)
  private def asIntArray(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType))
  // Vector kernels read ArrayData.toFloatArray: an uncast array<double>
  // input would CCE (Generic) or read garbage (Unsafe). Coerce like the
  // other builders do.
  private def asFloatArray(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))

  /** name -> (usage, builder) for the aggregate expressions. */
  val aggregateBuilders: Map[String, (String, Seq[Expression] => Expression)] =
    Map(
      "graft_bloom_agg_tokens" -> (
        "(tokens, capacity, fpr[, maxBits]) - blocked Bloom filter dump",
        (es: Seq[Expression]) => {
          val maxBits = if (es.length > 3) lng(es(3), "maxBits") else 0L
          val (nbits, k) = BloomConfig.optimize(
            lng(es(1), "capacity"), dbl(es(2), "fpr"), maxBits)
          catalyst.BloomTokensAggregate(asIntArray(es.head), nbits, k)
            .toAggregateExpression()
        }),
      "graft_bloom_agg_hash" -> (
        "(hash64, capacity, fpr[, maxBits]) - blocked Bloom filter dump",
        (es: Seq[Expression]) => {
          val maxBits = if (es.length > 3) lng(es(3), "maxBits") else 0L
          val (nbits, k) = BloomConfig.optimize(
            lng(es(1), "capacity"), dbl(es(2), "fpr"), maxBits)
          catalyst.BloomHashAggregate(asLong(es.head), nbits, k)
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
          catalyst.HllTokensAggregate(asIntArray(es.head), p).toAggregateExpression()
        }),
      "graft_hll_agg_hash" -> (
        "(hash64[, p]) - HyperLogLog sketch",
        (es: Seq[Expression]) => {
          val p = if (es.length > 1) lng(es(1), "p").toInt else 14
          catalyst.HllHashAggregate(asLong(es.head), p).toAggregateExpression()
        }),
      "graft_cms_agg_tokens" -> (
        "(tokens[, depth, width]) - count-min sketch",
        (es: Seq[Expression]) => {
          val d = if (es.length > 1) lng(es(1), "depth").toInt else 5
          val w = if (es.length > 2) lng(es(2), "width").toInt else 65536
          catalyst.CmsTokensAggregate(asIntArray(es.head), d, w).toAggregateExpression()
        }),
      "graft_cms_agg_hash" -> (
        "(hash64[, depth, width]) - count-min sketch",
        (es: Seq[Expression]) => {
          val d = if (es.length > 1) lng(es(1), "depth").toInt else 5
          val w = if (es.length > 2) lng(es(2), "width").toInt else 65536
          catalyst.CmsHashAggregate(asLong(es.head), d, w).toAggregateExpression()
        }),
      "graft_theta_agg_tokens" -> (
        "(tokens[, k]) - theta (KMV) distinct sketch; intersectable",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 4096
          catalyst.ThetaTokensAggregate(asIntArray(es.head), k).toAggregateExpression()
        }),
      "graft_theta_agg_hash" -> (
        "(hash64[, k]) - theta (KMV) distinct sketch; intersectable",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 4096
          catalyst.ThetaHashAggregate(asLong(es.head), k).toAggregateExpression()
        }),
      "graft_theta_union_agg" -> (
        "(sketch[, k]) - union of theta sketches",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 4096
          catalyst.ThetaUnionAggregate(es.head, k).toAggregateExpression()
        }),
      "graft_tuple_agg_hash" -> (
        "(hash64, weight[, k]) - tuple sketch (theta + additive summary)",
        (es: Seq[Expression]) => {
          val k = if (es.length > 2) lng(es(2), "k").toInt else 4096
          catalyst.TupleHashAggregate(asLong(es.head), asLong(es(1)), k)
            .toAggregateExpression()
        }),
      "graft_tuple_agg_tokens" -> (
        "(tokens[, k]) - tuple sketch, weight 1 per token occurrence",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 4096
          catalyst.TupleTokensAggregate(asIntArray(es.head), k).toAggregateExpression()
        }),
      "graft_tuple_union_agg" -> (
        "(sketch[, k]) - union of tuple sketches (equal keys sum)",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 4096
          catalyst.TupleUnionAggregate(es.head, k).toAggregateExpression()
        }),
      "graft_freq_agg_tokens" -> (
        "(tokens[, k]) - Misra-Gries frequent-items sketch over raw " +
          "token ids; deterministic bounds, <= k entries",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 1024
          catalyst.FreqTokensAggregate(asIntArray(es.head), k).toAggregateExpression()
        }),
      "graft_freq_agg_str" -> (
        "(item[, k]) - Misra-Gries frequent-items sketch over strings",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 1024
          catalyst.FreqStrAggregate(asString(es.head), k)
            .toAggregateExpression()
        }),
      "graft_freq_union_agg" -> (
        "(sketch[, k, stringItems]) - merge of freq sketches",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 1024
          val str = es.length > 2 && lng(es(2), "stringItems") != 0
          catalyst.FreqUnionAggregate(es.head, k, str).toAggregateExpression()
        }),
      "graft_tdigest_agg" -> (
        "(value[, compression]) - t-digest sketch",
        (es: Seq[Expression]) => {
          val c = if (es.length > 1) dbl(es(1), "compression") else 100.0
          catalyst.TDigestAggregate(asDouble(es.head), c).toAggregateExpression()
        }),
      "graft_kll_agg" -> (
        "(value[, k]) - KLL quantile sketch",
        (es: Seq[Expression]) => {
          val k = if (es.length > 1) lng(es(1), "k").toInt else 200
          catalyst.KllAggregate(asDouble(es.head), k).toAggregateExpression()
        }),
      "graft_sketch_panel_agg" -> (
        "(tokens, capacity, fpr[, p, depth, width]) - fused " +
          "struct(bloom, hll, cms) in one pass",
        (es: Seq[Expression]) => {
          val (nbits, k) = BloomConfig.optimize(
            lng(es(1), "capacity"), dbl(es(2), "fpr"))
          val p = if (es.length > 3) lng(es(3), "p").toInt else 14
          val d = if (es.length > 4) lng(es(4), "depth").toInt else 5
          val w = if (es.length > 5) lng(es(5), "width").toInt else 65536
          catalyst.SketchPanelAggregate(asIntArray(es.head), nbits, k, p, d, w)
            .toAggregateExpression()
        }),
      "graft_topk_by_score" -> (
        "(score, id, k) - per-group top-k array<struct<id,score>>, " +
          "partial (map-side) top-k instead of a window",
        (es: Seq[Expression]) => {
          catalyst.TopKByScoreAggregate(asDouble(es.head), asLong(es(1)),
            lng(es(2), "k").toInt).toAggregateExpression()
        }))

  /** name -> (usage, builder) for the native scalar expressions (codegen,
    * no UDF dispatch — the SQL lift of graft.functions.expressions).
    */
  val scalarBuilders: Map[String, (String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{LongType, StringType}
    Map(
      "graft_tokenize" -> (
        "(text) - deterministic token ids, array<int>",
        (es: Seq[Expression]) =>
          expressions.Tokenize(Cast(es.head, StringType))),
      "graft_token_hash" -> (
        "(token_id) - splitmix64 of an int token",
        (es: Seq[Expression]) => expressions.TokenHash64(
          Cast(es.head, org.apache.spark.sql.types.IntegerType))),
      "graft_fnv64" -> (
        "(str) - 64-bit FNV-1a",
        (es: Seq[Expression]) =>
          expressions.Fnv1a64(Cast(es.head, StringType))),
      "graft_minhash_signature" -> (
        "(tokens[, numPerms]) - MinHash signature, array<long>",
        (es: Seq[Expression]) => expressions.MinhashSignature(
          asIntArray(es.head),
          if (es.length > 1) lng(es(1), "numPerms").toInt else 128)),
      "graft_minhash_bands" -> (
        "(sig, numBands, rowsPerBand) - LSH band keys, array<long>",
        (es: Seq[Expression]) => expressions.MinhashBands(es.head,
          lng(es(1), "numBands").toInt, lng(es(2), "rowsPerBand").toInt)),
      "graft_simhash" -> (
        "(tokens) - 64-bit SimHash fingerprint",
        (es: Seq[Expression]) =>
          expressions.Simhash64(asIntArray(es.head))),
      "graft_simhash_buckets" -> (
        "(fp, maxHamming) - two-level pigeonhole bucket keys, array<long>",
        (es: Seq[Expression]) => expressions.SimhashBuckets(
          Cast(es.head, LongType), lng(es(1), "maxHamming").toInt)),
      "graft_hamming64" -> (
        "(a, b) - Hamming distance of two int64 fingerprints",
        (es: Seq[Expression]) => expressions.Hamming64(
          Cast(es.head, LongType), Cast(es(1), LongType))),
      "graft_cosine_sim" -> (
        "(a, b) - cosine similarity of two array<float>",
        (es: Seq[Expression]) =>
          expressions.CosineSim(asFloatArray(es.head), asFloatArray(es(1)))),
      "graft_token_shingles" -> (
        "(tokens, n) - rolling n-gram shingle hashes, array<long>",
        (es: Seq[Expression]) => expressions.TokenShingles(
          asIntArray(es.head), lng(es(1), "n").toInt)),
      "graft_lang_id" -> (
        "(text) - heuristic language id",
        (es: Seq[Expression]) =>
          expressions.LangId(Cast(es.head, StringType))),
      "graft_canonical_url" -> (
        "(url) - canonical URL form (dedup key): fragment/tracking-" +
          "param/default-port/www/trailing-slash normalization",
        (es: Seq[Expression]) =>
          expressions.CanonicalUrl(Cast(es.head, StringType))),
      "graft_rolling_fp" -> (
        "(text) - Karp-Rabin rolling-window fingerprint",
        (es: Seq[Expression]) =>
          expressions.RollingFingerprint(Cast(es.head, StringType))),
      "graft_lsh_band_keys" -> (
        "(emb, numBands, bitsPerBand, dim) - hyperplane band keys",
        (es: Seq[Expression]) => expressions.LshBandKeys(asFloatArray(es.head),
          lng(es(1), "numBands").toInt, lng(es(2), "bitsPerBand").toInt,
          lng(es(3), "dim").toInt)),
      "graft_word_ngrams" -> (
        "(text, n) - distinct word n-grams, array<string>",
        (es: Seq[Expression]) => expressions.WordNgrams(
          Cast(es.head, StringType), lng(es(1), "n").toInt)),
      "graft_word_ngrams_all" -> (
        "(text, n) - ALL word n-grams in position order, duplicates " +
          "kept (LM occurrence stream), array<string>",
        (es: Seq[Expression]) => expressions.WordNgramsAll(
          Cast(es.head, StringType), lng(es(1), "n").toInt)),
      "graft_seg_token_count" -> (
        "(text) - BPE-style pre-tokenizer token count (alnum runs + " +
          "one per other non-space char), long",
        (es: Seq[Expression]) => expressions.SegTokenCount(
          Cast(es.head, StringType))),
      "graft_gopher_signals" -> (
        "(text) - Gopher quality raw signals, array<long> of 9: " +
          "[n_words, sum_word_codepoints, n_alpha_words, n_stopwords, " +
          "n_lines, n_bullet_lines, n_ellipsis_lines, n_hash_chars, " +
          "n_ellipsis_occurrences]",
        (es: Seq[Expression]) => expressions.GopherSignals(
          Cast(es.head, StringType))),
      "graft_gram_hashes" -> (
        "(text, n) - position-ordered rolling word-n-gram hashes, " +
          "array<long> (duplicate-span seeds)",
        (es: Seq[Expression]) => expressions.GramHashes(
          Cast(es.head, StringType), lng(es(1), "n").toInt)),
      "graft_gram_at" -> (
        "(text, pos, n) - the word n-gram at word index pos, string " +
          "(span-candidate verifier; null out of range)",
        (es: Seq[Expression]) => expressions.GramAt(
          Cast(es.head, StringType),
          Cast(es(1), org.apache.spark.sql.types.IntegerType),
          lng(es(2), "n").toInt)))
  }

  private def injectInto(registry:
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    (aggregateBuilders ++ scalarBuilders).foreach {
      case (name, (usage, builder)) =>
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Runtime registration of everything (aggregates + scalar helpers). */
  def registerAll(spark: SparkSession): Unit = {
    injectInto(spark.sessionState.functionRegistry)
    val u = spark.udf
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
    u.register("graft_theta_estimate",
      (bytes: Array[Byte]) => ThetaSketch.deserialize(bytes).estimate)
    u.register("graft_theta_intersect",
      (a: Array[Byte], b: Array[Byte]) =>
        ThetaSketch.deserialize(a).intersect(ThetaSketch.deserialize(b)).serialize())
    u.register("graft_theta_a_not_b",
      (a: Array[Byte], b: Array[Byte]) =>
        ThetaSketch.deserialize(a).aNotB(ThetaSketch.deserialize(b)).serialize())
    u.register("graft_tuple_estimate",
      (bytes: Array[Byte]) => TupleSketch.deserialize(bytes).estimate)
    u.register("graft_tuple_sum_estimate",
      (bytes: Array[Byte]) => TupleSketch.deserialize(bytes).sumEstimate)
    u.register("graft_tuple_intersect",
      (a: Array[Byte], b: Array[Byte]) =>
        TupleSketch.deserialize(a).intersect(TupleSketch.deserialize(b)).serialize())
    u.register("graft_tuple_a_not_b",
      (a: Array[Byte], b: Array[Byte]) =>
        TupleSketch.deserialize(a).aNotB(TupleSketch.deserialize(b)).serialize())
    u.register("graft_freq_entries",
      (bytes: Array[Byte]) => {
        val s = FreqSketch.deserialize(bytes)
        s.entries.map { case (item, lb) =>
          (s.codec.render(item), lb, lb + s.maxError)
        }.toSeq
      })
    u.register("graft_freq_lower_bound",
      (bytes: Array[Byte], item: String) => {
        val s = FreqSketch.deserialize(bytes)
        val key: AnyRef =
          if (s.codec.tag == 0) java.lang.Long.valueOf(item.toLong) else item
        s.lowerBound(key)
      })
    u.register("graft_freq_max_error",
      (bytes: Array[Byte]) => FreqSketch.deserialize(bytes).maxError)
    u.register("graft_cms_estimate",
      (bytes: Array[Byte], h: Long) =>
        CountMinSketch.deserialize(bytes).estimate(h))
    u.register("graft_tdigest_quantile",
      (bytes: Array[Byte], q: Double) =>
        TDigest.deserialize(bytes).quantile(q))
    u.register("graft_kll_quantile",
      (bytes: Array[Byte], q: Double) =>
        KllSketch.deserialize(bytes).quantile(q))
    u.register("graft_minhash_jaccard",
      (a: Array[Long], b: Array[Long]) => MinHash.estimateJaccard(a, b))
    // simhash/hamming/tokenize/cosine/minhash are injected above as
    // NATIVE expressions (scalarBuilders), not UDFs
  }
}

/** spark.sql.extensions entry point: SQL functions plus the runtime
  * Bloom semi-join pruning rule (conf-gated,
  * spark.graft.runtimeFilter.enabled).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    (sql.aggregateBuilders ++ sql.scalarBuilders).foreach {
      case (name, (usage, builder)) =>
        e.injectFunction((
          FunctionIdentifier(name),
          // surface the usage string: DESCRIBE FUNCTION <name> shows it
          new ExpressionInfo("graft", null, name, usage, ""),
          builder))
    }
    e.injectOptimizerRule(graft.plans.GraftRuntimeFilter(_))
  }
}
