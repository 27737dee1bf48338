package graft.spark

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{aggregators, functions => F}
import graft.sources.{TokenDoc, TokenDocGen}

/** Coverage for the two secondary surfaces: the typed Aggregator facade
  * (Dataset API users) and the spark.sql.extensions injection path.
  */
class FacadeSpec extends AnyFunSuite {

  test("GraftExtensions injects SQL functions at session build time") {
    // getOrCreate ignores withExtensions when a session already exists
    // (e.g. created by an earlier suite in this JVM) — build fresh
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      TokenDocGen.generateDf(spark, 200, 5L, 2)
        .createOrReplaceTempView("t")
      val n = spark.sql(
        """SELECT length(graft_bloom_agg_tokens(tokens, 10000, 0.01)) AS l,
          |       length(graft_hll_agg_tokens(tokens, 12)) AS h
          |FROM t""".stripMargin).head()
      assert(n.getInt(0) > 64)
      assert(n.getInt(1) == 4 + (1 << 12))
      // freq aggregate through SQL: exact regime over the tiny token
      // vocab slice — the sketch must report the same total weight the
      // rows carry (header field, independent of item layout)
      val fq = spark.sql(
        "SELECT graft_freq_agg_tokens(tokens, 8192) AS s FROM t").head()
        .getAs[Array[Byte]](0)
      val fqSk = graft.core.FreqSketch.deserialize(fq)
      val totTok = spark.sql("SELECT sum(n_tok) FROM t").head().getLong(0)
      assert(fqSk.streamWeight == totTok)
      assert(fqSk.numEntries > 0 && fqSk.numEntries <= 8192)
      // native scalar surface: values must match the Scala kernels
      val s = spark.sql(
        """SELECT graft_simhash(graft_tokenize('hello world hello')) AS fp,
          |  graft_hamming64(5, 6) AS hd,
          |  graft_token_hash(42) AS th,
          |  size(graft_minhash_signature(graft_tokenize('a b c'), 32)) AS ms
          |""".stripMargin).head()
      assert(s.getLong(0) == graft.core.SimHash.fingerprintOfTokens(
        graft.sources.TokenDocs.tokenize("hello world hello")))
      assert(s.getInt(1) == 2)
      assert(s.getLong(2) == graft.core.Hashing.tokenHash(42))
      assert(s.getInt(3) == 32)
      // word n-grams lift: same values as the operator's column form
      val ng = spark.sql(
        "SELECT graft_word_ngrams('a b c d a b', 2) AS g").head()
        .getSeq[String](0)
      assert(ng == Seq("a b", "b c", "c d", "d a"), ng)
      // gopher signal kernel from SQL: same layout as the Column form
      val gs = spark.sql(
        "SELECT graft_gopher_signals('the of # ...') AS g").head()
        .getSeq[Long](0)
      assert(gs == Seq(4L, 9L, 2L, 2L, 1L, 0L, 1L, 1L, 1L), gs)
      assert(spark.sql("SELECT graft_seg_token_count('hello, world!') AS c")
        .head().getLong(0) == 4L)
      // span-gram kernels from SQL: seeds match the kernel, verifier
      // returns the indexed window (and null out of range)
      val gh = spark.sql(
        "SELECT graft_gram_hashes('a b c d', 2) AS g").head()
        .getSeq[Long](0)
      assert(gh == graft.functions.kernels.gramHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c d"), 2)
        .toLongArray().toSeq, gh)
      val ga = spark.sql(
        "SELECT graft_gram_at('a b c d', 1, 2) AS g1, " +
          "graft_gram_at('a b c d', 3, 2) AS g2").head()
      assert(ga.getString(0) == "b c" && ga.isNullAt(1), ga.toString)
      // the scalar surface is codegen expressions, not UDFs
      val plan = spark.sql(
        "SELECT graft_simhash(graft_tokenize('x')) FROM t")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), plan)
      // SQL builders coerce input types (an INT column into a
      // double/long-typed aggregate used to ClassCastException)
      val coerced = spark.sql(
        """SELECT length(graft_kll_agg(n_tok)) AS a,
          |       length(graft_tdigest_agg(n_tok)) AS b,
          |       length(graft_bloom_agg_hash(n_tok, 1000, 0.01)) AS c
          |FROM t""".stripMargin).head()
      assert(coerced.getInt(0) > 0 && coerced.getInt(1) > 0 &&
        coerced.getInt(2) > 64)
      // fused panel + partial top-k from SQL
      val panel = spark.sql(
        """SELECT p.bloom, p.hll,
          |  graft_topk_by_score(n_tok, n_tok, 3) AS top
          |FROM (SELECT graft_sketch_panel_agg(tokens, 10000, 0.01) AS p,
          |             first(n_tok) AS n_tok FROM t GROUP BY source)
          |GROUP BY 1, 2 LIMIT 1""".stripMargin)
      assert(panel.head().getAs[scala.collection.Seq[_]]("top").nonEmpty)
    } finally spark.stop()
  }

  test("typed Aggregator facade works through Dataset.groupByKey") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val ds = TokenDocGen.generate(spark, 500, 9L, 4)
    val typedResult = ds.groupByKey(_.source)
      .mapValues(_.tokens)
      .agg(new aggregators.BloomTokensAgg(65536, 5).toColumn.name("bloom"))
      .collect().toMap
    // equals the native-aggregate DataFrame path bit-for-bit
    val nativeResult = ds.toDF().groupBy(col("source"))
      .agg(graft.functions.catalyst.aggCol(
        graft.functions.catalyst.BloomTokensAggregate(
          graft.functions.catalyst.expr(col("tokens")), 65536, 5))
        .as("bloom"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("bloom"))
      .toMap
    assert(typedResult.keySet == nativeResult.keySet)
    typedResult.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, nativeResult(k)),
        s"typed facade diverged from native aggregate for $k")
    }
  }

  test("every typed Aggregator matches its core sketch bit-for-bit") {
    // the facade classes are the Dataset-API surface; each must produce
    // the SAME wire bytes as a direct core-class build over the same
    // rows (divergence guard for the hand-written reduce loops)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    import graft.core._
    val tokens = (0 until 400).map(i =>
      Array.tabulate(20)(j => (i * 31 + j * 7) % 5000))
    val hashes = tokens.flatten.map(Hashing.tokenHash(_)).toArray
    val tokDs = spark.createDataset(tokens)
    val hashDs = hashes.toSeq.toDS()
    def one[B](ds: org.apache.spark.sql.Dataset[B],
               agg: org.apache.spark.sql.expressions.Aggregator[B, _, Array[Byte]]): Array[Byte] =
      ds.groupByKey(_ => 0).agg(agg.toColumn).collect().head._2
    // Bloom: tokens / hash / union forms vs one core build
    val coreBloom = BlockedBloomFilter(1 << 16, 5)
    hashes.foreach(coreBloom.add)
    val bloomDump = BloomIO.dump(coreBloom)
    assert(java.util.Arrays.equals(
      one(tokDs, new aggregators.BloomTokensAgg(1 << 16, 5)), bloomDump))
    assert(java.util.Arrays.equals(
      one(hashDs, new aggregators.BloomHashAgg(1 << 16, 5)), bloomDump))
    assert(java.util.Arrays.equals(
      one(Seq(bloomDump, bloomDump).toDS(),
        new aggregators.BloomUnionAgg(1 << 16, 5)), bloomDump))
    // HLL
    val coreHll = HyperLogLog(12)
    hashes.foreach(coreHll.add)
    assert(java.util.Arrays.equals(
      one(tokDs, new aggregators.HllTokensAgg(12)), coreHll.serialize()))
    assert(java.util.Arrays.equals(
      one(hashDs, new aggregators.HllHashAgg(12)), coreHll.serialize()))
    // CMS
    val coreCms = CountMinSketch(4, 1 << 12)
    hashes.foreach(h => coreCms.add(h))
    assert(java.util.Arrays.equals(
      one(tokDs, new aggregators.CmsTokensAgg(4, 1 << 12)),
      coreCms.serialize()))
    assert(java.util.Arrays.equals(
      one(hashDs, new aggregators.CmsHashAgg(4, 1 << 12)),
      coreCms.serialize()))
    // Theta: order-insensitive, byte-exact vs the core build
    val coreTheta = ThetaSketch(256)
    hashes.foreach(coreTheta.add)
    assert(java.util.Arrays.equals(
      one(tokDs, new aggregators.ThetaTokensAgg(256)),
      coreTheta.serialize()))
    assert(java.util.Arrays.equals(
      one(Seq(coreTheta.serialize(), coreTheta.serialize()).toDS(),
        new aggregators.ThetaUnionAgg(256)), coreTheta.serialize()))
    // Tuple: order-insensitive keys, ADDITIVE summaries — byte-exact vs
    // the core build; union test merges two DISJOINT halves (tuple
    // union is not idempotent, unioning the same sketch doubles sums)
    val coreTuple = TupleSketch(256)
    hashes.foreach(h => coreTuple.add(h, 1L))
    assert(java.util.Arrays.equals(
      one(tokDs, new aggregators.TupleTokensAgg(256)),
      coreTuple.serialize()))
    val halfA = TupleSketch(256); val halfB = TupleSketch(256)
    hashes.zipWithIndex.foreach { case (h, ix) =>
      if (ix % 2 == 0) halfA.add(h, 1L) else halfB.add(h, 1L)
    }
    assert(java.util.Arrays.equals(
      one(Seq(halfA.serialize(), halfB.serialize()).toDS(),
        new aggregators.TupleUnionAgg(256)), coreTuple.serialize()))
    // Freq (Misra-Gries): in the EXACT regime (distinct <= k at every
    // node) no decrement fires and the state is a pure count map —
    // byte-exact vs the core build at any partitioning
    val coreFreq = FreqSketch.longs(8192)
    tokens.flatten.foreach(t =>
      coreFreq.update(java.lang.Long.valueOf(t.toLong)))
    assert(java.util.Arrays.equals(
      one(tokDs, new aggregators.FreqTokensAgg(8192)),
      coreFreq.serialize()))
    val words = tokens.flatten.map(t => s"w${t % 50}")
    val coreFreqStr = FreqSketch.strings(64)
    words.foreach(coreFreqStr.update(_))
    assert(java.util.Arrays.equals(
      one(words.toDS(), new aggregators.FreqStrAgg(64)),
      coreFreqStr.serialize()))
    // t-digest / KLL merges are order-sensitive, so compare estimates
    // (rank-level agreement), not bytes
    val vals = (0 until 4000).map(i => Hashing.toUnitDouble(Hashing.at(3, i)))
    val tdBytes = one(vals.toDS(), new aggregators.TDigestAgg(100.0))
    assert(math.abs(TDigest.deserialize(tdBytes).quantile(0.5) - 0.5) < 0.05)
    val kllBytes = one(vals.toDS(), new aggregators.KllAgg(200))
    assert(math.abs(KllSketch.deserialize(kllBytes).quantile(0.5) - 0.5) < 0.05)
  }
}
