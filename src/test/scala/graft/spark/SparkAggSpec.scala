package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.functions.{functions => F}
import graft.sources.{TokenDocGen, TokenDocs}

/** Distributed aggregation tests — the Spark analogs of the reference's
  * concurrency oracles: partial aggregation at any partitioning must be
  * bit-identical to a sequential build (/root/reference/sync_test.go:27-61
  * concurrent==sequential; /root/reference/bloomfilter_test.go:266-296
  * union associativity), plus accuracy bounds through the full
  * scan->partial->shuffle->final path.
  */
class SparkAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val docs = {
    val d = TokenDocGen.generateDf(spark, 2000, seed = 42L, numPartitions = 8)
    d.cache(); d.count()
    d
  }

  // Exact distinct tokens, for oracle comparisons.
  lazy val distinctTokens: Array[Int] = {
    import spark.implicits._
    docs.select(explode(col("tokens")).as("t")).distinct()
      .as[Int].collect().sorted
  }

  val capacity = 60000L
  val fpr = 0.001
  lazy val (nbits, k) = BloomConfig.optimize(capacity, fpr)

  private def buildBloom(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.agg(F.bloom_agg_tokens(col("tokens"), capacity, fpr).as("sketch"))
      .head().getAs[Array[Byte]]("sketch")

  test("bloom build is partition-invariant (bit parity 1 vs 32 partitions)") {
    val one = buildBloom(docs.repartition(1))
    val many = buildBloom(docs.repartition(32))
    assert(java.util.Arrays.equals(one, many),
      "distributed bloom build must be byte-identical at any parallelism")
    // and identical to a local single-threaded build over the same rows
    val local = BlockedBloomFilter(nbits, k)
    docs.select("tokens").collect().foreach { r =>
      r.getSeq[Int](0).foreach(t => local.add(Hashing.tokenHash(t)))
    }
    assert(java.util.Arrays.equals(one, BloomIO.dump(local)),
      "distributed build must equal sequential reference build")
  }

  test("bloom probe: no false negatives, observed FPR < 2x configured") {
    val bytes = buildBloom(docs)
    val f = BloomIO.load(bytes)
    distinctTokens.foreach { t =>
      assert(f.has(Hashing.tokenHash(t)), s"false negative for token $t")
    }
    // probe disjoint keys (token ids outside vocab)
    val probes = (TokenDocs.VocabSize until TokenDocs.VocabSize + 20000)
    val fp = probes.count(t => f.has(Hashing.tokenHash(t)))
    val observed = fp.toDouble / probes.size
    assert(observed < 2 * fpr, s"observed FPR $observed >= ${2 * fpr}")
  }

  test("salted two-phase bloom equals direct build (skew handling)") {
    // phase 1: per-(source, salt) partials; phase 2: union per source
    val salted = docs
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16)))
      .groupBy(col("source"), col("salt"))
      .agg(F.bloom_agg_tokens(col("tokens"), capacity, fpr).as("partial"))
      .groupBy(col("source"))
      .agg(F.bloom_union_agg(col("partial"), nbits, k).as("sketch"))
    val direct = docs.groupBy(col("source"))
      .agg(F.bloom_agg_tokens(col("tokens"), capacity, fpr).as("sketch"))
    val s = salted.collect().map(r => r.getString(0) ->
      r.getAs[Array[Byte]]("sketch")).toMap
    val d = direct.collect().map(r => r.getString(0) ->
      r.getAs[Array[Byte]]("sketch")).toMap
    assert(s.keySet == d.keySet)
    s.keySet.foreach { src =>
      assert(java.util.Arrays.equals(s(src), d(src)),
        s"salted != direct for source $src")
    }
  }

  test("checkpoint write + bloom_union_agg resume equals fresh build") {
    // one sketch row per partition-range with lineage columns
    // (SURVEY.md §3.3 — load-is-union makes this resumable)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    docs.withColumn("part_id", spark_partition_id())
      .groupBy(col("part_id"))
      .agg(
        F.bloom_agg_tokens(col("tokens"), capacity, fpr).as("sketch"),
        count(lit(1)).as("row_count"),
        sum(col("n_tok")).as("token_count"))
      .write.mode("overwrite").parquet(s"$dir/bloom-ckpt")

    val resumed = spark.read.parquet(s"$dir/bloom-ckpt")
      .agg(F.bloom_union_agg(col("sketch"), nbits, k).as("sketch"))
      .head().getAs[Array[Byte]]("sketch")
    val fresh = buildBloom(docs)
    assert(java.util.Arrays.equals(resumed, fresh))
    // lineage columns present and consistent
    val ck = spark.read.parquet(s"$dir/bloom-ckpt")
    assert(ck.agg(sum("row_count")).head().getLong(0) == 2000L)
  }

  test("hll_agg estimate within 3 sigma of exact distinct count") {
    val p = 14
    val est = docs
      .agg(F.hll_agg_tokens(col("tokens"), p).as("sk"))
      .select(F.hll_estimate(col("sk")).as("est"))
      .head().getDouble(0)
    val exact = distinctTokens.length.toDouble
    val bound = 3 * 1.04 / math.sqrt((1 << p).toDouble)
    assert(math.abs(est / exact - 1) < bound + 0.001,
      s"HLL est $est vs exact $exact (bound $bound)")
  }

  test("hll and cms partition invariance (byte-exact)") {
    def build(n: Int) = docs.repartition(n)
      .agg(F.hll_agg_tokens(col("tokens"), 12).as("hll"),
        F.cms_agg_tokens(col("tokens"), 4, 1024).as("cms"))
      .head()
    val one = build(1); val many = build(32)
    assert(java.util.Arrays.equals(one.getAs[Array[Byte]]("hll"),
      many.getAs[Array[Byte]]("hll")))
    assert(java.util.Arrays.equals(one.getAs[Array[Byte]]("cms"),
      many.getAs[Array[Byte]]("cms")))
  }

  test("cms estimates: never undercount, within eps*N") {
    import spark.implicits._
    val bytes = docs
      .agg(F.cms_agg_tokens(col("tokens"), 5, 65536).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val cms = CountMinSketch.deserialize(bytes)
    val exact = docs.select(explode(col("tokens")).as("t"))
      .groupBy("t").count().as[(Int, Long)].collect().toMap
    val n = exact.values.sum
    assert(cms.total == n)
    // check the 50 most frequent tokens
    exact.toSeq.sortBy(-_._2).take(50).foreach { case (t, c) =>
      val est = cms.estimate(Hashing.tokenHash(t))
      assert(est >= c, s"CMS undercounted token $t")
      assert(est <= c + (cms.eps * n).toLong + 1,
        s"CMS overshoot for token $t: $est vs $c")
    }
  }

  test("tdigest/kll quantiles of n_tok match exact within rank bounds") {
    import spark.implicits._
    val sk = docs.agg(
      F.tdigest_agg(col("n_tok").cast("double"), 100.0).as("td"),
      F.kll_agg(col("n_tok").cast("double"), 200).as("kll"))
      .head()
    val td = TDigest.deserialize(sk.getAs[Array[Byte]]("td"))
    val kll = KllSketch.deserialize(sk.getAs[Array[Byte]]("kll"))
    val sorted = docs.select($"n_tok").as[Int].collect().sorted
    def exactQ(q: Double): Double =
      sorted(math.min(sorted.length - 1, (q * sorted.length).toInt)).toDouble
    for (q <- Seq(0.1, 0.5, 0.9)) {
      // compare by rank error: the estimated quantile's true rank must be
      // within 2% of q
      def rankOf(v: Double): Double =
        sorted.count(_ <= v).toDouble / sorted.length
      assert(math.abs(rankOf(td.quantile(q)) - q) < 0.02,
        s"t-digest q=$q -> ${td.quantile(q)} (exact ${exactQ(q)})")
      assert(math.abs(rankOf(kll.quantile(q)) - q) < 0.025,
        s"KLL q=$q -> ${kll.quantile(q)} (exact ${exactQ(q)})")
    }
  }

  test("sort-based aggregation fallback preserves bit parity") {
    // ObjectHashAggregateExec falls back to sort-based aggregation when
    // the in-memory map exceeds a threshold; force that path and require
    // byte-identical sketches — the fallback exercises the buffer
    // serialize/deserialize spill route that normal runs skip
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.get(key, "128")
    try {
      spark.conf.set(key, "1")
      val fallback = docs.repartition(8).groupBy(col("source"))
        .agg(F.bloom_agg_tokens(col("tokens"), capacity, fpr).as("sk"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk"))
        .toMap
      spark.conf.set(key, prev)
      val normal = docs.repartition(8).groupBy(col("source"))
        .agg(F.bloom_agg_tokens(col("tokens"), capacity, fpr).as("sk"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk"))
        .toMap
      assert(fallback.keySet == normal.keySet)
      fallback.keySet.foreach { k =>
        assert(java.util.Arrays.equals(fallback(k), normal(k)),
          s"sort-based fallback diverged for $k")
      }
    } finally spark.conf.set(key, prev)
  }

  test("minhash_agg equals local signature of the token union") {
    val sig = docs
      .agg(F.minhash_agg_tokens(col("tokens"), 64).as("sig"))
      .head().getAs[Seq[Long]]("sig").toArray
    val local = MinHash.signatureOfTokens(distinctTokens, 64)
    assert(sig.sameElements(local))
  }

  test("tokenizer derives the documents table deterministically") {
    val t = TokenDocs.fromDocumentsPath(spark, "/root/testdata/sf0.001")
    val rows = t.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tokens = r.getSeq[Int](r.fieldIndex("tokens"))
      assert(r.getInt(r.fieldIndex("n_tok")) == tokens.length)
      assert(tokens.forall(t => t >= 0 && t < TokenDocs.VocabSize))
    }
    // deterministic across runs
    val again = TokenDocs.fromDocumentsPath(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("generator is deterministic and skewed as specified") {
    import spark.implicits._
    val a = TokenDocGen.generateDf(spark, 500, 7L, 2).collect()
    val b = TokenDocGen.generateDf(spark, 500, 7L, 16).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted),
      "generation must not depend on partitioning")
    val bySource = docs.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(bySource("web-crawl") > 800 && bySource("web-crawl") < 1200,
      s"web-crawl skew missing: $bySource")
  }
}
