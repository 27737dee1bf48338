package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.functions.{functions => F, sharded}
import graft.sources.TokenDocGen

/** Sharded Bloom filters (the >single-JVM scale path): membership
  * correctness, FPR bound, partition invariance, shard-row checkpoint
  * form, and equivalence of sharding to independent per-shard builds.
  */
class ShardedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val docs = {
    val d = TokenDocGen.generateDf(spark, 2000, 42L, 8); d.cache(); d.count(); d
  }

  test("sharded build: no false negatives, FPR bound holds, 1==32 parts") {
    def build(df: org.apache.spark.sql.DataFrame) =
      df.agg(sharded.bloom_agg_sharded(col("tokens"), 64000, 0.001, 8)
        .as("shards")).head().getSeq[Array[Byte]](0)
    val dumps = build(docs)
    assert(dumps.length == 8)
    val f = sharded.shardedFilterOf(dumps)
    import spark.implicits._
    val tokens = docs.select(explode(col("tokens"))).distinct()
      .as[Int].collect()
    tokens.foreach(t => assert(f.hasToken(t), s"false negative: token $t"))
    val probes = (100000 until 200000)
    val fpr = probes.count(t => f.hasToken(t)).toDouble / probes.size
    assert(fpr < 2 * 0.001, s"sharded FPR $fpr")
    // partition invariance, shard-wise byte equality
    val one = build(docs.repartition(1))
    val many = build(docs.repartition(32))
    (one, many).zipped.foreach((a, b) =>
      assert(java.util.Arrays.equals(a, b)))
  }

  test("shard rows checkpoint form re-unions per shard") {
    val built = docs.agg(sharded.bloom_agg_sharded(
      col("tokens"), 64000, 0.001, 4).as("shards"))
    val rows = sharded.toShardRows(built).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getInt(0)).sorted.sameElements(0 until 4))
    // each shard is a valid reference-format dump
    rows.foreach { r =>
      val filt = BloomIO.load(r.getAs[Array[Byte]]("sketch"))
      assert(filt.numBits > 0)
    }
  }

  test("sharding distributes keys across shards by top hash bits") {
    val dumps = docs.agg(sharded.bloom_agg_sharded(
      col("tokens"), 64000, 0.001, 8).as("s")).head().getSeq[Array[Byte]](0)
    val cards = dumps.map(d => BloomIO.load(d).cardinality)
    val total = cards.sum
    // every shard holds a nontrivial share (uniform hash -> ~1/8 each)
    cards.foreach(c => assert(c > total / 8 * 0.5 && c < total / 8 * 1.5,
      s"shard imbalance: $cards"))
    // summed shard cardinality ~= distinct token count
    val exact = docs.select(explode(col("tokens"))).distinct().count()
    assert(math.abs(total / exact - 1) < 0.1, s"$total vs $exact")
  }

  test("numShards=1 degenerates to a single whole filter (shift mod 64 fix)") {
    assert(sharded.shardOf(0x8000000000000000L, 1) == 0)
    assert(sharded.shardOf(-1L, 1) == 0)
    assert(sharded.shardOf(42L, 1) == 0)
    val dumps = docs.agg(sharded.bloom_agg_sharded(
      col("tokens"), 8000, 0.001, 1).as("s")).head().getSeq[Array[Byte]](0)
    assert(dumps.length == 1)
    val whole = docs.agg(graft.functions.functions.bloom_agg_tokens(
      col("tokens"), 8000, 0.001)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(dumps.head, whole),
      "1-shard build must be byte-identical to the plain build")
  }

  test("row-form build (groupBy shard) dumps byte-identical shards") {
    val agg = docs.agg(sharded.bloom_agg_sharded(
      col("tokens"), 64000, 0.001, 8).as("s")).head().getSeq[Array[Byte]](0)
    val rows = sharded.buildShardRows(docs, 64000, 0.001, 8)
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    (0 until 8).foreach { sId =>
      rows.get(sId) match {
        case Some(bytes) =>
          assert(java.util.Arrays.equals(bytes, agg(sId)), s"shard $sId")
        case None => // row form omits empty shards
          assert(BloomIO.load(agg(sId)).isEmpty, s"shard $sId must be empty")
      }
    }
  }

  test("sharded probe equals union-of-truth for planted keys") {
    // keys inserted into shard s must never leak into other shards:
    // probing a key only consults its own shard
    val dumps = docs.agg(sharded.bloom_agg_sharded(
      col("tokens"), 64000, 0.001, 8).as("s")).head().getSeq[Array[Byte]](0)
    val filters = dumps.map(BloomIO.load(_)).toArray
    import spark.implicits._
    val tokens = docs.select(explode(col("tokens"))).distinct()
      .as[Int].collect()
    tokens.foreach { t =>
      val h = Hashing.tokenHash(t)
      val s = sharded.shardOf(h, 8)
      assert(filters(s).has(h))
    }
  }

  test("shardedFilterOfRows: gaps become empty shards, ids respected") {
    // row-form output drops empty shards and arrives unordered: the
    // assembly MUST key on shard_id (a bare dump list would misroute
    // probes). Build two shards locally, leave 1 and 2 empty.
    val hs = (0 until 4000).map(i => Hashing.splitmix64(0xABCDEFL + i))
    val byShard = hs.groupBy(h => sharded.shardOf(h, 4))
    def shardDump(ks: Seq[Long]): Array[Byte] = {
      val f = BlockedBloomFilter(1 << 16, 6)
      ks.foreach(f.add)
      BloomIO.dump(f)
    }
    // pass rows out of order on purpose
    val f = sharded.shardedFilterOfRows(
      Seq(3 -> shardDump(byShard(3)), 0 -> shardDump(byShard(0))), 4)
    byShard(0).foreach(h => assert(f.has(h), "shard-0 key must hit"))
    byShard(3).foreach(h => assert(f.has(h), "shard-3 key must hit"))
    // keys of the EMPTY shards probe an empty filter: always false
    byShard(1).foreach(h => assert(!f.has(h)))
    byShard(2).foreach(h => assert(!f.has(h)))
    intercept[IllegalArgumentException] {
      sharded.shardedFilterOfRows(Seq(4 -> shardDump(Nil)), 4)
    }
    intercept[IllegalArgumentException] {
      sharded.shardedFilterOfRows(
        Seq(0 -> shardDump(Nil), 0 -> shardDump(Nil)), 4)
    }
  }
}
