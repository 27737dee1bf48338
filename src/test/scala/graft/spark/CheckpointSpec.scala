package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.BloomConfig
import graft.functions.{functions => F}
import graft.plans.SketchCheckpoint
import graft.sources.TokenDocGen

/** Checkpoint/lineage/resume semantics (north rule): partial-sketch rows
  * written per (group, partition-range) with lineage metadata; resume and
  * incremental-update paths produce byte-identical sketches to fresh
  * builds. (Associativity oracle:
  * /root/reference/bloomfilter_test.go:266-296; load-is-union:
  * /root/reference/io.go:151-178.)
  */
class CheckpointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val cap = 60000L
  val fpr = 0.001

  def bloomOf(df: org.apache.spark.sql.DataFrame): Map[String, Array[Byte]] =
    df.groupBy(col("source"))
      .agg(F.bloom_agg_tokens(col("tokens"), cap, fpr).as("sketch"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch"))
      .toMap

  test("write partials + resume equals fresh build, byte-for-byte") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck1").toString
    val docs = TokenDocGen.generateDf(spark, 3000, 42L, 8).cache()
    SketchCheckpoint.writeBloomPartials(docs, "source", cap, fpr, dir, "s1")
    val resumed = SketchCheckpoint.resumeBloom(spark, dir, cap, fpr)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch"))
      .toMap
    val fresh = bloomOf(docs)
    assert(resumed.keySet == fresh.keySet)
    resumed.keySet.foreach { k =>
      assert(java.util.Arrays.equals(resumed(k), fresh(k)), s"group $k")
    }
    docs.unpersist()
  }

  test("panel checkpoint resume equals fresh build for bloom+hll+cms") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckp").toString
    val docs = TokenDocGen.generateDf(spark, 3000, 42L, 8).cache()
    SketchCheckpoint.writePanelPartials(docs, "source", cap, fpr, dir, "s1")
    val resumed = SketchCheckpoint.resumePanel(spark, dir, cap, fpr)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Array[Byte]]("bloom"), r.getAs[Array[Byte]]("hll"),
          r.getAs[Array[Byte]]("cms"))).toMap
    val fresh = docs.groupBy(col("source"))
      .agg(F.sketch_panel_agg(col("tokens"), cap, fpr, 14, 5, 65536).as("p"))
      .collect().map(r => r.getString(0) -> {
        val p = r.getStruct(1)
        (p.getAs[Array[Byte]](0), p.getAs[Array[Byte]](1),
          p.getAs[Array[Byte]](2))
      }).toMap
    docs.unpersist()
    assert(resumed.keySet == fresh.keySet)
    resumed.foreach { case (k, (b, h, c)) =>
      assert(java.util.Arrays.equals(b, fresh(k)._1), s"bloom $k")
      assert(java.util.Arrays.equals(h, fresh(k)._2), s"hll $k")
      assert(java.util.Arrays.equals(c, fresh(k)._3), s"cms $k")
    }
  }

  test("incremental snapshot union equals full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck2").toString
    // snapshot 1: docs [0, 2000); snapshot 2: docs [2000, 3000) —
    // a deterministic disjoint split of the same table
    val all = TokenDocGen.generateDf(spark, 3000, 7L, 4).cache()
    val first = all.where(
      substring_index(col("doc_id"), "-", -1).cast("long") < 2000)
    val second = all.where(
      substring_index(col("doc_id"), "-", -1).cast("long") >= 2000)
    SketchCheckpoint.writeBloomPartials(first, "source", cap, fpr, dir, "s1")
    SketchCheckpoint.writeBloomPartials(second, "source", cap, fpr, dir, "s2")
    val merged = SketchCheckpoint
      .resumeBloom(spark, dir, cap, fpr, Seq("s1", "s2"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch"))
      .toMap
    val full = bloomOf(all)
    assert(merged.keySet == full.keySet)
    merged.keySet.foreach { k =>
      assert(java.util.Arrays.equals(merged(k), full(k)), s"group $k")
    }
    all.unpersist()
  }

  test("lineage accounts for every row and token") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck3").toString
    val docs = TokenDocGen.generateDf(spark, 1000, 11L, 4).cache()
    SketchCheckpoint.writeBloomPartials(docs, "source", cap, fpr, dir, "s1")
    val lin = SketchCheckpoint.lineage(spark, dir)
    val rows = lin.agg(sum("row_count"), sum("token_count")).head()
    assert(rows.getLong(0) == 1000L)
    assert(rows.getLong(1) ==
      docs.agg(sum("n_tok")).head().getLong(0))
    assert(lin.filter(col("max_build_ms") < 0).count() == 0)
    docs.unpersist()
  }

  test("salted two-phase agg equals direct (skew handling helper)") {
    val docs = TokenDocGen.generateDf(spark, 2000, 13L, 8).cache()
    val salted = SketchCheckpoint.saltedBloomAgg(docs, "source", cap, fpr)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch"))
      .toMap
    val direct = bloomOf(docs)
    direct.keySet.foreach { k =>
      assert(java.util.Arrays.equals(salted(k), direct(k)), s"group $k")
    }
    docs.unpersist()
  }

  test("SQL surface: registered functions work end to end") {
    graft.functions.sql.registerAll(spark)
    val docs = TokenDocGen.generateDf(spark, 1000, 17L, 4)
    docs.createOrReplaceTempView("tokdocs")
    val row = spark.sql(
      """SELECT source,
        |  graft_bloom_agg_tokens(tokens, 60000, 0.001) AS bloom,
        |  graft_hll_agg_tokens(tokens, 14) AS hll,
        |  graft_cms_agg_tokens(tokens, 5, 65536) AS cms,
        |  graft_kll_agg(CAST(n_tok AS DOUBLE), 200) AS kll
        |FROM tokdocs GROUP BY source""".stripMargin)
    row.createOrReplaceTempView("sketches")
    val checks = spark.sql(
      """SELECT source,
        |  graft_bloom_cardinality(bloom) AS bloom_card,
        |  graft_bloom_might_contain(bloom, graft_token_hash(0)) AS has0,
        |  graft_hll_estimate(hll) AS hll_est,
        |  graft_cms_estimate(cms, graft_token_hash(0)) AS cnt0,
        |  graft_kll_quantile(kll, 0.5) AS med_ntok
        |FROM sketches""".stripMargin).collect()
    assert(checks.nonEmpty)
    checks.foreach { r =>
      assert(r.getDouble(1) > 0, "bloom cardinality positive")
      assert(r.getBoolean(2), "token 0 (most frequent) must be present")
      assert(r.getDouble(3) > 0)
      assert(r.getLong(4) > 0)
      assert(r.getDouble(5) >= 20 && r.getDouble(5) <= 520)
    }
    // SQL build == DataFrame build, byte-for-byte
    val sqlBloom = spark.sql(
      "SELECT graft_bloom_agg_tokens(tokens, 60000, 0.001) FROM tokdocs")
      .head().getAs[Array[Byte]](0)
    val dfBloom = docs.agg(F.bloom_agg_tokens(col("tokens"), 60000, 0.001))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sqlBloom, dfBloom))
    // sizing args must be literals
    intercept[Exception] {
      spark.sql("SELECT graft_bloom_agg_tokens(tokens, n_tok, 0.001) FROM tokdocs")
        .collect()
    }
  }
}
