package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TokenDocGen

/** Phase-by-phase profile of the b10 batch dedup workload (throwaway
  * diagnostic, not part of the bench contract): counts and times each
  * stage of dedupDocs so the optimization effort lands where the time
  * actually is (guide §1.1).
  */
object DiagDedup {
  private def time[A](tag: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val a = body
    println(f"DIAG $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s -> $a")
    a
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def toText(df: DataFrame): DataFrame = df.select(
      regexp_extract(col("doc_id"), "(\\d+)$", 1).cast("long").as("doc_id"),
      concat_ws(" ", transform(col("tokens"), t => t.cast("string")))
        .as("text"), col("source"))
    val corpus = toText(TokenDocGen.generateDf(spark, 50000, 11L, cpus))
      .persist()
    val fresh = toText(TokenDocGen.generateDf(spark, 4500, 99L, cpus))
      .select((col("doc_id") + 50000L).as("doc_id"), col("text"),
        col("source"))
    val dups = corpus.filter(col("doc_id") < 500)
      .select((col("doc_id") + 54500L).as("doc_id"), col("text"),
        col("source"))
    val snap = fresh.union(dups).persist()
    corpus.count(); snap.count()
    val docs = corpus.union(snap)
    val threshold = 0.8

    import operators.Dedup
    // phase 1: exact tier
    val afterExact = docs.join(Dedup.exactDropIds(docs), Seq("doc_id"),
      "left_anti")
    time("exact_tier_count")(afterExact.count())
    val afterExactC = afterExact.localCheckpoint()
    val toks = graft.sources.TokenDocs.fromDocuments(afterExactC)
      .withColumn("doc_id",
        regexp_extract(col("doc_id"), "(\\d+)$", 1).cast("long"))
    // phase 2: band keys (inline copy of Dedup.bandKeys — private)
    val F = graft.functions.functions
    val bands = toks.select(col("doc_id"), col("tokens"))
      .withColumn("sz", size(array_distinct(col("tokens"))))
      .withColumn("sig", F.minhash_signature(128)(col("tokens")))
      .select(col("doc_id"), col("sz"),
        explode(F.minhash_bands(16, 8)(col("sig"))).as("band"))
      .localCheckpoint()
    time("band_keys")(bands.count())
    // doc size spread (how selective can the size screen be at 0.8?)
    val szs = bands.select(col("doc_id"), col("sz")).distinct()
    time("size_quantiles")(szs.stat
      .approxQuantile("sz", Array(0.01, 0.25, 0.5, 0.75, 0.99), 0.01)
      .mkString(","))
    // phase 3: candidates, without and with the size screen
    val candsAll = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    time("cand_rows_nofilter")(candsAll.count())
    val candsSz = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id")
          && least(col("x.sz"), col("y.sz")).cast("double") >=
            lit(threshold) * greatest(col("x.sz"), col("y.sz"))
              .cast("double") - lit(1e-9))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    time("cand_rows_szfilter")(candsSz.count())
    val dist = candsSz.distinct().localCheckpoint()
    time("cand_distinct")(dist.count())
    // phase 4: verify
    val pairs = time("verify_pairs") {
      Dedup.minhashLshPairs(toks, threshold, 16, 8).count()
    }
    // end to end
    time("dedupDocs_total") {
      Dedup.dedupDocs(docs, threshold, 16, 8).count()
    }
    spark.stop()
  }
}
