package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{expressions => E}

/** CCNet-style n-gram language-model quality scoring (Wenzek et al.
  * 2020): train a smoothed bigram model on a trusted reference slice of
  * the corpus, score every other document by its model fit, and keep the
  * well-modeled ones. The production pipelines behind most open corpora
  * run exactly this shape (a KenLM 5-gram over Wikipedia); here it is a
  * bigram over a deterministic reference sample, built relationally so
  * both sides scale.
  *
  * Two scores:
  *  - [[scoreDocs]] — `bits_per_bigram`: add-one-smoothed bigram NLL in
  *    power-of-two-bucketed bits, floor(log2(c(prev)+V)) -
  *    floor(log2(c(prev,w)+1)) per occurrence (within 1 bit of the true
  *    smoothed NLL term log2((c(prev)+V)/(c(prev,w)+1))). The bucket is
  *    deliberate: every input is an integer count and floor(log2(x)) is
  *    `length(bin(x))-1` — EXACT integer arithmetic any SQL engine
  *    reproduces bit-for-bit (the q52 DuckDB oracle), where a raw
  *    `ln` differs across engines in the last ulp and can flip a rounded
  *    comparison. Ranking quality is preserved (OperatorSpec pins
  *    rank agreement with the precise score on a fixture).
  *  - [[scoreDocsPrecise]] — the full-precision `avg_nll` in nats for
  *    in-engine consumers (sbt-verified against a direct recomputation;
  *    not oracle-hashed, per the engine-wide IEEE rounding rule).
  *
  * Scale design (corpus side is the 100 TB side):
  *  - model counts aggregate the REFERENCE slice only (small by
  *    construction) with map-side partial aggregation; the vocabulary
  *    size joins in as a one-row broadcast, never a driver collect;
  *  - scoring explodes the corpus bigram stream ONCE (native
  *    [[graft.functions.kernels.wordNgramsAll]] kernel — O(len) per doc,
  *    duplicates kept, the HOF formulation is O(len^2) CodegenFallback)
  *    and looks up (bigram, prev-word) counts with two equi-joins on
  *    uniform string keys; Catalyst/AQE broadcasts the model tables
  *    when they fit, otherwise both shuffles hash-partition on keys
  *    with no skew (Zipf mass concentrates on DISTINCT hot grams, but
  *    each (doc,pos) occurrence row is unique — hot grams fan out
  *    across doc partitions and meet the count table row-to-row);
  *  - the per-doc reduce is a sum/count groupBy with partial combine —
  *    one corpus-keyed shuffle of narrow (id, int) rows.
  */
object LmScore {

  /** Bigram occurrence counts of the reference slice: (ng, c2). */
  def bigramCounts(ref: DataFrame, textCol: String = "text"): DataFrame =
    ref.select(explode(E.word_ngrams_all(col(textCol), 2)).as("ng"))
      .groupBy(col("ng")).agg(count(lit(1)).as("c2"))

  /** Unigram (word) occurrence counts of the reference slice: (w, c1). */
  def unigramCounts(ref: DataFrame, textCol: String = "text"): DataFrame =
    ref.select(explode(E.word_ngrams_all(col(textCol), 1)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))

  /** Per-document bucketed-bits LM score of `docs` under a bigram model
    * trained on `ref`. Output per doc (every doc, including those with
    * no bigrams): `n_bigrams` (long, 0 for short docs), `sum_bits`
    * (long, 0), `bits_per_bigram` (double 4dp, null when unscorable),
    * `keep` = bits_per_bigram <= maxBitsPerBigram (false when
    * unscorable — the engine-wide wordless-docs-fail rule).
    */
  def scoreDocs(docs: DataFrame, ref: DataFrame,
                maxBitsPerBigram: Double = 12.0,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val uni = unigramCounts(ref, textCol)
    val big = bigramCounts(ref, textCol)
    val vocab = uni.agg(count(lit(1)).as("__v"))
    // floor(log2(x)) for x >= 1, exact in integers on any engine
    def blog2(x: Column): Column = length(bin(x)) - 1
    val occ = docs
      .select(col(idCol), explode(E.word_ngrams_all(col(textCol), 2)).as("ng"))
      .crossJoin(vocab) // one row: BroadcastNestedLoopJoin, no shuffle
      .join(big, Seq("ng"), "left")
      .withColumn("__prev", substring_index(col("ng"), " ", 1))
      .join(uni, col("__prev") === uni("w"), "left")
      .select(col(idCol),
        (blog2(coalesce(col("c1"), lit(0L)) + col("__v")) -
          blog2(coalesce(col("c2"), lit(0L)) + lit(1L))).as("__bits"))
    val perDoc = occ.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      sum(col("__bits")).cast("bigint").as("sum_bits"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        round(col("sum_bits").cast("double") / col("n_bigrams"), 4)
          .as("bits_per_bigram"))
      .withColumn("keep",
        coalesce(col("bits_per_bigram") <= maxBitsPerBigram, lit(false)))
  }

  /** Full-precision twin of [[scoreDocs]]: per-occurrence NLL
    * -ln((c(prev,w)+1)/(c(prev)+V)) in nats, averaged per doc
    * (`avg_nll`, null when unscorable). Same plan shape; for in-engine
    * thresholds and ranking where cross-engine bit-equality is not
    * required. `keep` = avg_nll <= maxAvgNll.
    */
  def scoreDocsPrecise(docs: DataFrame, ref: DataFrame,
                       maxAvgNll: Double = 9.0,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val uni = unigramCounts(ref, textCol)
    val big = bigramCounts(ref, textCol)
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val occ = docs
      .select(col(idCol), explode(E.word_ngrams_all(col(textCol), 2)).as("ng"))
      .crossJoin(vocab)
      .join(big, Seq("ng"), "left")
      .withColumn("__prev", substring_index(col("ng"), " ", 1))
      .join(uni, col("__prev") === uni("w"), "left")
      .select(col(idCol),
        (log((coalesce(col("c1"), lit(0L)) + col("__v")).cast("double")) -
          log((coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double")))
          .as("__nll"))
    val perDoc = occ.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"), avg(col("__nll")).as("avg_nll"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"))
      .withColumn("keep", coalesce(col("avg_nll") <= maxAvgNll, lit(false)))
  }
}
