package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{expressions => E}

/** Substring-level exact deduplication: find verbatim runs of >= minLen
  * word tokens shared across documents and either report them as spans
  * ([[duplicateSpans]]) or excise them ([[exciseSpans]]) — the
  * duplicate-span removal of Lee et al. 2022 ("Deduplicating Training
  * Data Makes Language Models Better"), which doc-level dedup misses:
  * after exact+near doc dedup, the dominant residual duplication in web
  * corpora is the 50-token boilerplate paragraph shared by otherwise
  * different pages.
  *
  * Algorithm (seed -> verify -> merge; no suffix array needed):
  *  1. SEED: every doc emits one rolling hash per word-gram start
  *    position (kernels.gramHashes — native, one O(len) pass per row,
  *    any gram length). One groupBy on the uniform 64-bit hash finds
  *    grams present in >= 2 distinct docs.
  *  2. VERIFY: candidate positions (rare — proportional to duplicated
  *    mass, not corpus size) join back to their doc's text on doc_id
  *    and re-derive the gram STRING (kernels.gramAt); the cross-doc
  *    test reruns on md5(gram string), so a 64-bit seed collision
  *    costs one wasted verify row, never a false span.
  *  3. MERGE: each verified start covers word indices [pos, pos+L);
  *    per-doc maximal runs of covered indices become spans via the
  *    islands trick (idx - row_number), a per-doc-bounded window.
  *
  * 100-TB shape: every shuffle keys on a uniform value (gram hash,
  * gram md5, doc_id); there is no all-pairs join anywhere — two docs
  * sharing a span never meet in a join, they only co-occur in a gram
  * group's count. Total cost = one gram-hash pass + one hash groupBy
  * over the corpus, plus work proportional to MATCHED span mass (the
  * b12 bench pins the linear scaling). Overlapping-span merging is
  * per-doc and bounded by doc length.
  */
object SpanDedup {

  /** Verified shared-gram start positions: (__id, pos, gk) where gk =
    * md5 of the gram string and the gram occurs in >= 2 distinct docs.
    */
  private def verifiedStarts(docs: DataFrame, minLen: Int,
                             textCol: String, idCol: String): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val seeds = docs.select(col(idCol).as("__id"),
      posexplode(E.gram_hashes(col(textCol), minLen)).as(Seq("pos", "gh")))
    val shared = seeds.groupBy(col("gh"))
      .agg(countDistinct(col("__id")).as("nd"))
      .filter(col("nd") >= 2).select(col("gh"))
    val cands = seeds.join(shared, Seq("gh"))
    // exact verify: candidates are matched-seed-sized, so this equi-join
    // against the text reads only the docs that hold a candidate
    val withG = cands
      .join(docs.select(col(idCol).as("__id"), col(textCol).as("__text")),
        Seq("__id"))
      .select(col("__id"), col("pos"),
        md5(E.gram_at(col("__text"), col("pos"), minLen)).as("gk"))
    // any occurrence of a string shared by >= 2 docs seeds to the same
    // hash, so ALL its occurrences are candidate rows: the string-level
    // distinct-doc count over candidates equals the corpus-level one,
    // and the result is exact despite the 64-bit seeds
    val sharedStr = withG.groupBy(col("gk"))
      .agg(countDistinct(col("__id")).as("nd2"))
      .filter(col("nd2") >= 2).select(col("gk"))
    withG.join(sharedStr, Seq("gk"))
      .select(col("__id"), col("pos"), col("gk"))
  }

  /** Covered word indices per doc with the minimum group key covering
    * each: (__id, idx, mgk).
    */
  private def coveredIndices(docs: DataFrame, minLen: Int,
                             textCol: String, idCol: String): DataFrame =
    verifiedStarts(docs, minLen, textCol, idCol)
      .select(col("__id"), col("gk"),
        explode(sequence(col("pos"), col("pos") + lit(minLen - 1)))
          .as("idx"))
      .groupBy(col("__id"), col("idx")).agg(min(col("gk")).as("mgk"))

  /** Maximal cross-doc duplicate spans: one row per (doc, maximal run
    * of word indices covered by some shared >= minLen-gram), as
    * (doc_id, span_from, span_to, span_tokens, group_key) with
    * [span_from, span_to) half-open word-index bounds over the doc's
    * whitespace token stream and group_key = the minimum gram md5 in
    * the span (equal for the copies of a shared passage, so spans are
    * groupable across docs). Word indices count non-empty
    * single-space-split tokens — the tokenization every text operator
    * here shares. Exactly SQL-recomputable (q48's oracle).
    */
  def duplicateSpans(docs: DataFrame, minLen: Int = 50,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val cov = coveredIndices(docs, minLen, textCol, idCol)
    val isl = cov.withColumn("grp",
      col("idx") - row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("idx"))))
    isl.groupBy(col("__id"), col("grp"))
      .agg(min(col("idx")).as("span_from"),
        (max(col("idx")) + 1).as("span_to"),
        min(col("mgk")).as("group_key"))
      .select(col("__id").as(idCol), col("span_from"), col("span_to"),
        (col("span_to") - col("span_from")).as("span_tokens"),
        col("group_key"))
  }

  /** Excised-text variant: every doc with its duplicate-span tokens
    * removed — (doc_id, clean_text, n_removed), where clean_text is the
    * doc's kept tokens re-joined with single spaces (runs of separator
    * spaces collapse; newlines live INSIDE tokens and survive) and
    * n_removed counts excised tokens. Docs with no spans pass through
    * (space-normalized) with n_removed = 0; a fully-covered doc keeps
    * an empty clean_text rather than disappearing. The reconstruction
    * is one anti-join plus a per-doc sort-and-join — no window over
    * corpus-wide data, no driver collect.
    */
  def exciseSpans(docs: DataFrame, minLen: Int = 50,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val cov = coveredIndices(docs, minLen, textCol, idCol)
      .select(col("__id"), col("idx"))
    val toks = docs.select(col(idCol).as("__id"),
      posexplode(filter(split(col(textCol), " "), t => t =!= ""))
        .as(Seq("idx", "tok")))
    val kept = toks.join(cov, Seq("__id", "idx"), "left_anti")
    val agg = kept.groupBy(col("__id")).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("tok")))),
          s => s("tok")), " ").as("clean_text"),
      count(lit(1)).as("n_kept"))
    docs.select(col(idCol), col(textCol))
      .withColumn("__ntok",
        size(filter(split(coalesce(col(textCol), lit("")), " "),
          t => t =!= "")))
      .join(agg.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("__ntok") - coalesce(col("n_kept"), lit(0L))).cast("int")
          .as("n_removed"))
  }
}
