package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Hashing

/** The engine's fundamental input table (BASELINE.json input_hint):
  *   doc_id: string, tokens: array<int>, n_tok: int, source: string
  * stored as Parquet (no Iceberg runtime jar in this environment; Parquet
  * tables + deterministic snapshot directories stand in for Iceberg
  * tables/snapshots — see SURVEY.md §1.2).
  */
case class TokenDoc(doc_id: String, tokens: Array[Int], n_tok: Int,
                    source: String)

object TokenDocs {
  /** Vocabulary size for the deterministic tokenizer and generator. */
  val VocabSize = 50000

  /** Deterministic tokenizer: lowercase, split on non-alphanumeric runs,
    * map each word to an int32 id by FNV-1a mod vocab. Pure function of
    * the text — reproducible on any executor at any parallelism.
    */
  private val splitPattern = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  def tokenize(text: String, vocab: Int = VocabSize): Array[Int] = {
    if (text == null) return Array.empty
    // precompiled pattern: String.split would recompile the regex per row.
    // Locale.ROOT: default-locale lowercasing breaks the "pure function
    // of the text" contract across JVMs (tr-TR maps I to dotless i,
    // changing every token id on that executor)
    val words = splitPattern.split(
      text.toLowerCase(java.util.Locale.ROOT))
    val out = new Array[Int](words.length)
    var n = 0
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        out(n) = ((Hashing.fnv1a64(words(i)) >>> 1) % vocab).toInt
        n += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** Derive the token table from the driver's `documents` parquet
    * (doc_id: long, text, lang, source, n_chars). The tokenizer runs as
    * a native codegen expression — this projection sits inside every
    * sf-dir query, so it must not pay the udf encoder tax.
    */
  def fromDocuments(documents: DataFrame): DataFrame =
    documents
      .withColumn("tokens", graft.functions.functions.tokenize(col("text")))
      .select(
        format_string("doc_%012d", col("doc_id")).as("doc_id"),
        col("tokens"),
        size(col("tokens")).as("n_tok"),
        col("source"))

  def fromDocumentsPath(spark: SparkSession, sfDir: String): DataFrame =
    fromDocuments(spark.read.parquet(s"$sfDir/documents.parquet"))
}
