package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII pattern redaction — the scrub pass every published web-corpus
  * pipeline runs before training (emails, IPs, long ID numbers):
  * replace each match with a typed placeholder and report per-type
  * match counts per document.
  *
  * Patterns apply SEQUENTIALLY on the running text (each type's count
  * is measured on the text as the previous redactions left it) — the
  * semantics of an actual scrubber, and the only composable one: an
  * email whose domain is a dotted quad ("a@10.0.0.1") is one email,
  * not an email plus an IP, because the email rule consumed it first.
  * Pattern order is therefore part of the contract.
  *
  * Scale: a chain of builtin `regexp_count`/`regexp_replace` column
  * projections — whole-stage codegen, zero shuffle, streaming-safe.
  * The regexes stay in the portable common subset of java.util.regex
  * and RE2 (character classes, bounded repetition, `\b`), so the
  * DuckDB oracle replays them verbatim; both engines scrub ASCII text
  * identically (the corpus-wide ASCII scope of the word-level ops).
  */
object Redact {

  /** (type name, regex, replacement) — applied in order. */
  val defaultPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    // >=9-digit runs: SSNs, card and account numbers, phone numbers
    // written without separators
    ("longnum", "\\b\\d{9,}\\b", "<NUM>"))

  /** Per document: `n_<type>` match counts (long, sequential
    * semantics), the fully redacted text, and `pii_free` = no pattern
    * matched anywhere.
    */
  def scrubPii(docs: DataFrame,
               patterns: Seq[(String, String, String)] = defaultPatterns,
               textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    require(patterns.nonEmpty, "no redaction patterns")
    val start: (Column, Seq[Column]) = (coalesce(col(textCol), lit("")), Nil)
    val (redacted, counts) = patterns.foldLeft(start) {
      case ((cur, cnts), (name, pat, repl)) =>
        (regexp_replace(cur, pat, repl),
          cnts :+ regexp_count(cur, lit(pat)).cast("long").as(s"n_$name"))
    }
    docs
      .select(col(idCol) +: counts :+ redacted.as("text_redacted"): _*)
      .withColumn("pii_free",
        patterns.map { case (n, _, _) => col(s"n_$n") === 0L }
          .reduce(_ && _))
  }
}
