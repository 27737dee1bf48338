package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-keyed sampling — the reproducible alternative to
  * `DataFrame.sample`/`rand()` for corpus curation.
  *
  * `rand()`-based sampling is seeded per-partition: a task retry, an AQE
  * re-plan, or any repartition yields a DIFFERENT sample of the same
  * data, which is unacceptable when the sample defines a training set.
  * Here the keep/drop decision is a pure function of the row's id:
  * keep iff md5(id || '|' || salt) < threshold(fraction), comparing
  * 32-digit lowercase hex strings (lexicographic == numeric for
  * fixed-width hex). That makes the sample
  *  - stable under retries, partitioning, and cluster size;
  *  - refreshable: a different salt is an independent resample;
  *  - portable: any engine with md5 reproduces it exactly (the q36
  *    DuckDB oracle recomputes the sample in plain SQL).
  *
  * Scale: a narrow filter on top of the scan — no shuffle, no state; the
  * stratum threshold is one map lookup per row.
  */
object Sampling {

  /** 32-hex-digit threshold such that P[md5 < threshold] = frac for a
    * uniform 128-bit digest: floor(frac * 2^128) in hex. frac >= 1 maps
    * to "g" (lexically above every hex string: keep all); frac <= 0 to
    * "" (below every digest: keep none).
    */
  def hexThreshold(frac: Double): String =
    if (frac >= 1.0) "g"
    else if (frac <= 0.0) ""
    else {
      val scaled = (BigDecimal(frac) * BigDecimal(BigInt(1) << 128)).toBigInt
      String.format("%032x", scaled.bigInteger)
    }

  /** The per-row sampling key: md5 hex of the id and salt. */
  def sampleKey(id: Column, salt: String): Column =
    md5(concat(id.cast("string"), lit("|" + salt)))

  /** Uniform Bernoulli sample at `frac`, keyed on `idCol`. */
  def sample(df: DataFrame, frac: Double, salt: String = "graft",
             idCol: String = "doc_id"): DataFrame =
    df.filter(sampleKey(col(idCol), salt) < lit(hexThreshold(frac)))

  /** Deterministic budget fill: keep each stratum's docs in hash-key
    * order while the stratum's cumulative weight (token count) stays
    * within `budget` — the "give me N tokens per source" pipeline op.
    * The kept set is the prefix of a reproducible random permutation,
    * so it is retry-stable, grows monotonically with the budget, and
    * any engine with md5 and window sums reproduces it exactly (q38).
    *
    * Scale: one shuffle keyed on the stratum plus an in-partition sort
    * of (key, weight) rows — window sort is spill-backed, and the rows
    * are narrow regardless of document size. A single stratum must fit
    * one task's sort, which holds whenever stratum row counts are
    * bounded (the usual case: sources/languages number in the
    * thousands, not billions).
    */
  def sampleByBudget(df: DataFrame, budget: Long,
                     weightCol: String = "n_tok",
                     salt: String = "graft",
                     idCol: String = "doc_id",
                     strataCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(sampleKey(col(idCol), salt), col(idCol))
    df.withColumn("__graft_cum", sum(col(weightCol)).over(w))
      .filter(col("__graft_cum") <= budget)
      .drop("__graft_cum")
  }

  /** Stratified Bernoulli sample: per-stratum fractions (e.g. balance
    * sources or languages), `defaultFraction` for strata not listed.
    */
  def sampleBySource(df: DataFrame, fractions: Map[String, Double],
                     defaultFraction: Double = 0.0,
                     salt: String = "graft",
                     idCol: String = "doc_id",
                     strataCol: String = "source"): DataFrame = {
    val thresholds = typedLit(fractions.map { case (k, v) =>
      k -> hexThreshold(v) })
    val thr = coalesce(element_at(thresholds, col(strataCol)),
      lit(hexThreshold(defaultFraction)))
    df.filter(sampleKey(col(idCol), salt) < thr)
  }
}
