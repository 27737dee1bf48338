package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last step before a training run: concatenate
  * documents in a deterministic order and split the stream into
  * fixed-length chunks of `seqLen` tokens (documents may span a chunk
  * boundary, the standard concat-then-split packing). This operator
  * computes each document's PLACEMENT (start offset, chunk id, offset
  * within chunk) rather than materializing token arrays, so the output
  * is narrow and the assignment is exactly recomputable in SQL (q41):
  *
  *   start_off = cumulative token count of all docs BEFORE this one
  *               (md5-key order within the stratum, ties by id)
  *   chunk_id  = floor(start_off / seqLen)
  *   chunk_off = start_off % seqLen
  *
  * Determinism inherits from [[Sampling.sampleKey]]: stable under
  * retries/partitioning, and a salt change is an independent shuffle
  * of the packing order (fresh epoch).
  *
  * Scale: packing runs per stratum (source), so the window sort is the
  * same one shuffle as [[Sampling.sampleByBudget]] — a global pack
  * would serialize the prefix sum into one task, while per-source
  * chunks are what loaders consume anyway (source-stratified batches).
  */
object Packing {

  def packAssignments(docs: DataFrame, seqLen: Long,
                      weightCol: String = "n_tok",
                      salt: String = "graft",
                      idCol: String = "doc_id",
                      strataCol: String = "source"): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Sampling.sampleKey(col(idCol), salt), col(idCol))
    docs
      .withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("start_off", col("__cum") - col(weightCol))
      .select(col(idCol), col(strataCol), col(weightCol),
        col("start_off"),
        (col("start_off") / seqLen).cast("bigint").as("chunk_id"),
        (col("start_off") % seqLen).as("chunk_off"))
  }

  /** Per-stratum chunk inventory: how many full chunks a pack yields
    * and the leftover tokens in the final partial chunk.
    */
  def chunkStats(assignments: DataFrame, seqLen: Long,
                 weightCol: String = "n_tok",
                 strataCol: String = "source"): DataFrame =
    assignments.groupBy(col(strataCol))
      .agg(sum(col(weightCol)).as("total_tokens"),
        count(lit(1)).as("n_docs"))
      .select(col(strataCol), col("n_docs"), col("total_tokens"),
        (col("total_tokens") / seqLen).cast("bigint").as("full_chunks"),
        (col("total_tokens") % seqLen).as("tail_tokens"))
}
