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

  /** Chunk manifest — what a loader actually reads: each document of a
    * [[packAssignments]] output exploded into the chunks it covers,
    * with the half-open slice taken from the doc (`doc_from`/`doc_to`)
    * and where it lands in the chunk (`chunk_from`); a doc spanning a
    * boundary appears once per covered chunk and its slice lengths sum
    * to its weight. Pure narrow arithmetic + a native sequence/explode,
    * no extra shuffle beyond the assignment's own window: the manifest
    * inherits the assignment partitioning. Empty docs (weight 0) cover
    * no chunk and emit no row (the when() guard — sequence() DESCENDS
    * for stop < start, it does not return empty).
    */
  def chunkManifest(assignments: DataFrame, seqLen: Long,
                    weightCol: String = "n_tok",
                    idCol: String = "doc_id",
                    strataCol: String = "source"): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val w = col(weightCol).cast("long")
    val start = col("start_off")
    // same floor-division form as packAssignments, so chunk ids agree
    val firstChunk = (start / seqLen).cast("bigint")
    val lastChunk = ((start + w - lit(1L)) / seqLen).cast("bigint")
    val gfrom = greatest(start, col("chunk_id") * seqLen)
    val gto = least(start + col("__w"), (col("chunk_id") + lit(1L)) * seqLen)
    assignments
      .select(col(idCol), col(strataCol), start, w.as("__w"),
        explode(when(w > lit(0L), sequence(firstChunk, lastChunk)))
          .as("chunk_id"))
      .select(col(idCol), col(strataCol), col("chunk_id"),
        (gfrom - start).as("doc_from"),
        (gto - start).as("doc_to"),
        (gfrom - col("chunk_id") * seqLen).as("chunk_from"),
        (gto - gfrom).as("slice_len"))
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
