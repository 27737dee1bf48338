package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Hashing

/** Approximate-nearest-neighbor search over embedding columns
  * (array<float>).
  *
  * Two paths:
  *  - bruteForceTopK: exact cosine top-k via broadcast of the (small)
  *    query set against the full corpus — the correctness baseline. The
  *    corpus side streams; only queries are broadcast, so this scales to
  *    any corpus size as long as the query set is broadcastable.
  *  - lshTopK: random-hyperplane LSH (Charikar 2002) — hash every vector
  *    to a b-bit signature over fixed hyperplanes, band the signature,
  *    join on band buckets, rank candidates by exact cosine. At scale the
  *    bucket join replaces the corpus-size-by-query-size product with
  *    bucket-local products.
  */
object Ann {

  private val cosineUdf = udf((a: Seq[Float], b: Seq[Float]) => {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  })

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries  (id, embedding) — must be small enough to broadcast
    * @param corpus   (id, embedding)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(embCol).as("c_emb"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineUdf(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Fixed random hyperplanes: nbits x dim, deterministic from the
    * engine-wide seed. Gaussian-ish components via sum of uniforms.
    */
  private def hyperplanes(nbits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nbits) { b =>
      Array.tabulate(dim) { d =>
        // approximate N(0,1): sum of 4 uniforms, centered/scaled
        var s = 0.0
        var j = 0
        while (j < 4) {
          s += Hashing.toUnitDouble(Hashing.at(0xA22B55EE77L, (b * dim + d) * 4 + j))
          j += 1
        }
        (s - 2.0) * math.sqrt(3.0)
      }
    }

  /** Sign-random-projection signature + banded candidate join + exact
    * re-rank. Recall rises with numBands; neighbors colliding in no band
    * are missed (that's the approximation).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nbits: Int = 32, numBands: Int = 8,
              idCol: String = "vec_id",
              embCol: String = "embedding"): DataFrame = {
    require(nbits % numBands == 0, "nbits must divide into bands")
    val bitsPerBand = nbits / numBands
    val dim = corpus.select(col(embCol)).head().getSeq[Float](0).length
    val planes = hyperplanes(nbits, dim)
    val sigUdf = udf((emb: Seq[Float]) => {
      var sig = 0L
      var b = 0
      while (b < planes.length) {
        var dot = 0.0
        val p = planes(b)
        var i = 0
        val n = math.min(p.length, emb.length)
        while (i < n) { dot += p(i) * emb(i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      sig
    })
    def banded(df: DataFrame, role: String) =
      df.select(col(idCol).as(s"${role}_id"), col(embCol).as(s"${role}_emb"),
          sigUdf(col(embCol)).as("sig"))
        .select(col(s"${role}_id"), col(s"${role}_emb"),
          explode(array((0 until numBands).map { b =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), b * bitsPerBand)
                .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("bv"))
          }: _*)).as("bucket"))
    val qb = banded(queries, "query")
    val cb = banded(corpus, "neighbor")
    val cands = qb.join(cb, qb("bucket") === cb("bucket") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("query_emb").as("q_emb"),
        col("neighbor_id"), col("neighbor_emb").as("c_emb"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.withColumn("cosine",
      cosineUdf(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cosine"), 4).as("cosine"))
  }
}
