package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{functions => F}

/** Deduplication operators for training-data pipelines.
  *
  * Four tiers, cheapest first — at 100 TB each tier prunes the candidate
  * space for the next, and every shuffle is keyed to stay balanced:
  *  1. exact: hash-groupBy on content digest (one shuffle on the digest —
  *     uniformly distributed by construction, no skew)
  *  2. MinHash+LSH: per-doc signature (narrow), explode only the B band
  *     keys (B rows/doc, not |tokens| rows/doc), self-join on band buckets,
  *     verify candidates with exact similarity
  *  3. SimHash: 64-bit fingerprint, near-dup = small Hamming distance;
  *     bucketed by 16-bit chunks (pigeonhole: hamming<=3 over 4 chunks
  *     guarantees an exact chunk match) so the self-join never goes n^2
  *  4. exact n-gram Jaccard: the expensive verifier, run only on candidate
  *     pairs (or small tables)
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content, with the kept
    * (minimum) doc_id and the duplicate count. Content key = md5(text).
    */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Rows to drop under exact dedup (everything but the kept id per group). */
  def exactDropIds(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), md5(col(textCol)).as("content_md5"))
      .join(exactGroups(docs, textCol, idCol), Seq("content_md5"))
      .filter(col(idCol) =!= col("keep_id"))
      .select(col(idCol))

  /** Distinct word-token set per doc (the unit for Jaccard measures). */
  private def tokenSets(tokenDocs: DataFrame): DataFrame =
    tokenDocs.select(col("doc_id"),
        array_distinct(col("tokens")).as("tokset"))
      .withColumn("set_size", size(col("tokset")))

  /** Exact pairwise Jaccard over token sets, emitting pairs with
    * similarity >= threshold. O(pairs sharing a token) — intended for
    * small tables or LSH-candidate verification; the shuffle key is the
    * token, so frequent tokens are the skew risk: tokens appearing in
    * more than `maxDf` docs are dropped from pairing (they contribute
    * little discrimination and quadratic blowup).
    */
  def jaccardPairs(tokenDocs: DataFrame, threshold: Double,
                   maxDf: Int = Int.MaxValue): DataFrame = {
    val sets = tokenSets(tokenDocs)
    val posting = sets
      .select(col("doc_id"), col("set_size"), explode(col("tokset")).as("t"))
    val filtered =
      if (maxDf == Int.MaxValue) posting
      else {
        val dfreq = posting.groupBy("t")
          .agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
        posting.join(dfreq.select("t"), Seq("t"))
      }
    // self-join the SAME plan aliased two ways: the shuffle on t is
    // canonically identical on both sides, so ReusedExchange computes the
    // scan+tokenize+explode subtree once (verified in PlanSpec)
    val p = filtered
    p.as("x").join(p.as("y"),
        col("x.t") === col("y.t") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.set_size").as("sa"), col("y.set_size").as("sb"))
      .groupBy(col("a"), col("b"), col("sa"), col("sb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common") / (col("sa") + col("sb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash + LSH near-dup pairs, verified with exact Jaccard.
    *
    * numPerms = numBands * rowsPerBand. Candidate recall at similarity j
    * is 1-(1-j^rowsPerBand)^numBands; with the defaults (32 bands of 4
    * rows) recall at j=0.6 is ~0.99. Each doc contributes numBands rows
    * to the bucket join — constant fan-out, unlike the posting-list join.
    */
  def minhashLshPairs(tokenDocs: DataFrame, threshold: Double,
                      numBands: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    val numPerms = numBands * rowsPerBand
    val sigs = tokenDocs.select(col("doc_id"), col("tokens"))
      .withColumn("sig", F.minhash_signature(numPerms)(col("tokens")))
      // drop the 128-long signature before the band shuffle — only
      // (doc_id, band) rides the exchange
      .select(col("doc_id"),
        explode(F.minhash_bands(numBands, rowsPerBand)(col("sig"))).as("band"))
    // self-join on band buckets with identical subplans on both sides so
    // the band shuffle (scan + minhash + explode) is computed once and
    // reused (ReusedExchange)
    val cands = sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // verify candidates exactly; both verification joins shuffle the same
    // tokenSets subplan on doc_id -> one computation, one reuse
    val sets = tokenSets(tokenDocs)
    cands
      .join(sets.as("sa0"), col("a") === col("sa0.doc_id"))
      .join(sets.as("sb0"), col("b") === col("sb0.doc_id"))
      .select(col("a"), col("b"),
        col("sa0.tokset").as("ta"), col("sa0.set_size").as("sa"),
        col("sb0.tokset").as("tb"), col("sb0.set_size").as("sb"))
      .withColumn("common", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jaccard",
        col("common") / (col("sa") + col("sb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs: (a, b, cosine) with
    * cosine >= threshold, a < b. Exact all-pairs form — suitable when one
    * side broadcasts; the scale path buckets by random-hyperplane LSH
    * first (Ann.lshTopK's signature machinery) and verifies candidates
    * with this exact cosine.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double,
                            idCol: String = "vec_id",
                            embCol: String = "embedding"): DataFrame = {
    val cosine = udf((a: Seq[Float], b: Seq[Float]) => {
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
    val l = embeddings.select(col(idCol).as("a"), col(embCol).as("ea"))
    val r = embeddings.select(col(idCol).as("b"), col(embCol).as("eb"))
    l.join(broadcast(r), col("a") < col("b"))
      .withColumn("cosine", cosine(col("ea"), col("eb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), round(col("cosine"), 4).as("cosine"))
  }

  /** SimHash near-dup pairs: fingerprints within `maxHamming`.
    * Bucketing: split the 64-bit fingerprint into (maxHamming+1) chunks;
    * two fingerprints within maxHamming share at least one exact chunk
    * (pigeonhole), so the join is on (chunk index, chunk value) — linear
    * fan-out, never a full cross join.
    */
  def simhashPairs(tokenDocs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val bits = 64 / nChunks
    val fps = tokenDocs.select(col("doc_id"),
      F.simhash64(col("tokens")).as("fp"))
    val chunked = fps.select(col("doc_id"), col("fp"),
      explode(array((0 until nChunks).map { c =>
        struct(lit(c).as("ci"),
          shiftright(col("fp"), c * bits)
            .bitwiseAND(lit((1L << bits) - 1)).as("cv"))
      }: _*)).as("chunk"))
    val cands = chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.fp").as("fa"), col("y.fp").as("fb"))
      .distinct()
    cands
      .withColumn("hamming", F.hamming64(col("fa"), col("fb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }
}
