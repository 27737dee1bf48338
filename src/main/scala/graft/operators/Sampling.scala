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

  /** Deterministic global shuffle into `numShards` training shards —
    * the reproducible alternative to `repartition(rand())` for writing
    * the final training set. Every doc gets
    *  - `shard`: the index of the hex-threshold bucket its sample key
    *    falls in (equal-probability buckets of the md5 key space —
    *    shard boundaries are the same [[hexThreshold]] strings any
    *    engine can compare lexicographically, the q53 oracle);
    *  - `pos`: its rank within the shard in key order — a reproducible
    *    random order WITHIN each shard, so a trainer reading shard
    *    files sequentially sees a deterministic global shuffle.
    * Stable under retries, partitioning, and cluster size; a different
    * salt is an independent reshuffle.
    *
    * Scale: the shard column is a pure codegen projection on the scan
    * (a when-chain over numShards-1 string compares — zero shuffle,
    * PlanSpec-pinned); `pos` adds the ONE shuffle the op fundamentally
    * needs (hash-partition by shard + in-partition spill-backed sort).
    * [[writeShards]] rides that same exchange straight into a
    * partitioned, sorted write.
    */
  def shardAssignments(df: DataFrame, numShards: Int,
                       salt: String = "graft",
                       idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__graft_key"), col(idCol))
    withShard(df, numShards, salt, idCol)
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .drop("__graft_key")
  }

  /** The shard projection alone (plus the `__graft_key` it derives
    * from): zero-shuffle codegen when-chain, shared by
    * [[shardAssignments]] (which adds the position window — the one
    * shuffle that op fundamentally needs) and [[shardBalance]] (whose
    * counts don't need positions, so it must not pay that sort).
    */
  private def withShard(df: DataFrame, numShards: Int,
                        salt: String, idCol: String): DataFrame = {
    require(numShards >= 1 && numShards <= 4096,
      s"numShards must be in [1, 4096], got $numShards")
    val key = sampleKey(col(idCol), salt)
    // descending when-chain: shard = max i with key >= threshold(i/S)
    def ge(i: Int): Column =
      col("__graft_key") >= lit(hexThreshold(i.toDouble / numShards))
    val shardCol =
      if (numShards == 1) lit(0)
      else (numShards - 2 to 1 by -1)
        .foldLeft(when(ge(numShards - 1), lit(numShards - 1))) {
          (acc, i) => acc.when(ge(i), lit(i))
        }.otherwise(lit(0))
    df.withColumn("__graft_key", key)
      .withColumn("shard", shardCol)
  }

  /** Shard-balance audit over [[shardAssignments]] — the two claims a
    * training loader depends on, checked with exact integers: shards
    * are near-equal in size (stragglers = wasted cluster), and every
    * shard is a faithful sample of the source mix (a shard that
    * under-represents a source skews every step trained from it). One
    * row per shard: `n_docs, n_tokens`, `size_ratio` =
    * n_docs·numShards/T (1.0 = perfectly even; one IEEE div of exact
    * int64), and the worst mix deviation `mix_dev_num` =
    * max over sources |c_ss·T − c_s·n_docs| (exact int64 — zero iff
    * the shard's mix equals the corpus mix exactly), its normalized
    * `mix_dev` in [0,1], and `top_source` (ties break on the source).
    * Sources ABSENT from a shard deviate by their full expected mass —
    * the grid is (shards × sources)-sized, so the total-absence case
    * is counted, not silently skipped.
    *
    * Input needs (`idCol`, `sourceCol`, `ntokCol`). Shape: the shard
    * column alone (zero-shuffle codegen projection — NOT the full
    * [[shardAssignments]], whose per-shard position sort the audit
    * never reads), one count aggregation, then everything is
    * (shards × sources)-sized off one checkpointed frame.
    */
  def shardBalance(docs: DataFrame, numShards: Int,
                   salt: String = "graft", idCol: String = "doc_id",
                   sourceCol: String = "source",
                   ntokCol: String = "n_tok"): DataFrame = {
    val ss = withShard(docs, numShards, salt, idCol)
      .groupBy(col("shard"), col(sourceCol).as("source"))
      .agg(count(lit(1)).as("c_ss"), sum(col(ntokCol)).as("tok_ss"))
      .localCheckpoint(true)
    val perShard = ss.groupBy(col("shard")).agg(
      sum(col("c_ss")).as("n_docs"), sum(col("tok_ss")).as("n_tokens"))
    val perSource = ss.groupBy(col("source")).agg(
      sum(col("c_ss")).as("c_s"))
    val totals = ss.agg(sum(col("c_ss")).as("T"))
    val j = perShard.crossJoin(broadcast(perSource))
      .join(ss.select(col("shard"), col("source"), col("c_ss")),
        Seq("shard", "source"), "left")
      .na.fill(0L, Seq("c_ss"))
      .crossJoin(broadcast(totals))
      .withColumn("dev_num",
        abs(col("c_ss") * col("T") - col("c_s") * col("n_docs")))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("dev_num").desc, col("source").asc)
    j.withColumn("rk", row_number().over(rankW))
      .filter(col("rk") === 1)
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        ((col("n_docs") * lit(numShards)).cast("double")
          / col("T").cast("double")).as("size_ratio"),
        col("dev_num").as("mix_dev_num"),
        (col("dev_num").cast("double")
          / (col("T").cast("double") * col("n_docs").cast("double")))
          .as("mix_dev"),
        col("source").as("top_source"))
      .orderBy(col("shard"))
  }

  /** Loader-facing shard manifest with integrity checksums — the
    * per-shard lineage record a training run stores next to
    * [[writeShards]] output: `n_docs, n_tokens`, `pos_contiguous`
    * (positions are exactly 1..n_docs — a dropped or doubled row
    * breaks it), and `checksum` = the order-free sum of a 32-bit
    * md5-derived hash of each `(doc_id:pos)` pair, so ANY change to
    * the shard's membership OR its order moves the number, yet the
    * sum needs no per-shard collect (commutative — a plain aggregate
    * at any parallelism; int64-exact to 2^30 rows per shard). A
    * re-run of the same corpus must reproduce every checksum
    * bit-for-bit; a loader can re-derive and compare before training.
    */
  def shardManifest(docs: DataFrame, numShards: Int,
                    salt: String = "graft", idCol: String = "doc_id",
                    ntokCol: String = "n_tok"): DataFrame = {
    val rowHash = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":"),
          col("pos").cast("string"))), 1, 8), 16, 10)
      .cast("bigint")
    shardAssignments(docs, numShards, salt, idCol)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(ntokCol)).as("n_tokens"),
        (max(col("pos")) === count(lit(1)) && min(col("pos")) === 1)
          .as("pos_contiguous"),
        sum(rowHash).as("checksum"))
      .orderBy(col("shard"))
  }

  /** Per-group document cap (the RefinedWeb/C4 per-domain cap: no
    * single domain may dominate the corpus): keep at most `k` docs per
    * group, ranked by `orderCol` DESCENDING with ties broken by id
    * ascending — a deterministic total order, so the kept set is
    * exactly reproducible (and exactly SQL-recomputable, the q64
    * oracle). Output = the input rows that survive, plus their
    * `group_rank` (1-based).
    *
    * Scale: one hash exchange on the group key + an in-partition sort
    * — the minimum a per-group rank fundamentally needs. A
    * pathologically hot group (half the corpus one domain) makes that
    * group's partition large; the sort spills rather than OOMs, and
    * callers who only need the cap (not exact ranks) can pre-thin hot
    * groups with [[sample]] before ranking. Rank, don't groupBy-agg:
    * collecting a group's docs to one row is the anti-pattern.
    */
  def capPerGroup(df: DataFrame, groupCol: String, k: Int,
                  orderCol: String,
                  idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"cap must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    df.withColumn("group_rank", row_number().over(w).cast("bigint"))
      .filter(col("group_rank") <= k)
  }

  /** Priority sampling (Duffield, Lund, Thorup 2007): a weighted
    * WITHOUT-replacement sample of up to `k` rows per stratum with
    * near-optimal variance for subset-sum estimation — the principled
    * "sample big documents more, but keep an unbiased token-count
    * estimator" op (md5-threshold Bernoulli is unweighted; budget fill
    * is a hard cutoff, not an estimator).
    *
    * Each row gets priority p_i = w_i / u_i with u_i a deterministic
    * md5-derived uniform in (0, 1]; the k highest-priority rows per
    * stratum are kept, and each kept row carries the Horvitz-Thompson
    * adjusted weight max(w_i, tau) where tau is the stratum's (k+1)-th
    * priority (0 when the stratum has <= k rows). Summing adjusted
    * weights over the sample unbiasedly estimates the stratum's total
    * weight (the DLT theorem), which is what downstream mixture math
    * needs from a subsample.
    *
    * Cross-engine determinism (the q66 oracle recomputes everything in
    * SQL): u_i = (h_i + 1) / 2^52 with h_i = first 13 md5 hex digits of
    * the salted id, and the priority is evaluated as
    * (w * 2^52) / (h + 1). w * 2^52 multiplies an integer-valued
    * double by a power of two — exact in IEEE — so the single rounded
    * operation is the final division, which IEEE defines uniquely:
    * both engines produce the same 64 bits, and the order (priority
    * desc, id asc) is identical everywhere. No round() smoothing is
    * needed anywhere.
    *
    * Scale: same shape as [[capPerGroup]] — ONE stratum-keyed exchange
    * + spill-backed sort (rank, never a group collect); tau rides the
    * same ranked frame as a groups-sized broadcast join.
    */
  def prioritySample(df: DataFrame, k: Int, groupCol: String = "source",
                     weightCol: String = "n_chars",
                     idCol: String = "doc_id",
                     salt: String = "graft"): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(sampleKey(col(idCol), salt), 1, 13), 16, 10)
      .cast("bigint") + 1
    val priority = (col(weightCol).cast("double") *
      lit(4503599627370496.0)) / col("__h")  // w * 2^52 exact, one IEEE div
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__priority").desc, col(idCol).asc)
    // tau rides the SAME exchange: rank, keep k+1 rows per stratum, read
    // tau off the (k+1)-th with an unordered whole-partition max (the
    // second window reuses the first's partitioning — one shuffle total),
    // then drop the boundary row.
    val wg = Window.partitionBy(col(groupCol))
    df.withColumn("__h", h)
      .withColumn("__priority", priority)
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k + 1)
      .withColumn("__tau",
        max(when(col("__rank") === k + 1, col("__priority"))).over(wg))
      .filter(col("__rank") <= k)
      .select(col(idCol), col(groupCol),
        col(weightCol).cast("bigint").as("weight"),
        col("__priority").as("priority"),
        col("__rank").cast("bigint").as("sample_rank"),
        greatest(col(weightCol).cast("double"),
          coalesce(col("__tau"), lit(0.0))).as("adj_weight"))
  }

  /** Write `df` as `numShards` sorted training shards under `dir`
    * (parquet, `partitionBy(shard)`, rows in `pos` order within each
    * shard): the one shard-keyed exchange plus an in-partition sort,
    * then a straight write — the 100 TB shape.
    */
  def writeShards(df: DataFrame, dir: String, numShards: Int,
                  salt: String = "graft", idCol: String = "doc_id"): Unit =
    shardAssignments(df, numShards, salt, idCol)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  /** Per-stratum token budgets for a temperature-flattened domain
    * mixture at tau = 1/2 (the standard "sqrt scaling" that upweights
    * small domains): budget_s = floor(totalBudget * t_s / sum(t_s))
    * with t_s = floor(sqrt(sum of weight in stratum s)). Everything is
    * integer arithmetic over exactly-rounded IEEE sqrt/division, so any
    * engine reproduces the budgets bit-for-bit (the q55 oracle) —
    * a free-tau float power would differ in the last ulp across
    * engines. Output: (stratum, weight_total, budget).
    *
    * Scale: one tiny stratum aggregate; the normalizer joins in as a
    * one-row cross join (no driver collect).
    */
  /** Deterministic weighted interleave — the training-order contract
    * for a mixed-source corpus: sources are emitted round-robin with
    * `weight` slots per round (a weight-2 source appears twice as often
    * as a weight-1 source while both last), each source's docs in
    * md5-keyed reproducible-shuffle order.
    *
    * Emits `epoch_key`, a globally UNIQUE total-order key computed
    * per-row from (round, source offset, slot):
    * `round * W + offset(source) + slot` with W = total weight and
    * offset = cumulative weight of lexically-earlier sources. The
    * loader sorts by it (or range-partitions on it) — there is no
    * global row_number anywhere, so no single-partition sort at any
    * corpus size; the one exchange is the per-source rank. Keys have
    * HOLES once a source exhausts (its slots in later rounds go
    * unused): the order is what the contract promises, not density.
    *
    * `weight` must be a per-row expression that is CONSTANT within
    * each stratum and >= 1 (checked; strata-sized collect, bounded by
    * construction like every driver-side read in this engine).
    */
  def interleaveByWeights(df: DataFrame, weight: Column,
                          salt: String = "graft",
                          strataCol: String = "source",
                          idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val strata = df.groupBy(col(strataCol).as("__s"))
      .agg(max(weight.cast("long")).as("__wmax"),
        min(weight.cast("long")).as("__wmin"))
      .orderBy(col("__s")).collect()
    strata.foreach { r =>
      require(r.getLong(1) == r.getLong(2),
        s"interleave weight must be constant per stratum, ${r.get(0)} has " +
          s"[${r.getLong(2)}, ${r.getLong(1)}]")
      require(r.getLong(1) >= 1L,
        s"interleave weight must be >= 1, ${r.get(0)} has ${r.getLong(1)}")
    }
    val weights = strata.map(r => r.get(0) -> r.getLong(1))
    val total = weights.map(_._2).sum
    val offsets = weights.scanLeft(("", 0L)) { case ((_, acc), (s, w)) =>
      (s.toString, acc + w)
    }.init.map(_._2).zip(weights).map { case (off, (s, _)) => (s, off) }
    // sources-sized when-chain: offset of this row's stratum
    val offCol = offsets.tail.foldLeft(
      when(col(strataCol) === offsets.head._1, lit(offsets.head._2))) {
      case (acc, (s, off)) => acc.when(col(strataCol) === s, lit(off))
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__graft_key"), col(idCol))
    df.withColumn("__graft_key", sampleKey(col(idCol), salt))
      .withColumn("pos_in_source", row_number().over(w).cast("bigint"))
      .withColumn("epoch_key",
        ((col("pos_in_source") - 1) / weight.cast("long")).cast("long") *
          lit(total) + offCol +
          pmod(col("pos_in_source") - 1, weight.cast("long")))
      .drop("__graft_key")
  }

  /** Leakage-free train/validation split: the split key is the
    * near-dup CLUSTER, not the document, so two near-duplicates can
    * never land on opposite sides of the split (the classic eval-
    * contamination bug: a val doc whose near-copy sits in train scores
    * as memorization, not generalization).
    *
    * `labels` is a (id, cluster_id) frame — [[graft.operators.Dedup
    * .nearDupClusters]] output, whose cluster_id is the min doc id of
    * the component. Unlabeled docs are singletons keyed by their own
    * id, which is exactly the label a singleton component would get,
    * so the two cases share one key space. Split = md5 threshold on
    * the cluster rep (deterministic, engine-portable, the [[sample]]
    * rule applied to clusters).
    *
    * Scale: one id-keyed join (labels are the clustered subset, far
    * smaller than the corpus) + per-row hash — no shuffle beyond the
    * join, no collect.
    */
  def splitByCluster(docs: DataFrame, labels: DataFrame, valFrac: Double,
                     salt: String = "graft-split",
                     idCol: String = "doc_id"): DataFrame = {
    require(valFrac >= 0.0 && valFrac <= 1.0,
      s"valFrac must be in [0, 1], got $valFrac")
    val lab = labels.select(col("id").as(idCol), col("cluster_id"))
    docs.join(lab, Seq(idCol), "left")
      .withColumn("cluster_rep", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("split",
        when(sampleKey(col("cluster_rep"), salt) <
          lit(hexThreshold(valFrac)), lit("val"))
          .otherwise(lit("train")))
      .drop("cluster_id")
  }

  def mixtureBudgets(df: DataFrame, totalBudget: Long,
                     weightCol: String = "n_chars",
                     strataCol: String = "source"): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0")
    val p = df.groupBy(col(strataCol))
      .agg(sum(col(weightCol)).cast("bigint").as("weight_total"))
      .withColumn("__t", floor(sqrt(col("weight_total").cast("double"))))
    val tot = p.agg(sum(col("__t")).cast("bigint").as("__tot"))
    p.crossJoin(tot)
      .select(col(strataCol), col("weight_total"),
        floor((lit(totalBudget) * col("__t")).cast("double") / col("__tot"))
          .cast("bigint").as("budget"))
  }

  /** Resample `df` to the tau=1/2 temperature mixture: within each
    * stratum, keep docs in reproducible hash-key order until the
    * stratum's [[mixtureBudgets]] budget is filled (the
    * [[sampleByBudget]] prefix rule with data-dependent budgets). The
    * kept set is deterministic, retry-stable, and exactly
    * SQL-recomputable end to end.
    *
    * Scale: budgets are stratum-count-sized and broadcast into the
    * corpus join; the fill is the one stratum-keyed window shuffle.
    */
  def sampleToMixture(df: DataFrame, totalBudget: Long,
                      salt: String = "graft",
                      weightCol: String = "n_chars",
                      idCol: String = "doc_id",
                      strataCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budgets = mixtureBudgets(df, totalBudget, weightCol, strataCol)
      .select(col(strataCol), col("budget"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(sampleKey(col(idCol), salt), col(idCol))
    df.join(broadcast(budgets), Seq(strataCol))
      .withColumn("__graft_cum", sum(col(weightCol)).over(w))
      .filter(col("__graft_cum") <= col("budget"))
      .drop("__graft_cum", "budget")
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
