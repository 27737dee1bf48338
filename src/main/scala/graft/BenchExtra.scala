package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TokenDocGen

/** Isolation harness for the optimization rounds (guide §1.4): times
  * SINGLE operators on the same synthetic inputs the frozen Bench uses,
  * so a change's effect can be measured without a full bench run and
  * without touching the frozen harness. Each workload prints one line
  * per trial plus a min; nothing here feeds the driver contract —
  * `graft.Bench` stays the only official metrics source.
  *
  * Usage: sbt "runMain graft.BenchExtra [workload ...]"
  * (default: all). Workloads: b5, b10_batch, b10_inc, b11, b12,
  * b14, b15, b17, b18, b20_length, b21.
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def report(name: String, trials: Seq[Double],
                     note: String = ""): Unit =
    println(f"EXTRA $name%-18s min=${trials.min}%7.3f s  trials=" +
      trials.map(t => f"$t%.3f").mkString("[", ",", "]") +
      (if (note.nonEmpty) s"  $note" else ""))

  private def toText(df: DataFrame): DataFrame = df.select(
    regexp_extract(col("doc_id"), "(\\d+)$", 1).cast("long").as("doc_id"),
    concat_ws(" ", transform(col("tokens"), t => t.cast("string")))
      .as("text"),
    col("source"))

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val want: Set[String] =
      if (args.isEmpty) Set("all") else args.toSet
    def on(n: String): Boolean = want("all") || want(n)
    val spark = session(cpus)
    spark.sparkContext.setJobDescription("bench-extra")

    if (on("b5")) {
      val base5 = TokenDocGen.generateDf(spark, 50000, 7L, cpus)
      val planted = TokenDocGen.generateDf(spark, 500, 7L, cpus)
        .withColumn("doc_id", concat(col("doc_id"), lit("-copy")))
      val dedupDocs = base5.union(planted).cache()
      dedupDocs.count()
      var n = 0L
      val tr = (1 to 3).map { _ =>
        val (np, t) = time {
          operators.Dedup
            .minhashLshPairs(dedupDocs, 0.8, numBands = 16, rowsPerBand = 8)
            .count()
        }
        n = np; t
      }
      require(n >= 500, s"b5 recall broke: $n pairs")
      report("b5_minhash", tr, s"pairs=$n")
      dedupDocs.unpersist()
    }

    if (on("b10_batch") || on("b10_inc")) {
      val corpus = toText(TokenDocGen.generateDf(spark, 50000, 11L, cpus))
        .persist()
      val fresh = toText(TokenDocGen.generateDf(spark, 4500, 99L, cpus))
        .select((col("doc_id") + 50000L).as("doc_id"), col("text"),
          col("source"))
      val dups = corpus.filter(col("doc_id") < 500)
        .select((col("doc_id") + 54500L).as("doc_id"), col("text"),
          col("source"))
      val snap = fresh.union(dups).persist()
      corpus.count(); snap.count()
      if (on("b10_inc")) {
        val idxDir = java.nio.file.Files
          .createTempDirectory("graft-extra-idx").toString
        val (_, tIdx) = time {
          operators.Dedup.writeDedupIndex(corpus, idxDir,
            numBands = 16, rowsPerBand = 8)
        }
        var nInc = 0L
        val tr = (1 to 3).map { _ =>
          val (ni, t) = time {
            operators.Dedup.dedupIncremental(snap, idxDir, 0.8).count()
          }
          nInc = ni; t
        }
        require(nInc <= 4500 && nInc >= 4000, s"b10 inc kept $nInc")
        report("b10_index_build", Seq(tIdx))
        report("b10_incremental", tr, s"kept=$nInc")
      }
      if (on("b10_batch")) {
        var nBatch = 0L
        val tr = (1 to 3).map { _ =>
          val (nb, t) = time {
            operators.Dedup.dedupDocs(corpus.union(snap), threshold = 0.8,
              numBands = 16, rowsPerBand = 8).count()
          }
          nBatch = nb; t
        }
        require(nBatch <= 54500 && nBatch >= 50000, s"b10 batch $nBatch")
        report("b10_batch", tr, s"kept=$nBatch")
      }
      corpus.unpersist(); snap.unpersist()
    }

    if (on("b11")) {
      val evalDocs = toText(TokenDocGen.generateDf(spark, 10000, 22L, cpus))
        .drop("source").persist()
      val planted = evalDocs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"), col("text"))
      val train = toText(TokenDocGen.generateDf(spark, 200000, 21L, cpus))
        .drop("source").union(planted).persist()
      train.count(); evalDocs.count()
      var n = 0L
      val tr = (1 to 3).map { _ =>
        val (nf, t) = time {
          operators.Decontaminate.contaminated(train, evalDocs, n = 8)
            .count()
        }
        n = nf; t
      }
      report("b11_decon", tr, s"flagged=$n")
      train.unpersist(); evalDocs.unpersist()
    }

    if (on("b12")) {
      val baseFull = toText(TokenDocGen.generateDf(spark, 40000, 33L, cpus))
        .drop("source")
      def copies(src: DataFrame, n: Int): DataFrame =
        src.filter(col("doc_id") < n)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val full = baseFull.union(copies(baseFull, 400)).persist()
      val halfBase = baseFull.filter(col("doc_id") < 20000)
      val half = halfBase.union(copies(halfBase, 200)).persist()
      full.count(); half.count()
      operators.SpanDedup.duplicateSpans(half, minLen = 16).count() // warm
      var nh = 0L; var nf = 0L
      val hTr = collection.mutable.ArrayBuffer[Double]()
      val fTr = collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ =>
        val (h, th) = time {
          operators.SpanDedup.duplicateSpans(half, minLen = 16).count() }
        val (f, tf) = time {
          operators.SpanDedup.duplicateSpans(full, minLen = 16).count() }
        nh = h; nf = f; hTr += th; fTr += tf
      }
      require(nh > 0 && nf > nh, s"b12 spans: half=$nh full=$nf")
      report("b12_span_20k", hTr.toSeq, s"spans=$nh")
      report("b12_span_40k", fTr.toSeq, s"spans=$nf")
      full.unpersist(); half.unpersist()
    }

    if (on("b14")) {
      val ref = toText(TokenDocGen.generateDf(spark, 20000, 36L, cpus))
        .drop("source").persist()
      ref.count()
      val corpus = toText(TokenDocGen.generateDf(spark, 100000, 37L, cpus))
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .persist()
      corpus.count()
      val lmDir = java.nio.file.Files
        .createTempDirectory("graft-extra-lm").toString
      operators.LmScore.writeLmModel(ref, lmDir)
      val thr = operators.LmScore.scoreDocsVsModel(corpus, lmDir)
        .stat.approxQuantile("bits_per_bigram", Array(0.5), 0.001).head
      var nd = 0L
      val dTr = (1 to 3).map { _ =>
        val (n, t) = time {
          operators.LmScore.scoreDocs(corpus, ref, thr)
            .filter(col("keep")).count() }
        nd = n; t
      }
      var nm = 0L
      val mTr = (1 to 3).map { _ =>
        val (n, t) = time {
          operators.LmScore.scoreDocsVsModel(corpus, lmDir, thr)
            .filter(col("keep")).count() }
        nm = n; t
      }
      require(nd == nm, s"b14 disagree: $nd vs $nm")
      report("b14_direct", dTr, s"kept=$nd")
      report("b14_model", mTr)
      ref.unpersist(); corpus.unpersist()
    }

    if (on("b15")) {
      import operators.{Audit, Decontaminate, Dedup, TextAnalysis}
      val F = graft.functions.functions
      def toTextWx(df: DataFrame): DataFrame = df.select(
        regexp_extract(col("doc_id"), "(\\d+)$", 1).cast("long").as("doc_id"),
        concat_ws(" ", transform(col("tokens"),
          t => concat(lit("wx"), t.cast("string")))).as("text"))
      val docs = toTextWx(TokenDocGen.generateDf(spark, 30000, 51L, cpus))
        .persist()
      docs.count()
      val ev = toTextWx(TokenDocGen.generateDf(spark, 3000, 52L, cpus))
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
        .persist()
      ev.count()
      def audit(): Long =
        Audit.curationFunnel(Audit.curationAudit(docs, ev,
            contamN = 5, minStopwords = 0))
          .collect().map(r => r.getAs[String]("stage") ->
            r.getAs[Long]("n_docs")).toMap.getOrElse("kept", 0L)
      def pipeline(): Long = {
        val toksSize = size(org.apache.spark.sql.functions.filter(
          split(col("text"), " "), t => t =!= ""))
        val dup2 = when(toksSize - 1 >= 1,
          round(lit(1.0) -
            size(Decontaminate.wordNgrams(col("text"), 2)).cast("double") /
              (toksSize - 1).cast("double"), 4))
          .otherwise(lit(0.0))
        val quality = TextAnalysis.gopherQualityFlags(docs,
            minStopwords = 0, carry = Seq("text"))
          .filter(col("keep") && dup2 <= 0.2)
          .select(col("doc_id"), col("text"))
        val exact = quality.join(Dedup.exactDropIds(quality),
          Seq("doc_id"), "left_anti")
        val toks = exact.select(col("doc_id"),
          F.tokenize(col("text")).as("tokens"))
        val near = exact.join(
          Dedup.nearDupDropIdsCC(Dedup.minhashLshPairs(toks, 0.9, 32, 4)
            .select(col("a"), col("b"))),
          Seq("doc_id"), "left_anti")
        near.join(
          Decontaminate.contaminated(near, ev, 5, 1).select(col("doc_id")),
          Seq("doc_id"), "left_anti").count()
      }
      audit(); pipeline() // warm
      var na = 0L; var np = 0L
      val aTr = collection.mutable.ArrayBuffer[Double]()
      val pTr = collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ =>
        val (a, ta) = time(audit())
        val (p, tp) = time(pipeline())
        na = a; np = p; aTr += ta; pTr += tp
      }
      require(na == np, s"b15 disagree: $na vs $np")
      report("b15_audit", aTr.toSeq, s"kept=$na")
      report("b15_pipeline", pTr.toSeq)
      docs.unpersist(); ev.unpersist()
    }

    if (on("b17") || on("b18")) {
      val docs = TokenDocGen.generateDf(spark, 100000, 61L, cpus)
        .select(
          regexp_extract(col("doc_id"), "(\\d+)$", 1).cast("long").as("id"),
          concat(lit("s"),
            (regexp_extract(col("doc_id"), "(\\d+)$", 1).cast("long") % 16)
              .cast("string")).as("source"),
          concat_ws(" ", transform(col("tokens"), t => t.cast("string")))
            .as("text"))
        .persist()
      docs.count()
      if (on("b17")) {
        operators.TextAnalysis.sourceOverlapMatrix(docs, 3, 4096,
          withExact = false).collect() // warm
        val sTr = (1 to 3).map(_ => time {
          operators.TextAnalysis.sourceOverlapMatrix(docs, 3, 4096,
            withExact = false).collect() }._2)
        val eTr = (1 to 3).map(_ => time {
          operators.TextAnalysis.sourceOverlapMatrix(docs, 3, 4096)
            .collect() }._2)
        report("b17_theta", sTr)
        report("b17_exact", eTr)
      }
      if (on("b18")) {
        operators.TextAnalysis.tokenMassOverlap(docs, 3, 4096,
          withExact = false).collect() // warm
        val sTr = (1 to 3).map(_ => time {
          operators.TextAnalysis.tokenMassOverlap(docs, 3, 4096,
            withExact = false).collect() }._2)
        val eTr = (1 to 3).map(_ => time {
          operators.TextAnalysis.tokenMassOverlap(docs, 3, 4096)
            .collect() }._2)
        report("b18_tuple", sTr)
        report("b18_exact", eTr)
      }
      docs.unpersist()
    }

    if (on("b20_length")) {
      def toTextWx(df: DataFrame): DataFrame = df.select(
        concat_ws(" ", transform(col("tokens"),
          t => concat(lit("wx"), t.cast("string")))).as("text"))
      val a = toTextWx(TokenDocGen.generateDf(spark, 200000, 71L, cpus))
        .persist()
      val b = toTextWx(TokenDocGen.generateDf(spark, 200000, 72L, cpus))
        .persist()
      a.count(); b.count()
      operators.Drift.lengthDrift(a, b).head() // warm
      val tr = (1 to 3).map(_ => time {
        operators.Drift.lengthDrift(a, b).head() }._2)
      report("b20_length", tr)
      a.unpersist(); b.unpersist()
    }

    if (on("b21")) {
      def toT(df: DataFrame): DataFrame = df.select(
        regexp_extract(col("doc_id"), "(\\d+)$", 1).cast("long").as("doc_id"),
        concat_ws(" ", transform(col("tokens"), t => t.cast("string")))
          .as("text"))
      val sets = toT(TokenDocGen.generateDf(spark, 20000, 23L, cpus))
        .withColumn("set_id",
          concat(lit("set"), (col("doc_id") % 8).cast("string")))
        .persist()
      val planted = sets.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 400000L).as("doc_id"), col("text"))
      val train = toT(TokenDocGen.generateDf(spark, 200000, 24L, cpus))
        .union(planted).persist()
      sets.count(); train.count()
      import operators.Decontaminate
      Decontaminate.contaminatedMulti(train, sets, n = 8).count() // warm
      val mTr = (1 to 2).map(_ => time {
        Decontaminate.contaminatedMulti(train, sets, n = 8).count() }._2)
      val setIds = (0 until 8).map(i => s"set$i")
      val sTr = (1 to 2).map(_ => time { setIds.map { sid =>
        Decontaminate.contaminated(train,
          sets.filter(col("set_id") === sid), n = 8).count() }.sum }._2)
      report("b21_multi", mTr)
      report("b21_singles", sTr)
      sets.unpersist(); train.unpersist()
    }

    spark.stop()
  }
}
