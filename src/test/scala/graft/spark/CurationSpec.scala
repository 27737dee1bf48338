package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Decontaminate, LmScore, Sampling}

/** Unit tests for the round-5 curation additions: LM quality scoring,
  * deterministic shard assignment, fractional contamination scores, and
  * temperature-mixture resampling — hand-computed fixtures plus the
  * determinism / plan properties each op promises.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // ---------------- LM scoring ----------------

  test("wordNgramsAll keeps duplicates in position order") {
    val out = Seq(("a b a b"))
      .toDF("text")
      .select(graft.functions.expressions.word_ngrams_all(col("text"), 2))
      .head().getSeq[String](0)
    assert(out == Seq("a b", "b a", "a b"))
    val empty = Seq(("a")).toDF("text")
      .select(graft.functions.expressions.word_ngrams_all(col("text"), 2))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  // ref unigrams: a:3 b:2 c:1 (V=3); bigrams: "a b":2 "b a":1 "a c":1
  private def lmRef = Seq(
    (100L, "a b a c"), (101L, "a b")).toDF("doc_id", "text")

  test("LM score: hand-computed bucketed bits") {
    val docs = Seq((1L, "a b c"), (2L, "zzz"), (3L, "")).toDF("doc_id", "text")
    val out = LmScore.scoreDocs(docs, lmRef).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "a b": blog2(3+3)-blog2(2+1) = 2-1 = 1; "b c": blog2(2+3)-blog2(0+1)
    // = 2-0 = 2 -> sum 3 over 2 bigrams
    assert(out(1L).getAs[Long]("n_bigrams") == 2L)
    assert(out(1L).getAs[Long]("sum_bits") == 3L)
    assert(out(1L).getAs[Double]("bits_per_bigram") == 1.5)
    assert(out(1L).getAs[Boolean]("keep"))
    for (id <- Seq(2L, 3L)) {
      assert(out(id).getAs[Long]("n_bigrams") == 0L)
      assert(out(id).getAs[Long]("sum_bits") == 0L)
      assert(out(id).isNullAt(out(id).fieldIndex("bits_per_bigram")))
      assert(!out(id).getAs[Boolean]("keep"))
    }
  }

  test("LM precise score matches direct computation") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = LmScore.scoreDocsPrecise(docs, lmRef).head()
    val expected =
      ((math.log(6) - math.log(3)) + (math.log(5) - math.log(1))) / 2
    assert(math.abs(out.getAs[Double]("avg_nll") - expected) < 1e-12)
  }

  test("bucketed bits within 1 bit of precise NLL on random docs") {
    val rnd = new scala.util.Random(7)
    def doc(i: Int) = (i.toLong,
      Seq.fill(10 + rnd.nextInt(20))(s"w${rnd.nextInt(50)}").mkString(" "))
    val ref = (0 until 30).map(doc).toDF("doc_id", "text")
    val docs = (100 until 130).map(doc).toDF("doc_id", "text")
    val bits = LmScore.scoreDocs(docs, ref).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bits_per_bigram"))
      .toMap
    val precise = LmScore.scoreDocsPrecise(docs, ref).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    assert(bits.nonEmpty)
    // per-term bucket error is in (-1, 1) bits, so the averages agree
    // within a bit — the ranking-preservation contract of the bucketing
    bits.foreach { case (id, b) =>
      assert(math.abs(b - precise(id) / math.log(2)) < 1.0,
        s"doc $id: bucketed $b vs precise ${precise(id) / math.log(2)}")
    }
  }

  test("persisted LM model: batched build+append == direct scoring") {
    val rnd = new scala.util.Random(11)
    def doc(i: Int) = (i.toLong,
      Seq.fill(10 + rnd.nextInt(20))(s"w${rnd.nextInt(40)}").mkString(" "))
    val refA = (0 until 20).map(doc).toDF("doc_id", "text")
    val refB = (20 until 45).map(doc).toDF("doc_id", "text")
    val docs = (100 until 140).map(doc).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    LmScore.writeLmModel(refA, dir)
    LmScore.appendToLmModel(refB, dir, batchId = 1L)
    val direct = LmScore.scoreDocs(docs, refA.union(refB)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val vsModel = LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(vsModel.toSeq == direct.toSeq)
    // exactly-once: re-appending the same batchId is a no-op
    LmScore.appendToLmModel(refB, dir, batchId = 1L)
    val again = LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(again.toSeq == direct.toSeq)
  }

  test("shardManifest: reproducible checksums, membership-sensitive") {
    val docs = (0 until 120).map(i => (i.toLong, 5 + i % 7))
      .toDF("doc_id", "n_tok")
    val m1 = Sampling.shardManifest(docs, 4, "t2").collect()
    // bit-for-bit reproducible at any input partitioning
    val m2 = Sampling.shardManifest(docs.repartition(7), 4, "t2").collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.length == 4)
    assert(m1.forall(_.getAs[Boolean]("pos_contiguous")))
    assert(m1.map(_.getAs[Long]("n_docs")).sum == 120L)
    // dropping one doc moves exactly ITS shard's checksum (positions
    // in other shards are untouched by construction)
    val dropped = Sampling
      .shardManifest(docs.filter(col("doc_id") =!= 57L), 4, "t2")
      .collect()
    val ch1 = m1.map(r => r.getAs[Int]("shard") ->
      r.getAs[Long]("checksum")).toMap
    val ch2 = dropped.map(r => r.getAs[Int]("shard") ->
      r.getAs[Long]("checksum")).toMap
    assert(ch1.keySet == ch2.keySet)
    assert(ch1.count { case (s, c) => ch2(s) != c } == 1)
  }

  test("contaminatedMulti equals per-set single-set runs, one pass") {
    import graft.operators.Decontaminate
    val rnd = new scala.util.Random(17)
    def doc(i: Int) = (i.toLong,
      Seq.fill(12 + rnd.nextInt(10))(s"w${rnd.nextInt(30)}").mkString(" "))
    val train = (0 until 60).map(doc).toDF("doc_id", "text")
    val evA = (100 until 110).map(doc).toDF("doc_id", "text")
    val evB = (200 until 210).map(doc).toDF("doc_id", "text")
    val sets = evA.withColumn("set_id", lit("A"))
      .unionByName(evB.withColumn("set_id", lit("B")))
    val multi = Decontaminate.contaminatedMulti(train, sets, n = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("set_id"),
        r.getAs[Long]("n_overlap"))).toSet
    def single(ev: org.apache.spark.sql.DataFrame, tag: String) =
      Decontaminate.contaminated(train, ev, n = 2).collect()
        .map(r => (r.getAs[Long]("doc_id"), tag,
          r.getAs[Long]("n_overlap"))).toSet
    assert(multi == single(evA, "A") ++ single(evB, "B"))
    assert(multi.nonEmpty, "fixture must produce overlaps")
  }

  test("shardBalance: brute-force reconciliation, single-source dev is 0") {
    val docs = (0 until 200).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", 10 + i % 5))
      .toDF("doc_id", "source", "n_tok")
    val bal = Sampling.shardBalance(docs, 4, "t1").collect()
    assert(bal.length == 4)
    assert(bal.map(_.getAs[Long]("n_docs")).sum == 200L)
    assert(bal.map(_.getAs[Long]("n_tokens")).sum ==
      (0 until 200).map(10 + _ % 5).sum.toLong)
    // brute-force the mix deviation from the raw assignments
    val asg = Sampling.shardAssignments(docs, 4, "t1").collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[String]("source")))
    val bySh = asg.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val bySrc = asg.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val T = asg.length.toLong
    bal.foreach { r =>
      val sh = r.getAs[Int]("shard")
      val devs = bySrc.keys.toSeq.sorted.map { s =>
        val cSs = asg.count(p => p._1 == sh && p._2 == s).toLong
        s -> math.abs(cSs * T - bySrc(s) * bySh(sh))
      }
      val maxDev = devs.map(_._2).max
      val topSrc = devs.filter(_._2 == maxDev).map(_._1).min
      assert(r.getAs[Long]("mix_dev_num") == maxDev, s"shard $sh")
      assert(r.getAs[String]("top_source") == topSrc, s"shard $sh")
      assert(r.getAs[Double]("size_ratio") ==
        (bySh(sh) * 4L).toDouble / T.toDouble)
    }
    // one source: every shard's mix IS the corpus mix, exactly
    val one = (0 until 100).map(i => (i.toLong, "x", 7))
      .toDF("doc_id", "source", "n_tok")
    Sampling.shardBalance(one, 4, "t1").collect().foreach { r =>
      assert(r.getAs[Long]("mix_dev_num") == 0L)
      assert(r.getAs[Double]("mix_dev") == 0.0)
    }
  }

  test("LM model drift gate: off-distribution batch refused, in-dist passes") {
    val rnd = new scala.util.Random(13)
    def doc(i: Int, pfx: String) = (i.toLong,
      Seq.fill(200)(s"$pfx${rnd.nextInt(40)}").mkString(" "))
    val refA = (0 until 50).map(doc(_, "w")).toDF("doc_id", "text")
    val refB = (50 until 80).map(doc(_, "w")).toDF("doc_id", "text")
    val alien = (0 until 30).map(doc(_, "z")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-gate").toString
    LmScore.writeLmModel(refA, dir)
    spark.conf.set("spark.graft.lm.driftAction", "refuse")
    try {
      // same law: sampling noise sits far under the tolerance
      LmScore.appendToLmModel(refB, dir, batchId = 1L)
      assert(spark.read.parquet(s"$dir/batches").collect()
        .map(_.getAs[Long]("batch_id")).contains(1L))
      // disjoint vocabulary: head-TV = 1.0, refused BEFORE any write
      val ex = intercept[IllegalStateException] {
        LmScore.appendToLmModel(alien, dir, batchId = 2L)
      }
      assert(ex.getMessage.contains("drift gate"))
      assert(!spark.read.parquet(s"$dir/batches").collect()
        .map(_.getAs[Long]("batch_id")).contains(2L))
      // explicit override appends it
      spark.conf.set("spark.graft.lm.driftAction", "off")
      LmScore.appendToLmModel(alien, dir, batchId = 2L)
      assert(spark.read.parquet(s"$dir/batches").collect()
        .map(_.getAs[Long]("batch_id")).contains(2L))
      // a model written before the baseline existed gates as off
      val legacy = java.nio.file.Files
        .createTempDirectory("graft-lm-legacy").toString
      LmScore.writeLmModel(refA, legacy)
      val p = new org.apache.hadoop.fs.Path(s"$legacy/drift_baseline")
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      spark.conf.set("spark.graft.lm.driftAction", "refuse")
      LmScore.appendToLmModel(alien, legacy, batchId = 1L) // must not throw
      assert(spark.read.parquet(s"$legacy/batches").collect()
        .map(_.getAs[Long]("batch_id")).contains(1L))
    } finally spark.conf.unset("spark.graft.lm.driftAction")
  }

  test("LM model crash recovery: uncommitted batch ignored, re-run heals") {
    val refA = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val refB = Seq((2L, "c d c d e")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b c d")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lmc").toString
    LmScore.writeLmModel(refA, dir)
    val before = LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // simulate a crash AFTER batch data landed but BEFORE the commit
    // row: write the partition dirs by hand, no batches append
    LmScore.bigramCounts(refB)
      .write.mode("overwrite").parquet(s"$dir/big/batch_id=7")
    LmScore.unigramCounts(refB)
      .write.mode("overwrite").parquet(s"$dir/uni/batch_id=7")
    // the reader must NOT see the uncommitted partition
    assert(LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq == before)
    // the retried append overwrites the leftover and commits it
    LmScore.appendToLmModel(refB, dir, batchId = 7L)
    val healed = LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val direct = LmScore.scoreDocs(docs, refA.union(refB)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(healed.toSeq == direct.toSeq)
  }

  test("order-3 LM score: hand-computed bucketed bits") {
    // ref "a b c a b c": words a:2 b:2 c:2 (V=3); contexts "a b":2
    // "b c":2 "c a":1; trigrams "a b c":2 "b c a":1 "c a b":1
    val ref = Seq((100L, "a b c a b c")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b c"), (2L, "b c c"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = LmScore.scoreDocs(docs, ref, 12.0, order = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "a b c": blog2(2+3) - blog2(2+1) = 2 - 1 = 1
    assert(out(1L).getAs[Long]("n_bigrams") == 1L)
    assert(out(1L).getAs[Long]("sum_bits") == 1L)
    // "b c c" unseen: blog2(2+3) - blog2(0+1) = 2 - 0 = 2
    assert(out(2L).getAs[Long]("sum_bits") == 2L)
    // two words cannot carry a trigram
    assert(out(3L).getAs[Long]("n_bigrams") == 0L)
    assert(!out(3L).getAs[Boolean]("keep"))
  }

  test("order-5 persisted model: append, local scorer, compaction all agree") {
    val rnd = new scala.util.Random(29)
    def doc(i: Int) = (i.toLong,
      Seq.fill(5 + rnd.nextInt(20))(s"w${rnd.nextInt(12)}").mkString(" "))
    val refA = (0 until 25).map(doc).toDF("doc_id", "text")
    val refB = (25 until 50).map(doc).toDF("doc_id", "text")
    val docRows = (100 until 130).map(doc) ++ Seq((200L, "w1 w2 w3 w4"))
    val docs = docRows.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lm5").toString
    LmScore.writeLmModel(refA, dir, order = 5)
    LmScore.appendToLmModel(refB, dir, batchId = 1L)
    def scores() = LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val direct = LmScore.scoreDocs(docs, refA.union(refB), 12.0, order = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(scores() == direct, "model path must equal direct order-5")
    // 4 words carry no 5-gram
    assert(direct.find(_._1 == 200L).get._2 == 0L)
    val local = LmScore.loadLmModelLocal(spark, dir)
    assert(local.order == 5)
    docRows.foreach { case (id, text) =>
      val (n, sum) = local.score(text)
      val row = direct.find(_._1 == id).get
      assert((n, sum) == ((row._2, row._3)), s"local scorer at doc $id")
    }
    // compaction folds the words/ table too (V must survive exactly:
    // distinct across batches, not summed)
    LmScore.compactLmModel(spark, dir)
    assert(scores() == direct, "compaction must not change order-5 answers")
    val wordDirs = new java.io.File(s"$dir/words").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(wordDirs == Seq("batch_id=2"), s"words dirs: $wordDirs")
  }

  test("loadLmModelLocal refuses an over-limit model loudly (driver guard)") {
    val ref = Seq((1L, "a b c d e"), (2L, "b c d e f")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lmg").toString
    LmScore.writeLmModel(ref, dir)
    // 6 unigrams + 8 bigrams > 3: must refuse loudly, naming the conf
    // and pointing at the relational path (never a silent driver OOM)
    spark.conf.set("spark.graft.lm.maxLocalModelEntries", "3")
    try {
      val e = intercept[IllegalArgumentException](
        LmScore.loadLmModelLocal(spark, dir))
      assert(e.getMessage.contains("scoreDocsVsModel"), e.getMessage)
      assert(e.getMessage.contains("maxLocalModelEntries"), e.getMessage)
    } finally spark.conf.unset("spark.graft.lm.maxLocalModelEntries")
    // within the limit the load works as before
    assert(LmScore.loadLmModelLocal(spark, dir).order == 2)
  }

  test("compactLmModel: one folded batch, same answers, appends keep working") {
    val rnd = new scala.util.Random(13)
    def doc(i: Int) = (i.toLong,
      Seq.fill(10 + rnd.nextInt(20))(s"w${rnd.nextInt(40)}").mkString(" "))
    val refA = (0 until 15).map(doc).toDF("doc_id", "text")
    val refB = (15 until 30).map(doc).toDF("doc_id", "text")
    val refC = (30 until 50).map(doc).toDF("doc_id", "text")
    val docs = (100 until 130).map(doc).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lmf").toString
    LmScore.writeLmModel(refA, dir)
    LmScore.appendToLmModel(refB, dir, batchId = 1L)
    def scores() = LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val before = scores()
    LmScore.compactLmModel(spark, dir)
    assert(scores() == before, "compaction must not change answers")
    // the log holds ONE batch and the folded dirs are gone
    val committed = spark.read.parquet(s"$dir/batches").collect()
      .map(_.getAs[Long]("batch_id")).toSeq
    assert(committed == Seq(2L))
    val uniDirs = new java.io.File(s"$dir/uni").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(uniDirs == Seq("batch_id=2"), s"folded batch dirs must be GC'd: $uniDirs")
    // compaction is idempotent when there is nothing to fold
    LmScore.compactLmModel(spark, dir)
    assert(scores() == before)
    assert(spark.read.parquet(s"$dir/batches").count() == 1L)
    // appends after compaction: the folded batch is just a big batch
    LmScore.appendToLmModel(refC, dir, batchId = 3L)
    val direct = LmScore.scoreDocs(docs, refA.union(refB).union(refC))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(scores() == direct)
  }

  test("append replay of a FOLDED batch stays a no-op (exactly-once across compaction)") {
    val refA = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val refB = Seq((2L, "c d c d e")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b c d")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lmr").toString
    LmScore.writeLmModel(refA, dir)
    LmScore.appendToLmModel(refB, dir, batchId = 1L)
    LmScore.compactLmModel(spark, dir) // folds {0,1} -> 2
    val want = LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // a crashed orchestrator replays the append of batch 1 AFTER the
    // compaction folded it away: without the fold high-water mark this
    // re-commits refB's counts and silently doubles them
    LmScore.appendToLmModel(refB, dir, batchId = 1L)
    val after = LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(after == want, "replayed folded append must not double-count")
    assert(spark.read.parquet(s"$dir/batches").count() == 1L)
    // a genuinely NEW batch id above the mark still appends fine
    LmScore.appendToLmModel(refB, dir, batchId = 9L)
    val direct = LmScore
      .scoreDocs(docs, refA.union(refB).union(refB)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      == direct)
  }

  test("compactLmModel crash windows: staged log rolls forward, pre-switch crash redoes") {
    val refA = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val refB = Seq((2L, "c d c d e")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b c d")).toDF("doc_id", "text")
    def scores(dir: String) = LmScore.scoreDocsVsModel(docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // (a) crash INSIDE the switch: batches deleted, batches.next staged
    // -> the next reader rolls the log forward and answers correctly
    val dirA = java.nio.file.Files.createTempDirectory("graft-lmx").toString
    LmScore.writeLmModel(refA, dirA)
    LmScore.appendToLmModel(refB, dirA, batchId = 1L)
    val want = scores(dirA)
    import org.apache.hadoop.fs.Path
    val fs = new Path(dirA).getFileSystem(
      spark.sessionState.newHadoopConf())
    spark.read.parquet(s"$dirA/uni")
      .filter(col("batch_id").isin(0L, 1L))
      .groupBy(col("w")).agg(sum(col("c1")).as("c1"))
      .write.parquet(s"$dirA/uni/batch_id=2")
    spark.read.parquet(s"$dirA/big")
      .filter(col("batch_id").isin(0L, 1L))
      .groupBy(col("ng")).agg(sum(col("c2")).as("c2"))
      .write.parquet(s"$dirA/big/batch_id=2")
    Seq((2L, 1L)).toDF("batch_id", "folded_up_to")
      .coalesce(1).write.parquet(s"$dirA/batches.next")
    fs.delete(new Path(s"$dirA/batches"), true) // crash point
    assert(scores(dirA) == want, "reader must roll the staged log forward")
    assert(spark.read.parquet(s"$dirA/batches").collect()
      .map(_.getAs[Long]("batch_id")).toSeq == Seq(2L))
    // (b) crash BEFORE the switch: staged log beside the live one -> the
    // staged copy is dropped and a re-run compaction converges
    val dirB = java.nio.file.Files.createTempDirectory("graft-lmy").toString
    LmScore.writeLmModel(refA, dirB)
    LmScore.appendToLmModel(refB, dirB, batchId = 1L)
    Seq((2L, 1L)).toDF("batch_id", "folded_up_to")
      .coalesce(1).write.parquet(s"$dirB/batches.next") // crash point
    assert(scores(dirB) == want, "stale staged log must be ignored")
    LmScore.compactLmModel(spark, dirB)
    assert(scores(dirB) == want)
    assert(spark.read.parquet(s"$dirB/batches").count() == 1L)
  }

  test("LocalLmModel row-local scoring is bit-identical to the relational path") {
    val rnd = new scala.util.Random(17)
    def doc(i: Int) = (i.toLong,
      Seq.fill(2 + rnd.nextInt(25))(s"w${rnd.nextInt(40)}").mkString(" "))
    val ref = (0 until 25).map(doc).toDF("doc_id", "text")
    val docRows = (100 until 140).map(doc) ++
      Seq((200L, "oneword"), (201L, ""), (202L, "  "))
    val docs = docRows.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lml").toString
    LmScore.writeLmModel(ref, dir)
    val local = LmScore.loadLmModelLocal(spark, dir)
    val relational = LmScore.scoreDocsVsModel(docs, dir, 4.67).collect()
    assert(relational.nonEmpty)
    relational.foreach { r =>
      val text = docRows.find(_._1 == r.getAs[Long]("doc_id")).get._2
      val (n, sum) = local.score(text)
      assert(n == r.getAs[Long]("n_bigrams"), s"n_bigrams at $text")
      assert(sum == r.getAs[Long]("sum_bits"), s"sum_bits at $text")
      val bpb = local.bitsPerBigram(text)
      if (r.isNullAt(r.fieldIndex("bits_per_bigram"))) assert(bpb.isEmpty)
      else assert(bpb.contains(r.getAs[Double]("bits_per_bigram")))
      assert(local.keep(text, 4.67) == r.getAs[Boolean]("keep"))
    }
  }

  // ---------------- curation audit ----------------

  test("curation audit: planted docs land in their stages; funnel sums") {
    import graft.operators.Audit
    def words(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d")
    // each doc engineered to fail exactly one stage (or none):
    val good = ("the" +: "of" +: words("wd", 58)).mkString(" ")
    val tooShort = "the of wd01 wd02 wd03" // < 50 words -> gopher
    val nearDup = // good's 60 words + 3 fresh -> J = 60/63 ~ 0.95
      (("the" +: "of" +: words("wd", 58)) ++ Seq("zx01", "zx02", "zx03"))
        .mkString(" ")
    val repet = // passes gopher, dup_2gram ~ 0.92
      ("the" +: "of" +: Seq.fill(25)(Seq("abcd", "efgh")).flatten)
        .mkString(" ")
    val contamDoc = // carries an eval trigram, else clean
      (("the" +: "of" +: words("xd", 55)) ++
        Seq("alpha", "beta", "gamma")).mkString(" ")
    val docs = Seq((1L, good), (2L, tooShort), (3L, good), (4L, nearDup),
      (5L, contamDoc), (6L, repet)).toDF("doc_id", "text")
    val evalDocs = Seq((100L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val audit = Audit.curationAudit(docs, evalDocs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def reason(id: Long) = audit(id).getAs[String]("drop_reason")
    assert(audit(1L).getAs[Boolean]("keep"))
    assert(audit(1L).isNullAt(audit(1L).fieldIndex("drop_reason")))
    assert(reason(2L) == "gopher")
    assert(reason(3L) == "dup_exact") // the copy with the larger id
    assert(reason(4L) == "dup_near")
    assert(reason(5L) == "contaminated")
    assert(reason(6L) == "repetition")
    // sequential populations: a quality-dropped doc never reaches the
    // dedup tiers, so its corpus-dependent flags stay false
    assert(!audit(2L).getAs[Boolean]("dup_exact"))
    assert(!audit(2L).getAs[Boolean]("dup_near"))
    assert(!audit(6L).getAs[Boolean]("contaminated"))
    val funnel = Audit.curationFunnel(
        Audit.curationAudit(docs, evalDocs)).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(funnel == Map("kept" -> 1L, "gopher" -> 1L,
      "repetition" -> 1L, "dup_exact" -> 1L, "dup_near" -> 1L,
      "contaminated" -> 1L))
  }

  // ---------------- blocklist screen ----------------

  test("blocklist: word-level, case-insensitive, null text clean") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "the Bad word bad one"),   // 2 hits of 'bad' (mixed case)
      (2L, "badge embadded badword"), // substrings must NOT hit
      (3L, "worse things"),           // second list word
      (4L, null.asInstanceOf[String]),
      (5L, "clean doc")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFlags(docs, Seq("BAD", "worse"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[String]("matched"),
          r.getAs[Boolean]("keep")))).toMap
    assert(out(1L) == ((2L, "bad", false)))
    assert(out(2L) == ((0L, "", true))) // word-level: no substring hits
    assert(out(3L) == ((1L, "worse", false)))
    assert(out(4L) == ((0L, "", true)))
    assert(out(5L) == ((0L, "", true)))
    // multiple distinct matches sort
    val m = TextAnalysis.blocklistFlags(
        Seq((9L, "worse bad worse")).toDF("doc_id", "text"),
        Seq("bad", "worse"))
      .head()
    assert(m.getAs[Long]("n_hits") == 3L)
    assert(m.getAs[String]("matched") == "bad,worse")
  }

  test("blocklist phrases: consecutive words only, overlaps count") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a Very Bad phrase here"),   // phrase hit (mixed case)
      (2L, "very phrase bad here"),     // words present, NOT consecutive
      (3L, "bad bad bad"),              // overlapping "bad bad" twice
      (4L, "very bad and bad too")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFlags(docs,
        Seq("very bad", "bad bad"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[String]("matched")))).toMap
    assert(out(1L) == ((1L, "very bad")))
    assert(out(2L) == ((0L, "")))
    assert(out(3L) == ((2L, "bad bad"))) // start positions 0 and 1
    assert(out(4L) == ((1L, "very bad")))
    // mixed single + phrase entries on one pass, both lengths hit
    val mixed = TextAnalysis.blocklistFlags(
        Seq((9L, "x very bad x")).toDF("doc_id", "text"),
        Seq("x", "very bad")).head()
    assert(mixed.getAs[Long]("n_hits") == 3L)
    assert(mixed.getAs[String]("matched") == "very bad,x")
  }

  test("blocklist plan: one kernel projection, no UDF, no exchange") {
    import graft.operators.TextAnalysis
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalysis.blocklistFlags(docs, Seq("dup", "vector"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("graft_blocklist_matches"), plan)
  }

  // ---------------- within-doc line dedup ----------------

  test("dedupLinesWithin: first occurrence kept in order") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "c\na\nc\nb\na\nc"),
      (2L, "only line"),
      (3L, ""),                          // one empty line, kept
      (4L, null.asInstanceOf[String]),   // null == empty
      (5L, "x\n\nx\n\ny")).toDF("doc_id", "text") // empty lines dedup too
    val out = TextAnalysis.dedupLinesWithin(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_deduped"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_lines_removed")))).toMap
    assert(out(1L) == (("c\na\nb", 6L, 3L)))
    assert(out(2L) == (("only line", 1L, 0L)))
    assert(out(3L) == (("", 1L, 0L)))
    assert(out(4L) == (("", 1L, 0L)))
    assert(out(5L) == (("x\n\ny", 5L, 2L)))
  }

  test("dedupLinesWithin plan: builtin projection, no UDF, no exchange") {
    import graft.operators.TextAnalysis
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalysis.dedupLinesWithin(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  // ---------------- per-group caps ----------------

  test("capPerGroup: top-k by score, deterministic tie-break") {
    import graft.operators.Sampling
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 5L),
      (5L, "b", 7L)).toDF("doc_id", "source", "n_chars")
    val kept = Sampling.capPerGroup(docs, "source", 2, "n_chars")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("group_rank"))).toSet
    // ties on 30 break to the smaller id: 2 then 3; 10 and 5 capped out
    assert(kept == Set((2L, 1L), (3L, 2L), (5L, 1L)))
    // exactly ONE exchange (the group-key hash partitioning the rank
    // fundamentally needs)
    val plan = Sampling.capPerGroup(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "source", 3, "n_chars")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  // ---------------- priority sampling ----------------

  test("prioritySample: HT adjusted weights, exact when stratum fits") {
    import graft.operators.Sampling
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 50L), (3L, "a", 10L), (4L, "a", 200L),
      (5L, "b", 7L), (6L, "b", 9L)).toDF("doc_id", "source", "n_chars")
    // k >= stratum size: every row kept, tau absent -> adj_weight == w,
    // so the HT estimator is EXACT (sum == stratum total)
    val all = Sampling.prioritySample(docs, k = 10)
    val sums = all.groupBy("source").agg(sum("adj_weight")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums == Map("a" -> 360.0, "b" -> 16.0))
    // k = 2 on stratum a: tau is the 3rd priority; every kept row's
    // adj_weight >= its own weight and >= tau by construction
    val two = Sampling.prioritySample(docs, k = 2)
      .filter(col("source") === "a").collect()
    assert(two.length == 2)
    val ranked = Sampling.prioritySample(docs, k = 10)
      .filter(col("source") === "a")
      .orderBy(col("sample_rank")).collect()
    val tau = ranked(2).getAs[Double]("priority") // 3rd priority
    two.foreach { r =>
      assert(r.getAs[Double]("adj_weight") ==
        math.max(r.getAs[Long]("weight").toDouble, tau))
    }
    // kept ids are the top-2 of the full ranking (without-replacement
    // prefix property)
    assert(two.map(_.getAs[Long]("doc_id")).toSet ==
      ranked.take(2).map(_.getAs[Long]("doc_id")).toSet)
  }

  test("prioritySample: retry/partitioning-stable, one exchange, no UDF") {
    import graft.operators.Sampling
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Sampling.prioritySample(docs, k = 5).collect().toSet
    val b = Sampling.prioritySample(docs.repartition(7), k = 5)
      .collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    val plan = Sampling.prioritySample(docs, k = 5)
      .queryExecution.executedPlan.toString
    // the rank exchange; the tau window reuses its partitioning
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("prioritySample: weighted inclusion skews to heavy rows") {
    import graft.operators.Sampling
    // one heavy row among light ones: across many salts the heavy row
    // must appear far more often than any individual light row
    val docs = (1L to 50L).map(i =>
      (i, "s", if (i == 7L) 10000L else 10L)).toDF("doc_id", "source", "n_chars")
    val hits = (0 until 20).count { s =>
      Sampling.prioritySample(docs, k = 5, salt = s"salt$s")
        .collect().exists(_.getAs[Long]("doc_id") == 7L)
    }
    assert(hits >= 18, s"heavy row sampled only $hits/20 times")
  }

  // ---------------- PII redaction ----------------

  test("pii redaction: typed placeholders, sequential counts") {
    import graft.operators.Redact
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org thanks"),
      (2L, "server 192.168.0.1 and card 4111111111111111"),
      // dotted-quad "domains" are NOT emails (the email rule demands
      // an alphabetic TLD), so both quads here fall through to the IP
      // rule — the sequential pipeline still counts each string once
      (3L, "root@10.0.0.1 logged in from 10.0.0.2"),
      (4L, "v1.2.3 released, build 12345678"), // neither pattern
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Redact.scrubPii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def row(id: Long) = (out(id).getAs[Long]("n_email"),
      out(id).getAs[Long]("n_ipv4"), out(id).getAs[Long]("n_longnum"),
      out(id).getAs[String]("text_redacted"),
      out(id).getAs[Boolean]("pii_free"))
    assert(row(1L) == ((1L, 0L, 0L, "mail me at <EMAIL> thanks", false)))
    assert(row(2L) == ((0L, 1L, 1L,
      "server <IP> and card <NUM>", false)))
    assert(row(3L) == ((0L, 2L, 0L,
      "root@<IP> logged in from <IP>", false)))
    assert(row(4L) == ((0L, 0L, 0L, "v1.2.3 released, build 12345678",
      true)))
    assert(row(5L) == ((0L, 0L, 0L, "", true)))
  }

  test("pii redaction plan: builtin regex only, no UDF, no exchange") {
    import graft.operators.Redact
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Redact.scrubPii(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  // ---------------- contrastive LM score ----------------

  test("contrastive score == scoreDocs(good) - scoreDocs(bad) margins") {
    import graft.operators.LmScore
    val good = lmRef
    // heavy repetition makes "x y" CHEAP under bad (known gram, small
    // vocab) while good charges it the full unknown-gram rate — the
    // margin has to clear the power-of-two bucketing to show a sign
    val bad = Seq((200L, "x y x y x y x y")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b a"), (2L, "x y"), (3L, "q"), (4L, "a b x y"))
      .toDF("doc_id", "text")
    val g = LmScore.scoreDocs(docs, good).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_bits")))).toMap
    val b = LmScore.scoreDocs(docs, bad).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_bits")))).toMap
    val c = LmScore.contrastiveScore(docs, good, bad).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("sum_margin_bits"),
          r.getAs[Boolean]("keep")))).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(c(id)._1 == g(id)._1, s"doc $id gram count")
      assert(c(id)._2 == g(id)._2 - b(id)._2, s"doc $id margin")
    }
    // unscorable doc (single word): zero grams, keep = false
    assert(c(3L) == ((0L, 0L, false)))
    // margin sign follows which model fits better
    assert(c(1L)._3, "good-modeled doc keeps") // "a b a" fits good ref
    assert(!c(2L)._3, "bad-modeled doc drops")  // "x y" is bad's gram
  }

  test("contrastive plan: the corpus gram stream explodes once") {
    import graft.operators.LmScore
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0 &&
      col("doc_id") % 7 =!= 0)
    val plan = LmScore.contrastiveScore(corpus,
        docs.filter(col("doc_id") % 5 === 0),
        docs.filter(col("doc_id") % 7 === 0))
      .queryExecution.optimizedPlan.toString
    // order-2 (gram) explodes: 2 reference bigram-count subtrees +
    // exactly ONE corpus occurrence stream = 3; a scoreDocs-twice
    // formulation explodes the corpus twice and shows 4. (Order-1
    // context explodes appear twice per side — the vocab scalar
    // recomputes the tiny reference subtree, same as scoreDocs.)
    val gramExplodes = plan.linesIterator.count(l =>
      l.contains("graft_word_ngrams_all") && l.contains(", 2)"))
    assert(gramExplodes == 3,
      s"expected 3 order-2 explodes, got $gramExplodes\n$plan")
    assert(!plan.contains("ScalaUDF"), plan)
  }

  // ---------------- audit diff ----------------

  test("audit diff: outcome changes only, null-safe on drop_reason") {
    import graft.operators.Audit
    val a = Seq(
      (1L, true, null.asInstanceOf[String]),
      (2L, false, "gopher"),
      (3L, false, "repetition"),
      (4L, false, "dup_near")).toDF("doc_id", "keep", "drop_reason")
    val b = Seq(
      (1L, true, null.asInstanceOf[String]),   // unchanged -> absent
      (2L, false, "gopher"),                    // unchanged -> absent
      (3L, true, null.asInstanceOf[String]),    // kept now
      (5L, false, "contaminated"))              // new doc
      .toDF("doc_id", "keep", "drop_reason")
    val d = Audit.auditDiff(a, b).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(d.keySet == Set(3L, 4L, 5L))
    assert(d(3L).getAs[String]("reason_a") == "repetition" &&
      d(3L).getAs[Boolean]("keep_b"))
    assert(d(4L).isNullAt(d(4L).fieldIndex("keep_b"))) // gone from run b
    assert(d(5L).isNullAt(d(5L).fieldIndex("keep_a"))) // new in run b
  }

  // ---------------- shard assignment ----------------

  test("shard assignment: correct buckets, dense pos, deterministic") {
    val docs = (1L to 500L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out = Sampling.shardAssignments(docs, numShards = 8, salt = "sh1")
      .collect()
    assert(out.length == 500)
    val thresholds = (1 to 7).map(i => Sampling.hexThreshold(i / 8.0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String =
      md.digest(s"$id|sh1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    out.foreach { r =>
      val expected = thresholds.count(_ <= key(r.getAs[Long]("doc_id")))
      assert(r.getAs[Int]("shard") == expected)
    }
    // pos is a dense 1..n rank within each shard, in key order
    out.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (key(r.getAs[Long]("doc_id")),
        r.getAs[Long]("doc_id")))
      assert(sorted.map(_.getAs[Long]("pos")).toSeq ==
        (1L to rows.length).toSeq)
    }
    // partitioning-independence (the reason rand() is banned here)
    val again = Sampling
      .shardAssignments(docs.repartition(7), numShards = 8, salt = "sh1")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(again.toSeq == out
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Long]("pos"))).sorted.toSeq)
  }

  test("writeShards: partitioned layout, pos-sorted within shard") {
    val docs = (1L to 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    Sampling.writeShards(docs, dir, numShards = 4, salt = "sh1")
    val back = spark.read.parquet(dir)
    assert(back.count() == 200)
    assert(back.select("shard").distinct().collect()
      .map(_.getAs[Int]("shard")).sorted.toSeq == Seq(0, 1, 2, 3))
    // each shard file holds its rows in pos order (trainer reads
    // sequentially => deterministic global shuffle)
    (0 to 3).foreach { sh =>
      val files = new java.io.File(s"$dir/shard=$sh")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      files.foreach { f =>
        val pos = spark.read.parquet(f.getAbsolutePath)
          .select("pos").collect().map(_.getAs[Long]("pos"))
        assert(pos.sameElements(pos.sorted))
      }
    }
  }

  // ---------------- contamination scores ----------------

  test("contamination scores: planted overlap fraction, clean and short docs") {
    val eval = Seq((900L, "x1 x2 x3 x4")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x1 x2 x3 q1 q2 q3"), // 4 trigrams, 1 shared -> 0.25
      (2L, "p1 p2 p3 p4"),       // 2 trigrams, 0 shared
      (3L, "s1 s2")              // no trigrams
    ).toDF("doc_id", "text")
    val out = Decontaminate.contaminationScores(train, eval, n = 3,
        minFrac = 0.05).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_ngrams") == 4L)
    assert(out(1L).getAs[Long]("n_hits") == 1L)
    assert(out(1L).getAs[Double]("overlap_frac") == 0.25)
    assert(out(1L).getAs[Boolean]("contaminated"))
    assert(out(2L).getAs[Long]("n_hits") == 0L)
    assert(out(2L).getAs[Double]("overlap_frac") == 0.0)
    assert(!out(2L).getAs[Boolean]("contaminated"))
    assert(out(3L).getAs[Long]("n_ngrams") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("overlap_frac")))
    assert(!out(3L).getAs[Boolean]("contaminated"))
  }

  // ---------------- temperature mixture ----------------

  test("mixture budgets: integer-exact sqrt scaling") {
    // A mass 100 -> t=10, B mass 400 -> t=20; budget 90 -> 30/60
    val docs = ((1 to 10).map(i => (i.toLong, "A", 10L)) ++
      (11 to 50).map(i => (i.toLong, "B", 10L)))
      .toDF("doc_id", "source", "n_chars")
    val budgets = Sampling.mixtureBudgets(docs, totalBudget = 90)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("weight_total"), r.getAs[Long]("budget"))).toMap
    assert(budgets("A") == ((100L, 30L)))
    assert(budgets("B") == ((400L, 60L)))
  }

  test("mixture fill: budget-maximal prefix per source, deterministic") {
    val docs = ((1 to 10).map(i => (i.toLong, "A", 10L)) ++
      (11 to 50).map(i => (i.toLong, "B", 10L)))
      .toDF("doc_id", "source", "n_chars")
    val kept = Sampling.sampleToMixture(docs, totalBudget = 90, salt = "mx")
      .collect()
    val bySource = kept.groupBy(_.getAs[String]("source"))
    // 30/10 = 3 docs from A, 60/10 = 6 from B
    assert(bySource("A").length == 3)
    assert(bySource("B").length == 6)
    // the kept docs are exactly the smallest sample keys of each source
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String =
      md.digest(s"$id|mx".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(bySource("A").map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      (1L to 10L).sortBy(key).take(3).sorted.toSeq)
    assert(bySource("B").map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      (11L to 50L).sortBy(key).take(6).sorted.toSeq)
    val again = Sampling
      .sampleToMixture(docs.repartition(7), totalBudget = 90, salt = "mx")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(again.toSeq == kept.map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }

  // ---------------- plan shapes ----------------

  test("plans: shard = one exchange; mixture join broadcasts; LM has no UDF") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val shardPlan = Sampling.shardAssignments(docs, 8)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(shardPlan).length == 1,
      s"shard+pos needs exactly the one shard-keyed shuffle:\n$shardPlan")
    val mixPlan = Sampling.sampleToMixture(docs, 10000)
      .queryExecution.executedPlan.toString
    assert(mixPlan.contains("BroadcastHashJoin"),
      s"budget join must broadcast:\n$mixPlan")
    assert(!mixPlan.contains("SortMergeJoin"), mixPlan)
    val lmPlan = LmScore.scoreDocs(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0))
      .queryExecution.executedPlan.toString
    assert(!lmPlan.contains("ScalaUDF"), lmPlan)
    assert(lmPlan.contains("graft_word_ngrams_all"), lmPlan)
  }

  test("audit plan carries no UDF (all stages native/codegen)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.operators.Audit.curationAudit(
        docs.filter(col("doc_id") % 11 =!= 0),
        docs.filter(col("doc_id") % 11 === 0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("model read path partition-prunes to the committed batches") {
    // the commit protocol only works if uncommitted partitions are
    // pruned at the SCAN, not post-filtered: the isin(committed) must
    // land in the FileSourceScan's PartitionFilters
    val ref = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lmp").toString
    LmScore.writeLmModel(ref, dir)
    LmScore.appendToLmModel(ref, dir, batchId = 1L)
    val plan = LmScore.scoreDocsVsModel(docs, dir)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*batch_id".r
      .findFirstIn(plan).isDefined,
      s"committed-batch filter must prune partitions at the scan:\n$plan")
  }
  // ---------------- weighted interleave (training order) ----------------

  test("interleaveByWeights: unique keys, weighted cadence, retry-stable") {
    // 3 sources, weights 1/2/3, plenty of docs each
    val docs = (0 until 120).map { i =>
      (i.toLong, s"s${i % 3}")
    }.toDF("doc_id", "source")
    val wt = substring(col("source"), 2, 2).cast("int") + 1 // s0->1 s1->2 s2->3
    val out = Sampling.interleaveByWeights(docs, wt).persist()
    try {
      // epoch_key is globally unique
      assert(out.select(countDistinct(col("epoch_key"))).head().getLong(0) ==
        out.count())
      // weighted cadence: while every source lasts, round r emits
      // exactly w_s docs of source s. W = 6; 40 docs/source means
      // source s survives 40/w_s full rounds; check the first 10.
      val firstRounds = out.where(col("epoch_key") < 10 * 6)
        .groupBy(col("source")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(firstRounds == Map("s0" -> 10L, "s1" -> 20L, "s2" -> 30L),
        firstRounds.toString)
      // retry/partitioning stability
      val again = Sampling.interleaveByWeights(docs.repartition(7), wt)
        .select(col("doc_id"), col("epoch_key")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val base = out.select(col("doc_id"), col("epoch_key")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(again == base)
      // within a source, epoch_key order == pos_in_source order
      val s2 = out.where(col("source") === "s2")
        .orderBy(col("epoch_key"))
        .select(col("pos_in_source")).collect().map(_.getLong(0))
      assert(s2.sameElements(s2.sorted))
    } finally { out.unpersist(): Unit }
    // non-constant weight per stratum fails loudly
    intercept[IllegalArgumentException] {
      Sampling.interleaveByWeights(docs,
        (col("doc_id") % 2 + 1).cast("int"))
    }
    // weight < 1 fails loudly
    intercept[IllegalArgumentException] {
      Sampling.interleaveByWeights(docs, lit(0))
    }
  }

  // ---------------- leakage-free split ----------------

  test("splitByCluster: near-dups never straddle the split") {
    val docs = (0L until 400L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    // planted clusters: docs (3k, 3k+1) near-dup pairs, 3k+2 singletons
    val labels = (0L until 400L).filter(_ % 3 != 2)
      .map(i => (i, i - i % 3)).toDF("id", "cluster_id")
    val out = Sampling.splitByCluster(docs, labels, valFrac = 0.25).persist()
    try {
      // the guarantee: one split value per cluster_rep
      assert(out.groupBy(col("cluster_rep"))
        .agg(countDistinct(col("split")).as("n"))
        .where(col("n") > 1).count() == 0)
      // paired docs landed together
      val byDoc = out.select(col("doc_id"), col("split")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      (0L until 400L by 3L).filter(_ + 1 < 400L).foreach { k =>
        assert(byDoc(k) == byDoc(k + 1), s"pair ($k, ${k + 1}) straddles")
      }
      // singletons keyed by their own id
      assert(out.where(col("doc_id") % 3 === 2)
        .where(col("cluster_rep") =!= col("doc_id")).count() == 0)
      // split sizes in a loose band around 25% of CLUSTERS
      val valClusters = out.where(col("split") === "val")
        .select(countDistinct(col("cluster_rep"))).head().getLong(0)
      val allClusters = out.select(countDistinct(col("cluster_rep")))
        .head().getLong(0)
      val frac = valClusters.toDouble / allClusters
      assert(frac > 0.10 && frac < 0.45, s"val cluster fraction $frac")
      // degenerate fractions
      assert(Sampling.splitByCluster(docs, labels, 0.0)
        .where(col("split") === "val").count() == 0)
      assert(Sampling.splitByCluster(docs, labels, 1.0)
        .where(col("split") === "train").count() == 0)
    } finally { out.unpersist(): Unit }
  }
}
