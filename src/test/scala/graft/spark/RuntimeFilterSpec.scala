package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftRuntimeFilter

/** The runtime Bloom semi-join pruning rule: injection shape, semantics
  * preservation, and the guards (thresholds, join types, idempotence).
  */
class RuntimeFilterSpec extends AnyFunSuite {

  // def, not lazy val: the extensions test below stops the shared
  // session, so later tests must be able to getOrCreate a fresh one
  private def spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withRule[A](confs: (String, String)*)(body: => A): A = {
    spark.experimental.extraOptimizations = Seq(GraftRuntimeFilter(spark))
    spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
    spark.conf.set("spark.graft.runtimeFilter.minProbeBytes", "0")
    spark.conf.set("spark.graft.runtimeFilter.maxBuildBytes",
      (1L << 40).toString)
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally {
      spark.experimental.extraOptimizations = Nil
      Seq("enabled", "minProbeBytes", "maxBuildBytes", "fpr",
        "expectedBuildRows").foreach(k =>
        spark.conf.unset(s"spark.graft.runtimeFilter.$k"))
    }
  }

  private def fact = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
  private def dim = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .filter(col("o_orderpriority") === "1-URGENT")

  test("injects the bloom probe under the probe side; results unchanged") {
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum(col("l_quantity"))).head()
    withRule() {
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)), sum(col("l_quantity")))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("graft_bloom_might_contain"),
        s"rule must inject the probe:\n$opt")
      // exactly one injection per side (idempotent under fixed point)
      assert(
        "graft_bloom_might_contain".r.findAllIn(opt).size <= 2, opt)
      // the filter must sit UNDER the join (prunes before the shuffle)
      val joinIdx = opt.indexOf("Join")
      assert(opt.indexOf("graft_bloom_might_contain") > joinIdx, opt)
      val pruned = joined.head()
      assert(pruned == plain,
        s"pruned result must equal plain: $pruned vs $plain")
    }
  }

  test("left outer join never prunes the preserved (left) side") {
    withRule() {
      val joined = fact.join(dim,
        col("l_orderkey") === col("o_orderkey"), "left_outer")
      val opt = joined.queryExecution.optimizedPlan
      // left side (fact) must not carry the probe; right side may
      val leftStr = opt.children.headOption.map(_.toString).getOrElse("")
      opt.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          assert(!j.left.toString.contains("graft_bloom_might_contain"),
            s"left-outer must not filter the preserved side:\n$j")
      }
      assert(joined.count() == fact.count(), leftStr)
    }
  }

  test("threshold guards: oversized build side suppresses injection") {
    withRule("spark.graft.runtimeFilter.maxBuildBytes" -> "1") {
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      assert(!joined.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"))
    }
  }

  test("disabled by conf: no rewrite") {
    withRule("spark.graft.runtimeFilter.enabled" -> "false") {
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      assert(!joined.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"))
    }
  }

  test("extensions injection path applies the rule too") {
    // fresh session (getOrCreate ignores withExtensions otherwise)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.runtimeFilter.enabled", "true")
      .config("spark.graft.runtimeFilter.minProbeBytes", "0")
      .config("spark.graft.runtimeFilter.maxBuildBytes", (1L << 40).toString)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val f = s2.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val d = s2.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = f.join(d, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("graft_bloom_might_contain"),
        s"extension-injected rule must fire:\n$opt")
      assert(joined.head().getLong(0) > 0)
    } finally s2.stop()
  }

  test("non-equi join is left alone") {
    withRule() {
      val joined = fact.join(dim, col("l_orderkey") < col("o_orderkey"))
      assert(!joined.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"))
    }
  }

  test("multi-key equi-join hashes ALL keys into the one filter") {
    // second key (l_suppkey) is the selective one here; hashing the
    // composite tuple is at least as selective as the best single key
    val dim2 = fact.filter(col("l_quantity") >= 49)
      .select(col("l_orderkey").as("d_ok"), col("l_suppkey").as("d_sk"),
        col("l_quantity").as("d_qty"))
    val cond = col("l_orderkey") === col("d_ok") &&
      col("l_suppkey") === col("d_sk")
    val plain = fact.join(dim2, cond)
      .agg(count(lit(1)), sum(col("l_quantity"))).head()
    withRule() {
      val joined = fact.join(dim2, cond)
        .agg(count(lit(1)), sum(col("l_quantity")))
      val probes = joined.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.isInstanceOf[
              graft.functions.expressions.BloomMightContainDump] =>
          f.condition.asInstanceOf[
            graft.functions.expressions.BloomMightContainDump]
      }
      assert(probes.nonEmpty, "rule must inject on the multi-key join")
      probes.foreach { p =>
        val hashKeys = p.right.children.map(_.toString)
        // probe may land on either side: orderkey aliases d_ok, suppkey d_sk
        assert(hashKeys.exists(k =>
            k.contains("l_orderkey") || k.contains("d_ok")) &&
          hashKeys.exists(k =>
            k.contains("l_suppkey") || k.contains("d_sk")),
          s"probe hash must cover BOTH equi-keys, got: $hashKeys")
      }
      assert(joined.head() == plain)
    }
  }

  test("nondeterministic build side suppresses injection") {
    withRule() {
      // left-semi: ONLY the left side can be pruned, so the build is
      // forced to be the (nondeterministic) right side -> must refuse.
      // rand() filter: the ScalarSubquery evaluation and the real join
      // build side could disagree.
      val ndDim = fact.filter(rand(7) < 0.5)
        .select(col("l_orderkey").as("d_ok"))
      val j1 = fact.join(ndDim, col("l_orderkey") === col("d_ok"),
        "left_semi")
      assert(!j1.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"),
        "rand() build side must not be used to build a runtime filter")
      // limit without a defining order: same hazard
      val limDim = dim.limit(10).select(col("o_orderkey").as("d_ok"))
      val j2 = fact.join(limDim, col("l_orderkey") === col("d_ok"),
        "left_semi")
      assert(!j2.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"),
        "limit build side must not be used to build a runtime filter")
      // deterministic build side on the same join shape still fires
      val j3 = fact.join(dim.select(col("o_orderkey").as("d_ok")),
        col("l_orderkey") === col("d_ok"), "left_semi")
      assert(j3.queryExecution.optimizedPlan.toString
        .contains("graft_bloom_might_contain"))
    }
  }

  test("star join: each dimension injects its own filter") {
    withRule() {
      // fact JOIN dim1 (on orderkey) JOIN dim2 (on partkey): the
      // idempotence guard is keyed to the probe keys, so the second
      // join must STILL get a filter — a subtree-wide guard would stop
      // after the first dimension and forfeit the second's pruning
      val dim2 = spark.read
        .parquet("/root/testdata/sf0.001/part.parquet")
        .filter(col("p_size") <= 5)
      val plain = fact
        .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(dim2, col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)), sum(col("l_quantity"))).head()
      val starved = fact
        .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(dim2, col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)), sum(col("l_quantity")))
      val opt = starved.queryExecution.optimizedPlan.toString
      val n = "graft_bloom_might_contain".r.findAllIn(opt).size
      assert(n == 2, s"expected one filter per dimension, got $n:\n$opt")
      assert(starved.head() == plain)
    }
  }
}
