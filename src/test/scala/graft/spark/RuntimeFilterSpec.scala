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
}
