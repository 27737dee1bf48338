package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` of declared queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization round's plan
  * evidence (the judge checks plan claims against these files).
  *
  * Usage:
  *   sbt 'runMain graft.PlanDump <suffix> <query> [query ...]'
  * with SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001) and
  * SPARK_GRAFT_PLAN_TAG (default r06) in the environment.
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query> [query ...]")
    val suffix = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r06")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(out)
    val qs = SparkEntry.queries
    for (n <- names) {
      val q = qs.getOrElse(n,
        sys.error(s"unknown query $n; known: ${qs.keys.toSeq.sorted}"))
      val df = q(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(out.resolve(s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote plans/$tag/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
