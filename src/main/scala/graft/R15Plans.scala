package graft

import org.apache.spark.sql.SparkSession

/** Capture `explain("formatted")` for named catalog queries into
  * plans/r15/<query>_<tag>.txt — the optimization round's before/after
  * plan evidence. Usage:
  *   runMain graft.R15Plans <sfDir> <tag> q_a q_b ...
  * Same session shape as Bench (AQE on, shuffle partitions = cpus) so the
  * captured plan is the one the bench actually runs, modulo AQE's runtime
  * re-optimization (explain shows the initial plan, as the guide §7.2
  * notes).
  */
object R15Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r15"))
    dir.mkdirs()
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val f = new java.io.PrintWriter(new java.io.File(dir, s"${n}_$tag.txt"))
          try { f.println(s"# $n @ $sfDir ($tag)"); f.println(plan) }
          finally f.close()
          println(s"[r15plans] wrote ${n}_$tag.txt (${plan.length} chars)")
        case None => println(s"[r15plans] UNKNOWN query $n")
      }
    }
    spark.stop()
  }
}
