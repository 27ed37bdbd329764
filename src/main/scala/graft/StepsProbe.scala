package graft

// Scratch measurement for r15-verdict item #8: does the walk PREFIX
// (v1..v_{i-1}) riding node2vec's per-step candidate explode + window
// exchange cost anything at steps >= 4? Variant B runs the identical loop
// carrying NO prefix columns — the UPPER BOUND of any prefix-re-join win
// (a real re-join would add N joins on top). Not part of any query path.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object StepsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val steps = sys.env.getOrElse("SPARK_GRAFT_STEPS", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_QPROBE_REPS", "3").toInt
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the PLACED projection (same edges q_cypher_call_node2vec walks)
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val edges = ord.select(col("o_custkey").cast("long").as("src"),
      (col("o_orderkey") + 10000000L).cast("long").as("dst"))

    /** node2vecWalks with NO prefix columns carried through the loop. */
    def noPrefix(e: DataFrame, steps: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val sym = e.select(col("src").as("_ws"), col("dst").as("_wd"))
        .unionAll(e.select(col("dst").as("_ws"), col("src").as("_wd")))
        .filter(col("_ws") =!= col("_wd")).distinct().localCheckpoint(true)
      val adj = sym.groupBy(col("_ws"))
        .agg(sort_array(collect_list(col("_wd"))).as("_nbrs"),
          count(lit(1)).as("_deg")).localCheckpoint(true)
      def draw(i: Int) = (col("_v") % 100000L) * 2654435761L + lit(i.toLong * 40503L)
      var fr = adj.select(col("_ws").as("start"), col("_ws").as("_v"),
          col("_nbrs"), col("_deg"))
        .withColumn("v1", element_at(col("_nbrs"), (pmod(draw(1), col("_deg")) + 1).cast("int")))
        .select(col("start"), col("_v").as("_prev"), col("v1").as("_v"))
      val ordered = Window.partitionBy(col("start")).orderBy(col("_pos"))
      val whole = Window.partitionBy(col("start"))
      for (i <- 2 to steps) {
        val cand = fr.join(adj, fr("_v") === adj("_ws"))
          .select(col("start"), col("_prev"), col("_v"), posexplode(col("_nbrs")))
          .withColumnRenamed("pos", "_pos").withColumnRenamed("col", "_n")
        fr = cand
          .join(sym.select(col("_ws").as("_pa"), col("_wd").as("_pb")),
            cand("_prev") === col("_pa") && cand("_n") === col("_pb"), "left")
          .withColumn("_wt", when(col("_n") === col("_prev"), lit(1L))
            .when(col("_pb").isNotNull, lit(4L)).otherwise(lit(2L)))
          .withColumn("_cum", sum(col("_wt")).over(ordered))
          .withColumn("_r", pmod(draw(i), sum(col("_wt")).over(whole)))
          .filter(col("_cum") > col("_r") && col("_r") >= col("_cum") - col("_wt"))
          .select(col("start"), col("_v").as("_prev"), col("_n").as("_v"))
      }
      fr.select(col("start"), col("_v"))
    }

    def time(label: String, mk: => DataFrame): Unit = {
      val runs = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[stepsprobe] $label%-18s steps=$steps min ${runs.min}%.3f  runs ${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    // alternate to cancel window drift
    (1 to 2).foreach { _ =>
      time("full-prefix", graft.algo.Algorithms.node2vecWalks(edges, steps))
      time("no-prefix", noPrefix(edges, steps))
    }
    // plan evidence for the deep-walk form (plans/r16)
    val dir = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16"))
    dir.mkdirs()
    val plan = graft.algo.Algorithms.node2vecWalks(edges, steps)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val f = new java.io.PrintWriter(new java.io.File(dir, s"node2vec_steps${steps}_after.txt"))
    try { f.println(s"# node2vecWalks steps=$steps (PLACED projection, $sfDir)"); f.println(plan) }
    finally f.close()
    spark.stop()
  }
}
