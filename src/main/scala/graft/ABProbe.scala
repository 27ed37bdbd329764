package graft

// Scratch A/B harness for r15 optimization work: times alternating variants
// of one operator inside a single JVM/session so window noise cancels.
// Not part of the driver contract; removed or kept out of catalog paths.
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.algo.Algorithms
import org.apache.spark.sql.functions._

object ABProbe {
  // old window-based node2vec pick (r14 form), for A/B only
  def node2vecWindow(edges: DataFrame, steps: Int,
                     wBack: Int = 1, wCommon: Int = 4, wFar: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = edges.select(col("src").cast("long").as("_ws"), col("dst").cast("long").as("_wd"))
      .unionAll(edges.select(col("dst").cast("long").as("_ws"), col("src").cast("long").as("_wd")))
      .filter(col("_ws") =!= col("_wd"))
      .distinct()
      .localCheckpoint(true)
    val adj = sym.groupBy(col("_ws"))
      .agg(sort_array(collect_list(col("_wd"))).as("_nbrs"),
        count(lit(1)).as("_deg"))
      .localCheckpoint(true)
    def draw(i: Int): org.apache.spark.sql.Column =
      (col("_v") % 100000L) * 2654435761L + lit(i.toLong * 40503L)
    var fr = adj.select(col("_ws").as("start"), col("_ws").as("_v"),
        col("_nbrs"), col("_deg"))
      .withColumn("v1",
        element_at(col("_nbrs"), (pmod(draw(1), col("_deg")) + 1).cast("int")))
      .select(col("start"), col("_v").as("_prev"), col("v1").as("_v"), col("v1"))
    val ordered = Window.partitionBy(col("start")).orderBy(col("_pos"))
    val whole = Window.partitionBy(col("start"))
    for (i <- 2 to steps) {
      val cand = fr.join(adj, fr("_v") === adj("_ws"))
        .select((col("start") +: col("_prev") +: col("_v") +:
          (1 until i).map(j => col(s"v$j"))) :+
          posexplode(col("_nbrs")): _*)
        .withColumnRenamed("pos", "_pos").withColumnRenamed("col", "_n")
      fr = cand
        .join(sym.select(col("_ws").as("_pa"), col("_wd").as("_pb")),
          cand("_prev") === col("_pa") && cand("_n") === col("_pb"), "left")
        .withColumn("_wt", when(col("_n") === col("_prev"), lit(wBack.toLong))
          .when(col("_pb").isNotNull, lit(wCommon.toLong))
          .otherwise(lit(wFar.toLong)))
        .withColumn("_cum", sum(col("_wt")).over(ordered))
        .withColumn("_r", pmod(draw(i), sum(col("_wt")).over(whole)))
        .filter(col("_cum") > col("_r"))
        .withColumn("_rn", row_number().over(ordered))
        .filter(col("_rn") === 1)
        .select((col("start") +: col("_v").as("_prev") +:
          col("_n").as("_v") +: col("_n").as(s"v$i") +:
          (1 until i).map(j => col(s"v$j"))): _*)
    }
    fr.select(col("start") +: (1 to steps).map(i => col(s"v$i")): _*)
  }


  // mid-build aggregate-HOF pick (r14-verdict task #2 form), for A/B only
  def node2vecAgg(edges: DataFrame, steps: Int,
                  wBack: Int = 1, wCommon: Int = 4, wFar: Int = 2): DataFrame = {
    val sym = edges.select(col("src").cast("long").as("_ws"), col("dst").cast("long").as("_wd"))
      .unionAll(edges.select(col("dst").cast("long").as("_ws"), col("src").cast("long").as("_wd")))
      .filter(col("_ws") =!= col("_wd"))
      .distinct()
      .localCheckpoint(true)
    val adj = sym.groupBy(col("_ws"))
      .agg(sort_array(collect_list(col("_wd"))).as("_nbrs"),
        count(lit(1)).as("_deg"))
      .localCheckpoint(true)
    def draw(i: Int): org.apache.spark.sql.Column =
      (col("_v") % 100000L) * 2654435761L + lit(i.toLong * 40503L)
    var fr = adj.select(col("_ws").as("start"), col("_ws").as("_v"),
        col("_nbrs"), col("_deg"))
      .withColumn("v1",
        element_at(col("_nbrs"), (pmod(draw(1), col("_deg")) + 1).cast("int")))
      .select(col("start"), col("_v").as("_prev"), col("v1").as("_v"), col("v1"))
    for (i <- 2 to steps) {
      val cand = fr.join(adj, fr("_v") === adj("_ws"))
        .select((col("start") +: col("_prev") +: col("_v") +:
          (1 until i).map(j => col(s"v$j"))) :+
          posexplode(col("_nbrs")): _*)
        .withColumnRenamed("pos", "_pos").withColumnRenamed("col", "_n")
      val marked = cand
        .join(sym.select(col("_ws").as("_pa"), col("_wd").as("_pb")),
          cand("_prev") === col("_pa") && cand("_n") === col("_pb"), "left")
        .withColumn("_wt", when(col("_n") === col("_prev"), lit(wBack.toLong))
          .when(col("_pb").isNotNull, lit(wCommon.toLong))
          .otherwise(lit(wFar.toLong)))
      val keys = col("start") +: col("_prev") +: col("_v") +:
        (1 until i).map(j => col(s"v$j"))
      fr = marked.groupBy(keys: _*)
        .agg(sum(col("_wt")).as("_W"),
          sort_array(collect_list(struct(col("_pos"), col("_wt"), col("_n"))))
            .as("_cands"))
        .withColumn("_r", pmod(draw(i), col("_W")))
        .withColumn("_pick", aggregate(col("_cands"),
          struct(lit(0L).as("c"), lit(null).cast("long").as("n")),
          (acc, x) => struct(
            (acc("c") + x("_wt")).as("c"),
            coalesce(acc("n"),
              when(acc("c") + x("_wt") > col("_r"), x("_n"))).as("n")),
          acc => acc("n")))
        .select((col("start") +: col("_v").as("_prev") +:
          col("_pick").as("_v") +: col("_pick").as(s"v$i") +:
          (1 until i).map(j => col(s"v$j"))): _*)
    }
    fr.select(col("start") +: (1 to steps).map(i => col(s"v$i")): _*)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_THRESHOLD", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = graft.model.GraphLoader.tpch(spark, sfDir)
    val placedUnd = g.edgesOfType("PLACED")
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
      .select(col("a").as("src"), col("b").as("dst"))
    val li = graft.model.Tables(spark, sfDir, "lineitem")
    val copurch = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey").as("ok"), col("l_partkey").as("b")), "ok")
      .filter(col("a") < col("b")).select(col("a"), col("b")).distinct()
      .select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
      .localCheckpoint(true)

    def time(label: String)(f: => DataFrame): Double = {
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(30)
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $label%-28s $dt%8.3f s")
      dt
    }
    // warmup both paths once
    time("warmup-agg-placed")(node2vecAgg(placedUnd, 3))
    time("warmup-win-placed")(Algorithms.node2vecWalks(placedUnd, 3))
    for (rep <- 1 to 2) {
      time(s"agg-placed#$rep")(node2vecAgg(placedUnd, 3))
      time(s"win-placed#$rep")(Algorithms.node2vecWalks(placedUnd, 3))
      time(s"agg-copurch#$rep")(node2vecAgg(copurch, 3))
      time(s"win-copurch#$rep")(Algorithms.node2vecWalks(copurch, 3))
    }
    spark.stop()
  }
}
