package graft

import graft.cypher.QueryEngine
import graft.model.PropertyGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence harness for the WCO cycle-close lowering: times Cypher triangle
  * counting on the co-purchase graph (parts sharing an order, a<b oriented —
  * the same projection four catalog kernels share) through the fused
  * (adjacency-intersect) and unfused (binary-join) paths. Naming a
  * relationship variable on a closing hop disables the fusion, so the two
  * queries differ ONLY in lowering. The unfused plan materializes one row
  * per 2-path (a)->(b)->(c) — Σ outdeg(b) over edges (a,b) — before the
  * closing join; the fused plan moves only O(m) adjacency arrays plus true
  * triangle rows. Usage: runMain graft.WcoDemo [sfDir]. */
object WcoDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val a = li.select(col("ok"), col("pk").as("a"))
    val b = li.select(col("ok"), col("pk").as("b"))
    val co = a.join(b, Seq("ok")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct().localCheckpoint(true)
    val nodes = co.select(col("a").as("id")).unionAll(co.select(col("b").as("id")))
      .distinct().select(col("id"), array(lit("P")).as("labels"),
        lit(null).cast("string").as("name"))
    val edges = co.select(monotonically_increasing_id().as("id"),
      col("a").as("src"), col("b").as("dst"), lit("CO").as("relationship"))
      .localCheckpoint(true)
    // statsKey enables the fan/skew gate AND the simple-graph proof (the
    // distinct() above makes maxMultiplicity 1, dropping the back-joins)
    val g = PropertyGraph(nodes, edges, statsKey = Some(s"wco-demo:$sfDir"))

    def triangle(unfuse: Boolean): String = {
      val r = if (unfuse) "[r:CO]" else "[:CO]"
      s"MATCH (x:P)-[:CO]->(y:P)-$r->(z:P)<-[:CO]-(x) RETURN count(*) AS n"
    }
    def time(q: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = QueryEngine.execute(q, g).collect()(0).getLong(0)
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // warm the session (scan + codegen), then min-of-2 per path
    QueryEngine.execute("MATCH (x:P) RETURN count(*) AS n", g).collect()
    val (nF, tF) = Seq(time(triangle(false)), time(triangle(false))).minBy(_._2)
    val (nU, tU) = Seq(time(triangle(true)), time(triangle(true))).minBy(_._2)
    require(nF == nU, s"fused $nF != unfused $nU")
    println(f"""{"sf":"$sfDir","triangles":$nF,"fused_sec":$tF%.2f,"unfused_sec":$tU%.2f,"speedup":${tU / tF}%.2f}""")
    spark.stop()
  }
}
