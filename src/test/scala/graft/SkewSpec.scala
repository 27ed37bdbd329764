package graft

import graft.algo.{Algorithms, LocalKernels}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential tests on POWER-LAW (Zipf-degree) graphs — the degree
  * distribution class of the real LDBC SNB/Graphalytics datasets
  * (datagen graphs are heavy-tailed), which the uniform random graphs in
  * [[LocalKernelsSpec]] and the TPC-H-derived catalog fixtures do not
  * cover. Hubs are where distributed graph algorithms break in practice:
  * a single vertex touching a large fraction of edges concentrates one
  * reduce key (skewed shuffle partitions), makes wedge counts quadratic
  * in hub degree for triangle/LCC unless the orientation trick really
  * orients away from hubs, and makes label-frequency maps for CDLP as
  * large as the hub degree. These tests pin that the distributed twins
  * stay EXACTLY equal to the in-task kernels when ~25% of all edges hit
  * one vertex — same contract as LocalKernelsSpec, adversarial topology.
  *
  * The generator is a deterministic inverse-CDF Zipf sampler, so the
  * fixture (and its hub) is identical on every run. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** n vertices, m directed edges; dst ~ Zipf(s) over vertex ranks so
    * rank-0 is a hub absorbing ~1/H_{n,s} of all edges; src uniform.
    * Sparse non-contiguous ids to catch id/index confusion. */
  private def zipfGraph(seed: Long, n: Int, m: Int, s: Double): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val cum = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += 1.0 / math.pow(i + 1, s); cum(i) = acc; i += 1 }
    def draw(): Int = {
      val x = rnd.nextDouble() * acc
      val j = java.util.Arrays.binarySearch(cum, x)
      if (j >= 0) j else -j - 1
    }
    val ids = Array.tabulate(n)(i => 100L + 3L * i)
    Seq.fill(m)((ids(rnd.nextInt(n)), ids(draw()))).toDF("src", "dst")
  }

  private val N = 1500
  private val M = 20000
  private lazy val g = zipfGraph(42, N, M, 1.2).cache()
  private lazy val hub = 100L // ids(0) = rank-0 Zipf mode

  private def sortedRows(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  test("fixture is genuinely heavy-tailed: hub takes >100x the mean degree") {
    val indeg = g.groupBy("dst").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mean = M.toDouble / N
    assert(indeg(hub) > 100 * mean,
      s"hub in-degree ${indeg(hub)} vs mean $mean — generator not skewed")
    // and a real tail, not one outlier: top-10 hold a large share
    val top10 = indeg.values.toSeq.sorted.reverse.take(10).sum
    assert(top10 > M / 3, s"top-10 share $top10 of $M")
  }

  test("pageRank on hub graph: local == distributed (1e-9), hub ranks first") {
    val loc = LocalKernels.pageRank(g, 8, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = Algorithms.pageRankDistributed(g, 8, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(loc.keySet == dist.keySet)
    loc.foreach { case (id, r) =>
      assert(math.abs(r - dist(id)) < 1e-9, s"id $id") }
    assert(loc.maxBy(_._2)._1 == hub, "Zipf mode must dominate PageRank")
  }

  test("wcc on hub graph: local == distributed, exact") {
    assert(sortedRows(LocalKernels.wcc(g)) ===
      sortedRows(Algorithms.wccDistributed(g)))
  }

  test("cdlp on hub graph: local == distributed, exact (hub-sized label maps)") {
    assert(sortedRows(LocalKernels.cdlp(g, 5)) ===
      sortedRows(Algorithms.cdlpDistributed(g, 5)))
  }

  test("kCore peel on hub graph: local == distributed, exact") {
    // the hub survives every k; the tail peels in cascades
    for (k <- Seq(3, 8, 20))
      assert(sortedRows(LocalKernels.kCore(g, k, 4)) ===
        sortedRows(Algorithms.kCoreDistributed(g, k, 4)), s"k=$k")
  }

  test("triangleCount + lcc on hub graph: local == distributed, exact") {
    // canonical undirected pairs; hub sits in almost every wedge — the
    // degree-orientation must keep the wedge join subquadratic AND exact
    val und = g.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
    assert(sortedRows(LocalKernels.triangleCount(und)) ===
      sortedRows(Algorithms.triangleCountDistributed(und)))
    assert(sortedRows(LocalKernels.lcc(und)) ===
      sortedRows(Algorithms.lccDistributed(und)))
  }

  test("bfs through the hub: local == distributed, exact at every cap") {
    // any tail vertex reaches most of the graph in 2 hops via the hub
    val src = 100L + 3L * (N - 1)
    for (cap <- Seq(1, 2, 4))
      assert(sortedRows(LocalKernels.bfs(g, src, cap)) ===
        sortedRows(Algorithms.bfsDistributed(g, src, cap)), s"cap=$cap")
  }
}
