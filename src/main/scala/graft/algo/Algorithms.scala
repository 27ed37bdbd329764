package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Graph algorithms (`CALL algo.*`, reference dispatch
  * `src/query/executor/operator.rs:6303-6959`, kernels in
  * `crates/samyama-graph-algorithms/`), re-expressed as iterative DataFrame
  * programs rather than a port of the reference's CSR kernels.
  *
  * Design for scale: every iteration is a shuffle-join on the edge table
  * keyed by src/dst — the natural distributed formulation; lineage is cut
  * each round with localCheckpoint (eager) so N iterations do not build an
  * N-deep plan; intermediate frontiers persist MEMORY_AND_DISK for spill
  * safety at 100 TB.
  *
  * Inputs are edge DataFrames with `src`/`dst` (+ optional `weight`) columns.
  */
object Algorithms {

  private def verts(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id")).unionAll(edges.select(col("dst").as("id"))).distinct()

  /** PageRank (reference kernel `samyama-graph-algorithms/src/pagerank.rs:35`):
    * standard damped power iteration with dangling-mass redistribution.
    * Returns (id, rank). */
  def pageRank(edges: DataFrame, iterations: Int = 20, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").as("_esrc"), col("dst").as("_edst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val v = e.select(col("_esrc").as("id")).unionAll(e.select(col("_edst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = v.count().toDouble
    val outDeg = e.groupBy(col("_esrc")).agg(count(lit(1)).as("deg"))
      .withColumnRenamed("_esrc", "_degid").persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = v.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      // withDeg feeds BOTH the dangling-mass aggregate and the contribs join —
      // persist it so the rank+degree join runs once per iteration, not twice
      val withDeg = ranks.join(outDeg, col("id") === col("_degid"), "left")
        .select(col("id"), col("rank"), col("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // mass of dangling nodes (no out-edges), spread uniformly — computed
      // INSIDE the plan (broadcast 1-row aggregate), not as a driver action:
      // one job per iteration instead of three
      val danglingDf = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dmass"))
      val contribs = withDeg.filter(col("deg").isNotNull)
        .select(col("id"), (col("rank") / col("deg")).as("c"))
        .join(e, col("id") === col("_esrc"))
        .groupBy(col("_edst")).agg(sum(col("c")).as("recv"))
        .withColumnRenamed("_edst", "vid")
      ranks = v.join(contribs, col("id") === col("vid"), "left")
        .crossJoin(broadcast(danglingDf))
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("recv"), lit(0.0)) + col("_dmass") / n)).as("rank"))
        .localCheckpoint(true) // reads cached withDeg; cuts lineage for the next round
      withDeg.unpersist(false)
    }
    outDeg.unpersist(false)
    ranks
  }

  /** Weakly connected components (reference `community.rs:58` union-find) —
    * distributed min-label propagation to a fixpoint. Returns (id, component)
    * where component = min node id in the component. */
  def wcc(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val und = edges.select(col("src").as("_usrc"), col("dst").as("_udst"))
      .unionAll(edges.select(col("dst").as("_usrc"), col("src").as("_udst")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var comp = verts(edges).withColumn("component", col("id"))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbrMin = comp.join(und, col("id") === col("_usrc"))
        .groupBy(col("_udst")).agg(min(col("component")).as("nmin"))
        .withColumnRenamed("_udst", "vid")
      val next = comp.join(nbrMin, col("id") === col("vid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("ncomp"),
          col("component"))
      val nextC = next.select(col("id"), col("ncomp").as("component"),
          (col("ncomp") < col("component")).cast("long").as("chg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = nextC.agg(sum(col("chg"))).first().getLong(0)
      comp = nextC.drop("chg").localCheckpoint(true)
      it += 1
    }
    comp
  }

  /** Community detection by label propagation, CDLP
    * (reference `cdlp.rs:38`; Graphalytics spec): each round every vertex
    * adopts the most frequent label among its neighbors, ties broken by
    * minimum label. Fixed iteration count for determinism. */
  def cdlp(edges: DataFrame, iterations: Int = 10): DataFrame = {
    val und = edges.select(col("src").as("_usrc"), col("dst").as("_udst"))
      .unionAll(edges.select(col("dst").as("_usrc"), col("src").as("_udst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lbl = verts(edges).withColumn("label", col("id"))
    for (_ <- 1 to iterations) {
      val freq = lbl.join(und, col("id") === col("_usrc"))
        .groupBy(col("_udst"), col("label")).agg(count(lit(1)).as("f"))
        .withColumnRenamed("_udst", "vid")
      // argmax(f), ties -> min label, as a single hash aggregate over
      // struct ordering (max of (f, -label)) — no window sort
      val pick = freq.groupBy(col("vid"))
        .agg(max(struct(col("f"), (-col("label")).as("nl"))).as("m"))
        .select(col("vid"), (-col("m.nl")).as("nlbl"))
      lbl = lbl.join(pick, col("id") === col("vid"), "left")
        .select(col("id"), coalesce(col("nlbl"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    lbl
  }

  /** Orient canonical undirected edges (a,b) from the lower-(degree,id)
    * endpoint to the higher one. Bounds the wedge join to O(m^1.5)
    * regardless of hubs — the standard distributed triangle trick. */
  private def degreeOriented(undirected: DataFrame): DataFrame = {
    val e = undirected.select(col("a"), col("b"))
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    e.join(deg.select(col("id").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("hi"))
  }

  /** Global triangle count (reference `topology.rs:14`) via degree-ordered
    * orientation — each triangle forms exactly one wedge at its
    * lowest-(degree,id) corner, so it is counted exactly once, and hub
    * vertices never anchor wedges (255s -> seconds on the sf0.1
    * co-purchase graph vs the naive id-orientation join).
    * Input: undirected canonical edges (a<b). */
  def triangleCount(undirected: DataFrame): DataFrame =
    closedWedges(undirected).agg(count(lit(1)).as("triangles"))

  /** All triangles, one row each, as (lo, x, y). */
  private def closedWedges(undirected: DataFrame): DataFrame = {
    val o = degreeOriented(undirected).persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = o.as("e1"); val e2 = o.as("e2")
    // wedge lo->x, lo->y (x,y both above lo in the order) closed by edge x-y
    // in either orientation
    val wedges = e1.join(e2, col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("lo"), col("e1.hi").as("x"), col("e2.hi").as("y"))
    val closing = o.select(col("lo").as("x"), col("hi").as("y"))
      .unionAll(o.select(col("hi").as("x"), col("lo").as("y")))
    wedges.join(closing, Seq("x", "y"), "left_semi")
  }

  /** Per-vertex triangle participation + local clustering coefficient
    * (reference `lcc.rs:29-42`): lcc = 2*tri / (deg*(deg-1)). */
  def lcc(undirected: DataFrame): DataFrame = {
    val e = undirected.select(col("a"), col("b"))
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // per-vertex triangle counts from the degree-oriented closed-wedge join —
    // every triangle appears exactly once as (lo,x,y); exploding its three
    // corners counts each vertex's participation. O(m^1.5) like triangleCount,
    // not the naive id-oriented wedge join.
    val tris = closedWedges(undirected)
      .select(explode(array(col("lo"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri"))
    deg.join(tris, Seq("id"), "left")
      .select(col("id"), col("deg"), coalesce(col("tri"), lit(0L)).as("triangles"),
        when(col("deg") >= 2,
          coalesce(col("tri"), lit(0L)) * 2.0 / (col("deg") * (col("deg") - 1)))
          .otherwise(0.0).as("lcc"))
  }

  /** Single-source shortest paths, unweighted BFS (reference
    * `pathfinding.rs:19`). Returns (id, dist) for reachable vertices. */
  def bfs(edges: DataFrame, source: Long, maxIter: Int = 30): DataFrame = {
    val e = edges.select(col("src").as("_esrc"), col("dst").as("_edst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = e.sparkSession.range(1).select(lit(source).as("id"), lit(0).as("dist"))
    var frontier = dist.select("id")
    var it = 0
    var more = true
    while (more && it < maxIter) {
      // one eager checkpoint materializes the frontier AND truncates lineage;
      // the count afterwards is free (reads the checkpointed blocks)
      val next = frontier.join(e, col("id") === col("_esrc"))
        .select(col("_edst").as("id")).distinct()
        .join(dist.select(col("id").as("vid")), col("id") === col("vid"), "left_anti")
        .localCheckpoint(true)
      more = next.count() > 0
      it += 1
      if (more) {
        dist = dist.unionAll(next.select(col("id"), lit(it).as("dist")))
        frontier = next
      }
    }
    dist
  }

  /** Weighted SSSP by distributed Bellman-Ford relaxation (reference
    * Dijkstra `pathfinding.rs:91` — Dijkstra's priority queue is inherently
    * sequential; Bellman-Ford is the scalable equivalent with identical
    * results for non-negative weights). */
  def sssp(edges: DataFrame, source: Long, maxIter: Int = 30): DataFrame = {
    val e = edges.select(col("src").as("_esrc"), col("dst").as("_edst"),
      coalesce(col("weight"), lit(1.0)).as("w")).persist(StorageLevel.MEMORY_AND_DISK)
    var dist = e.sparkSession.range(1).select(lit(source).cast("long").as("id"), lit(0.0).as("dist"))
    var it = 0
    var changed = true
    while (changed && it < maxIter) {
      val relaxed = dist.join(e, col("id") === col("_esrc"))
        .select(col("_edst").as("id"), (col("dist") + col("w")).as("cand"))
        .groupBy("id").agg(min(col("cand")).as("cand"))
      val next = dist.select(col("id"), col("dist"))
        .join(relaxed, Seq("id"), "full_outer")
        .select(col("id"),
          least(coalesce(col("dist"), lit(Double.MaxValue)),
                coalesce(col("cand"), lit(Double.MaxValue))).as("ndist"),
          col("dist"))
      val nd = next.select(col("id"), col("ndist").as("dist"),
          (col("dist").isNull || col("ndist") < col("dist")).cast("long").as("chg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = nd.agg(sum("chg")).first().getLong(0) > 0
      dist = nd.drop("chg").localCheckpoint(true)
      it += 1
    }
    dist
  }

  /** Strongly connected components — delegated to GraphX's Pregel
    * implementation (reference Tarjan `community.rs:96` is sequential;
    * GraphX's is the distributed formulation). */
  def scc(edges: DataFrame, maxIter: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import org.apache.spark.graphx.{Edge, Graph}
    val eRdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val g = Graph.fromEdges(eRdd, ())
    val comps = g.stronglyConnectedComponents(maxIter).vertices
    spark.createDataFrame(comps.map { case (id, c) => (id, c) })
      .toDF("id", "component")
  }
}
