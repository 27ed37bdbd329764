package graft

import graft.algo.{Algorithms, LocalKernels}
import graft.operators.Traversals
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential tests: the in-task kernels must reproduce the distributed
  * implementations' observable output — exactly for integer-valued results
  * (wcc/cdlp/bfs/mst/varlength/triangles), to float tolerance for
  * pagerank/sssp (summation order differs; the catalog rounds to 4-6
  * decimals, far above the ULP drift). Random graphs with parallel edges,
  * self-referencing structure, dangling nodes, and disconnected pieces. */
class LocalKernelsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic random multigraph: n vertices, m directed edges
  private def randGraph(seed: Long, n: Int, m: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    // sparse ids (multiples of 7 plus offset) to catch id/index confusion
    val ids = Array.tabulate(n)(i => 1000L + 7L * i)
    Seq.fill(m)((ids(rnd.nextInt(n)), ids(rnd.nextInt(n))))
      .toDF("src", "dst")
  }

  private def weighted(seed: Long, n: Int, m: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val ids = Array.tabulate(n)(i => 500L + 3L * i)
    Seq.fill(m)((ids(rnd.nextInt(n)), ids(rnd.nextInt(n)),
      math.rint(rnd.nextDouble() * 100) / 10.0))
      .toDF("src", "dst", "weight")
  }

  private def sortedRows(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  test("gate: small inputs route local, localSizeBytes=0 pins distributed") {
    val e = randGraph(1, 20, 60)
    assert(LocalKernels.isSmall(e))
    spark.conf.set("spark.graft.algo.localSizeBytes", "0")
    try assert(!LocalKernels.isSmall(e))
    finally spark.conf.unset("spark.graft.algo.localSizeBytes")
  }

  test("superlinear gate: byte-small but edge-dense inputs stay distributed") {
    val e = randGraph(20, 20, 100).toDF("a", "b")
    assert(LocalKernels.isSmallSuperlinear(e)) // tiny both ways → local
    // cap the edge count below the input: the gray-zone count rejects it
    spark.conf.set("spark.graft.algo.localSizeBytesSuperlinear", "1")
    spark.conf.set("spark.graft.algo.localMaxEdgesSuperlinear", "50")
    try assert(!LocalKernels.isSmallSuperlinear(e))
    finally {
      spark.conf.unset("spark.graft.algo.localSizeBytesSuperlinear")
      spark.conf.unset("spark.graft.algo.localMaxEdgesSuperlinear")
    }
  }

  test("dense tier: many-edge few-vertex graphs route local, many-vertex stay distributed") {
    // force the gray zone (estimate > 1 byte) with thresholds scaled down:
    // plain cap 2 edges, dense cap 100 edges / 5 vertices
    val keys = Seq(
      "spark.graft.algo.localSizeBytes" -> "1",
      "spark.graft.algo.localMaxEdges" -> "2",
      "spark.graft.algo.localMaxEdgesDense" -> "100",
      "spark.graft.algo.localMaxNodesDense" -> "5")
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 12 edges over 4 vertices: past the plain cap, inside the dense tier
      val dense = (for (a <- 0 until 4; b <- 0 until 4 if a != b)
        yield (a.toLong, b.toLong)).toDF("src", "dst")
      assert(LocalKernels.isSmall(dense), "dense small-vertex graph should route local")
      // 9 edges over 10 vertices: same edge ballpark, too many vertices
      val sparse = (0 until 9).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
      assert(!LocalKernels.isSmall(sparse), "large-vertex graph should stay distributed")
      // past the dense edge cap: distributed without the vertex pass
      spark.conf.set("spark.graft.algo.localMaxEdgesDense", "10")
      assert(!LocalKernels.isSmall(dense))
    } finally keys.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("bidirBfs local == distributed (pairs, depth cap, degenerate pair, absent endpoints)") {
    for (seed <- Seq(31L, 32L, 33L)) {
      val e = randGraph(seed, 30, 80)
      val ids = e.select(col("src")).unionAll(e.select(col("dst")))
        .distinct().orderBy(col("src")).collect().map(_.getLong(0))
      val pairs = Seq((ids.head, ids.last), (ids.head, ids.head),
        (ids(1), ids(ids.length / 2)), (ids.head, 999999L)) // absent endpoint
      for (depth <- Seq(2, 5)) {
        val loc = sortedRows(LocalKernels.bidirBfs(e, pairs, depth))
        spark.conf.set("spark.graft.algo.localSizeBytes", "0")
        val dist = try sortedRows(Algorithms.bidirectionalBfs(e, pairs, depth))
        finally spark.conf.unset("spark.graft.algo.localSizeBytes")
        assert(loc.toSeq == dist.toSeq, s"seed $seed depth $depth")
      }
    }
  }

  test("louvainMoves local == distributed (exact labels)") {
    for (seed <- Seq(11L, 12L, 13L)) {
      val e = randGraph(seed, 30, 120).toDF("a", "b")
      val loc = sortedRows(LocalKernels.louvainMoves(e, 3))
      spark.conf.set("spark.graft.algo.localSizeBytes", "0")
      val dist = try sortedRows(Algorithms.louvainMoves(e, 3))
      finally spark.conf.unset("spark.graft.algo.localSizeBytes")
      assert(loc.toSeq == dist.toSeq, s"seed $seed")
    }
    // BOTH pair orientations present (the distributed distinct keeps both)
    val bi = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val lb = sortedRows(LocalKernels.louvainMoves(bi, 2))
    spark.conf.set("spark.graft.algo.localSizeBytes", "0")
    val db2 = try sortedRows(Algorithms.louvainMoves(bi, 2))
    finally spark.conf.unset("spark.graft.algo.localSizeBytes")
    assert(lb.toSeq == db2.toSeq)
  }

  test("louvain multi-level local == distributed (exact labels)") {
    for (seed <- Seq(21L, 22L)) {
      val e = randGraph(seed, 40, 160).toDF("a", "b")
      val loc = sortedRows(LocalKernels.louvain(e, 2, 2))
      spark.conf.set("spark.graft.algo.localSizeBytes", "0")
      val dist = try sortedRows(Algorithms.louvain(e, 2, 2))
      finally spark.conf.unset("spark.graft.algo.localSizeBytes")
      assert(loc.toSeq == dist.toSeq, s"seed $seed")
    }
    // three levels on the planted barbell (contraction chain exercised)
    val bar = (Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L)) ++ Seq((7L, 8L), (8L, 9L), (9L, 7L))).toDF("a", "b")
    val loc3 = sortedRows(LocalKernels.louvain(bar, 2, 3))
    spark.conf.set("spark.graft.algo.localSizeBytes", "0")
    val dist3 = try sortedRows(Algorithms.louvain(bar, 2, 3))
    finally spark.conf.unset("spark.graft.algo.localSizeBytes")
    assert(loc3.toSeq == dist3.toSeq)
  }

  test("pageRank local == distributed (1e-9)") {
    val e = randGraph(2, 40, 150)
    val loc = LocalKernels.pageRank(e, 8, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = Algorithms.pageRankDistributed(e, 8, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(loc.keySet == dist.keySet)
    loc.foreach { case (id, r) => assert(math.abs(r - dist(id)) < 1e-9, s"id $id") }
    // ranks sum to ~1
    assert(math.abs(loc.values.sum - 1.0) < 1e-9)
  }

  test("pageRankWeighted local == distributed (1e-9), zero-weight edges are not edges") {
    import org.apache.spark.sql.functions._
    for (seed <- 15 to 16) {
      val e = randGraph(seed, 40, 150)
        .withColumn("weight",
          (pmod(col("src") * 7 + col("dst") * 3, lit(5)) + lit(0)).cast("double"))
      // weight 0 rows exist by construction -> exercises the drop rule
      val loc = LocalKernels.pageRankWeighted(e, 8, 0.85).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val dist = Algorithms.pageRankWeightedDistributed(e, 8, 0.85).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(loc.keySet == dist.keySet, s"seed $seed")
      loc.foreach { case (id, r) =>
        assert(math.abs(r - dist(id)) < 1e-9, s"id $id seed $seed") }
    }
  }

  test("harmonic/closeness local == distributed, exact (absent seed, truncation)") {
    for (seed <- 31 to 32) {
      val e = randGraph(seed, 50, 90)
      val seeds = Seq(1L, 2L, 999999L) // 999999 absent from the graph
      assert(sortedRows(LocalKernels.harmonicCentrality(e, seeds, 3)) ===
        sortedRows(Algorithms.harmonicDistributed(e, seeds, 3)))
      assert(sortedRows(LocalKernels.closenessCentrality(e, seeds, 3)) ===
        sortedRows(Algorithms.closenessDistributed(e, seeds, 3)))
    }
  }

  test("betweenness local == distributed (rounded-4 equality over random graphs)") {
    for (seed <- 41 to 42) {
      val e = randGraph(seed, 40, 120)
      val loc = LocalKernels.betweennessCentrality(e, Seq(1L, 2L, 3L), 4).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val dist = Algorithms.betweennessDistributed(e, Seq(1L, 2L, 3L), 4).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(loc.keySet == dist.keySet, s"seed $seed")
      loc.foreach { case (id, b) =>
        assert(math.abs(b - dist(id)) < 1e-9, s"id $id seed $seed: $b vs ${dist(id)}") }
    }
  }

  test("hits local == distributed (1e-9)") {
    for (seed <- 11 to 12) {
      val e = randGraph(seed, 40, 150)
      val loc = LocalKernels.hits(e, 6).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val dist = Algorithms.hitsDistributed(e, 6).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(loc.keySet == dist.keySet)
      loc.foreach { case (id, (h, a)) =>
        assert(math.abs(h - dist(id)._1) < 1e-9, s"hub id $id seed $seed")
        assert(math.abs(a - dist(id)._2) < 1e-9, s"auth id $id seed $seed")
      }
      // both L1-normalized
      assert(math.abs(loc.values.map(_._1).sum - 1.0) < 1e-9)
      assert(math.abs(loc.values.map(_._2).sum - 1.0) < 1e-9)
    }
  }

  test("wcc local == distributed, exact") {
    for (seed <- 3 to 5) {
      val e = randGraph(seed, 60, 70) // sparse → several components
      assert(sortedRows(LocalKernels.wcc(e)) ===
        sortedRows(Algorithms.wccDistributed(e)))
    }
  }

  test("scc local (Tarjan) == distributed (GraphX Pregel), exact") {
    // dense-ish digraphs so real multi-node SCCs form; GraphX needs enough
    // iterations to converge — Tarjan is exact in one pass
    for (seed <- 21 to 23) {
      val e = randGraph(seed, 40, 160)
      assert(sortedRows(LocalKernels.scc(e)) ===
        sortedRows(Algorithms.sccDistributed(e, maxIter = 40)))
    }
    // pure DAG (chain): all singletons
    val chain = (1 to 20).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
    val got = LocalKernels.scc(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.forall { case (id, c) => id == c })
    // one big cycle: single SCC labeled by min id
    val cyc = ((1 to 9).map(i => (i.toLong, i + 1L)) :+ ((10L, 1L))).toDF("src", "dst")
    val gotC = LocalKernels.scc(cyc).collect().map(_.getLong(1)).distinct
    assert(gotC.toSeq == Seq(1L))
  }

  test("cdlp local == distributed, exact (incl. parallel-edge frequency)") {
    for (seed <- 6 to 8) {
      val e = randGraph(seed, 30, 120) // dense-ish → duplicate edges matter
      assert(sortedRows(LocalKernels.cdlp(e, 5)) ===
        sortedRows(Algorithms.cdlpDistributed(e, 5)))
    }
  }

  test("kCore local == distributed, exact (fixed synchronous rounds)") {
    for (seed <- 20 to 22) {
      val e = randGraph(seed, 40, 160) // dense-ish: real peel cascades
      for (k <- Seq(2, 5, 8))
        assert(sortedRows(LocalKernels.kCore(e, k, 4)) ===
          sortedRows(Algorithms.kCoreDistributed(e, k, 4)),
          s"seed=$seed k=$k")
    }
    // self-loops and duplicate/reversed edges must not count toward degree
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    assert(sortedRows(LocalKernels.kCore(dup, 2, 3)) ===
      sortedRows(Algorithms.kCoreDistributed(dup, 2, 3)))
  }

  test("bfs local == distributed, exact (depth cap + unreachable)") {
    val e = randGraph(9, 50, 90)
    val src = e.select("src").as[Long].head()
    for (cap <- Seq(2, 4, 30)) {
      assert(sortedRows(LocalKernels.bfs(e, src, cap)) ===
        sortedRows(Algorithms.bfsDistributed(e, src, cap)))
    }
    // isolated source: exactly the (source, 0) row
    assert(sortedRows(LocalKernels.bfs(e, 99999L, 4)) === Array("[99999,0]"))
  }

  test("sssp local == distributed (bounded rounds, 1e-9)") {
    val e = weighted(10, 40, 120)
    val src = e.select("src").as[Long].head()
    for (cap <- Seq(2, 6, 30)) {
      val loc = LocalKernels.sssp(e, src, cap).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val dist = Algorithms.ssspDistributed(e, src, cap).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(loc.keySet == dist.keySet, s"cap $cap")
      loc.foreach { case (id, d) => assert(math.abs(d - dist(id)) < 1e-9) }
    }
  }

  test("ssspPath: gated (in-task) == pinned distributed, identical rows") {
    // the parent tree's exact-FP equality must hold on EITHER distance
    // path: kernel and distributed relax with the same double additions
    for (seed <- Seq(21L, 22L)) {
      val e = weighted(seed, 12, 50)
      val src = e.select("src").as[Long].head()
      val tgt = e.select("dst").as[Long].orderBy(col("dst").desc).head()
      assert(LocalKernels.isSmall(e)) // gated run takes the kernel
      val viaKernel = sortedRows(Algorithms.ssspPath(e, src, tgt, 8))
      spark.conf.set("spark.graft.algo.localSizeBytes", "0")
      val viaDist =
        try sortedRows(Algorithms.ssspPath(e, src, tgt, 8))
        finally spark.conf.unset("spark.graft.algo.localSizeBytes")
      assert(viaKernel === viaDist, s"seed $seed")
    }
  }

  test("mst local == distributed, exact (unique forest under (w,a,b) order)") {
    for (seed <- 11 to 13) {
      val e = weighted(seed, 30, 80)
      assert(sortedRows(LocalKernels.mst(e)) ===
        sortedRows(Algorithms.mstDistributed(e)))
    }
  }

  test("triangleCount + lcc local == distributed, exact (multigraph rows kept)") {
    val rnd = new scala.util.Random(14)
    val ids = Array.tabulate(25)(i => 10L * i)
    // canonical a<b undirected edges WITH duplicates
    val und = Seq.fill(120)((ids(rnd.nextInt(25)), ids(rnd.nextInt(25))))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("a", "b")
    assert(sortedRows(LocalKernels.triangleCount(und)) ===
      sortedRows(Algorithms.triangleCountDistributed(und)))
    assert(sortedRows(LocalKernels.lcc(und)) ===
      sortedRows(Algorithms.lccDistributed(und)))
  }

  test("varLengthExpand local == distributed, exact (min/max hops, revisit)") {
    val e = randGraph(15, 40, 100)
    val starts = e.select(col("src")).limit(6)
    for ((mn, mx) <- Seq((0, 2), (1, 3), (2, 4))) {
      assert(sortedRows(LocalKernels.varLengthExpand(e, starts, "src", mn, mx)) ===
        sortedRows(Traversals.varLengthExpandDistributed(e, starts, "src", mn, mx)),
        s"range $mn..$mx")
    }
  }

  test("varLengthExpandPaths local == distributed, exact (witness path + parallel edges)") {
    val rnd = new scala.util.Random(17)
    val ids = Array.tabulate(30)(i => 100L + 5L * i)
    // edges WITH ids and a few parallel duplicates (distinct eids)
    val rows = Seq.tabulate(90)(k =>
      (1000L + k, ids(rnd.nextInt(30)), ids(rnd.nextInt(30)))) ++
      Seq((2001L, ids(0), ids(1)), (2002L, ids(0), ids(1))) // parallel pair
    val e = rows.toDF("id", "src", "dst")
    val starts = e.select(col("src")).limit(5)
    for ((mn, mx) <- Seq((0, 2), (1, 3))) {
      assert(sortedRows(LocalKernels.varLengthExpandPaths(e, starts, "src", mn, mx)) ===
        sortedRows(Traversals.varLengthExpandPathsDistributed(e, starts, "src", mn, mx)),
        s"paths $mn..$mx")
      assert(sortedRows(LocalKernels.varLengthExpandAllPaths(e, starts, "src", mn, mx)) ===
        sortedRows(Traversals.varLengthExpandAllPathsDistributed(e, starts, "src", mn, mx)),
        s"allpaths $mn..$mx")
    }
    // no id column: epath stays empty on both paths
    val eNoId = e.select("src", "dst")
    assert(sortedRows(LocalKernels.varLengthExpandPaths(eNoId, starts, "src", 1, 2)) ===
      sortedRows(Traversals.varLengthExpandPathsDistributed(eNoId, starts, "src", 1, 2)))
  }

  test("public entry points route through the gate and stay correct") {
    val e = randGraph(16, 30, 60)
    // public call (small → local) equals the pinned-distributed run
    val viaGate = sortedRows(Algorithms.wcc(e))
    spark.conf.set("spark.graft.algo.localSizeBytes", "0")
    try assert(viaGate === sortedRows(Algorithms.wcc(e)))
    finally spark.conf.unset("spark.graft.algo.localSizeBytes")
  }

  test("resident cache: file-backed kernels hit the cache and match cold runs") {
    // parquet-backed edges (LocalRelation inputs never cache) — run each
    // kernel twice: run 1 populates the resident cache, run 2 serves from
    // it; both must match each other AND the distributed twin
    val dir = java.nio.file.Files.createTempDirectory("graft_rescache").toFile
    try {
      randGraph(77, 40, 200).write.mode("overwrite").parquet(s"$dir/e.parquet")
      val e = spark.read.parquet(s"$dir/e.parquet")
      val starts = e.select(col("src").as("s0")).distinct().limit(5)
      // distributed references, pinned so the gate cannot route them back
      // to the (cached) local kernels
      def distributed(f: => DataFrame): Array[String] = {
        spark.conf.set("spark.graft.algo.localSizeBytes", "0")
        try sortedRows(f)
        finally spark.conf.unset("spark.graft.algo.localSizeBytes")
      }
      def runs(f: => DataFrame): (Array[String], Array[String]) =
        (sortedRows(f), sortedRows(f))
      val (b1, b2) = runs(LocalKernels.bfs(e, 1000L, 30))
      assert(b1 === b2)
      assert(b1 === distributed(graft.algo.Algorithms.bfs(e, 1000L, 30)))
      val (v1, v2) = runs(LocalKernels.varLengthExpand(e, starts, "s0", 1, 3))
      assert(v1 === v2)
      assert(v1 === sortedRows(
        Traversals.varLengthExpandDistributed(e, starts, "s0", 1, 3)))
      val (p1, p2) = runs(LocalKernels.varLengthExpandPaths(e, starts, "s0", 1, 2))
      assert(p1 === p2)
      val (w1, w2) = runs(LocalKernels.wcc(e))
      assert(w1 === w2)
      assert(w1 === distributed(graft.algo.Algorithms.wcc(e)))
      // rewriting the files invalidates the key (len/mtime in the key): a
      // different graph at the same path must NOT serve stale results
      randGraph(88, 40, 200).write.mode("overwrite").parquet(s"$dir/e.parquet")
      val e2 = spark.read.parquet(s"$dir/e.parquet")
      assert(sortedRows(LocalKernels.wcc(e2)) ===
        distributed(graft.algo.Algorithms.wcc(e2)))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir)
    }
  }
}
