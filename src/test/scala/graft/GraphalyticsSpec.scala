package graft

import graft.algo.Algorithms
import org.apache.spark.sql.functions._

/** LDBC Graphalytics semantics validation against INDEPENDENT ground truth.
  *
  * The reference validates its six Graphalytics algorithms against the
  * official example-dataset expected outputs
  * (`benches/graphalytics_common/mod.rs:97-135`, 28/28 checks). Those
  * datasets are fetched by `scripts/download_graphalytics.sh` and are not
  * available offline, so this spec does the equivalent with hand-built
  * graphs exercising the same corner semantics, validated against
  * spec-local reference implementations written directly from the
  * published Graphalytics algorithm definitions (Iosup et al., "LDBC
  * Graphalytics: A Benchmark for Large-Scale Graph Analysis on Parallel and
  * Distributed Platforms", PVLDB 9(13), 2016 — §3.2 algorithm semantics):
  *
  *   BFS   — level of each REACHABLE vertex from a source (directed).
  *   PR    — damping 0.85, synchronous, dangling-vertex mass redistributed
  *           uniformly each iteration: r'(v) = (1-d)/n + d*(Σ r(u)/deg(u)
  *           + dangling/n).
  *   WCC   — component id = min vertex id in the component (directed edges
  *           treated as undirected).
  *   CDLP  — synchronous label propagation, labels init to vertex id,
  *           neighbors counted WITH multiplicity in both directions, most
  *           frequent label wins, ties broken by MIN label.
  *   SSSP  — weighted shortest distance for each reachable vertex.
  *   LCC   — 2*tri(v) / (deg(v)*(deg(v)-1)) over the undirected graph,
  *           0 when deg < 2.
  *
  * The ground-truth code here is deliberately naive (adjacency maps, queues,
  * dense iteration) and shares nothing with graft.algo — a real differential
  * oracle, not the implementation checking itself. Corner cases covered:
  * dangling PR sink, disconnected component, unreachable-from-source
  * vertices, CDLP oscillation tie-break, degree-1 LCC vertex.
  */
class GraphalyticsSpec extends SparkSpec {
  import spark.implicits._

  // Directed test graph: a hub cluster (1-5), a cycle (6,7,8), a dangling
  // sink (9: in-edges only — PR dangling semantics), and a disconnected
  // pair (20,21). Vertex 9 is unreachable from source 6; 20/21 are
  // unreachable from everything else (WCC second component).
  private val dEdges: Seq[(Long, Long, Double)] = Seq(
    (1L, 2L, 1.0), (1L, 3L, 4.0), (2L, 3L, 2.0), (3L, 4L, 1.0),
    (4L, 1L, 7.0), (4L, 5L, 3.0), (5L, 9L, 1.0), (2L, 9L, 9.0),
    (6L, 7L, 2.0), (7L, 8L, 2.0), (8L, 6L, 2.0), (6L, 1L, 10.0),
    (20L, 21L, 5.0))

  private def directedDf = dEdges.toDF("src", "dst", "weight")

  // ---- spec-local ground-truth implementations (naive, independent) ----

  private def outAdj: Map[Long, Seq[Long]] =
    dEdges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
  private def vertices: Seq[Long] =
    dEdges.flatMap(e => Seq(e._1, e._2)).distinct.sorted

  private def bfsRef(source: Long): Map[Long, Int] = {
    val adj = outAdj
    val dist = scala.collection.mutable.Map(source -> 0)
    val q = scala.collection.mutable.Queue(source)
    while (q.nonEmpty) {
      val v = q.dequeue()
      adj.getOrElse(v, Nil).foreach { w =>
        if (!dist.contains(w)) { dist(w) = dist(v) + 1; q += w }
      }
    }
    dist.toMap
  }

  private def ssspRef(source: Long): Map[Long, Double] = {
    // naive Bellman-Ford to fixpoint
    val dist = scala.collection.mutable.Map(source -> 0.0)
    var changed = true
    while (changed) {
      changed = false
      dEdges.foreach { case (s, d, w) =>
        dist.get(s).foreach { ds =>
          if (dist.get(d).forall(_ > ds + w)) { dist(d) = ds + w; changed = true }
        }
      }
    }
    dist.toMap
  }

  private def prRef(iterations: Int, damping: Double): Map[Long, Double] = {
    val vs = vertices
    val n = vs.size
    val adj = outAdj
    var rank = vs.map(_ -> 1.0 / n).toMap
    (1 to iterations).foreach { _ =>
      val dangling = vs.filter(v => adj.getOrElse(v, Nil).isEmpty).map(rank).sum
      val recv = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      vs.foreach { u =>
        val out = adj.getOrElse(u, Nil)
        out.foreach(v => recv(v) += rank(u) / out.size)
      }
      rank = vs.map(v => v -> ((1 - damping) / n + damping * (recv(v) + dangling / n))).toMap
    }
    rank
  }

  private def wccRef: Map[Long, Long] = {
    // naive: repeat min-propagation over undirected edges to fixpoint
    var comp = vertices.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      dEdges.foreach { case (s, d, _) =>
        val m = math.min(comp(s), comp(d))
        if (comp(s) != m) { comp += s -> m; changed = true }
        if (comp(d) != m) { comp += d -> m; changed = true }
      }
    }
    comp
  }

  private def cdlpRef(iterations: Int): Map[Long, Long] = {
    // neighbors in BOTH directions with multiplicity; min-label tie-break
    val inc: Map[Long, Seq[Long]] =
      (dEdges.map(e => (e._1, e._2)) ++ dEdges.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2) }
    var lbl = vertices.map(v => v -> v).toMap
    (1 to iterations).foreach { _ =>
      lbl = vertices.map { v =>
        val counts = inc.getOrElse(v, Nil).map(lbl).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        if (counts.isEmpty) v -> lbl(v)
        else {
          val best = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
          v -> best
        }
      }.toMap
    }
    lbl
  }

  // Undirected graph for LCC: a 4-clique (1-4), a pendant (5 off 4),
  // a triangle sharing vertex 1 (1,6,7), and an isolated edge (8,9).
  private val uEdges: Seq[(Long, Long)] = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (1L, 6L), (1L, 7L), (6L, 7L), (8L, 9L))

  private def lccRef: Map[Long, Double] = {
    val nbr = (uEdges ++ uEdges.map(_.swap)).groupBy(_._1)
      .map { case (v, ps) => v -> ps.map(_._2).toSet }
    nbr.map { case (v, ns) =>
      val d = ns.size
      val links = uEdges.count { case (a, b) => ns(a) && ns(b) }
      v -> (if (d < 2) 0.0 else links * 2.0 / (d.toLong * (d - 1)))
    }
  }

  // ---- assertions: every algorithm, exact per-vertex match ----

  test("Graphalytics BFS: exact per-vertex levels from source 6") {
    val got = Algorithms.bfs(directedDf, source = 6L)
      .collect().map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
    assert(got === bfsRef(6L))
    // corner: 9 reachable via 6→1→2→9 at depth 3; 20/21 absent
    assert(got(9L) === 3 && !got.contains(20L) && !got.contains(21L))
  }

  test("Graphalytics SSSP: exact weighted distances from source 6") {
    val got = Algorithms.sssp(directedDf, source = 6L, maxIter = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = ssspRef(6L)
    assert(got.keySet === want.keySet)
    want.foreach { case (v, d) => assert(math.abs(got(v) - d) < 1e-12, s"v=$v") }
    // corner: weighted path to 9 — the BFS-shortest hop path 6→1→2→9
    // costs 10+1+9=20, but the LONGER hop path 6→1→2→3→4→5→9 costs
    // 10+1+2+1+3+1=18; weighted SSSP must prefer it
    assert(math.abs(got(9L) - 18.0) < 1e-12)
  }

  test("Graphalytics PageRank: damping 0.85, dangling redistribution, 1e-10 parity") {
    val got = Algorithms.pageRank(directedDf, iterations = 25, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = prRef(25, 0.85)
    assert(got.keySet === want.keySet)
    want.foreach { case (v, r) => assert(math.abs(got(v) - r) < 1e-10, s"v=$v got=${got(v)} want=$r") }
    // mass conservation: ranks sum to 1 (dangling mass not lost)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("Graphalytics WCC: component = min vertex id, disconnected pair separate") {
    val got = Algorithms.wcc(directedDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === wccRef)
    assert(got(21L) === 20L && got(9L) === 1L)
  }

  test("Graphalytics CDLP: synchronous rounds, multiplicity, min-label ties") {
    for (iters <- Seq(1, 2, 5, 10)) {
      val got = Algorithms.cdlp(directedDf, iterations = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === cdlpRef(iters), s"iterations=$iters")
    }
  }

  test("Graphalytics LCC: clique 1.0, pendant 0.0, shared-vertex triangles") {
    val got = Algorithms.lcc(uEdges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val want = lccRef
    assert(got.keySet === want.keySet)
    want.foreach { case (v, l) => assert(math.abs(got(v) - l) < 1e-12, s"v=$v got=${got(v)} want=$l") }
    // corners: inside the 4-clique every pair of 2/3's neighbors is linked
    assert(got(2L) === 1.0 && got(3L) === 1.0)
    assert(got(5L) === 0.0 && got(8L) === 0.0) // deg<2
    // vertex 1 has neighbors {2,3,4,6,7}: links 2-3,2-4,3-4,6-7 = 4 → 2*4/(5*4)
    assert(math.abs(got(1L) - 0.4) < 1e-12)
  }

  test("Graphalytics differential: distributed twins match the same ground truth") {
    // the local-kernel gate routes small inputs to LocalKernels; force the
    // distributed paths too so BOTH implementations face the oracle
    val gotPr = Algorithms.pageRankDistributed(directedDf, iterations = 25, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    prRef(25, 0.85).foreach { case (v, r) => assert(math.abs(gotPr(v) - r) < 1e-10, s"pr v=$v") }

    val gotW = Algorithms.wccDistributed(directedDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotW === wccRef)

    val gotC = Algorithms.cdlpDistributed(directedDf, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotC === cdlpRef(5))

    val gotB = Algorithms.bfsDistributed(directedDf, source = 6L)
      .collect().map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
    assert(gotB === bfsRef(6L))

    val gotS = Algorithms.ssspDistributed(directedDf, source = 6L, maxIter = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ssspRef(6L).foreach { case (v, d) => assert(math.abs(gotS(v) - d) < 1e-12, s"sssp v=$v") }

    val gotL = Algorithms.lccDistributed(uEdges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    lccRef.foreach { case (v, l) => assert(math.abs(gotL(v) - l) < 1e-12, s"lcc v=$v") }
  }
}
