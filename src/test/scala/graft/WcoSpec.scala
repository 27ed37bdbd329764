package graft

import graft.cypher.QueryEngine
import graft.model.PropertyGraph

/** WCO cycle-close lowering (Translator.expandCycleClose — Spark-first
  * analog of the reference's LeapfrogTrieJoin, `executor/leapfrog.rs`).
  * Differential tests: naming a relationship variable on either closing hop
  * disables the fusion, so the same pattern runs through the binary-join
  * path — both lowerings must agree on rows AND multiplicities. */
class WcoSpec extends SparkSpec {
  import spark.implicits._

  // directed 3-cycles: (1,2,3) and (1,2,4); 3->4 dangles; 5 isolated.
  // edge 101 duplicates 2->3 (parallel edge: each binding is a row).
  private lazy val g = PropertyGraph(
    Seq((1L, Seq("V"), "a"), (2L, Seq("V"), "b"), (3L, Seq("V", "W"), "c"),
      (4L, Seq("V"), "d"), (5L, Seq("V"), "e")).toDF("id", "labels", "name"),
    Seq((10L, 1L, 2L, "E"), (11L, 2L, 3L, "E"), (12L, 3L, 1L, "E"),
      (13L, 2L, 4L, "E"), (14L, 4L, 1L, "E"), (15L, 3L, 4L, "E"),
      (101L, 2L, 3L, "E")).toDF("id", "src", "dst", "relationship"))

  private def count(q: String): Long =
    QueryEngine.execute(q, g).as[Long].head()

  test("directed triangle count matches the unfused lowering (incl. parallel-edge multiplicity)") {
    val fused = count(
      "MATCH (a:V)-[:E]->(b:V)-[:E]->(c:V)-[:E]->(a) RETURN count(*) AS n")
    val unfused = count(
      "MATCH (a:V)-[:E]->(b:V)-[r:E]->(c:V)-[:E]->(a) RETURN count(*) AS n")
    // cycles (1,2,3) x2 parallel and (1,2,4), each seen from 3 rotations
    assert(fused == 9L)
    assert(fused == unfused)
  }

  test("label constraint on the fused middle node applies") {
    val fused = count(
      "MATCH (a:V)-[:E]->(b:V)-[:E]->(c:W)-[:E]->(a) RETURN count(*) AS n")
    val unfused = count(
      "MATCH (a:V)-[:E]->(b:V)-[r:E]->(c:W)-[:E]->(a) RETURN count(*) AS n")
    // only rotations with node 3 in the c position: (1,2,3)x2 parallel
    assert(fused == 2L)
    assert(fused == unfused)
  }

  test("undirected cycle agrees with the unfused lowering") {
    val fused = count(
      "MATCH (a:V)-[:E]-(b:V)-[:E]-(c:V)-[:E]-(a) RETURN count(*) AS n")
    val unfused = count(
      "MATCH (a:V)-[:E]-(b:V)-[r:E]-(c:V)-[:E]-(a) RETURN count(*) AS n")
    assert(fused == unfused && fused > 0L)
  }

  test("fused rows carry the middle node's columns for RETURN") {
    val rows = QueryEngine.execute(
      "MATCH (a:V)-[:E]->(b:V)-[:E]->(c:V)-[:E]->(a) " +
        "RETURN DISTINCT c.name AS cn ORDER BY cn", g)
      .as[String].collect().toSeq
    assert(rows == Seq("a", "b", "c", "d"))
  }

  test("longer cycle closes through the fused wedge") {
    // 4-cycle 1->2->3->4->1? requires 4->1 (yes, 14) and 3->4 (yes, 15)
    val fused = count(
      "MATCH (a:V)-[:E]->(b:V)-[:E]->(c:V)-[:E]->(d:V)-[:E]->(a) RETURN count(*) AS n")
    val unfused = count(
      "MATCH (a:V)-[:E]->(b:V)-[:E]->(c:V)-[r:E]->(d:V)-[:E]->(a) RETURN count(*) AS n")
    assert(fused == unfused)
  }

  test("mid-chain cycle close: the chain continues from the bound variable") {
    // (x)-->(y)-->(z)-->(x) fuses hops 2-3, then the chain keeps expanding
    // from the bound x
    val q = "MATCH (x:V)-[:E]->(y:V)-%s->(z:V)-[:E]->(x)-[:E]->(w:V) " +
      "RETURN id(x) AS xid, id(z) AS zid, id(w) AS wid ORDER BY xid, zid, wid"
    val fused = QueryEngine.execute(q.format("[:E]"), g).as[(Long, Long, Long)].collect().toSeq
    val unfused = QueryEngine.execute(q.format("[r:E]"), g).as[(Long, Long, Long)].collect().toSeq
    assert(fused == unfused && fused.nonEmpty)
  }

  test("fusion inside OPTIONAL MATCH keeps left-outer semantics") {
    val q = "MATCH (x:V) OPTIONAL MATCH (x)-[:E]->(y:V)-%s->(z:V)-[:E]->(x) " +
      "RETURN id(x) AS xid, count(z) AS n ORDER BY xid"
    val fused = QueryEngine.execute(q.format("[:E]"), g).as[(Long, Long)].collect().toSeq
    val unfused = QueryEngine.execute(q.format("[r:E]"), g).as[(Long, Long)].collect().toSeq
    assert(fused == unfused)
    // node 5 is isolated: the optional pattern must keep it with count 0
    assert(fused.exists { case (x, n) => x == 5L && n == 0L })
  }

  test("fusion inside EXISTS keeps semi-join semantics") {
    val q = "MATCH (x:V) WHERE EXISTS { (x)-[:E]->(y:V)-%s->(z:V)-[:E]->(x) } " +
      "RETURN id(x) AS xid ORDER BY xid"
    val fused = QueryEngine.execute(q.format("[:E]"), g).as[Long].collect().toSeq
    val unfused = QueryEngine.execute(q.format("[r:E]"), g).as[Long].collect().toSeq
    assert(fused == unfused && fused == Seq(1L, 2L, 3L, 4L))
  }

  test("simple-graph stats drop the multiplicity back-joins; parallel edges keep them") {
    // dense toy (complete digraph on 5 nodes: fan 20/5 = 4 clears the fan
    // gate) so the STATS path fuses; maxMultiplicity=1 proves the graph
    // simple, so the fused plan needs no back-joins
    val ids = (1L to 5L)
    val denseNodes = ids.map(i => (i, Seq("V"), s"n$i")).toDF("id", "labels", "name")
    val denseEdges = (for { a <- ids; b <- ids if a != b } yield
      (a * 100 + b, a, b, "E")).toDF("id", "src", "dst", "relationship")
    val qTri = "MATCH (a:V)-[:E]->(b:V)-[:E]->(c:V)-[:E]->(a) RETURN count(*) AS n"
    val qTriU = "MATCH (a:V)-[:E]->(b:V)-[r:E]->(c:V)-[:E]->(a) RETURN count(*) AS n"

    def joinCount(df: org.apache.spark.sql.DataFrame): Int =
      "Join Inner".r.findAllIn(df.queryExecution.optimizedPlan.toString).size

    val simpleG = PropertyGraph(denseNodes, denseEdges,
      statsKey = Some("wco-test-simple"))
    val df = QueryEngine.execute(qTri, simpleG)
    assert(df.queryExecution.optimizedPlan.toString.contains("array_intersect"))
    assert(df.as[Long].head() ==
      QueryEngine.execute(qTriU, simpleG).as[Long].head())

    // with a parallel 1->2 edge the stat reads 2 -> the two multiplicity
    // back-joins stay in the plan and the fused count still matches the
    // binary lowering
    val parG = PropertyGraph(denseNodes,
      denseEdges.unionAll(Seq((999L, 1L, 2L, "E")).toDF("id", "src", "dst", "relationship")),
      statsKey = Some("wco-test-par"))
    val df2 = QueryEngine.execute(qTri, parG)
    assert(joinCount(df2) == joinCount(df) + 2,
      "parallel-edge stats should keep exactly the two back-joins")
    assert(df2.as[Long].head() ==
      QueryEngine.execute(qTriU, parG).as[Long].head())
  }

  test("relationship-property predicates apply to both fused hops") {
    // weighted toy: only the w=1 edges may bind the filtered hops
    val wNodes = (1L to 4L).map(i => (i, Seq("V"), s"n$i")).toDF("id", "labels", "name")
    val wEdges = Seq(
      (1L, 1L, 2L, "E", 1L), (2L, 2L, 3L, "E", 1L), (3L, 3L, 1L, "E", 1L),
      (4L, 2L, 3L, "E", 2L), (5L, 3L, 1L, "E", 2L), (6L, 2L, 4L, "E", 1L),
      (7L, 4L, 1L, "E", 1L)).toDF("id", "src", "dst", "relationship", "w")
    val wg = PropertyGraph(wNodes, wEdges)
    val q = "MATCH (a:V)-[:E]->(b:V)-%s {w: 1}]->(c:V)-[:E {w: 1}]->(a) " +
      "RETURN count(*) AS n"
    val fused = QueryEngine.execute(q.format("[:E"), wg).as[Long].head()
    val unfused = QueryEngine.execute(q.format("[r:E"), wg).as[Long].head()
    // the w=2 parallel copies of 2->3 / 3->1 must be filtered out of the
    // two CONSTRAINED hops but still bind the unconstrained first hop —
    // the named-rel variant runs the same filters through the binary path
    assert(fused == unfused && fused > 0L)
  }

  test("direct 2-cycle (mutual edges) closes through the fused wedge") {
    val ids = (1L to 4L)
    val dn = ids.map(i => (i, Seq("V"), s"n$i")).toDF("id", "labels", "name")
    val de = (for { a <- ids; b <- ids if a != b } yield
      (a * 10 + b, a, b, "E")).toDF("id", "src", "dst", "relationship")
    val dg = PropertyGraph(dn, de)
    val q = "MATCH (a:V)-[:E]->(b:V)-%s->(a) RETURN count(*) AS n"
    val fused = QueryEngine.execute(q.format("[:E]"), dg).as[Long].head()
    val unfused = QueryEngine.execute(q.format("[r:E]"), dg).as[Long].head()
    // complete digraph on 4 nodes: every ordered pair is a 2-cycle
    assert(fused == 12L && fused == unfused)
  }

  test("randomized differential: fused == unfused on 8 random multigraphs") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 8) {
      val n = 4 + rnd.nextInt(5)
      val m = 8 + rnd.nextInt(20)
      val nodes = (1L to n).map(i => (i, Seq("V"), s"n$i")).toDF("id", "labels", "name")
      // parallel edges and self-loops both allowed
      val edges = (1 to m).map { k =>
        (1000L + k, 1L + rnd.nextInt(n), 1L + rnd.nextInt(n), "E")
      }.toDF("id", "src", "dst", "relationship")
      val rg = PropertyGraph(nodes, edges)
      for (pat <- Seq(
        "MATCH (a:V)-[:E]->(b:V)-%s->(c:V)-[:E]->(a) RETURN count(*) AS n",
        "MATCH (a:V)-[:E]->(b:V)-%s->(a) RETURN count(*) AS n",
        "MATCH (a:V)-[:E]-(b:V)-%s-(c:V)-[:E]-(a) RETURN count(*) AS n")) {
        val fused = QueryEngine.execute(pat.format("[:E]"), rg).as[Long].head()
        val unfused = QueryEngine.execute(pat.format("[r:E]"), rg).as[Long].head()
        assert(fused == unfused, s"trial $trial pattern $pat: $fused != $unfused")
      }
    }
  }

  test("the fused plan intersects adjacency arrays instead of a third edge join") {
    val df = QueryEngine.execute(
      "MATCH (a:V)-[:E]->(b:V)-[:E]->(c:V)-[:E]->(a) RETURN count(*) AS n", g)
    assert(df.queryExecution.optimizedPlan.toString.contains("array_intersect"))
  }
}
