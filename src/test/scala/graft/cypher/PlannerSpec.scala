package graft.cypher

import graft.SparkSpec
import graft.model.{GraphLoader, GraphStats}
import graft.cypher.Ast._

/** Anchor selection (reference plan_enumerator.rs:18-64, cost model
  * cost_model.rs:11-100): evidence the triple-stats decision actually fires
  * — the cost model orders the two orientations correctly AND the produced
  * plan anchors the scan at the cheap end. */
class PlannerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("triple-stats anchor selection flips a 2-hop pattern to the cheap end") {
    val g = GraphLoader.tpch(spark, dir)
    val tr = new Translator(g)
    val q = CypherParser.parse(
      "MATCH (c:Customer)-[:IN_NATION]->(n:Nation {name: 'NATION_3'}) RETURN id(c) AS cid")
    val path = q.first.clauses.collect { case m: MatchClause => m }.head.paths.head
    val st = GraphStats.forGraph(g, s"tpch:$dir")

    // the cost model must rank the reversed orientation (anchor at the
    // 25-row Nation table with a 0.1-selective prop) under the written one
    // (anchor at the full Customer scan)
    val fwd = tr.pathCost(path, st)
    val rev = tr.pathCost(tr.reversePath(path), st)
    assert(rev < fwd, s"expected reversed anchor cheaper: rev=$rev fwd=$fwd")

    // and the TRANSLATED plan really starts from the Nation leaf: the anchor
    // scan is the leftmost leaf of the left-deep join chain, so the FIRST
    // relation printed by the optimized plan is the nation table
    val plan = tr.translate(q).queryExecution.optimizedPlan.toString
    val firstLeaf = plan.substring(plan.indexOf("Relation ["))
      .linesIterator.next()
    assert(firstLeaf.contains("n_nationkey"), s"anchor not at the Nation leaf:\n$plan")
  }

  test("anchor selection keeps the written order when it is already cheap") {
    val g = GraphLoader.tpch(spark, dir)
    val tr = new Translator(g)
    val q = CypherParser.parse(
      "MATCH (n:Nation {name: 'NATION_3'})<-[:IN_NATION]-(c:Customer) RETURN id(c) AS cid")
    val path = q.first.clauses.collect { case m: MatchClause => m }.head.paths.head
    val st = GraphStats.forGraph(g, s"tpch:$dir")
    // written order already anchors at Nation: the reverse must NOT be
    // strictly cheaper, so the plan keeps the written orientation
    assert(tr.pathCost(tr.reversePath(path), st) >= tr.pathCost(path, st))
    val plan = tr.translate(q).queryExecution.optimizedPlan.toString
    val firstLeaf = plan.substring(plan.indexOf("Relation ["))
      .linesIterator.next()
    assert(firstLeaf.contains("n_nationkey"), s"anchor not at the Nation leaf:\n$plan")
  }

  test("WCO fusion is stats-gated: high-fan wedge fuses, fan-1 wedge stays binary") {
    val g = GraphLoader.tpch(spark, dir)
    val tr1 = new Translator(g)
    // wedge hop (p)<-[:HAS_PART]-(l2) fans out ~30 lineitems per part ->
    // the closing hops fuse to the adjacency-intersect lowering
    val fused = tr1.translate(CypherParser.parse(
      "MATCH (o:Order)-[:CONTAINS]->(l1:Lineitem)-[:HAS_PART]->(p:Part)" +
        "<-[:HAS_PART]-(l2:Lineitem)<-[:CONTAINS]-(o) RETURN count(*) AS n"))
      .queryExecution.optimizedPlan.toString
    assert(fused.contains("array_intersect"), "high-fan cycle close should fuse")

    // wedge hop (s)-[:IN_NATION]->(n) has out-degree 1 -> the fusion's
    // constant overhead cannot pay off, the gate keeps binary joins
    val tr2 = new Translator(g)
    val binary = tr2.translate(CypherParser.parse(
      "MATCH (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(l:Lineitem)" +
        "-[:SUPPLIED_BY]->(s:Supplier)-[:IN_NATION]->(n:Nation)<-[:IN_NATION]-(c) " +
        "RETURN count(*) AS n"))
      .queryExecution.optimizedPlan.toString
    assert(!binary.contains("array_intersect"), "fan-1 cycle close should not fuse")
  }
}
