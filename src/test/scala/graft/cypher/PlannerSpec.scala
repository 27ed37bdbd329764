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
}
