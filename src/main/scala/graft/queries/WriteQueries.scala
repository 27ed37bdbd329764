package graft.queries

import graft.functions.CypherFunctions
import graft.model.{GraphLoader, GraphMutations}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path catalog (SURVEY §2.8): each entry MUTATES the graph with a
  * batch transform (CREATE / MERGE / DELETE / SET / REMOVE,
  * `graft.model.GraphMutations`) and returns a POST-MUTATION query result the
  * DuckDB oracle reproduces arithmetically — verifying the mutation semantics
  * end-to-end, not just that the transform runs.
  */
object WriteQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.8 CREATE: append cloned nodes, then count them back
    "q_create" -> ((s, d) => {
      val g = GraphLoader.tpch(s, d)
      val clones = g.nodesWithLabel("Customer")
        .select((col("id") + 50000000L).as("id"),
          array(lit("CustomerClone")).as("labels"), col("name"), col("balance"))
      val g2 = GraphMutations.createNodes(g, clones)
      g2.nodes.filter(col("id") >= 50000000L && col("id") < 60000000L)
        .agg(count(lit(1)).as("n_created"),
          CypherFunctions.roundC(sum(col("balance")), 2).as("total_bal"))
    }),

    // §2.8 MERGE: half the incoming ids exist (ON MATCH SET balance += 1000),
    // half are new (ON CREATE SET name = 'created')
    "q_merge" -> ((s, d) => {
      val g = GraphLoader.tpch(s, d)
      val existing = g.nodesWithLabel("Customer").filter(col("id") < 100)
      val incoming = existing
        .select(col("id"), col("labels"), col("name"), lit(0.0).as("balance"))
        .unionByName(existing.select((col("id") + 7000000L).as("id"),
          array(lit("NewCustomer")).as("labels"), col("name"), lit(50.0).as("balance")))
      val g2 = GraphMutations.mergeNodes(g, incoming,
        onCreateSet = Map("name" -> lit("created")),
        onMatchSet = Map("balance" -> (col("balance") + 1000.0)))
      g2.nodes
        .filter(col("id") < 100 || (col("id") >= 7000000L && col("id") < 8000000L))
        .select(col("id"), col("name"), CypherFunctions.roundC(col("balance"), 2).as("balance"))
        .orderBy(col("id"))
    }),

    // §2.8 DETACH DELETE: remove all Nation nodes + their incident edges,
    // then count what is left
    "q_delete" -> ((s, d) => {
      val g = GraphLoader.tpch(s, d)
      val g2 = GraphMutations.deleteNodes(g, g.nodesWithLabel("Nation").select(col("id")),
        detach = true)
      g2.nodes.agg(count(lit(1)).as("cnt")).select(lit("nodes").as("what"), col("cnt"))
        .unionAll(
          g2.edges.agg(count(lit(1)).as("cnt")).select(lit("edges").as("what"), col("cnt")))
        .orderBy(col("what"))
    }),

    // §2.8 SET + REMOVE: conditional property overwrite, then NULL-out a
    // property where the UPDATED value crosses a threshold (statement
    // ordering: the second mutation sees the first one's writes)
    "q_set" -> ((s, d) => {
      val g = GraphLoader.tpch(s, d)
      val isCust = array_contains(col("labels"), "Customer")
      val g2 = GraphMutations.setNodeProps(g, isCust && col("balance") > 5000,
        Map("balance" -> col("balance") * 1.1))
      val g3 = GraphMutations.removeNodeProps(g2, isCust && col("balance") > 9000, Seq("name"))
      g3.nodes.filter(isCust && col("id") < 300)
        .select(col("id"), col("name"), CypherFunctions.roundC(col("balance"), 2).as("balance"))
        .orderBy(col("id"))
    }))

  val oracles: Map[String, String] = Map(
    "q_create" ->
      "SELECT count(*) AS n_created, round(sum(c_acctbal), 2) AS total_bal FROM customer",
    "q_merge" ->
      """SELECT id, name, balance FROM (
        | SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name, round(c_acctbal + 1000, 2) AS balance FROM customer WHERE c_custkey < 100
        | UNION ALL SELECT CAST(c_custkey + 7000000 AS BIGINT), 'created', 50.0 FROM customer WHERE c_custkey < 100
        |) ORDER BY id""".stripMargin,
    "q_delete" ->
      """SELECT what, cnt FROM (
        | SELECT 'nodes' AS what, CAST((SELECT count(*) FROM customer)+(SELECT count(*) FROM orders)+(SELECT count(*) FROM part)+(SELECT count(*) FROM supplier)+(SELECT count(*) FROM region)+(SELECT count(DISTINCT l_orderkey*8 + l_linenumber) FROM lineitem) AS BIGINT) AS cnt
        | UNION ALL SELECT 'edges', CAST((SELECT count(*) FROM orders) + 3*(SELECT count(*) FROM lineitem) AS BIGINT)
        |) ORDER BY what""".stripMargin,
    "q_set" ->
      """SELECT id, name, balance FROM (
        | SELECT CAST(c_custkey AS BIGINT) AS id,
        |   CASE WHEN (CASE WHEN c_acctbal > 5000 THEN c_acctbal*1.1 ELSE c_acctbal END) > 9000 THEN NULL ELSE c_name END AS name,
        |   round(CASE WHEN c_acctbal > 5000 THEN c_acctbal*1.1 ELSE c_acctbal END, 2) AS balance
        | FROM customer WHERE c_custkey < 300
        |) ORDER BY id""".stripMargin)
}
