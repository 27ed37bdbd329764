package graft.queries

import graft.cypher.QueryEngine
import graft.model.GraphLoader
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end Cypher surface (SURVEY.md §3 lifecycle): each query is a Cypher
  * STRING parsed by graft.cypher.CypherParser, translated to a DataFrame
  * pipeline over the TPC-H graph projection, and checked against a DuckDB
  * oracle — validating parser + translator + execution together.
  */
object CypherQueries {

  private def run(cy: String)(s: SparkSession, d: String): DataFrame =
    QueryEngine.execute(cy, GraphLoader.tpch(s, d))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §7.2 flagship slice: scan+filter+expand+agg+sort+limit
    "q_cypher_match_agg" -> (run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.balance > 200000
        |RETURN c.name AS name, count(o) AS n
        |ORDER BY n DESC, name LIMIT 10""".stripMargin) _),

    // two-hop pattern with edge-property aggregation
    "q_cypher_2hop" -> (run(
      """MATCH (c:Customer)-[:PLACED]->(:Order)-[r:CONTAINS]->()
        |RETURN id(c) AS cid, count(r) AS n_items, round(sum(r.weight), 2) AS total_qty
        |ORDER BY cid""".stripMargin) _),

    // OPTIONAL MATCH with property map + null-skipping count
    "q_cypher_optional" -> (run(
      """MATCH (c:Customer)
        |OPTIONAL MATCH (c)-[:PLACED]->(o:Order {name: 'O'})
        |RETURN id(c) AS cid, count(o) AS n
        |ORDER BY cid""".stripMargin) _),

    // variable-length expansion *1..2 over all edge types
    "q_cypher_varlength" -> (run(
      """MATCH (c:Customer)-[*1..2]->(x)
        |WHERE id(c) < 20
        |RETURN id(c) AS start, id(x) AS node
        |ORDER BY start, node""".stripMargin) _),

    // string predicates in WHERE
    "q_cypher_where_str" -> (run(
      """MATCH (p:Part)
        |WHERE p.name STARTS WITH 'a' OR p.name CONTAINS 'ol'
        |RETURN id(p) AS pid, p.name AS name
        |ORDER BY pid""".stripMargin) _),

    // DISTINCT projection over an expand
    "q_cypher_distinct" -> (run(
      """MATCH (:Customer)-[:IN_NATION]->(n:Nation)
        |RETURN DISTINCT id(n) AS nid
        |ORDER BY nid""".stripMargin) _),

    // CASE expression as implicit grouping key
    "q_cypher_case" -> (run(
      """MATCH (o:Order)
        |RETURN CASE WHEN o.balance > 200000 THEN 'high'
        |            WHEN o.balance > 100000 THEN 'mid'
        |            ELSE 'low' END AS bucket, count(o) AS n
        |ORDER BY bucket""".stripMargin) _),

    // two comma patterns sharing a variable (join on c)
    "q_cypher_multipattern" -> (run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order), (c)-[:IN_NATION]->(n:Nation)
        |WHERE id(c) < 50
        |RETURN id(n) AS nid, count(o) AS n_orders
        |ORDER BY nid""".stripMargin) _),

    // UNWIND a generated list
    "q_cypher_unwind" -> (run(
      """MATCH (n:Nation)
        |UNWIND range(1, 3) AS i
        |RETURN id(n) AS nid, i
        |ORDER BY nid, i""".stripMargin) _),

    // ORDER BY + SKIP + LIMIT pagination
    "q_cypher_skip_limit" -> (run(
      """MATCH (o:Order)
        |RETURN id(o) AS oid, o.balance AS price
        |ORDER BY price DESC, oid
        |SKIP 5 LIMIT 10""".stripMargin) _))

  val oracles: Map[String, String] = Map(
    "q_cypher_match_agg" ->
      "SELECT c_name AS name, count(*) AS n FROM customer JOIN orders ON o_custkey = c_custkey WHERE o_totalprice > 200000 GROUP BY 1 ORDER BY n DESC, name LIMIT 10",
    "q_cypher_2hop" ->
      "SELECT CAST(o_custkey AS BIGINT) AS cid, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty FROM orders JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1",
    "q_cypher_optional" ->
      "SELECT CAST(c_custkey AS BIGINT) AS cid, count(o_orderkey) AS n FROM customer LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'O' GROUP BY 1 ORDER BY 1",
    "q_cypher_varlength" ->
      """WITH e AS (
        | SELECT CAST(o_custkey AS BIGINT) AS src, CAST(o_orderkey + 10000000 AS BIGINT) AS dst FROM orders
        | UNION ALL SELECT CAST(l_orderkey + 10000000 AS BIGINT), CAST(100000000 + l_orderkey*8 + l_linenumber AS BIGINT) FROM lineitem
        | UNION ALL SELECT CAST(100000000 + l_orderkey*8 + l_linenumber AS BIGINT), CAST(1000000000 + l_partkey AS BIGINT) FROM lineitem
        | UNION ALL SELECT CAST(100000000 + l_orderkey*8 + l_linenumber AS BIGINT), CAST(1100000000 + l_suppkey AS BIGINT) FROM lineitem
        | UNION ALL SELECT CAST(c_custkey AS BIGINT), CAST(1200000000 + c_nationkey AS BIGINT) FROM customer
        | UNION ALL SELECT CAST(1100000000 + s_suppkey AS BIGINT), CAST(1200000000 + s_nationkey AS BIGINT) FROM supplier
        | UNION ALL SELECT CAST(1200000000 + n_nationkey AS BIGINT), CAST(1300000000 + n_regionkey AS BIGINT) FROM nation
        |), s AS (SELECT CAST(c_custkey AS BIGINT) AS start FROM customer WHERE c_custkey < 20),
        |h1 AS (SELECT DISTINCT s.start, e.dst AS node FROM s JOIN e ON e.src = s.start),
        |h2 AS (SELECT DISTINCT h1.start, e.dst AS node FROM h1 JOIN e ON e.src = h1.node)
        |SELECT start, node FROM (SELECT start, node FROM h1 UNION SELECT start, node FROM h2) ORDER BY start, node""".stripMargin,
    "q_cypher_where_str" ->
      "SELECT CAST(p_partkey + 1000000000 AS BIGINT) AS pid, p_name AS name FROM part WHERE starts_with(p_name, 'a') OR contains(p_name, 'ol') ORDER BY pid",
    "q_cypher_distinct" ->
      "SELECT DISTINCT CAST(1200000000 + c_nationkey AS BIGINT) AS nid FROM customer ORDER BY 1",
    "q_cypher_case" ->
      "SELECT CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    "q_cypher_multipattern" ->
      "SELECT CAST(1200000000 + c_nationkey AS BIGINT) AS nid, count(*) AS n_orders FROM customer JOIN orders ON o_custkey = c_custkey WHERE c_custkey < 50 GROUP BY 1 ORDER BY 1",
    "q_cypher_unwind" ->
      "SELECT CAST(1200000000 + n_nationkey AS BIGINT) AS nid, CAST(i AS BIGINT) AS i FROM nation, (SELECT unnest([1, 2, 3]) AS i) t ORDER BY 1, 2",
    "q_cypher_skip_limit" ->
      "SELECT CAST(o_orderkey + 10000000 AS BIGINT) AS oid, o_totalprice AS price FROM orders ORDER BY price DESC, oid LIMIT 10 OFFSET 5")
}
