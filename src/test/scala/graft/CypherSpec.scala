package graft

import graft.cypher.{CypherParser, QueryEngine}
import graft.model.PropertyGraph

/** Cypher parser + translator golden tests on the micro Person/KNOWS fixture
  * (FIXTURES.md §1, mirroring the reference's executor end-to-end tests in
  * src/query/executor/mod.rs). */
class CypherSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g = {
    val nodes = Seq(
      (1L, Seq("Person"), "Alice", 30L, "Paris"),
      (2L, Seq("Person"), "Bob", 25L, "London"),
      (3L, Seq("Person", "Engineer"), "Carol", 35L, "Paris"),
      (4L, Seq("Company"), "Acme", 1990L, "London"))
      .toDF("id", "labels", "name", "age", "city")
    val edges = Seq(
      (10L, 1L, 2L, "KNOWS", 2010L),
      (11L, 2L, 3L, "KNOWS", 2015L),
      (12L, 1L, 3L, "KNOWS", 2020L),
      (13L, 1L, 4L, "WORKS_AT", 2018L),
      (14L, 3L, 4L, "WORKS_AT", 2019L))
      .toDF("id", "src", "dst", "relationship", "since")
    PropertyGraph(nodes, edges)
  }

  private def run(cy: String) = QueryEngine.execute(cy, g)

  test("parser handles full clause structure") {
    val q = CypherParser.parse(
      "MATCH (a:Person {city: 'Paris'})-[r:KNOWS|WORKS_AT *1..3]->(b) " +
        "WHERE a.age > 20 AND NOT b.name = 'X' " +
        "RETURN DISTINCT a.name AS n, count(b) ORDER BY n DESC SKIP 1 LIMIT 5")
    assert(q.matches.head.paths.head.rels.head.types == Seq("KNOWS", "WORKS_AT"))
    assert(q.matches.head.paths.head.rels.head.maxHops == 3)
    assert(q.returnDistinct && q.skip.contains(1L) && q.limit.contains(5L))
  }

  test("match + where + return") {
    val r = run("MATCH (p:Person) WHERE p.age >= 30 RETURN p.name AS name ORDER BY name")
      .as[String].collect().toSeq
    assert(r == Seq("Alice", "Carol"))
  }

  test("expand with relationship type and direction") {
    val r = run("MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a, b.name AS b ORDER BY a, b")
      .as[(String, String)].collect().toSeq
    assert(r == Seq(("Alice", "Bob"), ("Alice", "Carol"), ("Bob", "Carol")))
  }

  test("incoming direction") {
    val r = run("MATCH (a:Person)<-[:KNOWS]-(b:Person) WHERE a.name = 'Carol' RETURN b.name AS b ORDER BY b")
      .as[String].collect().toSeq
    assert(r == Seq("Alice", "Bob"))
  }

  test("implicit aggregation with grouping") {
    val r = run("MATCH (a:Person)-[:KNOWS]->(b) RETURN a.name AS name, count(b) AS n ORDER BY n DESC, name")
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("Alice", 2L), ("Bob", 1L)))
  }

  test("multi-label scan") {
    val r = run("MATCH (e:Person:Engineer) RETURN e.name AS name").as[String].collect().toSeq
    assert(r == Seq("Carol"))
  }

  test("var-length path dedups to min reach") {
    val r = run("MATCH (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(b) RETURN b.name AS name ORDER BY name")
      .as[String].collect().toSeq
    assert(r == Seq("Bob", "Carol")) // Carol reachable at 1 and 2, once
  }

  test("optional match keeps unmatched rows") {
    val r = run("MATCH (p:Person) OPTIONAL MATCH (p)-[:WORKS_AT]->(c:Company) " +
      "RETURN p.name AS name, count(c) AS n ORDER BY name")
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("Alice", 1L), ("Bob", 0L), ("Carol", 1L)))
  }

  test("edge property access and functions") {
    val r = run("MATCH (a)-[r:KNOWS]->(b) WHERE r.since > 2012 " +
      "RETURN toUpper(b.name) AS n, r.since AS y ORDER BY y")
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("CAROL", 2015L), ("CAROL", 2020L)))
  }

  test("undirected relationship") {
    val r = run("MATCH (a:Person {name: 'Bob'})-[:KNOWS]-(x) RETURN x.name AS n ORDER BY n")
      .as[String].collect().toSeq
    assert(r == Seq("Alice", "Carol"))
  }

  test("explain produces both planner views") {
    val s = QueryEngine.explain("MATCH (p:Person) RETURN count(p) AS n", g)
    assert(s.contains("AST:") && s.contains("Physical Plan") || s.contains("=="))
  }
}
