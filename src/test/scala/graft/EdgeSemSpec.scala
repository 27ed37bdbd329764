package graft

import graft.cypher.QueryEngine
import graft.model.PropertyGraph

class EdgeSemSpec extends SparkSpec {
  import spark.implicits._
  private lazy val g = PropertyGraph(
    Seq((1L, Seq("P"), "A")).toDF("id", "labels", "name"),
    Seq((10L, 1L, 1L, "E")).toDF("id", "src", "dst", "relationship"))

  test("IN on lists, incl. empty") {
    val r = QueryEngine.execute(
      "MATCH (n:P) RETURN 2 IN [1, 2] AS a, 3 IN [1, 2] AS b", g)
      .as[(Boolean, Boolean)].head()
    assert(r == ((true, false)))
  }

  test("UNWIND of an empty list yields no rows") {
    val n = QueryEngine.execute("UNWIND [] AS x RETURN x", g).count()
    assert(n == 0L)
  }

  test("elementId() returns the reference's node:/edge: string form") {
    val r = QueryEngine.execute(
      "MATCH (n:P)-[r:E]->() RETURN elementId(n) AS en, elementId(r) AS er", g)
      .as[(String, String)].head()
    assert(r == (("node:1", "edge:10")))
  }

  test("isNaN, toStringOrNull, rels alias") {
    val r = QueryEngine.execute(
      "MATCH (n:P) RETURN isNaN(sqrt(-1)) AS a, isNaN(1.5) AS b, " +
        "toStringOrNull(42) AS c, toStringOrNull([1, 2]) AS d", g).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getString(2) == "42" && r.isNullAt(3))
    // non-scalar detection is by TYPE, not literal syntax: a computed list
    // (labels(n)) and a map literal are null too; a non-numeric input to
    // isNaN is a type error -> null, never false (operator.rs extract_float)
    val r2 = QueryEngine.execute(
      "MATCH (n:P) RETURN toStringOrNull(labels(n)) AS a, " +
        "toStringOrNull({k: 1}) AS b, isNaN(n.name) AS c, isNaN('2.5') AS d",
      g).collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1) && r2.isNullAt(2))
    assert(!r2.getBoolean(3))
    val p = QueryEngine.execute(
      "MATCH p = (a:P)-[:E]->(b) RETURN rels(p) AS es", g)
      .as[Seq[Long]].head()
    assert(p == Seq(10L))
  }

  test("hyperbolic functions") {
    val r = QueryEngine.execute(
      "MATCH (n:P) RETURN round(sinh(0.0), 4) AS a, round(cosh(0.0), 4) AS b, " +
        "round(tanh(0.0), 4) AS c", g).as[(Double, Double, Double)].head()
    assert(r == ((0.0, 1.0, 0.0)))
  }

  test("CASE without ELSE yields null") {
    val r = QueryEngine.execute(
      "MATCH (n:P) RETURN CASE WHEN n.name = 'Z' THEN 1 END AS c", g).collect()(0)
    assert(r.isNullAt(0))
  }
}
