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

  test("CASE without ELSE yields null") {
    val r = QueryEngine.execute(
      "MATCH (n:P) RETURN CASE WHEN n.name = 'Z' THEN 1 END AS c", g).collect()(0)
    assert(r.isNullAt(0))
  }
}
