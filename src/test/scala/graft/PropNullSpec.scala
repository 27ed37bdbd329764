package graft

import graft.cypher.QueryEngine
import graft.model.PropertyGraph

/** Schema-free property semantics: a property absent from the graph reads
  * as NULL (reference property.rs:8-14 — any node any properties). */
class PropNullSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g = PropertyGraph(
    Seq((1L, Seq("P"), "A")).toDF("id", "labels", "name"),
    Seq((10L, 1L, 1L, "E")).toDF("id", "src", "dst", "relationship"))

  test("missing property reads as null") {
    val r = QueryEngine.execute("MATCH (n:P) RETURN n.name AS a, n.ghost AS b", g)
      .collect()(0)
    assert(r.getString(0) == "A" && r.isNullAt(1))
  }

  test("missing property in WHERE is three-valued") {
    val n = QueryEngine.execute("MATCH (n:P) WHERE n.ghost > 5 RETURN count(*) AS c", g)
      .as[Long].head()
    assert(n == 0L)
  }
}
