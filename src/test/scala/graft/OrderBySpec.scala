package graft

import graft.cypher.QueryEngine
import graft.model.PropertyGraph

class OrderBySpec extends SparkSpec {
  import spark.implicits._
  private lazy val g = PropertyGraph(
    Seq((1L, Seq("P"), "A", 30L), (2L, Seq("P"), "B", 25L), (3L, Seq("P"), "C", 35L))
      .toDF("id", "labels", "name", "age"),
    Seq((10L, 1L, 2L, "E")).toDF("id", "src", "dst", "relationship"))

  test("ORDER BY a non-projected property") {
    val r = QueryEngine.execute("MATCH (n:P) RETURN n.name AS name ORDER BY n.age DESC", g)
      .as[String].collect().toSeq
    assert(r == Seq("C", "A", "B"))
  }

  test("ORDER BY a non-projected expression") {
    val r = QueryEngine.execute("MATCH (n:P) RETURN n.name AS name ORDER BY n.age % 7", g)
      .as[String].collect().toSeq
    assert(r == Seq("C", "A", "B")) // 35%7=0, 30%7=2, 25%7=4 ascending
  }
}
